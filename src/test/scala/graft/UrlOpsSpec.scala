package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.UrlOps

/** Semantics the gate can't pin: URL edge shapes (ports, fragments, uppercase
  * hosts, schemeless strings) and the skew-safety equivalence — the two-phase
  * salted top-N must equal a single global window on a corpus with a hot key
  * three orders of magnitude above the cold ones.
  */
class UrlOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("parseUrls: host lowercased, port kept, path excludes query and fragment") {
    import spark.implicits._
    val got = UrlOps.parseUrls(Seq(
      (1L, "https://WWW.Example.COM/a/b?q=1#frag"),
      (2L, "http://cdn.site.org:8080/x"),
      (3L, "ftp://deep.sub.host.net/"),
      (4L, "not a url at all")
    ).toDF("doc_id", "url"))
      .select("doc_id", "scheme", "host", "path", "registrable_domain")
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getString(2), r.getString(3), r.getString(4)))).toMap
    assert(got(1L) == (("https", "www.example.com", "/a/b", "example.com")))
    // port stays in host but is STRIPPED from registrable_domain, so a
    // blocklist on 'site.org' also catches explicit-port URLs (r7 ADVICE)
    assert(got(2L) == (("http", "cdn.site.org:8080", "/x", "site.org")))
    assert(got(3L) == (("ftp", "deep.sub.host.net", "/", "host.net")))
    assert(got(4L) == (("", "", "", "")))
  }

  test("topNPerKey equals a single global window under heavy key skew") {
    import spark.implicits._
    // hot key: 5000 rows; cold keys: 3 rows each — ordering (score DESC, id ASC)
    // is total because id is unique
    val rows = (0L until 5000L).map(i => ("hot", i, (i * 2654435761L) % 9973)) ++
      (0L until 30L).map(i => (s"cold${i % 10}", 100000L + i, i))
    val df = rows.toDF("key", "id", "score")
    val ordering = Seq(col("score").desc, col("id").asc)
    val got = UrlOps.topNPerKey(df, col("key"), 7, ordering, saltCol = col("id"))
      .select("key", "id", "rank_in_key")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSet
    val want = df.withColumn("rank_in_key",
        row_number().over(Window.partitionBy("key").orderBy(ordering: _*)))
      .filter(col("rank_in_key") <= 7)
      .select("key", "id", "rank_in_key")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSet
    assert(got == want)
    assert(got.count(_._1 == "hot") == 7)
  }

  test("domainCap: blocklist removes the domain, cap bounds each survivor") {
    import spark.implicits._
    val docs = (0L until 60L).map { i =>
      val dom = if (i % 3 == 0) "blocked.com" else if (i % 3 == 1) "big.org" else "small.net"
      (i, s"https://www.$dom/p/$i", (100 + i).toInt)
    }.toDF("doc_id", "url", "n_chars")
    val got = UrlOps.domainCap(docs, Seq("blocked.com"), cap = 5)
      .collect().map(r => (r.getAs[String]("registrable_domain"),
        r.getAs[Long]("doc_id"), r.getAs[Int]("domain_rank")))
    assert(!got.exists(_._1 == "blocked.com"))
    assert(got.count(_._1 == "big.org") == 5)
    assert(got.count(_._1 == "small.net") == 5)
    // longer docs (higher n_chars = higher doc_id here) rank first
    val bigTop = got.filter(_._1 == "big.org").sortBy(_._3).map(_._2).toSeq
    assert(bigTop == Seq(58L, 55L, 52L, 49L, 46L))
  }
}
