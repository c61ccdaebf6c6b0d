package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.core.Tables
import graft.operators.Similarity

class SimilaritySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  def emb = Tables.embeddings(spark, TestSpark.sfDir)

  test("brute-force top-k: k rows per query, ranks contiguous, cosine sorted") {
    val rows = Similarity.bruteForceTopK(emb, nQueries = 5, k = 10).collect()
    val byQ = rows.groupBy(_.getLong(0))
    assert(byQ.size == 5)
    byQ.values.foreach { g =>
      assert(g.length == 10)
      val sorted = g.sortBy(_.getInt(3))
      assert(sorted.map(_.getInt(3)).toSeq == (1 to 10))
      val cosines = sorted.map(_.getDouble(2)).toSeq
      assert(cosines == cosines.sorted.reverse)
    }
  }

  test("l2Normalize yields unit vectors and is idempotent") {
    import org.apache.spark.sql.functions._
    val n1 = Similarity.l2Normalize(emb)
    val norms = n1.limit(20).select(expr("sqrt(graft_dot(embedding, embedding))")).collect()
      .map(_.getDouble(0))
    norms.foreach(n => assert(math.abs(n - 1.0) < 1e-3, s"norm $n"))
    val n2 = Similarity.l2Normalize(n1)
    val a = n1.orderBy("vec_id").limit(3).select("embedding").collect().map(_.getSeq[Float](0))
    val b = n2.orderBy("vec_id").limit(3).select("embedding").collect().map(_.getSeq[Float](0))
    a.zip(b).foreach { case (x, y) =>
      x.zip(y).foreach { case (u, v) => assert(math.abs(u - v) < 1e-4) } }
  }

  test("IVF ANN recall@10 >= 0.5 against brute force") {
    val exact = Similarity.bruteForceTopK(emb, nQueries = 10, k = 10).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Similarity.ivfAnnTopK(emb, nQueries = 10, k = 10).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.5, s"IVF recall was $recall")
  }

  test("LSH ANN recall@10 >= 0.6 against brute force") {
    val exact = Similarity.bruteForceTopK(emb, nQueries = 10, k = 10).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Similarity.lshAnnTopK(emb, nQueries = 10, k = 10).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.6, s"recall was $recall")
  }
}
