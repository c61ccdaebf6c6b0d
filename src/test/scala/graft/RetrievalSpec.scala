package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.core.Tables
import graft.operators.{Retrieval, Similarity, TextOps}

class RetrievalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  def docs = Tables.documents(spark, TestSpark.sfDir)
  def emb = Tables.embeddings(spark, TestSpark.sfDir)
  val terms = Seq("hash", "join", "stream")

  test("hybridRrf: fused ranks contiguous, rrf is the exact reciprocal arithmetic of the leg ranks") {
    val rows = Retrieval.hybridRrf(docs, emb, terms).collect()
    assert(rows.length == 20)
    val ranks = rows.map(_.getInt(4)).sorted.toSeq
    assert(ranks == (1 to 20))
    val rrfs = rows.sortBy(_.getInt(4)).map(_.getDouble(3)).toSeq
    assert(rrfs == rrfs.sorted.reverse)
    rows.foreach { r =>
      val lex = if (r.isNullAt(1)) 0.0 else 1.0 / (60 + r.getInt(1))
      val sem = if (r.isNullAt(2)) 0.0 else 1.0 / (60 + r.getInt(2))
      assert(r.getDouble(3) == lex + sem, s"rrf mismatch for doc ${r.getLong(0)}")
    }
  }

  test("hybridRrf: fusion agrees with a driver-side replay of the two legs") {
    val lex = TextOps.tfidfSearch(docs, terms, 50)
      .select("doc_id").collect().map(_.getLong(0)).toSeq // already (score desc, doc_id) ordered
    val sem = Similarity.bruteForceTopK(emb, 1, 50)
      .collect().sortBy(_.getInt(3)).map(_.getLong(1)).toSeq
    val lexR = lex.zipWithIndex.map { case (d, i) => d -> (i + 1) }.toMap
    val semR = sem.zipWithIndex.map { case (d, i) => d -> (i + 1) }.toMap
    val expected = (lexR.keySet ++ semR.keySet).toSeq
      .map(d => (d, lexR.get(d).map(r => 1.0 / (60 + r)).getOrElse(0.0) +
        semR.get(d).map(r => 1.0 / (60 + r)).getOrElse(0.0)))
      .sortBy { case (d, s) => (-s, d) }.take(20)
    val got = Retrieval.hybridRrf(docs, emb, terms).collect()
      .sortBy(_.getInt(4)).map(r => (r.getLong(0), r.getDouble(3))).toSeq
    assert(got == expected)
  }

  test("hybridRrf: every doc ranked in BOTH lists outranks every single-list doc") {
    // a theorem at (kEach = 50, K = 60): the worst both-lists score is
    // 2/(60+50) ~ 0.0182, the best single-list score 1/(60+1) ~ 0.0164 —
    // consensus dominates, the property RRF is chosen for
    val rows = Retrieval.hybridRrf(docs, emb, terms).collect()
    val both = rows.filter(r => !r.isNullAt(1) && !r.isNullAt(2))
    val single = rows.filter(r => r.isNullAt(1) ^ r.isNullAt(2))
    info(s"fused top-20: ${both.length} consensus docs, ${single.length} single-list docs")
    for (b <- both; s <- single)
      assert(b.getDouble(3) > s.getDouble(3) && b.getInt(4) < s.getInt(4))
  }

  test("mmrDiversify: lambda=1 is pure relevance order; diversification demotes the near-clone") {
    import spark.implicits._
    // toy space: query is vec 0; vecs 1 and 2 are near-identical clones
    // closest to the query; vec 3 is relevant but orthogonal to the clones
    val e = Seq(
      (0L, Array(1f, 0f, 0f, 0f)),
      (1L, Array(0.9f, 0.1f, 0f, 0f)),
      (2L, Array(0.9f, 0.11f, 0f, 0f)),
      (3L, Array(0.6f, 0f, 0.8f, 0f)),
      (4L, Array(0f, 0f, 0f, 1f))).toDF("vec_id", "embedding")
    val pure = Retrieval.mmrDiversify(e, kCand = 4, kOut = 3, lambda = 1.0)
      .collect().sortBy(_.getInt(3)).map(_.getLong(0)).toSeq
    assert(pure == Seq(1L, 2L, 3L), s"lambda=1 must be relevance order, got $pure")
    val div = Retrieval.mmrDiversify(e, kCand = 4, kOut = 3, lambda = 0.5)
      .collect().sortBy(_.getInt(3)).map(_.getLong(0)).toSeq
    // the second clone pays a ~full similarity penalty and drops behind the
    // orthogonal-but-relevant vec 3
    assert(div.take(2) == Seq(1L, 3L), s"diversification must demote the clone, got $div")
    // deterministic
    assert(div == Retrieval.mmrDiversify(e, kCand = 4, kOut = 3, lambda = 0.5)
      .collect().sortBy(_.getInt(3)).map(_.getLong(0)).toSeq)
  }

  test("mmrDiversify on the corpus: kOut rows, rank-contiguous, first pick is the top relevance") {
    val out = Retrieval.mmrDiversify(emb).collect().sortBy(_.getInt(3))
    assert(out.length == 10)
    assert(out.map(_.getInt(3)).toSeq == (1 to 10))
    val top = Similarity.bruteForceTopK(emb, 1, 1).collect().head.getLong(1)
    assert(out.head.getLong(0) == top, "rank 1 must be the pure-relevance top hit")
    // blend bound: mmr = λ·rel − (1−λ)·maxSim with maxSim ∈ [−1, 1]
    out.tail.foreach(r =>
      assert(math.abs(r.getDouble(2) - 0.7 * r.getDouble(1)) <= 0.3 + 1e-12))
  }

  test("mmrDiversifyBatch on the corpus: per-query slice is BITWISE the single-query driver fold") {
    // query 0's slice of the batch must equal mmrDiversify exactly —
    // same picks, same doubles — and every query must emit a contiguous
    // kOut-rank block
    val batch = Retrieval.mmrDiversifyBatch(emb, nQueries = 5)
      .collect().groupBy(_.getLong(0))
    assert(batch.keySet == (0L until 5L).toSet)
    batch.values.foreach(rows =>
      assert(rows.map(_.getInt(4)).sorted.toSeq == (1 to 10)))
    val single = Retrieval.mmrDiversify(emb).collect().sortBy(_.getInt(3))
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2))).toSeq
    val q0 = batch(0L).sortBy(_.getInt(4))
      .map(r => (r.getLong(1), r.getDouble(2), r.getDouble(3))).toSeq
    assert(q0 == single, "grouped fold must be bitwise-equal to the driver fold")
  }

  test("mmrDiversifyBatch plan: no Window, vector-attach join broadcasts the shortlist") {
    val p = Retrieval.mmrDiversifyBatch(emb, nQueries = 5)
      .queryExecution.executedPlan.toString
    assert(!p.contains("Window"), s"batch MMR must not rank via a window:\n${p.take(400)}")
    assert(p.contains("BroadcastHashJoin"),
      s"the kCand-per-query shortlist must broadcast into the corpus scan:\n${p.take(600)}")
    assert(p.contains("MapGroups") || p.contains("FlatMapGroups"),
      s"the greedy must run inside the grouped fold:\n${p.take(400)}")
  }

  test("hardNegatives filters false negatives: near-dup and exact twin excluded, rest ranked as brute force") {
    import spark.implicits._
    import graft.operators.Dedup
    // doc 1 = near-dup of anchor 0 (one token changed), doc 2 = exact twin;
    // docs 3.. are genuinely different content
    val base = "the quick brown fox jumps over the lazy dog near the river bank today"
    val tdocs = Seq(
      (0L, base), (1L, base.replace("today", "tonight")), (2L, base),
      (3L, "completely different content about spark shuffles and joins"),
      (4L, "another unrelated document mentioning parquet footers and scans"),
      (5L, "a third distinct document on bloom filters and zone maps"))
      .toDF("doc_id", "text")
    // vectors: 1 and 2 are the anchor's closest by construction
    def vec(seed: Int): Array[Float] =
      Array.tabulate(64)(i => (math.sin(seed * 31 + i).toFloat))
    val a = vec(7)
    val nearA = a.clone(); nearA(0) = a(0) + 0.01f
    val tvecs = Seq(
      (0L, a, 0), (1L, nearA, 0), (2L, a, 0),
      (3L, vec(11), 0), (4L, vec(13), 0), (5L, vec(17), 0))
      .toDF("vec_id", "embedding", "label")
    // precondition: the dedup machinery sees (0,1), (0,2), (1,2) as dups
    val dupPairs = Dedup.minhashLshPairs(tdocs, 3, 42, 3, 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(dupPairs.contains((0L, 1L)), s"setup: expected (0,1) near-dup, got $dupPairs")
    val hn = Retrieval.hardNegatives(tdocs, tvecs, nQueries = 1, k = 3, tauJ = 0.5)
      .collect().map(r => (r.getLong(1), r.getInt(3)))
    // the two duplicate partners never appear; the three real documents do,
    // in brute-force cosine order
    assert(!hn.map(_._1).toSet.exists(Set(1L, 2L)),
      s"false negatives leaked into the hard-negative list: ${hn.toSeq}")
    val brute = Similarity.bruteForceTopK(tvecs, nQueries = 1, k = 5)
      .collect().filter(r => r.getLong(1) >= 3L)
      .sortBy(_.getInt(3)).map(_.getLong(1)).toSeq
    assert(hn.sortBy(_._2).map(_._1).toSeq == brute,
      s"surviving negatives must keep brute-force order: ${hn.toSeq} vs $brute")

    // injection path: a precomputed verified pair table (the production
    // dedup stage's output) must yield the identical mining result with
    // zero signature work
    val injected = Retrieval.hardNegatives(tdocs, tvecs, nQueries = 1, k = 3,
        tauJ = 0.5, pairs = Some(Dedup.minhashLshPairs(tdocs, 3, 42, 3, 0.5)))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    val generated = Retrieval.hardNegatives(tdocs, tvecs, nQueries = 1, k = 3,
        tauJ = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    assert(injected.toSeq == generated.toSeq,
      "injected-pairs mining must be bitwise-equal to the generated path")
  }
}
