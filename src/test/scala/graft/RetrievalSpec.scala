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
}
