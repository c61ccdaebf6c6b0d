package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Enrich
import graft.operators.Enrich.Enricher

/** Plumbing pins for the pluggable enrichment slot: batch boundaries,
  * init-once-per-partition, poison-row isolation, dimension check. The
  * "model" is a deterministic fake — the stub-the-model /
  * verify-the-plumbing recipe the multimodal decode layer uses. */
/** Counts init calls and batch sizes through Spark accumulators (the
  * enricher runs in executor threads; plain fields would be lost).
  * Top-level so the closure does not drag the test suite along. */
private class EnrichProbe(initAcc: org.apache.spark.util.LongAccumulator,
                          maxSeen: org.apache.spark.util.LongAccumulator,
                          failOn: Set[String] = Set.empty)
    extends Enricher[String, String] {
  override def init(): Unit = initAcc.add(1)
  def enrichBatch(in: Seq[String]): Seq[String] = {
    maxSeen.add(math.max(0, in.length - 8)) // any batch over 8 adds evidence
    if (in.exists(failOn.contains)) throw new RuntimeException("poison")
    in.map(s => s"ok:$s")
  }
  def onFailure(in: String, e: Throwable): String = s"degraded:$in"
}

private class EnrichBadDim extends Enricher[String, Array[Float]] {
  def enrichBatch(in: Seq[String]): Seq[Array[Float]] =
    in.map(s => Array.fill(if (s == "b") 3 else 4)(1.0f))
  def onFailure(in: String, e: Throwable): Array[Float] = null
}

private class EnrichGoodDim extends Enricher[String, Array[Float]] {
  def enrichBatch(in: Seq[String]): Seq[Array[Float]] =
    in.map(_ => Array.fill(4)(0.5f))
  def onFailure(in: String, e: Throwable): Array[Float] = null
}

class EnrichSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("enrichText: one output per row, batches bounded, init once per partition") {
    import spark.implicits._
    val sc = spark.sparkContext
    val inits = sc.longAccumulator("inits")
    val overs = sc.longAccumulator("overs")
    val docs = (0L until 100L).map(i => (i, s"t$i")).toDF("doc_id", "text")
      .repartition(4)
    val out = Enrich.enrichText(docs, "doc_id", "text",
        new EnrichProbe(inits, overs), maxBatch = 8)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out.size == 100)
    assert((0L until 100L).forall(i => out(i) == s"ok:t$i"))
    assert(overs.value == 0, "a batch exceeded maxBatch")
    assert(inits.value == 4, s"init must run once per partition, ran ${inits.value}")
  }

  test("poison row degrades alone; its batch-mates still enrich") {
    import spark.implicits._
    val sc = spark.sparkContext
    val docs = (0L until 20L).map(i => (i, s"t$i")).toDF("doc_id", "text")
      .coalesce(1)
    val out = Enrich.enrichText(docs, "doc_id", "text",
        new EnrichProbe(sc.longAccumulator, sc.longAccumulator, failOn = Set("t7")),
        maxBatch = 8)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(7L) == "degraded:t7", "the poison row degrades")
    assert((0L until 20L).filter(_ != 7L).forall(i => out(i) == s"ok:t$i"),
      "every other row — including the poison row's batch-mates — enriches")
  }

  test("enrichEmbedding: dimension check fails loudly on a misbehaving model") {
    import spark.implicits._
    val docs = Seq((1L, "a"), (2L, "b")).toDF("doc_id", "text")
    val ex = intercept[org.apache.spark.SparkException] {
      Enrich.enrichEmbedding(docs, "doc_id", "text", new EnrichBadDim, dim = 4)
        .collect()
    }
    assert(ex.getMessage.contains("3-dim") || ex.getCause != null)
    // and a well-behaved enricher passes the check
    val rows = Enrich.enrichEmbedding(docs, "doc_id", "text", new EnrichGoodDim,
        dim = 4)
      .collect()
    assert(rows.length == 2 && rows.forall(_.getSeq[Float](1).length == 4))
  }
}
