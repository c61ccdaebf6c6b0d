package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Classifier

class ClassifierSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("perceptron separates a separable corpus after one epoch; trajectory deterministic") {
    import spark.implicits._
    // every +1 doc carries 'goodmark', every -1 doc 'badmark'; 'common'
    // appears in both classes equally, so its bucket weight must stay 0
    // (balanced classes) — a linearly separable toy the batch perceptron
    // must fit exactly by the second epoch's margins
    val labeled = (1 to 40).map { i =>
      if (i % 2 == 0) (i.toLong, "goodmark common common", 1L)
      else (i.toLong, "badmark common common", -1L)
    }.toDF("doc_id", "text", "y")
    val w = Classifier.trainPerceptron(labeled, buckets = 64, epochs = 3)
    val scored = Classifier.scorePerceptron(
      labeled.select("doc_id", "text"),
      w.select(col("bucket"), col("w3").as("w")), 64)
    val acc = scored.join(labeled.select("doc_id", "y"), "doc_id")
      .withColumn("ok", (col("margin") > 0) === (col("y") === 1L))
      .agg(avg(col("ok").cast("double"))).head().getDouble(0)
    assert(acc == 1.0, s"separable corpus not fit: accuracy $acc")
    // epoch 1 trains on every doc (w = 0 start): the marker buckets split
    // +/-, the balanced 'common' bucket nets to zero across all epochs
    val rows = w.collect().map(r => r.getLong(0) ->
      (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val nonzero = rows.filter(_._2._1 != 0L)
    assert(nonzero.size == 2, s"expected exactly the two marker buckets, got $nonzero")
    assert(nonzero.values.map(_._1).toSet == Set(20L, -20L))
    // deterministic retraining: identical trajectory
    val w2 = Classifier.trainPerceptron(labeled, buckets = 64, epochs = 3)
    assert(w.collect().sortBy(_.getLong(0)).toSeq ==
      w2.collect().sortBy(_.getLong(0)).toSeq)
  }

  test("scorePerceptron: featureless docs score margin 0 and pred false") {
    import spark.implicits._
    val docs = Seq((1L, "goodmark"), (2L, "")).toDF("doc_id", "text")
    // trainer-shaped table: one row per bucket (scorePerceptron fails loudly
    // on any other shape — the wrong-bucket-space guard)
    val w = (0 until 64).map(b => (b.toLong, if (b == 0) 5L else 0L))
      .toDF("bucket", "w")
    val got = Classifier.scorePerceptron(docs, w, 64).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(got(2L) == (0L, false))
    intercept[IllegalArgumentException](
      Classifier.scorePerceptron(docs, w.limit(3), 64).collect())
  }
}
