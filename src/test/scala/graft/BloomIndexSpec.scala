package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.lake.BloomIndex

class BloomIndexSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val Bits = 1 << 14
  private val K = 2

  // 20k events over 2k users, hash-partitioned into 16 files by event id, so
  // a user's rows scatter across files — exactly the layout footer min/max
  // stats cannot prune
  private lazy val dir = {
    import spark.implicits._
    val d = Files.createTempDirectory("graft-bloom").toString
    (0 until 20000).map(i => (i.toLong, (i * 7919L) % 2000L, s"v$i"))
      .toDF("event_id", "user_id", "payload")
      .repartition(16, col("event_id"))
      .write.mode("overwrite").parquet(d)
    d
  }

  test("no false negatives: every file truly holding a value is a candidate") {
    val table = spark.read.parquet(dir)
    val idx = BloomIndex.build(table, "user_id", Bits, K)
    for (u <- Seq(0L, 777L, 1999L)) {
      val truth = table.filter(col("user_id") === u)
        .select(input_file_name()).distinct().collect().map(_.getString(0)).toSet
      assert(truth.nonEmpty, s"user $u must exist in the fixture")
      val cand = BloomIndex.candidateFiles(spark, idx, Seq(u), Bits, K).toSet
      assert(truth.subsetOf(cand),
        s"user $u: files ${truth -- cand} truly contain it but were skipped")
    }
  }

  test("absent keys skip most files; lookup reads only candidates, exact rows") {
    val table = spark.read.parquet(dir)
    val idx = BloomIndex.build(table, "user_id", Bits, K)
    // a key that never occurs: with ~1250 distinct strings per file at 2^14
    // bits / k=2 the per-file fp rate is ~2%, so candidates must stay far
    // below the 16 files a stats-blind reader would open
    val ghosts = BloomIndex.candidateFiles(spark, idx, Seq(987654321L), Bits, K)
    assert(ghosts.length <= 8, s"expected heavy skipping, got ${ghosts.length}/16 files")
    // lookup returns exactly the true rows (false positives cleared by the
    // exact predicate), including for multi-value lookups
    val got = BloomIndex.lookup(spark, idx, "user_id", Seq(777L, 987654321L),
      table.schema, Bits, K)
    val want = table.filter(col("user_id") === 777L)
    assert(got.count() == want.count())
    assert(got.select(sum("event_id")).collect()(0).getLong(0) ==
      want.select(sum("event_id")).collect()(0).getLong(0))
    // an all-absent lookup opens nothing and returns an empty, well-typed frame
    val none = BloomIndex.lookup(spark, idx, "user_id", Seq(111222333L),
      table.schema, Bits, K)
    assert(none.count() == 0 && none.schema == table.schema)
  }

  test("index is sidecar-sized and lake-persistable") {
    val table = spark.read.parquet(dir)
    val idx = BloomIndex.build(table, "user_id", Bits, K)
    // at most files x bits/64 words ever materialize
    assert(idx.count() <= 16L * (Bits / 64))
    val lake = new graft.lake.ParquetDirFormat(
      Files.createTempDirectory("graft-bloom-lake").toString)
    lake.create(idx, "bloom_user_id")
    val served = BloomIndex.candidateFiles(spark,
      lake.read(spark, "bloom_user_id"), Seq(777L), Bits, K).toSet
    assert(served == BloomIndex.candidateFiles(spark, idx, Seq(777L), Bits, K).toSet)
  }
}
