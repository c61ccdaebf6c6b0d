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
      val cand = BloomIndex.candidateFiles(spark, idx, Seq(u)).toSet
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
    val ghosts = BloomIndex.candidateFiles(spark, idx, Seq(987654321L))
    assert(ghosts.length <= 8, s"expected heavy skipping, got ${ghosts.length}/16 files")
    // lookup returns exactly the true rows (false positives cleared by the
    // exact predicate), including for multi-value lookups
    val got = BloomIndex.lookup(spark, idx, "user_id", Seq(777L, 987654321L),
      table.schema)
    val want = table.filter(col("user_id") === 777L)
    assert(got.count() == want.count())
    assert(got.select(sum("event_id")).collect()(0).getLong(0) ==
      want.select(sum("event_id")).collect()(0).getLong(0))
    // an all-absent lookup opens nothing and returns an empty, well-typed frame
    val none = BloomIndex.lookup(spark, idx, "user_id", Seq(111222333L),
      table.schema)
    assert(none.count() == 0 && none.schema == table.schema)
  }

  test("index is sidecar-sized; (bits, k) survive the lake round trip") {
    val table = spark.read.parquet(dir)
    // NON-default parameters: the round trip must serve from the stored
    // (bits, k), not from any reader-side default — querying a 2^13/k=3
    // index under the 2^16/k=2 defaults would return false negatives
    val idx = BloomIndex.build(table, "user_id", 1 << 13, 3)
    // at most files x bits/64 words ever materialize
    assert(idx.count() <= 16L * ((1 << 13) / 64))
    val lake = new graft.lake.ParquetDirFormat(
      Files.createTempDirectory("graft-bloom-lake").toString)
    lake.create(idx, "bloom_user_id")
    val roundTripped = lake.read(spark, "bloom_user_id")
    val served = BloomIndex.candidateFiles(spark, roundTripped, Seq(777L)).toSet
    assert(served == BloomIndex.candidateFiles(spark, idx, Seq(777L)).toSet)
    // superset guarantee holds THROUGH the round trip
    val truth = table.filter(col("user_id") === 777L)
      .select(input_file_name()).distinct().collect().map(_.getString(0)).toSet
    assert(truth.subsetOf(served))
    // a parameter-mixed index (e.g. two builds unioned) fails loudly rather
    // than guessing and silently missing files
    val mixed = idx.unionByName(BloomIndex.build(table, "user_id", Bits, K))
    assertThrows[IllegalArgumentException] {
      BloomIndex.candidateFiles(spark, mixed, Seq(777L))
    }
  }

  test("refresh: appended files get filters under the stored (bits, k), stale drop") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_bloomref_").toString
    (0 until 2).foreach { k =>
      (0 until 50).map(i => 1000L * k + i).toDF("id").coalesce(1)
        .write.mode("append").parquet(dir)
    }
    val idx0 = BloomIndex.build(spark.read.parquet(dir), "id", bits = 1 << 10, k = 2)
      .localCheckpoint(true)
    (0 until 50).map(i => 9000L + i).toDF("id").coalesce(1)
      .write.mode("append").parquet(dir)
    val table = spark.read.parquet(dir)
    val idx1 = BloomIndex.refresh(table, idx0, "id").localCheckpoint(true)
    // the new value is found, and only in the appended file (no false negatives)
    val hits = BloomIndex.candidateFiles(spark, idx1, Seq(9007L))
    assert(hits.nonEmpty, "appended value must be indexed after refresh")
    val rows = BloomIndex.lookup(spark, idx1, "id", Seq(9007L, 1003L), table.schema)
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(rows == Seq(1003L, 9007L))
    // refreshed sidecar still carries exactly one (bits, k) pair
    assert(idx1.select("bits", "k").distinct().count() == 1)
    // no-op refresh is stable
    assert(BloomIndex.refresh(table, idx1, "id").count() == idx1.count())
  }
}
