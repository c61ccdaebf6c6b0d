package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.lake.ParquetDirFormat
import graft.operators.Profiling

class IncrementalStatsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  def li = Tables.lineitem(spark, TestSpark.sfDir)
  private val cols = Seq("l_quantity", "l_extendedprice")

  private def withShard(df: org.apache.spark.sql.DataFrame) =
    df.withColumn("shard", pmod(col("l_orderkey"), lit(8L)))

  test("merged partials equal the direct single-scan profile bit-for-bit") {
    val merged = Profiling.mergeStatsPartials(
      Profiling.statsPartials(withShard(li), "shard", cols), cols).collect()(0)
    val direct = li.agg(
      count(lit(1)).cast("long").as("total_rows"),
      cols.flatMap(c => Seq(
        count(col(c)).cast("long").as(s"nn_$c"),
        min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c"),
        graft.core.Exact.dsum(col(c)).as(s"sum_$c"),
        graft.core.Exact.davg(col(c)).as(s"avg_$c"))): _*).collect()(0)
    assert(merged.schema.fieldNames.sorted.sameElements(direct.schema.fieldNames.sorted))
    merged.schema.fieldNames.foreach { f =>
      assert(merged.getAs[Any](f) == direct.getAs[Any](f), s"field $f differs")
    }
  }

  test("lake round trip: batch-appended partials merge to the global profile") {
    val lake = new ParquetDirFormat(
      Files.createTempDirectory("graft-stats").toString)
    // two ingest batches land partials independently — no batch ever sees
    // the other's rows, and the merge never rescans either batch
    val b1 = li.filter(col("l_orderkey") % 2 === 0)
    val b2 = li.filter(col("l_orderkey") % 2 === 1)
    lake.create(Profiling.statsPartials(withShard(b1), "shard", cols), "stats")
    lake.append(Profiling.statsPartials(withShard(b2), "shard", cols), "stats")
    val merged = Profiling.mergeStatsPartials(lake.read(spark, "stats"), cols)
      .collect()(0)
    val full = Profiling.mergeStatsPartials(
      Profiling.statsPartials(withShard(li), "shard", cols), cols).collect()(0)
    full.schema.fieldNames.foreach { f =>
      assert(merged.getAs[Any](f) == full.getAs[Any](f), s"field $f differs")
    }
  }
}
