package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.lake.{ParquetDirFormat, Scd2}

class Scd2Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  def orders = Tables.orders(spark, TestSpark.sfDir)

  private def fmt() = new ParquetDirFormat(
    Files.createTempDirectory("graft-scd2").toString)

  private def canon(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.select("o_custkey", "o_orderpriority", "valid_from", "valid_to",
      "version_no", "is_current")
      .collect().map(_.mkString("")).sorted.toSeq

  test("history: versions tile each key's timeline with no gaps or overlaps") {
    val h = Scd2.history(orders, "o_custkey", Seq("o_orderpriority"),
      "o_orderdate", "o_orderkey").cache()
    val rows = h.collect().groupBy(_.getLong(0))
    assert(rows.nonEmpty)
    rows.foreach { case (_, vs) =>
      val sorted = vs.sortBy(_.getLong(4))
      // version numbers are 1..n dense
      assert(sorted.map(_.getLong(4)).toSeq == (1L to sorted.length).toSeq)
      // exactly one open (current) version, and it is the last
      assert(sorted.count(_.getBoolean(5)) == 1 && sorted.last.getBoolean(5))
      // each valid_to equals the successor's valid_from (timestamps are NTZ
      // here, so compare the raw objects, not java.sql.Timestamp)
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(a.getAs[Any](3) == b.getAs[Any](2))
        case _ =>
      }
      // consecutive versions always differ in the tracked attribute
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(a.getString(1) != b.getString(1))
        case _ =>
      }
    }
    h.unpersist()
  }

  test("incremental applyChanges converges to the full rebuild") {
    val dates = orders.select("o_orderdate").sort("o_orderdate").collect()
    val split = dates(dates.length / 2).getAs[java.time.LocalDateTime](0)
    val day1 = orders.filter(col("o_orderdate") <= lit(split))
    val day2 = orders.filter(col("o_orderdate") > lit(split))
    assert(day1.count() > 0 && day2.count() > 0)
    val lake = fmt()
    Scd2.applyChanges(spark, lake, "dim", day1, "o_custkey",
      Seq("o_orderpriority"), "o_orderdate", "o_orderkey")
    Scd2.applyChanges(spark, lake, "dim", day2, "o_custkey",
      Seq("o_orderpriority"), "o_orderdate", "o_orderkey")
    val full = Scd2.history(orders, "o_custkey", Seq("o_orderpriority"),
      "o_orderdate", "o_orderkey")
    assert(canon(lake.read(spark, "dim")) == canon(full))
  }

  test("applyChanges is idempotent and drops stale replays") {
    val lake = fmt()
    val run = () => Scd2.applyChanges(spark, lake, "dim", orders, "o_custkey",
      Seq("o_orderpriority"), "o_orderdate", "o_orderkey")
    run()
    val first = canon(lake.read(spark, "dim"))
    run() // replay the whole change log: every observation is at or before
          // the current valid_from, so nothing changes
    assert(canon(lake.read(spark, "dim")) == first)
  }
}
