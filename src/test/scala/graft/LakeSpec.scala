package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.lake.ParquetDirFormat

class LakeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def fmt() = new ParquetDirFormat(
    Files.createTempDirectory("graft-lake").toString)

  test("create / read / overwrite") {
    import spark.implicits._
    val t = fmt()
    t.create(Seq((1L, "a"), (2L, "b")).toDF("id", "v"), "t1")
    assert(t.read(spark, "t1").count() == 2)
    t.overwrite(Seq((9L, "z")).toDF("id", "v"), "t1")
    assert(t.read(spark, "t1").collect().map(_.getLong(0)).toSeq == Seq(9L))
  }

  test("append with additive schema evolution") {
    import spark.implicits._
    val t = fmt()
    t.create(Seq((1L, "a")).toDF("id", "v"), "t2")
    // new column arrives: old rows must read NULL
    t.append(Seq((2L, "b", 3.5)).toDF("id", "v", "score"), "t2")
    val out = t.read(spark, "t2").orderBy("id").collect()
    assert(out.length == 2)
    assert(out(0).isNullAt(out(0).fieldIndex("score")))
    assert(out(1).getDouble(out(1).fieldIndex("score")) == 3.5)
  }

  test("append aligns mismatched types with try_cast") {
    import spark.implicits._
    val t = fmt()
    t.create(Seq((1L, 10L)).toDF("id", "n"), "t3")
    t.append(Seq(("2", "20"), ("3", "oops")).toDF("id", "n"), "t3")
    val out = t.read(spark, "t3").orderBy("id").collect()
    assert(out.map(r => Option(r.get(r.fieldIndex("n")))).toSeq ==
      Seq(Some(10L), Some(20L), None))
  }

  test("upsert replaces matching keys and inserts new ones") {
    import spark.implicits._
    val t = fmt()
    t.create(Seq((1L, "old1"), (2L, "old2")).toDF("id", "v"), "t4")
    t.upsert(Seq((2L, "new2"), (3L, "new3")).toDF("id", "v"), "t4", Seq("id"))
    val out = t.read(spark, "t4").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(1L -> "old1", 2L -> "new2", 3L -> "new3"))
  }

  test("compaction, snapshot expiry and stats") {
    import spark.implicits._
    val t = fmt()
    t.create((1 to 100).map(i => (i.toLong, s"v$i")).toDF("id", "v"), "t6")
    // several small appends -> many files across versions
    (1 to 3).foreach(b =>
      t.append(Seq((1000L + b, "x")).toDF("id", "v").repartition(4), "t6"))
    val before = t.stats(spark, "t6")
    assert(before("rows") == 103)
    t.compact(spark, "t6", rowsPerFile = 1000)
    val after = t.stats(spark, "t6")
    assert(after("rows") == 103)
    assert(after("data_files") == 1)
    assert(after("data_files") <= before("data_files"))
    val expired = t.expireSnapshots("t6")
    assert(expired.nonEmpty)
    assert(t.versions("t6").size == 1)
    assert(t.read(spark, "t6").count() == 103)
  }

  test("partitioned create prunes directories on read") {
    import spark.implicits._
    val t = fmt()
    val df = (1 to 200).map(i => (i.toLong, s"2024-0${i % 3 + 1}", i * 1.0))
      .toDF("id", "month", "v")
    t.createPartitioned(df, "t7", Seq("month"))
    t.append(Seq((999L, "2024-02", 9.0)).toDF("id", "month", "v"), "t7")
    assert(t.read(spark, "t7").count() == 201)
    // the filtered plan must scan only the matching partition directory
    val filtered = t.read(spark, "t7").filter(col("month") === "2024-02")
    val scan = filtered.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters: [isnotnull(month"), scan.take(800))
    assert(filtered.count() > 0)
  }

  test("commits are versioned: failed reader never sees partial state") {
    import spark.implicits._
    val t = fmt()
    t.create(Seq((1L, "a")).toDF("id", "v"), "t5")
    val before = t.read(spark, "t5")
    t.overwrite(Seq((2L, "b")).toDF("id", "v"), "t5")
    // the old snapshot directory still resolves (immutable versions)
    assert(before.count() == 1)
    assert(t.read(spark, "t5").head().getLong(0) == 2L)
  }
}
