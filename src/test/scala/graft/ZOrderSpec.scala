package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.lake.ZOrder

/** What the gate can't pin: the LAYOUT payoff. The gate proves the z-ordered
  * rewrite is content-preserving and the z-value arithmetic portable; this
  * spec proves the layout actually buys multi-column file pruning — the whole
  * reason to z-order 100 TB instead of sorting it.
  */
class ZOrderSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def spansIntersecting(spans: Array[(Long, Long)], lo: Long, hi: Long): Int =
    spans.count { case (mn, mx) => mx >= lo && mn <= hi }

  test("z-ordered layout prunes on BOTH columns; single-sort prunes on one") {
    import spark.implicits._
    // two independent uniform columns: the adversarial case for single-column
    // sorting (sorting by x makes every file span all of y)
    val n = 40000L
    val df = spark.range(n).select(
      col("id"),
      (col("id") * 48271L % 65521L).as("x"),
      (col("id") * 69621L % 65497L).as("y"))
    val root = java.nio.file.Files.createTempDirectory("graft_zorder_spec_").toString
    try {
      df.repartitionByRange(16, col("x")).sortWithinPartitions("x")
        .write.parquet(s"$root/by_x")
      ZOrder.writeZOrdered(df, s"$root/z", Seq("x", "y"), nFiles = 16)

      def spans(path: String, c: String): Array[(Long, Long)] =
        ZOrder.fileSpans(spark, path, Seq("x", "y"))
          .select(col(s"min_$c"), col(s"max_$c"))
          .collect().map(r => (r.getLong(0), r.getLong(1)))

      // a y-selective box: ~6% of the y range
      val (yLo, yHi) = (10000L, 14000L)
      val plainY = spansIntersecting(spans(s"$root/by_x", "y"), yLo, yHi)
      val zY     = spansIntersecting(spans(s"$root/z", "y"), yLo, yHi)
      info(s"files to read for y-box: by_x=$plainY of 16, zorder=$zY of 16")
      assert(plainY == 16, "x-sorted layout cannot prune on y")
      assert(zY <= 8, s"z-order should prune most files on y, read $zY")

      // x stays pruned too (worse than a perfect x-sort, far better than
      // none). The bound carries one file of slack: the z-file boundaries
      // come from RangePartitioner's SAMPLED split points, and at 16-file
      // granularity the sampling can shift a boundary across the box edge
      // depending on suite ordering (observed 8 in isolation, 9 in one
      // full-suite run) — the property pinned is meaningful x-pruning, not
      // an exact file count
      val (xLo, xHi) = (20000L, 24000L)
      val zX = spansIntersecting(spans(s"$root/z", "x"), xLo, xHi)
      info(s"files to read for x-box: zorder=$zX of 16")
      assert(zX <= 10, s"z-order should still prune on x, read $zX")
    } finally {
      import java.nio.file.{Files, Path}
      import java.util.Comparator
      Files.walk(Path.of(root)).sorted(Comparator.reverseOrder[Path]())
        .forEach(f => Files.deleteIfExists(f))
    }
  }

  test("z-ordered rewrite preserves content exactly") {
    import spark.implicits._
    val df = spark.range(5000).select(col("id"),
      (col("id") % 97L).as("x"), (col("id") % 89L).as("y"))
    val root = java.nio.file.Files.createTempDirectory("graft_zorder_rt_").toString
    try {
      ZOrder.writeZOrdered(df, s"$root/z", Seq("x", "y"), nFiles = 8)
      val back = spark.read.parquet(s"$root/z")
      assert(back.count() == 5000)
      assert(back.select("id", "x", "y").except(df).isEmpty &&
        df.except(back.select("id", "x", "y")).isEmpty)
      // zv is a pure function of (x, y): equal inputs, equal z-values
      val distinctPerKey = back.groupBy("x", "y")
        .agg(countDistinct(col("zv")).as("nzv"))
        .agg(max(col("nzv"))).head().getLong(0)
      assert(distinctPerKey == 1L)
    } finally {
      import java.nio.file.{Files, Path}
      import java.util.Comparator
      Files.walk(Path.of(root)).sorted(Comparator.reverseOrder[Path]())
        .forEach(f => Files.deleteIfExists(f))
    }
  }

  test("partitioned OPTIMIZE ZORDER: per-partition files prune on both z-columns") {
    import spark.implicits._
    val t = new graft.lake.PartitionedTable(
      java.nio.file.Files.createTempDirectory("graft-zopt").toString, Seq("day"))
    val n = 40000L
    def slice(lo: Long, hi: Long) = spark.range(lo, hi).select(
      col("id"),
      concat(lit("d"), col("id") % 2).as("day"),
      (col("id") * 48271L % 65521L).as("x"),
      (col("id") * 69621L % 65497L).as("y"))
    // three appends -> multi-directory partitions, the compaction trigger
    t.create(slice(0, n / 2), "zc")
    t.append(slice(n / 2, 3 * n / 4), "zc")
    t.append(slice(3 * n / 4, n), "zc")
    val rowsBefore = t.read(spark, "zc").count()
    t.compactZOrdered(spark, "zc", Seq("x", "y"), nTasks = 16)
    // content preserved; every partition now single-directory
    assert(t.read(spark, "zc").count() == rowsBefore)
    assert(t.entries("zc").forall(_._2.length == 1))
    // within ONE partition, footer spans prune on BOTH columns
    val dirs = t.partitionDirs("zc", "__p_day=d0")
    val spans = ZOrder.fileSpans(spark, dirs.head, Seq("x", "y"))
      .select("min_y", "max_y").collect().map(r => (r.getLong(0), r.getLong(1)))
    val nFiles = spans.length
    assert(nFiles >= 4, s"expected several files per partition, got $nFiles")
    val hit = spansIntersecting(spans, 10000L, 14000L)
    info(s"y-box reads $hit of $nFiles files in partition d0")
    assert(hit <= (nFiles + 1) / 2, s"z-order should prune on y: $hit/$nFiles")
  }

  test("compaction preserves a user column named zv; withZValue refuses to clobber") {
    import spark.implicits._
    val t = new graft.lake.PartitionedTable(
      java.nio.file.Files.createTempDirectory("graft-zvcol").toString, Seq("day"))
    // a table that legitimately carries 'zv' — e.g. one produced by a
    // z-ordered writer that kept its sort key
    val df = spark.range(0, 2000).select(
      col("id"), concat(lit("d"), col("id") % 2).as("day"),
      (col("id") * 48271L % 65521L).as("x"),
      (col("id") * 7L).as("zv"))
    t.create(df, "zt")
    t.append(df.withColumn("id", col("id") + 2000L), "zt")
    t.compactZOrdered(spark, "zt", Seq("x"), nTasks = 4)
    val after = t.read(spark, "zt")
    assert(after.columns.contains("zv"), "user zv column must survive compaction")
    assert(after.select(sum("zv")).collect()(0).getLong(0) ==
      2L * df.select(sum("zv")).collect()(0).getLong(0))
    // direct withZValue on a zv-carrying frame fails loudly instead of
    // silently replacing the user's data
    assertThrows[IllegalArgumentException] { ZOrder.withZValue(df, Seq("x")) }
  }
}
