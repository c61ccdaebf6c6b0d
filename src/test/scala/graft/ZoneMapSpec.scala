package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.lake.ZoneMapIndex

/** Zone-map sidecar pins: per-file bounds, range pruning superset guarantee,
  * actual file skipping, typed (non-rounded) int64 bounds, Iceberg-style
  * string upper-bound truncation, null semantics. */
class ZoneMapSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def tempDir(): String = {
    val root = java.nio.file.Files.createTempDirectory("graft_zonemap_").toString
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      import java.nio.file.{Files, Path}
      val p = Path.of(root)
      if (Files.exists(p))
        Files.walk(p).sorted(java.util.Comparator.reverseOrder[Path]())
          .forEach(q => Files.delete(q))
    }))
    root
  }

  /** 4 files with disjoint known ranges: file k holds v in [1000k, 1000k+99]. */
  private def writeRanged(): String = {
    import spark.implicits._
    val dir = tempDir()
    (0 until 4).foreach { k =>
      (0 until 100).map(i => (1000L * k + i, s"name_${1000 * k + i}"))
        .toDF("v", "s").coalesce(1)
        .write.mode("append").parquet(dir)
    }
    dir
  }

  test("build: one row per file, exact typed bounds, null accounting") {
    import spark.implicits._
    val dir = writeRanged()
    val idx = ZoneMapIndex.build(spark.read.parquet(dir), Seq("v", "s"))
    val rows = idx.collect()
    assert(rows.length == 4, "one sidecar row per file")
    rows.foreach { r =>
      val mn = r.getAs[Long]("v__min"); val mx = r.getAs[Long]("v__max")
      assert(mx - mn == 99L && mn % 1000 == 0, s"bounds $mn..$mx not a file range")
      assert(r.getAs[Long]("rows") == 100L && r.getAs[Long]("v__nulls") == 0L)
    }
    // int64 bounds exceeding double precision survive exactly (no rounding)
    val bigDir = tempDir()
    val big = (1L << 53) + 1L
    Seq(big, big + 3L).toDF("v").coalesce(1).write.mode("append").parquet(bigDir)
    val bigIdx = ZoneMapIndex.build(spark.read.parquet(bigDir), Seq("v")).collect()
    assert(bigIdx.head.getAs[Long]("v__min") == big, "2^53+1 must not round")
  }

  test("candidateFiles prunes files and keeps the superset; rangeScan is exact") {
    val dir = writeRanged()
    val table = spark.read.parquet(dir)
    val idx = ZoneMapIndex.build(table, Seq("v", "s"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // a range inside one file's bounds: exactly 1 of 4 files survives
    assert(ZoneMapIndex.candidateFiles(idx, "v", Some(2010L), Some(2020L)).length == 1)
    // straddling two files
    assert(ZoneMapIndex.candidateFiles(idx, "v", Some(1090L), Some(2010L)).length == 2)
    // outside every range: zero files, and the scan reads nothing
    assert(ZoneMapIndex.candidateFiles(idx, "v", Some(9000L), None).isEmpty)
    val none = ZoneMapIndex.rangeScan(spark, idx, "v", Some(9000L), None, table.schema)
    assert(none.count() == 0L)
    // exactness: pruned scan == full-scan filter, row for row
    val pruned = ZoneMapIndex.rangeScan(spark, idx, "v", Some(1090L), Some(2010L), table.schema)
      .collect().map(_.getLong(0)).sorted.toSeq
    val full = table.filter(col("v") >= 1090L && col("v") <= 2010L)
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(pruned == full && full.nonEmpty)
    // open-ended bounds
    assert(ZoneMapIndex.rangeScan(spark, idx, "v", None, Some(5L), table.schema).count() == 6L)
    idx.unpersist()
  }

  test("string bounds: truncation keeps the superset; upper bound increments") {
    // unit pins on the truncation rule
    assert(ZoneMapIndex.truncatedUpper("short", 10).contains("short"))
    assert(ZoneMapIndex.truncatedUpper("abcdef", 3).contains("abd"), "last kept unit +1")
    assert(ZoneMapIndex.truncatedUpper("ab\uFFFFzz", 3).contains("ac"),
      "skip unincrementable tail unit")
    assert(ZoneMapIndex.truncatedUpper("\uFFFF\uFFFF\uFFFFx", 3).isEmpty,
      "all-FFFF prefix has no short upper bound")
    import spark.implicits._
    val dir = tempDir()
    Seq("prefix_aaaaaaaaaaaaaaaaaa", "prefix_zzzzzzzzzzzzzzzzzz")
      .toDF("s").coalesce(1).write.mode("append").parquet(dir)
    val table = spark.read.parquet(dir)
    val idx = ZoneMapIndex.build(table, Seq("s"), maxStrLen = 8)
    val r = idx.collect().head
    val mn = r.getAs[String]("s__min"); val mx = r.getAs[String]("s__max")
    assert(mn == "prefix_a" && mx == "prefix_{", s"got bounds '$mn'..'$mx'")
    // every real value still falls inside the truncated bounds
    assert(mn <= "prefix_aaaaaaaaaaaaaaaaaa" && mx >= "prefix_zzzzzzzzzzzzzzzzzz")
    // and a range probe for a real value keeps the file
    assert(ZoneMapIndex.candidateFiles(idx, "s",
      Some("prefix_zzzz"), Some("prefix_zzzzz")).length == 1)
  }

  test("null semantics: all-null files prune, mixed files survive") {
    import spark.implicits._
    val dir = tempDir()
    Seq[Option[Long]](None, None).toDF("v").coalesce(1).write.mode("append").parquet(dir)
    Seq[Option[Long]](Some(7L), None).toDF("v").coalesce(1).write.mode("append").parquet(dir)
    val table = spark.read.parquet(dir)
    val idx = ZoneMapIndex.build(table, Seq("v"))
    // range probes never match NULL, so the all-null file is skippable
    assert(ZoneMapIndex.candidateFiles(idx, "v", Some(0L), Some(100L)).length == 1)
    assert(ZoneMapIndex.candidateFiles(idx, "v", None, None).length == 1)
    val got = ZoneMapIndex.rangeScan(spark, idx, "v", Some(0L), Some(100L), table.schema)
      .collect().map(_.getLong(0)).toSeq
    assert(got == Seq(7L))
    // non-orderable columns refuse loudly
    val m = Seq((1L, Map("a" -> 1))).toDF("v", "m")
    intercept[IllegalArgumentException](ZoneMapIndex.build(m, Seq("m")))
  }

  test("refresh: appended files profile incrementally, rewritten files drop") {
    import spark.implicits._
    val dir = tempDir()
    (0 until 2).foreach { k =>
      (0 until 50).map(i => 1000L * k + i).toDF("v").coalesce(1)
        .write.mode("append").parquet(dir)
    }
    val idx0 = ZoneMapIndex.build(spark.read.parquet(dir), Seq("v"))
      .localCheckpoint(true)
    assert(idx0.count() == 2)
    // append two more files: refresh profiles ONLY them and keeps the rest
    (2 until 4).foreach { k =>
      (0 until 50).map(i => 1000L * k + i).toDF("v").coalesce(1)
        .write.mode("append").parquet(dir)
    }
    val idx1 = ZoneMapIndex.refresh(spark.read.parquet(dir), idx0, Seq("v"))
      .localCheckpoint(true)
    assert(idx1.count() == 4)
    assert(ZoneMapIndex.candidateFiles(idx1, "v", Some(3000L), Some(3010L)).length == 1)
    // the two original sidecar rows survive byte-identical
    val keep0 = idx0.collect().map(_.toSeq.toString).toSet
    val keep1 = idx1.collect().map(_.toSeq.toString).toSet
    assert(keep0.subsetOf(keep1), "existing rows must pass through untouched")
    // compaction: rewrite the whole table into one file — stale rows drop
    val dir2 = tempDir()
    spark.read.parquet(dir).coalesce(1).write.mode("append").parquet(dir2)
    val idx2 = ZoneMapIndex.refresh(spark.read.parquet(dir2), idx1, Seq("v"))
    val r = idx2.collect()
    assert(r.length == 1 && r.head.getAs[Long]("rows") == 200L,
      "compacted layout leaves one fresh row, no stale files")
    // no-op refresh returns the index unchanged
    assert(ZoneMapIndex.refresh(spark.read.parquet(dir2), idx2, Seq("v"))
      .collect().map(_.toSeq.toString).toSet == r.map(_.toSeq.toString).toSet)
  }

  test("keyBoundsPruneScan: bounded build cohort opens only overlapping files, join-exact") {
    import spark.implicits._
    val dir = writeRanged() // 4 files, file k holds v in [1000k, 1000k+99]
    val table = spark.read.parquet(dir)
    val idx = ZoneMapIndex.build(table, Seq("v"))
      .localCheckpoint(true)
    // build cohort spans [2010, 2040] — only file 2 can overlap
    val build = Seq(2010L, 2025L, 2040L, 2025L).toDF("k")
    val scanned = ZoneMapIndex.keyBoundsPruneScan(idx, "v", build, "k", table.schema)
    assert(scanned.inputFiles.length == 1, "3 of 4 files must be skipped")
    // inner-join equivalence: prune+join == plain join, row for row
    val got = scanned.join(build.distinct(), col("v") === col("k"))
      .collect().map(_.getLong(0)).sorted.toSeq
    val want = table.join(build.distinct(), col("v") === col("k"))
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(got == want && want == Seq(2010L, 2025L, 2040L))
    // straddling cohort keeps the superset (2 files), never loses a match
    val wide = Seq(1090L, 2010L).toDF("k")
    val scannedWide = ZoneMapIndex.keyBoundsPruneScan(idx, "v", wide, "k", table.schema)
    assert(scannedWide.inputFiles.length == 2)
    assert(scannedWide.join(wide, col("v") === col("k")).count() == 2L)
    // empty build side reads nothing; all-null build side likewise
    assert(ZoneMapIndex.keyBoundsPruneScan(idx, "v",
      Seq.empty[Long].toDF("k"), "k", table.schema).count() == 0L)
    assert(ZoneMapIndex.keyBoundsPruneScan(idx, "v",
      Seq[Option[Long]](None, None).toDF("k"), "k", table.schema).count() == 0L)
  }
}
