package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame
import graft.lake.{AutoSkip, PartitionedTable}

/** Planner-integrated skipping pins: a PLAIN `AutoSkip.read(...).filter(...)`
  * must (a) return exactly what an unpruned scan returns for every predicate
  * shape, and (b) demonstrably open only sidecar-admitted files — without the
  * query naming any index. Staleness cases pin the superset guarantee: files
  * the sidecars don't cover are never pruned. */
class AutoSkipSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def tempDir(): String = {
    val root = java.nio.file.Files.createTempDirectory("graft_autoskip_").toString
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      import java.nio.file.{Files, Path}
      val p = Path.of(root)
      if (Files.exists(p))
        Files.walk(p).sorted(java.util.Comparator.reverseOrder[Path]())
          .forEach(q => Files.deleteIfExists(q))
    }))
    root
  }

  /** cat in {a, b} partitions; v clustered into 4 stripes of 100 per cat;
    * id high-cardinality, scattered per stripe — the triad's shape. */
  private def build(indexed: Boolean = true): (String, PartitionedTable) = {
    import spark.implicits._
    val root = tempDir()
    val rows = for {
      cat <- Seq("a", "b"); k <- 0 until 4; i <- 0 until 100
    } yield (cat, 1000L * k + i, s"id_${cat}_${1000L * k + i}")
    val src = rows.toDF("cat", "v", "id")
      .repartitionByRange(8, col("cat"), col("v"))
    val table = new PartitionedTable(root, Seq("cat"))
    table.create(src, "t")
    if (indexed) AutoSkip.index(spark, root, "t", Seq("v"), Seq("id"))
    (root, table)
  }

  private def keptOf(df: DataFrame): Seq[String] =
    AutoSkip.fileIndexOf(df).get.lastKept

  private def assertSameRows(pruned: DataFrame, plain: DataFrame): Unit = {
    val a = pruned.collect().map(_.toSeq).sortBy(_.mkString("|"))
    val b = plain.collect().map(_.toSeq).sortBy(_.mkString("|"))
    assert(a.toSeq == b.toSeq)
  }

  test("plain filtered read prunes through partition + zone + bloom, exact result") {
    val (root, table) = build()
    val plain = table.read(spark, "t")
    val total = plain.inputFiles.length
    val pred = (d: DataFrame) => d.filter(
      col("cat") === "a" && col("v") >= 2000L && col("v") <= 2099L &&
        col("id").isin("id_a_2010", "id_a_2020"))
    val pruned = pred(AutoSkip.read(spark, root, "t"))
    assertSameRows(pruned, pred(plain))
    val kept = keptOf(pruned)
    assert(kept.nonEmpty && kept.size < total,
      s"must skip files: kept ${kept.size} of $total")
    // every kept file is in cat=a (partition pruning visibly engaged)
    assert(kept.forall(_.contains("cat=a")), kept.mkString("\n"))
  }

  test("InSet path (many-value IN) still prunes and matches") {
    val (root, table) = build()
    val plain = table.read(spark, "t")
    val ids = (0 until 15).map(i => s"id_b_${3000 + i}") // > inSetConversionThreshold
    val pred = (d: DataFrame) => d.filter(col("id").isin(ids: _*))
    val pruned = pred(AutoSkip.read(spark, root, "t"))
    assertSameRows(pruned, pred(plain))
    assert(keptOf(pruned).size < plain.inputFiles.length)
  }

  test("range-only predicate prunes by zone map alone") {
    val (root, table) = build()
    val plain = table.read(spark, "t")
    val pred = (d: DataFrame) => d.filter(col("v") > 2999L && col("v") < 3050L)
    val pruned = pred(AutoSkip.read(spark, root, "t"))
    assertSameRows(pruned, pred(plain))
    assert(keptOf(pruned).size < plain.inputFiles.length)
  }

  test("OR of two handled predicates keeps the union, never loses rows") {
    val (root, table) = build()
    val plain = table.read(spark, "t")
    val pred = (d: DataFrame) =>
      d.filter(col("v") <= 5L || col("v") >= 3095L)
    val pruned = pred(AutoSkip.read(spark, root, "t"))
    assertSameRows(pruned, pred(plain))
  }

  test("predicate matching nothing opens zero files") {
    val (root, _) = build()
    val pruned = AutoSkip.read(spark, root, "t")
      .filter(col("v") >= 100000L)
    assert(pruned.count() == 0L)
    assert(keptOf(pruned).isEmpty)
  }

  test("unindexed table reads correct and unpruned (sidecars advisory)") {
    val (root, table) = build(indexed = false)
    val plain = table.read(spark, "t")
    val pred = (d: DataFrame) => d.filter(col("v") >= 2000L && col("v") <= 2099L)
    val pruned = pred(AutoSkip.read(spark, root, "t"))
    assertSameRows(pruned, pred(plain))
  }

  test("stale sidecar after append: new files kept unconditionally (superset)") {
    import spark.implicits._
    val (root, table) = build()
    // r13: appends refresh sidecars transparently, so REAL staleness must be
    // constructed — snapshot the pre-append sidecar generation and restore it
    // after the append, exactly what a crashed/lagging refresher leaves
    import java.nio.file.{Files, Path, StandardCopyOption}
    val idx = Path.of(root, "t", "idx")
    val saved = Path.of(root, "idx_saved")
    def copyTree(from: Path, to: Path): Unit =
      Files.walk(from).forEach { p =>
        val q = to.resolve(from.relativize(p))
        if (Files.isDirectory(p)) Files.createDirectories(q)
        else Files.copy(p, q, StandardCopyOption.REPLACE_EXISTING)
      }
    def rmTree(p: Path): Unit = if (Files.exists(p))
      Files.walk(p).sorted(java.util.Comparator.reverseOrder[Path]())
        .forEach(q => Files.deleteIfExists(q))
    copyTree(idx, saved)
    // append rows the saved sidecar generation has never seen, with values
    // that WOULD be pruned if it (wrongly) claimed to cover the new files
    table.append(Seq(("a", 2050L, "id_new_1"), ("b", 2051L, "id_new_2"))
      .toDF("cat", "v", "id"), "t")
    rmTree(idx); copyTree(saved, idx); rmTree(saved)
    val plain = table.read(spark, "t")
    val pred = (d: DataFrame) => d.filter(
      col("v") >= 2000L && col("v") <= 2099L && col("id").isin("id_new_1", "id_a_2010"))
    val pruned = pred(AutoSkip.read(spark, root, "t"))
    assertSameRows(pruned, pred(plain))
    assert(pruned.count() == 2L)
    // refresh folds the appended files in; pruning tightens, result unchanged
    AutoSkip.index(spark, root, "t", Seq("v"), Seq("id"))
    val again = pred(AutoSkip.read(spark, root, "t"))
    assertSameRows(again, pred(plain))
  }

  test("write-transparent maintenance: plain append -> plain read prunes NEW files, no index() call") {
    import spark.implicits._
    val (root, table) = build() // indexed once at build; user code below never calls index()
    table.append(Seq(("a", 9000L, "id_auto_1"), ("a", 9001L, "id_auto_2"),
      ("b", 9002L, "id_auto_3")).toDF("cat", "v", "id"), "t")
    val plain = table.read(spark, "t")
    val total = plain.inputFiles.length
    // range disjoint from every pre-append stripe: only the appended files
    // can match, and the commit-hook refresh must have zone-covered them
    val pred = (d: DataFrame) => d.filter(col("v") >= 9000L)
    val pruned = pred(AutoSkip.read(spark, root, "t"))
    assertSameRows(pruned, pred(plain))
    assert(pruned.count() == 3L)
    val kept = keptOf(pruned)
    assert(kept.nonEmpty && kept.size < total,
      s"appended files must be pruned against without an index() call: " +
        s"kept ${kept.size} of $total")
    // and the OLD stripes stay prunable too (the refresh kept, not replaced,
    // existing coverage); point-lookup through the bloom sidecar still works
    val pointPred = (d: DataFrame) => d.filter(col("id") === "id_auto_2")
    val point = pointPred(AutoSkip.read(spark, root, "t"))
    assertSameRows(point, pointPred(plain))
    assert(keptOf(point).size < total)
    // per-commit refreshes retain a BOUNDED generation history (the commit
    // hook applies CommitRefreshRetain) — steady-state sidecar storage must
    // not grow one snapshot per table commit
    for (i <- 0 until 8)
      table.append(Seq(("a", 9100L + i, s"id_gen_$i")).toDF("cat", "v", "id"), "t")
    val gens = new graft.lake.ParquetDirFormat(s"$root/t/idx").versions("zonemap")
    assert(gens.size <= AutoSkip.CommitRefreshRetain + 1,
      s"sidecar generations must stay bounded, saw ${gens.size}: $gens")
  }

  test("mixed partition specs after evolvePartitionSpec: pruning correct across both") {
    import spark.implicits._
    val (root, table) = build() // partitioned by cat, indexed on v (zone) + id (bloom)
    table.evolvePartitionSpec("t", Seq("cat", "id"))
    // new-spec appends; the commit hook refreshes the sidecars transparently
    table.append(Seq(("a", 9000L, "id_mx_1"), ("b", 9001L, "id_mx_2"))
      .toDF("cat", "v", "id"), "t")
    val plain = table.read(spark, "t")
    val total = plain.inputFiles.length
    // predicate spanning both specs: an old-spec stripe value AND a new file
    val pred = (d: DataFrame) => d.filter(
      col("cat") === "a" && (col("v") === 2010L || col("v") === 9000L))
    val pruned = pred(AutoSkip.read(spark, root, "t"))
    assertSameRows(pruned, pred(plain))
    assert(pruned.count() == 2L)
    val kept = keptOf(pruned)
    assert(kept.nonEmpty && kept.size < total, s"kept ${kept.size} of $total")
    assert(kept.forall(_.contains("cat=a")), kept.mkString("\n"))
    // new-spec partition values participate: an id equality prunes to the
    // new file through its id partition segment AND the bloom sidecar
    val p2 = AutoSkip.read(spark, root, "t").filter(col("id") === "id_mx_2")
    assert(p2.count() == 1L)
    assert(keptOf(p2).size < total)
    // a MIGRATING rewrite (upsert touching an old-spec partition) replaces
    // old-spec files with new-spec files; the commit-hook refresh must cover
    // the migrated files so pruned reads stay exact with no index() call
    table.upsert(Seq(("a", 9100L, "id_mig_1")).toDF("cat", "v", "id"),
      "t", Seq("cat", "id"))
    val plainM = table.read(spark, "t")
    val totalM = plainM.inputFiles.length
    val predM = (d: DataFrame) => d.filter(col("v") === 9100L)
    val prunedM = predM(AutoSkip.read(spark, root, "t"))
    assertSameRows(prunedM, predM(plainM))
    assert(prunedM.count() == 1L)
    assert(keptOf(prunedM).size < totalM,
      s"migrated files must be sidecar-covered: kept ${keptOf(prunedM).size} of $totalM")
  }

  test("null-safe: IsNull finds the default-partition rows, IsNotNull prunes them") {
    import spark.implicits._
    val root = tempDir()
    val table = new PartitionedTable(root, Seq("cat"))
    table.create(Seq((Option("a"), 1L), (Option("a"), 2L), (None, 3L))
      .toDF("cat", "v"), "t")
    val plain = table.read(spark, "t")
    val isNull = AutoSkip.read(spark, root, "t").filter(col("cat").isNull)
    assertSameRows(isNull, plain.filter(col("cat").isNull))
    assert(isNull.count() == 1L)
    val eq = AutoSkip.read(spark, root, "t").filter(col("cat") === "a")
    assertSameRows(eq, plain.filter(col("cat") === "a"))
    assert(keptOf(eq).forall(!_.contains("__HIVE_DEFAULT_PARTITION__")))
  }

  test("projection-only read (no filter) returns everything") {
    val (root, table) = build()
    val pruned = AutoSkip.read(spark, root, "t").select("id")
    assert(pruned.count() == table.read(spark, "t").count())
  }

  test("unhandled predicate shapes keep all candidate rows (conservative)") {
    val (root, table) = build()
    val plain = table.read(spark, "t")
    // endswith is not a bounds-expressible shape; must not prune wrongly
    val pred = (d: DataFrame) => d.filter(col("id").endsWith("_2010") && col("v") >= 2000L)
    val pruned = pred(AutoSkip.read(spark, root, "t"))
    assertSameRows(pruned, pred(plain))
  }

  test("ParquetDirFormat tables get the same transparent pruning (readDir)") {
    import spark.implicits._
    val root = tempDir()
    val lake = new graft.lake.ParquetDirFormat(root)
    val rows = for {
      cat <- Seq("a", "b"); k <- 0 until 4; i <- 0 until 100
    } yield (cat, 1000L * k + i, s"id_${cat}_${1000L * k + i}")
    lake.createPartitioned(rows.toDF("cat", "v", "id")
      .repartitionByRange(8, col("v")), "t", Seq("cat"))
    AutoSkip.indexDir(spark, root, "t", Seq("v"), Seq("id"))
    val plain = lake.read(spark, "t")
    val total = plain.inputFiles.length
    val pred = (d: DataFrame) => d.filter(
      col("cat") === "b" && col("v") >= 2000L && col("v") <= 2099L &&
        col("id") === "id_b_2050")
    val pruned = pred(AutoSkip.readDir(spark, root, "t"))
    // column order differs under partitionBy (partition col moves last in
    // the physical files but the declared schema pins it) — compare values
    val a = pruned.select("cat", "v", "id").collect().map(_.toSeq).toSeq
    val b = pred(plain).select("cat", "v", "id").collect().map(_.toSeq).toSeq
    assert(a == b && a.size == 1)
    val kept = keptOf(pruned)
    assert(kept.nonEmpty && kept.size < total, s"kept ${kept.size} of $total")
    assert(kept.forall(_.contains("cat=b")))
    // overwrite commits a new version; a fresh handle tracks it (stale
    // sidecar entries for dead files are simply never consulted)
    lake.overwrite(rows.filter(_._1 == "a").toDF("cat", "v", "id"), "t")
    val after = AutoSkip.readDir(spark, root, "t").filter(col("v") === 2050L)
    assert(after.count() == lake.read(spark, "t").filter(col("v") === 2050L).count())
  }

  test("superset under churn: racing appenders + compactor + refreshers never lose rows") {
    import spark.implicits._
    // 8 racing workers, mirroring the lake's CAS-commit races: 2 appenders
    // (compose-commits, both must land), 1 compactor (read-modify-write,
    // aborts loudly on conflict and retries next round), 2 sidecar
    // refreshers (serialized in-process; each commits a NEW index
    // generation), 3 readers asserting on every iteration that the PRUNED
    // read over their snapshot equals the UNPRUNED read over the same
    // files — the superset guarantee as an exact-equality check, because
    // the retained filter clears pruning slack.
    val root = tempDir()
    val table = new PartitionedTable(root, Seq("cat"))
    def rowsFor(base: Long, n: Int) = (0 until n).map { j =>
      val v = base + j
      (if (v % 2 == 0) "a" else "b", v, s"id_$v")
    }
    table.create(rowsFor(0L, 200).toDF("cat", "v", "id"), "t")
    AutoSkip.index(spark, root, "t", Seq("v"), Seq("id"))

    val failures = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val appendsLeft = new java.util.concurrent.atomic.AtomicInteger(12)
    val nextBase = new java.util.concurrent.atomic.AtomicLong(1000L)
    def worker(f: () => Unit): Thread = {
      val th = new Thread(() => {
        try while (appendsLeft.get() > 0) f()
        catch { case t: Throwable => failures.add(t); appendsLeft.set(0) }
      })
      th.setDaemon(true); th.start(); th
    }
    val appenders = (1 to 2).map(_ => worker { () =>
      if (appendsLeft.getAndDecrement() > 0)
        table.append(rowsFor(nextBase.getAndAdd(50L), 50).toDF("cat", "v", "id"), "t")
    })
    val compactor = worker { () =>
      try table.compact(spark, "t")
      catch { case _: java.util.ConcurrentModificationException => () } // documented abort
      Thread.sleep(30)
    }
    val refreshers = (1 to 2).map(_ => worker { () =>
      AutoSkip.index(spark, root, "t", Seq("v"), Seq("id"))
    })
    val readers = (1 to 3).map(_ => worker { () =>
      val pruned = AutoSkip.read(spark, root, "t").filter(
        col("v") >= 40L && col("v") <= 160L && col("cat") === "a")
      val got = pruned.collect().map(_.toSeq).sortBy(_.mkString("|")).toSeq
      val snapFiles = AutoSkip.fileIndexOf(pruned).get.inputFiles
      val want = spark.read.schema(pruned.schema).parquet(snapFiles.toIndexedSeq: _*)
        .filter(col("v") >= 40L && col("v") <= 160L && col("cat") === "a")
        .collect().map(_.toSeq).sortBy(_.mkString("|")).toSeq
      assert(got == want, s"pruned read lost rows: got ${got.size}, want ${want.size}")
    })
    (appenders ++ Seq(compactor) ++ refreshers ++ readers).foreach(_.join(120000))
    assert(failures.isEmpty, s"racing worker failed: ${failures.peek()}")
    // convergence: the settled table reads identically pruned and plain
    AutoSkip.index(spark, root, "t", Seq("v"), Seq("id"))
    val pred = (d: DataFrame) => d.filter(col("v") >= 40L && col("v") <= 1100L)
    assertSameRows(pred(AutoSkip.read(spark, root, "t")), pred(table.read(spark, "t")))
    // seed covers v 0..199, the 12 appended blocks cover 1000..1599 exactly
    // once each (every decrement-winning appender lands via rebase-commit)
    assert(pred(table.read(spark, "t")).count() ==
      (40L to 199L).size + (1000L to 1100L).size)
  }
}
