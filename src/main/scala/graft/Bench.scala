package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every SparkEntry query against SPARK_GRAFT_SF_DIR and
  * prints one JSON line. Results are forced through the `noop` data source —
  * a plain count() would let Catalyst prune away the computed columns and
  * time only the row cardinality path. */
object Bench {

  /** Which file this run's JSON line should land in, given the standing
    * bench_last.json content (None when absent). The durable record only
    * advances when the run can improve it:
    *  - a different scale factor than the record → `bench_smoke.json` (a
    *    sf0.001 smoke must not clobber the sf0.1 chain);
    *  - a STRICTLY WORSE rerun of the SAME gate set (materially higher steal
    *    — beyond a 200-jiffy noise floor, so an honest quiet-window rerun of
    *    a genuine regression still advances the record — AND higher total) →
    *    `bench_candidate.json`: it adds nothing over the record (the r14
    *    4x-only threshold let 2-3x-dirtier, slower reruns clobber the record
    *    twice; promote a candidate by hand if you disagree);
    *  - a contended window over a 4x-quieter record → `bench_contended.json`;
    *  - otherwise → `bench_last.json`. A changed gate set always overwrites:
    *    the record must track the CURRENT gate set, so a total comparison
    *    against the old set is meaningless. */
  def recordTarget(prev: Option[String], sfDir: String, total: Double,
                   stealTotal: Long, contended: Boolean,
                   gateNames: Set[String]): String = {
    val prevSteal = prev.flatMap(
      "\"steal_jiffies\":(\\d+)".r.findFirstMatchIn(_).map(_.group(1).toLong))
    val prevSf = prev.flatMap(
      "\"sf\":\"([^\"]+)\"".r.findFirstMatchIn(_).map(_.group(1)))
    // anchored to the total line's own prefix: a bare "value": match would
    // bind to whichever metric happens to serialize first
    val prevTotal = prev.flatMap(
      "\\{\"metric\":\"total\",\"value\":([0-9.Ee+-]+)".r
        .findFirstMatchIn(_).map(_.group(1).toDouble))
    val prevQueryKeys = prev.flatMap(
      "\"queries\":\\{([^}]*)\\}".r.findFirstMatchIn(_).map(m =>
        "\"([^\"]+)\":".r.findAllMatchIn(m.group(1)).map(_.group(1)).toSet))
    val sameGates = prevQueryKeys.forall(_ == gateNames)
    if (prevSf.exists(_ != sfDir)) "bench_smoke.json"
    else if (!sameGates) "bench_last.json" // changed gate set ALWAYS overwrites
    else if (prevSteal.exists(_ + 200L < stealTotal) &&
        prevTotal.exists(_ < total)) "bench_candidate.json"
    else if (contended && prevSteal.exists(p => p < stealTotal / 4))
      "bench_contended.json"
    else "bench_last.json"
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // 60+ queries x several codegen stages each blows through the default
      // 100-entry janino cache, so warmup runs stop paying off (iterative
      // queries recompile every round, every run)
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.core.Sessions.instrument(spark)

    // Host steal-time accounting: this host has a noisy co-tenant, and a
    // stolen window can inflate a wall-clock timing 5-10x. Jiffies of steal
    // around each query make a polluted measurement VISIBLE in the output
    // instead of masquerading as a regression.
    def stealJiffies(): Long =
      try {
        val src = scala.io.Source.fromFile("/proc/stat")
        try src.getLines().find(_.startsWith("cpu "))
          .map(_.trim.split("\\s+").drop(1).lift(7).map(_.toLong).getOrElse(0L))
          .getOrElse(0L)
        finally src.close()
      } catch { case _: Exception => 0L }

    // CPU calibration probe: a fixed single-threaded integer-hash workload
    // timed at window start and end. Steal jiffies miss a whole contention
    // class — the r12 windows drifted a UNIFORM ~1.2x per query at <500
    // accounted steal (frequency scaling / same-host sharing) — so the
    // record carries an engine-independent speed constant two windows can
    // be normalized by before their totals are compared.
    def calibrate(): Double = {
      var acc = 0x9e3779b97f4a7c15L
      val t0 = System.nanoTime()
      var i = 0L
      while (i < 200000000L) {
        acc ^= i; acc *= 0xff51afd7ed558ccdL; acc ^= (acc >>> 33)
        i += 1
      }
      val dt = (System.nanoTime() - t0) / 1e9
      if (acc == 42L) System.err.println("never") // keep the loop observable
      dt
    }

    // Per-query JVM diagnostics (stderr, driver ignores it): GC time delta,
    // heap used, and JIT code-cache occupancy. Motive: the r12 driver window
    // showed 5-12x swings on the decimal-heavy gold queries at LOW steal and
    // flat calibration — same binary, so the suspect is JVM state (code-cache
    // flushing de-JITting the widest codegen, or GC pressure), and the only
    // way to name it is to record these alongside every timing.
    def gcMillis(): Long = {
      import scala.jdk.CollectionConverters._
      java.lang.management.ManagementFactory.getGarbageCollectorMXBeans.asScala
        .map(_.getCollectionTime).filter(_ > 0).sum
    }
    def jvmStats(): String = {
      import scala.jdk.CollectionConverters._
      val pools = java.lang.management.ManagementFactory.getMemoryPoolMXBeans.asScala
      val code = pools.filter(_.getName.startsWith("CodeHeap"))
        .map(_.getUsage.getUsed).sum >> 20
      val heap = java.lang.management.ManagementFactory.getMemoryMXBean
        .getHeapMemoryUsage.getUsed >> 20
      s"heap ${heap}M code ${code}M"
    }

    // SPARK_GRAFT_ONLY=q1,q2 restricts the run to named queries — the
    // iterate-on-one-plan loop. Filtered runs never overwrite bench_last.json
    // (the durable full-surface record). A misspelled name is an ERROR, not a
    // silently empty run (r7 ADVICE).
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    only.foreach { names =>
      val unknown = names -- SparkEntry.queries.keySet
      if (unknown.nonEmpty) {
        System.err.println("[bench] unknown SPARK_GRAFT_ONLY queries: " +
          unknown.toSeq.sorted.mkString(", ") + "\n[bench] known: " +
          SparkEntry.queries.keySet.toSeq.sorted.mkString(", "))
        spark.stop()
        sys.exit(2)
      }
    }
    // A full-bench window whose accounted steal exceeds this is CONTENDED:
    // its per-query numbers are noise-confounded (r6/r7 records at steal
    // 2,341-18,233 jiffies produced phantom 3-20x "regressions"); quiet
    // windows on this host land well under it.
    val ContendedJiffies = 500L
    // Per-query warm run (codegen + JIT for that plan shape) outside the
    // timed region, then timed steady-state runs — each run rebuilds the
    // whole DataFrame so no cached results carry over, only compiled code.
    def measure(): (Seq[(String, (Double, Double, Double))], Long) = {
    val stealStart = stealJiffies()
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .map { case (name, fn) =>
      def once(): Option[Double] = {
        val t0 = System.nanoTime()
        val r =
          try { fn(spark, sfDir).write.format("noop").mode("overwrite").save()
                Some((System.nanoTime() - t0) / 1e9) }
          catch { case e: Throwable =>
            System.err.println(s"[bench] $name failed: ${e.getMessage}"); None }
        // every run persists its own intermediates; drop them OUTSIDE the
        // timer (blocking, so no async block-drop bleeds into the next run)
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
        r
      }
      val s0 = stealJiffies()
      once() // warmup
      // gc delta EXCLUDES the warmup (first materialization is the
      // allocation-heaviest part) so the printed number describes the same
      // window the timings are judged from
      val gc0 = gcMillis()
      var runs = Seq(once(), once(), once()).flatten.sorted
      // Spread guard: a stolen/contended window inflates a single run 5-10x,
      // and with only three samples the median can still land on a polluted
      // one. When the fastest and slowest of the samples we'd judge from
      // disagree by >3x, buy extra runs (bounded) — contention only ADDS slow
      // samples, it never fabricates fast ones, so the low end of the
      // distribution is the trustworthy end.
      var retries = 0
      while (runs.nonEmpty && runs.take(3).last > runs.head * 3.0 && retries < 3) {
        retries += 1
        System.err.println(f"[bench] $name: spread ${runs.head}%.2f..${runs.take(3).last}%.2f s, retry $retries")
        runs = (runs ++ once()).sorted
      }
      val stolen = stealJiffies() - s0
      if (stolen > 0) System.err.println(s"[bench] $name: $stolen steal jiffies during runs")
      System.err.println(f"[bench] $name: gc ${gcMillis() - gc0} ms, ${jvmStats()}, " +
        f"runs ${runs.map(r => f"$r%.2f").mkString(",")}")
      // Judge from the fastest three ONLY when the host accounted ENOUGH
      // steal during this query's window to plausibly explain the excess —
      // discarding slow samples is justified exactly when the slowness is
      // provably external. On this chronically noisy host steal is rarely
      // zero, so "any steal at all" would discard genuine slow runs (GC
      // pressure, AQE plan flip, bimodal cache effects) and mask
      // regressions; instead require the accounted steal CPU-time (jiffies
      // are 10 ms of one CPU) to cover at least a quarter of the dropped
      // samples' wall-clock excess over the fastest run.
      val judged =
        if (runs.isEmpty) runs
        else {
          val dropped = runs.drop(3)
          val excess = dropped.map(_ - runs.head).sum
          if (dropped.nonEmpty && stolen * 0.01 >= 0.25 * excess) {
            System.err.println(
              f"[bench] $name: dropping ${dropped.length} slow sample(s) " +
                f"${dropped.map(d => f"$d%.2f").mkString(", ")} s " +
                f"($stolen steal jiffies covers ${stolen * 0.01}%.2f s " +
                f"of $excess%.2f s excess)")
            runs.take(3)
          } else runs
        }
      // median (lower middle on even counts — length/2 would pick the max of
      // two and bias partially-failing queries upward); failures report -1,
      // never a misleading near-zero timing
      val median = if (judged.isEmpty) -1.0 else judged((judged.length - 1) / 2)
      val minRun = if (judged.isEmpty) -1.0 else judged.head
      val spread = if (judged.isEmpty) -1.0 else judged.last - judged.head
      name -> (median, minRun, spread)
    }
    (results, stealJiffies() - stealStart)
    }

    // Bounded whole-run retry: when the window's accounted steal marks it
    // contended, the per-query medians are not worth recording — try again
    // (the second pass is also fully warm) and keep the quieter attempt.
    val maxAttempts = sys.env.get("SPARK_GRAFT_STEAL_RETRIES")
      .flatMap(s => scala.util.Try(s.toInt).toOption).getOrElse(1) + 1
    val calStart = calibrate()
    var (results, stealTotal) = measure()
    var attempt = 1
    while (stealTotal > ContendedJiffies && attempt < maxAttempts) {
      attempt += 1
      System.err.println(s"[bench] window contended ($stealTotal steal jiffies > " +
        s"$ContendedJiffies), retry $attempt/$maxAttempts")
      val (r2, s2) = measure()
      if (s2 < stealTotal) { results = r2; stealTotal = s2 }
    }
    val contended = stealTotal > ContendedJiffies
    val calEnd = calibrate()
    def jmap(f: ((Double, Double, Double)) => Double): String =
      results.map { case (k, v) => "\"" + k + "\":" + f(v) }.mkString("{", ",", "}")
    val total = results.map(_._2._1).sum
    val line =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":${jmap(_._1)},""" +
        s""""queries_min":${jmap(_._2)},"queries_spread":${jmap(_._3)},""" +
        s""""steal_jiffies":$stealTotal,"contended":$contended,""" +
        f""""cal_start_sec":$calStart%.3f,"cal_end_sec":$calEnd%.3f,"sf":"$sfDir"}"""
    println(line)
    // the driver captures stdout (and can truncate the tail); the in-repo copy
    // is the durable record the next round's analysis reads. A CONTENDED run
    // must not clobber a materially quieter committed record (the r7 driver
    // bench at steal 18,233 overwrote the quiet 2,623 one) — it lands in
    // bench_contended.json instead.
    if (only.isEmpty) {
      val path = java.nio.file.Paths.get("bench_last.json")
      val prev: Option[String] =
        if (java.nio.file.Files.exists(path))
          Some(new String(java.nio.file.Files.readAllBytes(path), "UTF-8"))
        else None
      val targetName = recordTarget(prev, sfDir, total, stealTotal, contended,
        results.map(_._1).toSet)
      if (targetName != "bench_last.json")
        System.err.println(s"[bench] not overwriting bench_last.json " +
          s"(see Bench.recordTarget); writing $targetName")
      val target = java.nio.file.Paths.get(targetName)
      try java.nio.file.Files.write(target, (line + "\n").getBytes("UTF-8"))
      catch { case e: Exception => System.err.println(s"[bench] ${target.getFileName} write failed: $e") }
    }
    spark.stop()
  }
}
