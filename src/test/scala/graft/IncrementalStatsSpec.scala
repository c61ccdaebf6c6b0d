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

  test("histogram quantiles: sharding-invariant merge, bounded error, edge clamping") {
    import spark.implicits._
    val qs = Seq(0.25, 0.5, 0.75, 0.95)
    // deterministic non-uniform values in [0, 100), plus out-of-domain
    // outliers that must clamp into the edge bins instead of crashing
    val vals = (0 until 2000).map(i => (i.toLong, ((i * i * 31) % 1000) / 10.0)) ++
      Seq((9001L, -50.0), (9002L, 640.0))
    val df = vals.toDF("id", "value")
    def sketch(shards: Long) = Profiling.mergeHistogramQuantiles(
      Profiling.histogramPartials(
        df.withColumn("shard", pmod(col("id"), lit(shards))),
        "shard", "value", lo = 0.0, width = 4.0, nBins = 32),
      qs, lo = 0.0, width = 4.0).collect()(0)
    val a = sketch(4L)
    val b = sketch(17L)  // different sharding must merge to identical bits
    assert(a == b, s"merge must be sharding-invariant:\n$a\n$b")
    assert(a.getLong(0) == 2002L)
    // each estimate within one bin width of the true quantile (clamped vals
    // distort only the extreme bins; p95 of the in-domain data is ~90)
    val sorted = vals.map(_._2).sorted
    qs.zipWithIndex.foreach { case (q, i) =>
      val exact = sorted(math.ceil(q * sorted.size).toInt - 1)
      val est = a.getDouble(i + 1)
      assert(math.abs(est - exact) <= 4.0, s"p$q: est $est vs exact $exact")
    }
    // lake round trip: two ingest batches append their histogram partials
    // independently; quantiles from the lake equal the direct sketch bitwise
    // — the no-rescan property for quantiles, not just moments
    val lake = new ParquetDirFormat(
      Files.createTempDirectory("graft-hist").toString)
    def partial(d: org.apache.spark.sql.DataFrame) = Profiling.histogramPartials(
      d.withColumn("shard", pmod(col("id"), lit(4L))),
      "shard", "value", lo = 0.0, width = 4.0, nBins = 32)
    lake.create(partial(df.filter(col("id") % 2 === 0)), "hist")
    lake.append(partial(df.filter(col("id") % 2 === 1)), "hist")
    val fromLake = Profiling.mergeHistogramQuantiles(
      lake.read(spark, "hist"), qs, lo = 0.0, width = 4.0).collect()(0)
    assert(fromLake == a, s"lake-merged quantiles differ:\n$fromLake\n$a")
  }

  test("HLL distinct: register-MAX merge invariance, bounded error, lake append") {
    import spark.implicits._
    // 5000 distinct keys, each duplicated 1-4 times — the estimate must see
    // through the duplication entirely (registers ignore multiplicity)
    val df = (0 until 5000).flatMap(k => Seq.fill(1 + k % 4)(k))
      .zipWithIndex.map { case (k, i) => (i.toLong, s"key$k") }
      .toDF("id", "k")
    def sketch(shards: Long) = Profiling.mergeHllDistinct(
      Profiling.hllPartials(
        df.withColumn("shard", pmod(col("id"), lit(shards))), "shard", "k"))
      .collect()(0)
    val a = sketch(4L)
    assert(a == sketch(23L), "estimate must be merge-grouping invariant")
    val est = a.getDouble(1)
    assert(math.abs(est - 5000.0) / 5000.0 < 0.35,
      s"portable-hash raw HLL should land within 35% of 5000, got $est")
    // two batches append partials to the lake; merged estimate is identical
    val lake = new ParquetDirFormat(
      Files.createTempDirectory("graft-hll").toString)
    def partial(d: org.apache.spark.sql.DataFrame) = Profiling.hllPartials(
      d.withColumn("shard", pmod(col("id"), lit(4L))), "shard", "k")
    lake.create(partial(df.filter(col("id") % 2 === 0)), "hll")
    lake.append(partial(df.filter(col("id") % 2 === 1)), "hll")
    assert(Profiling.mergeHllDistinct(lake.read(spark, "hll")).collect()(0) == a)
  }

  test("HLL overlap: union monotone over both cohorts, intersection in band") {
    import spark.implicits._
    // A = users 0..4999, B = 2500..7499: true intersection 2500, union 7500
    val rows = ((0 until 5000).map(k => ("a", k)) ++
      (2500 until 7500).map(k => ("b", k)))
      .zipWithIndex.map { case ((t, k), i) => (i.toLong, t, s"u$k") }
      .toDF("id", "coh", "u")
    def partials(t: String) = Profiling.hllPartials(
      rows.filter(col("coh") === t).withColumn("shard", pmod(col("id"), lit(4L))),
      "shard", "u")
    val r = Profiling.hllOverlap(partials("a"), partials("b")).collect()(0)
    val (a, b, u, ix) = (r.getDouble(0), r.getDouble(1), r.getDouble(2), r.getDouble(3))
    // register-MAX union is MONOTONE: deterministically >= both inputs
    assert(u >= math.max(a, b), s"union $u must dominate $a / $b")
    assert(ix === a + b - u)
    // inclusion-exclusion inherits all three sketches' portable-hash-grade
    // bias (singles overshoot ~50% on this corpus while the union stays
    // near truth, so their difference amplifies): the honest contract at
    // this hash grade is order-of-magnitude, factor-3 band around 2500 —
    // production deployments swap in xxhash64 exactly as the hllPartials
    // scaladoc describes, tightening this to sketch-grade
    assert(ix > 2500.0 / 3 && ix < 2500.0 * 3,
      s"intersection $ix outside the factor-3 band for true 2500")
  }

  test("CMS frequencies: counter-SUM merge invariance, overcount-only, bounded") {
    import spark.implicits._
    // zipfian-ish: term t_k occurs 200/k times (k in 1..50) plus 2000 noise
    // singletons that supply the colliding mass the min must see through
    val occurrences = (1 to 50).flatMap(k => Seq.fill(200 / k)(s"t$k")) ++
      (0 until 2000).map(i => s"noise$i")
    val df = occurrences.zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("id", "term")
    def merged(shards: Long) = Profiling.mergeCms(
      Profiling.cmsPartials(
        df.withColumn("shard", pmod(col("id"), lit(shards))), "shard", "term"))
    // merge-grouping invariance is BITWISE: identical counters either way
    val a = merged(4L).orderBy("sk_row", "sk_slot").collect().toSeq
    assert(a == merged(23L).orderBy("sk_row", "sk_slot").collect().toSeq,
      "sketch counters must be merge-grouping invariant")
    val truth = df.groupBy("term").agg(count(lit(1)).cast("bigint").as("true_cnt"))
    val est = Profiling.cmsEstimates(merged(4L), truth, "term")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val n = occurrences.size
    est.foreach { case (t, tc, e) =>
      assert(e >= tc, s"$t: CMS must never undercount ($e < $tc)")
      // additive error bound e*N/w holds in expectation per row; the min of
      // d=3 rows on a fixed corpus sits far inside 3x that slack
      assert(e - tc <= 3L * math.E.ceil.toLong * n / Profiling.CmsW,
        s"$t: overcount ${e - tc} exceeds slack at N=$n w=${Profiling.CmsW}")
    }
    // a term the sketch never saw estimates at most colliding mass, and the
    // estimate path must not drop it (absent counters read as zero)
    val unseen = Profiling.cmsEstimates(
      merged(4L), Seq(("never-seen-term", 0L)).toDF("term", "true_cnt"), "term")
      .collect()(0)
    assert(unseen.getLong(2) >= 0L)
  }

  test("histogramDrift: exact hand values, zero on identical sides, sound bounds") {
    import spark.implicits._
    def partials(rows: (Long, Long)*) =
      rows.toSeq.toDF("bin", "cnt").withColumn("shard", lit(0L))
    // A: 30@bin0 10@bin1; B: 10@bin0 10@bin1 20@bin2 (totals 40/40)
    // bin0 cross: 1200 vs 400 -> ratio floor 3 -> bits diff 2-1 = +1
    // bin1 equal -> 0; bin2 one-sided -> NULL
    // TVD = (800 + 0 + 800) / (2*40*40) = 0.5
    val got = graft.operators.Profiling.histogramDrift(
      partials(0L -> 30L, 1L -> 10L), partials(0L -> 10L, 1L -> 10L, 2L -> 20L))
      .orderBy("bin").collect()
    assert(got.map(_.getLong(0)).toSeq == Seq(0L, 1L, 2L))
    assert(got(0).getLong(5) == 1L && got(1).getLong(5) == 0L && got(2).isNullAt(5))
    assert(got(0).getDouble(3) == 0.75 && got(0).getDouble(4) == 0.25)
    assert(got.forall(_.getDouble(6) == 0.5))
    // identical sides: all drift_bits 0, tvd exactly 0
    val same = graft.operators.Profiling.histogramDrift(
      partials(0L -> 5L, 3L -> 7L), partials(0L -> 5L, 3L -> 7L)).collect()
    assert(same.forall(r => r.getLong(5) == 0L && r.getDouble(6) == 0.0))
    // fully disjoint supports: tvd exactly 1
    val disj = graft.operators.Profiling.histogramDrift(
      partials(0L -> 5L), partials(1L -> 9L)).collect()
    assert(disj.forall(r => r.isNullAt(5) && r.getDouble(6) == 1.0))
  }

  test("profileAll: one scan emits all four partial families bitwise-equal to the separate builders") {
    val ev = Tables.events(spark, TestSpark.sfDir)
      .withColumn("shard", pmod(col("event_id"), lit(16L)))
    val one = Profiling.profileAll(ev, "shard", Seq("value"),
      histCol = "value", lo = 0.0, width = 8.0, nBins = 64,
      hllCol = "user_id", cmsTermCol = "event_type")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy(df.columns.map(col): _*).collect().map(_.toSeq).toSeq
    val twins = Seq(
      ("stats", one.stats, Profiling.statsPartials(ev, "shard", Seq("value"))),
      ("hist", one.hist,
        Profiling.histogramPartials(ev, "shard", "value", 0.0, 8.0, 64)),
      ("hll", one.hll, Profiling.hllPartials(ev, "shard", "user_id")),
      ("cms", one.cms, Profiling.cmsPartials(ev, "shard", "event_type")))
    twins.foreach { case (name, got, want) =>
      assert(got.schema.map(f => (f.name, f.dataType)) ==
        want.schema.map(f => (f.name, f.dataType)), s"$name schema differs")
      assert(rows(got) == rows(want), s"$name partials differ")
    }
  }
}
