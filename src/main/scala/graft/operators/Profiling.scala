package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Batched single-scan profiling — the reference's core optimization re-built
  * as programmatic Column lists (reference: datagrunt_agent/tools/quality.py:6-8
  * "wide-SELECT FILTER batching", column_stats.sql, null_analysis.sql).
  *
  * Every profile is ONE wide hash aggregate: cost is a single table scan
  * regardless of how many columns/metrics are requested, and partial
  * aggregation happens map-side, so at 100 TB the shuffle carries one row per
  * partition, not data. Exact variants feed the DuckDB oracle; approx variants
  * (HLL++/quantile sketches) are the default at scale where a ±2% answer for
  * 100× less memory is the right trade — their sketch internals differ across
  * engines, so they are covered by ScalaTest bounds instead of hash equality.
  */
object Profiling {

  /** One row: total_rows + per-column non-null counts `nn_<col>`. */
  def nullAnalysis(df: DataFrame, cols: Seq[String]): DataFrame = {
    val aggs: Seq[Column] = cols.map(c => count(col(c)).as(s"nn_$c"))
    df.agg(count(lit(1)).as("total_rows"), aggs: _*)
  }

  /** One row of exact stats: min/max for `numericCols` and `stringCols` in a
    * single scan, exact distinct counts for `keyCols` as separate pruned
    * distinct aggregates crossJoined back. Multiple exact COUNT(DISTINCT)s in
    * one aggregate plan as an Expand that multiplies every row by
    * (distincts+1); per-key pruned scans read one column each (parquet column
    * pruning) and shuffle only distinct keys — 5x faster here and strictly
    * less shuffle at scale. [[columnStatsApprox]] is the true single-scan
    * variant when ±2% NDV is acceptable. */
  def columnStats(df: DataFrame, numericCols: Seq[String], stringCols: Seq[String],
                  keyCols: Seq[String]): DataFrame = {
    val aggs: Seq[Column] =
      numericCols.flatMap(c => Seq(min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c"))) ++
      stringCols.flatMap(c => Seq(min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c")))
    val base = df.agg(count(lit(1)).as("total_rows"), aggs: _*)
    keyCols.foldLeft(base) { (acc, c) =>
      acc.crossJoin(
        df.select(col(c)).distinct().agg(count(col(c)).as(s"ndv_$c")))
    }
  }

  /** Approximate twin of [[columnStats]] for the 100 TB path: HLL++ distinct
    * counts and approximate quartiles, still one scan. */
  def columnStatsApprox(df: DataFrame, numericCols: Seq[String],
                        keyCols: Seq[String]): DataFrame = {
    val aggs: Seq[Column] =
      numericCols.flatMap(c => Seq(
        min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c"),
        expr(s"percentile_approx($c, 0.5)").as(s"p50_$c"))) ++
      keyCols.map(c => approx_count_distinct(col(c)).as(s"andv_$c"))
    df.agg(count(lit(1)).as("total_rows"), aggs: _*)
  }

  /** DuckDB-SUMMARIZE-style per-column profile (reference
    * sql/profiling/column_stats.sql: one row per column with type,
    * approx-distinct, null %, min, max). ONE wide scan; the single result row
    * is reshaped driver-side (metadata, not data). */
  def summarize(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val cols = df.columns.toSeq
    // min/max only exist for orderable types — array/map/struct columns get
    // NULL bounds instead of failing the whole profile
    val orderable = df.schema.fields.map(f => f.name ->
      org.apache.spark.sql.catalyst.expressions.RowOrdering.isOrderable(f.dataType)).toMap
    val aggs: Seq[Column] = cols.flatMap { c =>
      val (mn, mx) =
        if (orderable(c)) (min(col(c)).cast("string"), max(col(c)).cast("string"))
        else (first(lit(null).cast("string")), first(lit(null).cast("string")))
      Seq(
        count(col(c)).as(s"nn_$c"),
        approx_count_distinct(col(c)).as(s"ad_$c"),
        mn.as(s"mn_$c"),
        mx.as(s"mx_$c"))
    }
    val row = df.agg(count(lit(1)).as("__total"), aggs: _*).head()
    val total = row.getAs[Long]("__total")
    val types = df.schema.fields.map(f =>
      f.name -> SchemaOps.canonicalTypeName(f.dataType)).toMap
    import spark.implicits._
    cols.map { c =>
      val nn = row.getAs[Long](s"nn_$c")
      (c, types(c), total, nn, row.getAs[Long](s"ad_$c"),
        if (total == 0) 0.0 else (total - nn).toDouble / total,
        Option(row.getAs[String](s"mn_$c")), Option(row.getAs[String](s"mx_$c")))
    }.toDF("column_name", "column_type", "total_rows", "non_null",
      "approx_distinct", "null_pct", "min_value", "max_value")
  }

  /** Reference duplicate_detection.sql: key groups with count > 1, top-k by
    * count with a total-order tie-break so LIMIT is deterministic. */
  def duplicateKeys(df: DataFrame, keys: Seq[String], limit: Int = 50): DataFrame = {
    val sortCols = col("dup_count").desc +: keys.map(col(_).asc)
    df.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("dup_count"))
      .filter(col("dup_count") > 1)
      .orderBy(sortCols: _*)
      .limit(limit)
  }

  /** Fixed-width histogram of a numeric column (floor(x / width) buckets). */
  def histogram(df: DataFrame, c: String, width: Double): DataFrame =
    df.groupBy(floor(col(c) / width).cast("long").as("bucket"))
      .agg(count(lit(1)).as("n"), min(col(c)).as("min_v"), max(col(c)).as("max_v"))

  /** Reference approximate_duplicates.sql: whole-row duplicate count via
    * md5 of concat_ws over all columns (exact for distinct-hash purposes). */
  def approxDuplicateCount(df: DataFrame): DataFrame = {
    // Cells join with a \u0001 separator and NULL maps to a \u0002 sentinel:
    // separator-less concat is ambiguous ((11415,1863) vs (114151,863)
    // concatenate identically) and concat_ws silently skips NULLs - both
    // manufacture false duplicates.
    val cells = df.columns.map(c => coalesce(col(c).cast("string"), lit("\u0002")))
    val h = md5(concat_ws("\u0001", cells: _*))
    df.agg(
      count(lit(1)).as("total_rows"),
      countDistinct(h).as("distinct_rows"),
      (count(lit(1)) - countDistinct(h)).as("duplicate_rows"))
  }

  /** Mergeable per-shard stats partials — the incremental-profiling building
    * block for a 100 TB lake: every ingest batch (or table partition)
    * contributes ONE partial row per shard, persisted alongside the data;
    * [[mergeStatsPartials]] folds any subset of partials into the exact
    * global profile WITHOUT rescanning a byte of the corpus. Exactness is
    * what makes the merge legal: COUNT/MIN/MAX are trivially associative and
    * the sums are DECIMAL ([[graft.core.Exact]]), so partial + partial loses
    * nothing — a float running sum would drift per merge order. */
  def statsPartials(df: DataFrame, shardCol: String, cols: Seq[String]): DataFrame = {
    val aggs: Seq[Column] = cols.flatMap(c => Seq(
      count(col(c)).as(s"nn_$c"),
      min(col(c)).as(s"min_$c"),
      max(col(c)).as(s"max_$c"),
      sum(col(c).cast(org.apache.spark.sql.types.DecimalType(18, 2))).as(s"dsum_$c")))
    df.groupBy(col(shardCol)).agg(count(lit(1)).as("n_rows"), aggs: _*)
  }

  /** Mergeable fixed-grid histogram partials — the QUANTILE companion to
    * [[statsPartials]]: per shard, counts over `nBins` equal-width bins of
    * `[lo, lo + nBins*width)` (values outside clamp to the edge bins). Bin
    * counts are integers, so partial + partial = exact merged histogram —
    * unlike engine-native quantile sketches (t-digest/KLL/GK), whose merge
    * is approximate AND implementation-specific, this grid is deterministic,
    * engine-portable, and merges without error growth; the price is a fixed
    * value domain (known a priori in telemetry/metrics pipelines) and
    * resolution bounded by the bin width. One hash aggregate, map-side
    * combinable; the partial is at most shards x nBins rows, persisted
    * alongside each ingest batch so quantile queries never rescan data. */
  def histogramPartials(df: DataFrame, shardCol: String, c: String,
                        lo: Double, width: Double, nBins: Int): DataFrame = {
    require(width > 0 && nBins > 0, "need positive width and nBins")
    df.filter(col(c).isNotNull)
      .withColumn("bin", least(greatest(floor((col(c) - lo) / width), lit(0.0)),
        lit((nBins - 1).toDouble)).cast("long"))
      .groupBy(col(shardCol), col("bin"))
      .agg(count(lit(1)).cast("bigint").as("cnt"))
  }

  /** Grouped [[histogramPartials]]: one bin grid PER GROUP — the
    * per-dimension quantile profile (latency per endpoint, value per event
    * type) kept mergeable, completing the grouped-sketch trio alongside
    * [[hllPartialsBy]] and [[cmsPartialsBy]]. The group-by dimensions ride
    * inside the same single map-side-combined aggregate; a partial is <=
    * shards x groups x nBins rows. */
  def histogramPartialsBy(df: DataFrame, shardCol: String, groupCols: Seq[String],
                          c: String, lo: Double, width: Double, nBins: Int): DataFrame = {
    require(width > 0 && nBins > 0, "need positive width and nBins")
    df.filter(col(c).isNotNull)
      .withColumn("bin", least(greatest(floor((col(c) - lo) / width), lit(0.0)),
        lit((nBins - 1).toDouble)).cast("long"))
      .groupBy((shardCol +: groupCols :+ "bin").map(col): _*)
      .agg(count(lit(1)).cast("bigint").as("cnt"))
  }

  /** Grouped [[mergeHistogramQuantiles]]: per group, the identical
    * integer-rank interpolation over that group's merged bin grid — one row
    * per group `(groups…, n_rows, est_p<q>…)`. The cum-sum window partitions
    * by group (each partition <= nBins rows), and each quantile's bin probe
    * joins back on the group key; everything downstream of the partials is
    * group-count-sized. Same bit-reproducibility argument as the ungrouped
    * merge — integer bins, pinned-double literals, integer-derived ranks. */
  def mergeHistogramQuantilesBy(partials: DataFrame, groupCols: Seq[String],
                                qs: Seq[Double], lo: Double, width: Double): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(groupCols.nonEmpty, "use mergeHistogramQuantiles for the ungrouped fold")
    require(qs.nonEmpty && qs.forall(q => q > 0 && q <= 1), "qs must be in (0, 1]")
    val merged = partials.groupBy((groupCols :+ "bin").map(col): _*)
      .agg(sum(col("cnt")).cast("bigint").as("cnt"))
    val n = merged.groupBy(groupCols.map(col): _*)
      .agg(sum(col("cnt")).cast("bigint").as("n_rows"))
    val wcum = Window.partitionBy(groupCols.map(col): _*).orderBy("bin")
      .rowsBetween(Window.unboundedPreceding, -1)
    val cum = merged
      .withColumn("cum_before", coalesce(sum(col("cnt")).over(wcum), lit(0L)))
      .join(n, groupCols)
    // ONE conditional aggregate computes every quantile (r17): the former
    // one-frame-per-q shape re-derived the merged grid + window + total per
    // quantile and re-joined each back on the group key — 4 extra exchanges
    // and window sorts of pure stage-count at bench scale (guide §2.4).
    // Exactly one bin satisfies each target's half-open cum window (targets
    // are in [1, n_rows] and the cum ranges partition it), so max(when(...))
    // recovers the identical interpolated value; n_rows is constant per
    // group, so max() recovers it exactly.
    cum.groupBy(groupCols.map(col): _*)
      .agg(max(col("n_rows")).as("n_rows"), qAggs(qs, lo, width): _*)
  }

  /** The per-quantile conditional aggregates shared by both quantile folds:
    * target rank ceil(q*N); the unique bin whose cumulative window contains
    * it contributes the interpolated estimate. */
  private def qAggs(qs: Seq[Double], lo: Double, width: Double): Seq[Column] =
    qs.map { q =>
      val name = s"est_p${(q * 100).round}"
      val target = ceil(lit(q) * col("n_rows")).cast("long")
      max(when(col("cum_before") < target && target <= col("cum_before") + col("cnt"),
        lit(lo) + lit(width) * col("bin") +
          lit(width) * ((target - col("cum_before")) / col("cnt")))).as(name)
    }

  /** Fold histogram partials into interpolated quantile estimates at `qs` —
    * one output row: `n_rows, est_p<q1>, est_p<q2>, …`. For each q the
    * target rank is ceil(q*N); the first bin whose cumulative count reaches
    * it contributes `lo + width*bin + width*(target - cum_before)/cnt` —
    * every term integer-derived, so the estimate is bit-reproducible across
    * engines and merge orders (the oracle computes the same arithmetic from
    * a direct single scan). Error is bounded by one bin width. The cum-sum
    * window runs over at most nBins rows — a single tiny task. */
  def mergeHistogramQuantiles(partials: DataFrame, qs: Seq[Double],
                              lo: Double, width: Double): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(qs.nonEmpty && qs.forall(q => q > 0 && q <= 1), "qs must be in (0, 1]")
    val merged = partials.groupBy("bin").agg(sum(col("cnt")).cast("bigint").as("cnt"))
    val wcum = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, -1)
    val cum = merged
      .withColumn("cum_before", coalesce(sum(col("cnt")).over(wcum), lit(0L)))
      .crossJoin(broadcast(merged.agg(sum(col("cnt")).cast("bigint").as("n_rows"))))
    // Column-API literals throughout ([[qAggs]]): a `0.95` inside SQL text
    // parses as DECIMAL in both engines, and decimal-vs-double rank
    // arithmetic can disagree by one at exact-multiple boundaries;
    // lit(Double) pins DOUBLE. One conditional aggregate computes every
    // quantile (r17) — the former per-q frames each re-derived merged +
    // window + total and crossJoined back (4 extra windows in the
    // profile_one_scan plan, pure stage-count; guide §2.4). The dummy
    // grouping key (dropped) keeps empty-input semantics: zero partials →
    // zero groups → zero rows, exactly the old distinct-of-empty.
    cum.groupBy(lit(0).as("__g"))
      .agg(max(col("n_rows")).as("n_rows"), qAggs(qs, lo, width): _*)
      .drop("__g")
  }

  /** Distribution drift between two histogram-partial sets — the
    * data-drift monitor a training pipeline runs between corpus snapshots
    * (did this week's crawl shift the length/quality/value distribution?),
    * answered ENTIRELY from persisted partials: both sides fold to their
    * merged bin grids (sketch-sized), never rescanning a corpus byte.
    *
    * Exactness: shares are one correctly-rounded division each from exact
    * integer counts; per-bin `drift_bits` is the INTEGER bit width of the
    * cross-ratio floor (cnt_a*tot_b vs cnt_b*tot_a — the comparison PSI/KL
    * make with logs, in the same transcendental-free floor-log2 form as the
    * surprisal scorers; positive = overrepresented in A, NULL when a side
    * is empty); the total-variation distance is an exact DECIMAL sum of
    * |cross-product differences| with ONE final double division. All
    * portable, so the whole report hash-checks cross-engine.
    *
    * Totals are collected once (two longs — report metadata); cross
    * products stay in BIGINT, which bounds each side at 2^31 rows — beyond
    * that swap the products to DECIMAL(38,0) (the sum already is), the
    * documented 100 TB follow-up. */
  def histogramDrift(pa: DataFrame, pb: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val a = pa.groupBy("bin").agg(sum(col("cnt")).cast("bigint").as("cnt_a"))
    val b = pb.groupBy("bin").agg(sum(col("cnt")).cast("bigint").as("cnt_b"))
    // three consumers (totals head, the report frame, the tvd aggregate) —
    // checkpoint the merged grid once so the full-outer join doesn't
    // re-evaluate per consumer; it is sketch-sized (bins, not rows), and the
    // checkpoint lives within this one call, so the harness's between-query
    // cache clears can't orphan it
    val j = a.join(b, Seq("bin"), "full_outer")
      .select(col("bin"), coalesce(col("cnt_a"), lit(0L)).as("cnt_a"),
        coalesce(col("cnt_b"), lit(0L)).as("cnt_b"))
      .localCheckpoint(false)
    val t = j.agg(sum(col("cnt_a")).cast("bigint"), sum(col("cnt_b")).cast("bigint")).head()
    val (totA, totB) = (t.getLong(0), t.getLong(1))
    require(totA > 0 && totB > 0, "drift needs rows on both sides")
    require(totA < (1L << 31) && totB < (1L << 31),
      "BIGINT cross products bound each side at 2^31 rows — swap to DECIMAL(38,0) products")
    def bits(c: Column) = length(conv(c.cast("string"), 10, 2))
    val e = j
      .withColumn("xab", col("cnt_a") * lit(totB))
      .withColumn("xba", col("cnt_b") * lit(totA))
      .withColumn("share_a", col("cnt_a").cast("double") / lit(totA).cast("double"))
      .withColumn("share_b", col("cnt_b").cast("double") / lit(totB).cast("double"))
      .withColumn("drift_bits", when(col("cnt_a") > 0 && col("cnt_b") > 0,
        (bits(greatest(expr("xab div xba"), lit(1L))) -
          bits(greatest(expr("xba div xab"), lit(1L)))).cast("bigint")))
    val tvd = e.agg(
      (sum(abs(col("xab") - col("xba")).cast(DecimalType(38, 0))).cast("double") /
        ((lit(2.0) * lit(totA.toDouble)) * lit(totB.toDouble))).as("tvd"))
    e.select(col("bin"), col("cnt_a"), col("cnt_b"),
        col("share_a"), col("share_b"), col("drift_bits"))
      .crossJoin(broadcast(tvd))
  }

  /** HyperLogLog register width: p=8 → 256 registers, ~6.5% standard error —
    * the approximate-distinct sweet spot for per-column lake profiling. */
  val HllP = 8
  private val HllM = 1 << HllP
  /** Flajolet et al.'s alpha_m bias constant for m = 256, computed ONCE here
    * and embedded as the same decimal literal in both engines' expressions. */
  val HllAlpha: Double = 0.7213 / (1 + 1.079 / HllM)

  /** Mergeable HyperLogLog distinct-count partials (Flajolet et al. 2007,
    * public algorithm), built BITWISE-PORTABLE: register and rank come from
    * two independently salted portable polynomial hashes ('hll-'/'hllr-'
    * prefixes decorrelate from every other salted selection), each through
    * the two-round [[graft.functions.Portable.hllScrambleSpark]] (see its
    * scaladoc for why the raw polynomial cannot feed a sketch), register =
    * scrambled mod 256, rank = 30-bit leading-zero count via integer bit
    * widths — no engine-specific hash, no opaque sketch buffer. Registers
    * merge by MAX, which is exactly associative — the same
    * any-subset-of-partials guarantee as [[statsPartials]], a property
    * Spark's own approx_count_distinct buffers have but cannot expose to an
    * oracle. One hash aggregate, map-side combinable; a partial is ≤
    * shards x 256 rows. Accuracy is sketch-grade, not ideal-hash-grade
    * (rank source uniform on [0, P), P just under 2^30) — spec-bounded at
    * ±35%; swap the hash for xxhash64 when no DuckDB oracle is needed,
    * exactly like every other operator taking the hash as a plugged
    * expression. */
  def hllPartials(df: DataFrame, shardCol: String, c: String): DataFrame =
    hllPartialsBy(df, shardCol, Seq.empty, c)

  /** Grouped [[hllPartials]]: one register set PER GROUP — the
    * distinct-users-per-dimension profile (users per event type, documents
    * per domain) kept mergeable. A partial is <= shards x groups x 256
    * rows; the group-by dimensions ride inside the same single map-side-
    * combined hash aggregate, so the corpus is still scanned once however
    * many groups exist. */
  def hllPartialsBy(df: DataFrame, shardCol: String, groupCols: Seq[String],
                    c: String): DataFrame = {
    import graft.functions.Portable
    graft.plans.GraftFunctions.register(df.sparkSession)
    // register and rank come from INDEPENDENTLY salted hashes, each pushed
    // through the two-round scramble: the raw polynomial is linear in the
    // key digits, which clusters both its residues (register skew -> an
    // effectively smaller m) and its top bits (non-geometric ranks) on
    // sequential-id corpora — measured 2x underestimates before the fix
    val hr = Portable.hllScrambleSpark(s"graft_phash(concat('hll-', cast($c as string)))")
    val hk = Portable.hllScrambleSpark(s"graft_phash(concat('hllr-', cast($c as string)))")
    df.filter(col(c).isNotNull)
      .withColumn("reg", expr(s"$hr % $HllM"))
      .withColumn("__v", expr(hk))
      // rank over the 30-bit value: leading zeros + 1 = (30 - bitwidth) + 1;
      // conv-base-2 string length IS the bitwidth for positive ints
      .withColumn("rank", expr(
        "CASE WHEN __v = 0 THEN 31 " +
          "ELSE 31 - length(conv(CAST(__v AS STRING), 10, 2)) END"))
      .groupBy((shardCol +: groupCols :+ "reg").map(col): _*)
      .agg(max(col("rank")).cast("bigint").as("max_rank"))
  }

  /** Fold HLL partials into the distinct estimate: registers re-MAX across
    * shards, then the raw HyperLogLog estimator alpha*m^2 / (sum 2^-M_j +
    * one per never-hit register). power(0.5, rank) is exact dyadic in IEEE,
    * the sum order is fixed by a bin-ordered window-free aggregate of exact
    * values, and alpha is a shared literal — so the estimate is
    * bit-identical in both engines AND under any merge grouping. The
    * small-range linear-counting correction is deliberately omitted: it
    * needs ln(), which is not correctly-rounded-portable; at lake scale
    * cardinalities sit far above the correction regime anyway. */
  def mergeHllDistinct(partials: DataFrame): DataFrame =
    mergeHllDistinctBy(partials, Seq.empty)

  /** Grouped [[mergeHllDistinct]]: registers re-MAX within (group, reg),
    * then the raw estimator per group — same arithmetic, same bitwise
    * portability, one row per group. */
  def mergeHllDistinctBy(partials: DataFrame, groupCols: Seq[String]): DataFrame = {
    val regs = partials.groupBy((groupCols :+ "reg").map(col): _*)
      .agg(max(col("max_rank")).as("max_rank"))
    regs.groupBy(groupCols.map(col): _*)
      .agg(
        count(lit(1)).cast("bigint").as("registers_hit"),
        sum(expr("power(cast(0.5 as double), cast(max_rank as double))")).as("__s"))
      .select(groupCols.map(col) ++ Seq(col("registers_hit"),
        (lit(HllAlpha) * HllM * HllM /
          (col("__s") + (lit(HllM) - col("registers_hit")).cast("double")))
          .as("est_distinct")): _*)
  }

  /** HLL set algebra — audience overlap WITHOUT a rescan or a join: given
    * the two cohorts' register partials, the union sketch is just the
    * register-wise MAX of both (the HLL merge), and the intersection
    * estimate follows by inclusion-exclusion est(A) + est(B) - est(A∪B).
    * This is the two-cohort question (users who did X and Y) answered from
    * sketch state alone — at 100 TB the partials are two 256-row tables,
    * while the exact answer is a distinct-join over both cohorts' raw data.
    * Inclusion-exclusion inherits BOTH sketches' error, so small overlaps
    * drown in noise (standard HLL-intersection caveat; spec-bounded) — the
    * arithmetic itself is the same dyadic/bitwise-portable estimator as
    * [[mergeHllDistinct]], so the estimates hash-check. */
  def hllOverlap(partialsA: DataFrame, partialsB: DataFrame): DataFrame = {
    def est(p: DataFrame, name: String) =
      mergeHllDistinct(p).select(col("est_distinct").as(name))
    val u = mergeHllDistinct(partialsA.select("reg", "max_rank")
        .unionByName(partialsB.select("reg", "max_rank")))
      .select(col("est_distinct").as("est_union"))
    est(partialsA, "est_a").crossJoin(est(partialsB, "est_b")).crossJoin(u)
      .withColumn("est_intersection",
        col("est_a") + col("est_b") - col("est_union"))
  }

  /** Fold stats partials into the global profile (same shape the direct
    * single-scan aggregate would produce): total/non-null counts, min/max,
    * exact sum and the [[graft.core.Exact.davg]]-style reproducible mean.
    * The decimal grand total is exact, so its one cast to DOUBLE matches the
    * direct scan bit-for-bit — the property the oracle gate pins. */
  def mergeStatsPartials(partials: DataFrame, cols: Seq[String]): DataFrame = {
    val aggs: Seq[Column] = cols.flatMap(c => Seq(
      sum(col(s"nn_$c")).cast("long").as(s"nn_$c"),
      min(col(s"min_$c")).as(s"min_$c"),
      max(col(s"max_$c")).as(s"max_$c"),
      sum(col(s"dsum_$c")).cast("double").as(s"sum_$c"),
      (sum(col(s"dsum_$c")).cast("double") / sum(col(s"nn_$c"))).as(s"avg_$c")))
    partials.agg(sum(col("n_rows")).cast("long").as("total_rows"), aggs: _*)
  }

  /** All four mergeable-sketch partial families — stats, fixed-grid
    * histogram, HLL registers, CMS counters — from ONE corpus scan. The
    * separate builders ([[statsPartials]], [[histogramPartials]],
    * [[hllPartials]], [[cmsPartials]]) each cost a full table scan; calling
    * all four is four scans of the same data, and at 100 TB the scans ARE
    * the cost (every family's aggregate state is tiny next to the read).
    *
    * Mechanism: each input row explodes into at most
    * 1 + |statsCols| + 1 + 1 + d tagged records — a row marker, one record
    * per non-null stats value, a histogram-bin record, an HLL
    * register/rank record, d CMS slot records — and ONE hash aggregate
    * groups them by (shard, family, key). Map-side combine collapses the
    * fan-out before the exchange, so the shuffle still carries sketch-sized
    * partials, not data. The aggregate is eagerly localCheckpoint'ed (it IS
    * the single scan); the four family frames are then filters/pivots over
    * that sketch-sized result, each BITWISE-EQUAL in schema and content to
    * its separate-builder twin (pinned by ProfilingSpec and the
    * `profile_one_scan` gate).
    *
    * `statsCols` must be DOUBLE-typed (the unified record carries one
    * double value slot; [[statsPartials]] itself is type-generic). */
  def profileAll(df: DataFrame, shardCol: String, statsCols: Seq[String],
                 histCol: String, lo: Double, width: Double, nBins: Int,
                 hllCol: String, cmsTermCol: String): ProfileAllPartials = {
    import graft.functions.Portable
    import org.apache.spark.sql.types.{DecimalType, DoubleType}
    require(width > 0 && nBins > 0, "need positive width and nBins")
    statsCols.foreach(c => require(df.schema(c).dataType == DoubleType,
      s"profileAll statsCols must be DOUBLE, $c is ${df.schema(c).dataType}"))
    graft.plans.GraftFunctions.register(df.sparkSession)
    val nullD = lit(null).cast("double")
    val nullL = lit(null).cast("bigint")
    val nullDec = lit(null).cast("decimal(18,2)")
    def rec(fam: String, k1: Column, k2: Column, v: Column, lv: Column, dv: Column) =
      struct(lit(fam).as("fam"), k1.cast("bigint").as("k1"), k2.cast("bigint").as("k2"),
        v.cast("double").as("v"), lv.cast("bigint").as("lv"),
        dv.cast(DecimalType(18, 2)).as("dv"))
    val rowRec = rec("n", lit(0L), lit(0L), nullD, nullL, nullDec)
    val statsRecs = statsCols.zipWithIndex.map { case (c, i) =>
      when(col(c).isNotNull, rec(s"s$i", lit(0L), lit(0L), col(c), nullL, col(c)))
    }
    // bin arithmetic identical to histogramPartials
    val bin = least(greatest(floor((col(histCol) - lo) / width), lit(0.0)),
      lit((nBins - 1).toDouble)).cast("long")
    val histRec = when(col(histCol).isNotNull, rec("h", bin, lit(0L), nullD, nullL, nullDec))
    // register/rank expressions identical to hllPartialsBy (the rank CASE
    // inlines the salted hash twice; deterministic expression, same value)
    val hr = Portable.hllScrambleSpark(s"graft_phash(concat('hll-', cast($hllCol as string)))")
    val hk = Portable.hllScrambleSpark(s"graft_phash(concat('hllr-', cast($hllCol as string)))")
    val rank = expr(
      s"CASE WHEN ($hk) = 0 THEN 31 " +
        s"ELSE 31 - length(conv(CAST(($hk) AS STRING), 10, 2)) END")
    val hllRec = when(col(hllCol).isNotNull,
      rec("l", expr(s"$hr % $HllM"), lit(0L), nullD, rank, nullDec))
    val cmsRecs = (0 until CmsD).map { j =>
      when(col(cmsTermCol).isNotNull,
        rec("c", lit(j.toLong), expr(cmsSlotSpark(j, cmsTermCol)), nullD, nullL, nullDec))
    }
    val allRecs = (rowRec +: statsRecs) ++ Seq(histRec, hllRec) ++ cmsRecs
    // explode the raw array and drop null records with a plain codegen'd
    // predicate AFTER the explode — an array `filter` here would put an
    // interpreted higher-order function on every corpus row (the CLAUDE.md
    // hot-path rule this module exists to respect)
    val tall = df
      .select(col(shardCol).as("__shard"), explode(array(allRecs: _*)).as("r"))
      .filter(col("r").isNotNull)
      .select(col("__shard"), col("r.fam").as("fam"), col("r.k1").as("k1"),
        col("r.k2").as("k2"), col("r.v").as("v"), col("r.lv").as("lv"), col("r.dv").as("dv"))
      .groupBy("__shard", "fam", "k1", "k2")
      .agg(count(lit(1)).as("cnt"), min(col("v")).as("mn"), max(col("v")).as("mx"),
        sum(col("dv")).as("ds"), max(col("lv")).as("mxr"))
      // LAZY checkpoint: the first consumer's action runs the one scan, the
      // other three families read the materialized blocks — eager would add
      // a whole extra job before any consumer needs the data
      .localCheckpoint(false)
    val statsAggs: Seq[Column] = statsCols.zipWithIndex.flatMap { case (c, i) =>
      Seq(
        coalesce(max(when(col("fam") === s"s$i", col("cnt"))), lit(0L)).as(s"nn_$c"),
        max(when(col("fam") === s"s$i", col("mn"))).as(s"min_$c"),
        max(when(col("fam") === s"s$i", col("mx"))).as(s"max_$c"),
        max(when(col("fam") === s"s$i", col("ds"))).as(s"dsum_$c"))
    }
    ProfileAllPartials(
      stats = tall.groupBy(col("__shard").as(shardCol))
        .agg(max(when(col("fam") === "n", col("cnt"))).as("n_rows"), statsAggs: _*),
      hist = tall.filter(col("fam") === "h")
        .select(col("__shard").as(shardCol), col("k1").as("bin"),
          col("cnt").cast("bigint").as("cnt")),
      hll = tall.filter(col("fam") === "l")
        .select(col("__shard").as(shardCol), col("k1").as("reg"),
          col("mxr").cast("bigint").as("max_rank")),
      cms = tall.filter(col("fam") === "c")
        .select(col("__shard").as(shardCol), col("k1").cast("int").as("sk_row"),
          col("k2").as("sk_slot"), col("cnt").cast("bigint").as("cnt")))
  }

  /** The four partial frames [[profileAll]] emits from its one scan, each
    * schema- and content-identical to its separate-builder twin. */
  final case class ProfileAllPartials(stats: DataFrame, hist: DataFrame,
                                      hll: DataFrame, cms: DataFrame)

  // ---- Count-Min frequency sketch ------------------------------------------
  /** Sketch depth (independent hash rows) and width (counters per row). d=3
    * bounds the failure probability at e^-3; w trades memory against the
    * additive overcount bound eN/w. At 100 TB, w scales with the token
    * budget, not the corpus — the sketch stays d x w counters regardless. */
  val CmsD = 3
  val CmsW = 1024

  private def cmsSlotSpark(j: Int, term: String): String = {
    import graft.functions.Portable
    s"(${Portable.hllScrambleSpark(s"graft_phash(concat('cms$j-', $term))")} % $CmsW)"
  }

  /** Mergeable Count-Min sketch partials (Cormode & Muthukrishnan 2005,
    * public algorithm) over one term-occurrence column: each occurrence
    * increments one counter per sketch row, counters merge by exact SUM —
    * the same any-subset-of-partials guarantee as [[statsPartials]] and
    * [[hllPartials]], completing the mergeable-sketch trio (distinct = HLL,
    * quantiles = histogram grid, frequencies = CMS). Rows are independently
    * salted portable hashes through the two-round scramble ([[graft.functions
    * .Portable.hllScrambleSpark]] — the raw polynomial clusters residues on
    * sequential corpora, which for CMS means correlated collisions across
    * all d rows at once, defeating the min). One explode x d stack then a
    * map-side-combined hash aggregate; a partial is <= shards x d x w rows
    * no matter the corpus size. */
  def cmsPartials(df: DataFrame, shardCol: String, termCol: String): DataFrame =
    cmsPartialsBy(df, shardCol, Seq.empty, termCol)

  /** Grouped [[cmsPartials]]: one d x w counter grid PER GROUP — term
    * frequencies per source/domain/language in the same single map-side-
    * combined aggregate; a partial is <= shards x groups x d x w rows. */
  def cmsPartialsBy(df: DataFrame, shardCol: String, groupCols: Seq[String],
                    termCol: String): DataFrame = {
    graft.plans.GraftFunctions.register(df.sparkSession)
    val pairs = (0 until CmsD)
      .map(j => s"$j, ${cmsSlotSpark(j, termCol)}").mkString(", ")
    df.filter(col(termCol).isNotNull)
      .selectExpr((shardCol +: groupCols) :+
        s"stack($CmsD, $pairs) AS (sk_row, sk_slot)": _*)
      .groupBy((shardCol +: groupCols :+ "sk_row" :+ "sk_slot").map(col): _*)
      .agg(count(lit(1)).cast("bigint").as("cnt"))
  }

  /** Fold CMS partials into the global sketch: counters re-SUM across
    * shards. Integer addition is exactly associative, so any merge grouping
    * (and the direct single-scan build) lands on identical counters. */
  def mergeCms(partials: DataFrame): DataFrame = mergeCmsBy(partials, Seq.empty)

  /** Grouped [[mergeCms]]: counters re-SUM within (group, row, slot). */
  def mergeCmsBy(partials: DataFrame, groupCols: Seq[String]): DataFrame =
    partials.groupBy((groupCols :+ "sk_row" :+ "sk_slot").map(col): _*)
      .agg(sum(col("cnt")).cast("bigint").as("cnt"))

  /** Point-query the merged sketch for each row of `terms`: estimate = MIN
    * over the d counters the term hashes to (absent counter = 0). Always an
    * OVERcount: every true occurrence incremented all d counters, so the min
    * is >= truth, and exceeds it only by colliding terms' mass. The sketch
    * is <= d x w rows -> broadcast; cost is O(|terms|), never a corpus
    * rescan. Extra columns on `terms` (e.g. the true count being audited)
    * pass through untouched. */
  def cmsEstimates(merged: DataFrame, terms: DataFrame, termCol: String): DataFrame =
    cmsEstimatesBy(merged, Seq.empty, terms, termCol)

  /** Grouped [[cmsEstimates]]: `terms` rows carry the group columns and each
    * is answered by ITS group's counter grid (absent counter — including a
    * group the sketch never saw — reads zero). */
  def cmsEstimatesBy(merged: DataFrame, groupCols: Seq[String],
                     terms: DataFrame, termCol: String): DataFrame = {
    graft.plans.GraftFunctions.register(terms.sparkSession)
    val carry = terms.columns.filterNot(_ == termCol)
    val pairs = (0 until CmsD)
      .map(j => s"$j, ${cmsSlotSpark(j, termCol)}").mkString(", ")
    terms.selectExpr((terms.columns :+ s"stack($CmsD, $pairs) AS (sk_row, sk_slot)"): _*)
      .join(broadcast(merged), (groupCols :+ "sk_row" :+ "sk_slot").toSeq, "left")
      .na.fill(0L, Seq("cnt"))
      .groupBy(termCol, carry: _*)
      .agg(min(col("cnt")).cast("bigint").as("cms_est"))
  }
}
