package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.operators.Profiling

/** Profiling/quality-scan queries over the test tables, mirroring the
  * reference's quality engine (null_analysis.sql, column_stats.sql,
  * duplicate_detection.sql, approximate_duplicates.sql) as single-scan wide
  * aggregates with DuckDB oracle twins.
  */
object Profile {
  type Q = (SparkSession, String) => DataFrame

  private val liCols = Seq("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
    "l_quantity", "l_extendedprice", "l_discount", "l_tax",
    "l_returnflag", "l_linestatus", "l_shipdate")

  def lineitemNulls(spark: SparkSession, dir: String): DataFrame =
    Profiling.nullAnalysis(Tables.lineitem(spark, dir), liCols)

  def lineitemStats(spark: SparkSession, dir: String): DataFrame =
    Profiling.columnStats(
      Tables.lineitem(spark, dir)
        .withColumn("l_shipdate", to_date(col("l_shipdate"))),
      numericCols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax"),
      stringCols = Seq("l_returnflag", "l_linestatus"),
      keyCols = Seq("l_orderkey", "l_partkey", "l_suppkey"))

  def eventsDupKeys(spark: SparkSession, dir: String): DataFrame =
    Profiling.duplicateKeys(Tables.events(spark, dir), Seq("user_id", "event_type"), 50)

  def eventsValueHistogram(spark: SparkSession, dir: String): DataFrame =
    Profiling.histogram(Tables.events(spark, dir), "value", 10.0)

  def ordersApproxDups(spark: SparkSession, dir: String): DataFrame =
    Profiling.approxDuplicateCount(
      Tables.orders(spark, dir).select("o_orderkey", "o_custkey", "o_orderstatus"))

  /** Value-type distribution with global-percentage window
    * (reference type_distribution.sql:4 `SUM(COUNT(*)) OVER ()`). */
  def eventsTypeDist(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    Tables.events(spark, dir)
      .groupBy("event_type").agg(count(lit(1)).as("cnt"))
      .withColumn("pct",
        col("cnt").cast("double") / sum("cnt").over(Window.partitionBy()))
  }

  /** Single-pass unpivot coercion analysis (reference: UNPIVOT melt,
    * tools/ingestion.py:378-383 + safe_type_coercion.sql): stack string-cast
    * columns into (column_name, value) rows, then one grouped castability
    * profile. */
  def partUnpivotCoercion(spark: SparkSession, dir: String): DataFrame =
    Tables.part(spark, dir)
      .selectExpr(
        """stack(3,
          |  'p_size', cast(p_size as string),
          |  'p_retailprice', cast(cast(p_retailprice as decimal(12,2)) as string),
          |  'p_brand', p_brand) as (column_name, value)""".stripMargin)
      .groupBy("column_name")
      .agg(
        count(col("value")).as("non_null"),
        // integer evidence via regex: DuckDB TRY_CAST rounds '1.5'::BIGINT
        // while Spark nulls it — a literal digit pattern is engine-neutral
        count(when(expr("value rlike '^-?[0-9]+$'"), lit(1))).as("castable_long"),
        count(expr("try_cast(value as double)")).as("castable_double"),
        count(expr("try_cast(value as date)")).as("castable_date"))

  /** Min/max decimal precision per numeric column (reference
    * tools/cleaning.py:779-824 `LENGTH(SPLIT_PART(CAST(c AS VARCHAR),'.',2))`
    * — the profile that sizes a DECIMAL target type for a column). Values are
    * rendered through DECIMAL casts (bitwise-identical strings in both
    * engines, unlike raw double->string), trailing zeros stripped so the
    * measured precision is the significant one. Single-pass wide agg. */
  def eventsDecimalPrecision(spark: SparkSession, dir: String): DataFrame = {
    def prec(rendered: String): org.apache.spark.sql.Column = {
      val stripped = expr(s"regexp_replace($rendered, '0+$$', '')")
      // NULL inputs must stay NULL (so MIN/MAX skip them, matching the
      // oracle's NULL semantics) — a bare when().otherwise(0) would map a
      // NULL condition to precision 0 and drag min_prec down.
      when(expr(rendered).isNull, lit(null).cast("int"))
        .when(stripped.contains("."),
          length(expr(s"substring_index(regexp_replace($rendered, '0+$$', ''), '.', -1)")))
        .otherwise(lit(0))
    }
    Tables.events(spark, dir)
      .withColumn("p2", prec("cast(cast(value as decimal(18,2)) as string)"))
      .withColumn("p4", prec(
        "cast(cast(cast(value as decimal(18,2)) * cast(value as decimal(18,2)) as decimal(22,4)) as string)"))
      .groupBy("event_type")
      .agg(
        min(col("p2")).as("min_prec_value"), max(col("p2")).as("max_prec_value"),
        min(col("p4")).as("min_prec_sq"), max(col("p4")).as("max_prec_sq"))
  }

  /** Number potential after stripping currency/percent/thousands markers
    * (reference sql/profiling/number_potential.sql:2: TRY_CAST of
    * regexp_replace(c, '[$%,]', '')). The dirty strings are derived
    * deterministically from orders so both engines profile identical input:
    * 1/4 '$'-prefixed, 1/4 '%'-suffixed, 1/4 comma-grouped, 1/4 plain
    * status letters (never numeric). */
  def ordersNumberPotential(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .withColumn("rendered", expr("cast(cast(o_totalprice as decimal(12,2)) as string)"))
      .withColumn("v", expr(
        """CASE cast(o_orderkey % 4 as int)
          |  WHEN 0 THEN concat('$', rendered)
          |  WHEN 1 THEN concat(rendered, '%')
          |  WHEN 2 THEN concat(',', rendered)
          |  ELSE o_orderstatus END""".stripMargin))
      .agg(
        count(col("v")).as("non_null"),
        count(expr("try_cast(v as double)")).as("directly_numeric"),
        count(expr("try_cast(regexp_replace(v, '[$%,]', '') as double)"))
          .as("number_potential"))

  /** Schema diff as data (reference compare_schemas.sql full-outer join). */
  def schemaCompare(spark: SparkSession, dir: String): DataFrame =
    graft.operators.SchemaOps.compareSchemas(spark,
      Tables.orders(spark, dir), Tables.lineitem(spark, dir))

  /** Deterministic row sampling (reference sample_rows.sql LIMIT cap):
    * total-ordered limit so the sample is stable across engines. */
  def lineitemSample(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
        col("l_quantity"))
      .orderBy(col("l_orderkey").asc, col("l_linenumber").asc)
      .limit(100)

  /** Join-key skew diagnostic — the pre-flight report behind the salted-join
    * operators ([[graft.operators.Scale.saltedJoin]]): per-key counts, the
    * top heavy hitters with their row share, and a recommended salt factor
    * (ceil(share × default parallelism), floored at 1 — the number of
    * sub-keys that levels the heaviest reducer). One hash aggregate + a
    * 10-row top-k; the two-row totals frame rides a broadcast. At 100 TB
    * this is the cheap scan you run BEFORE a shuffle join, not after it
    * straggles. */
  def skewReport(spark: SparkSession, dir: String): DataFrame = {
    val counts = Tables.lineitem(spark, dir)
      .groupBy(col("l_suppkey").as("key"))
      .agg(count(lit(1)).as("cnt"))
    val tot = counts.agg(sum(col("cnt")).as("total_rows"), count(lit(1)).as("n_keys"))
    counts.orderBy(col("cnt").desc, col("key").asc).limit(10)
      .crossJoin(broadcast(tot))
      .withColumn("share", col("cnt").cast("double") / col("total_rows"))
      .withColumn("rec_salt",
        greatest(lit(1L), ceil(col("share") * lit(32.0))))
  }

  /** Incremental profiling round trip: 32 synthetic ingest shards each
    * contribute one mergeable partial ([[Profiling.statsPartials]]), and the
    * merge ([[Profiling.mergeStatsPartials]]) must land bit-for-bit on the
    * oracle's DIRECT single-scan profile — the no-rescan maintenance story
    * for a 100 TB lake, legal only because every partial field is exactly
    * associative (decimal sums, not float). */
  def lineitemIncrementalStats(spark: SparkSession, dir: String): DataFrame = {
    val cols = Seq("l_quantity", "l_extendedprice")
    Profiling.mergeStatsPartials(
      Profiling.statsPartials(
        Tables.lineitem(spark, dir).withColumn("shard", pmod(col("l_orderkey"), lit(32L))),
        "shard", cols),
      cols)
  }

  /** Mergeable histogram-quantile sketch over events.value: 16 shard
    * partials ([[Profiling.histogramPartials]], 64 bins of width 8 over
    * [0, 512) — the telemetry domain is known a priori) merged into
    * interpolated p25/p50/p75/p95 WITHOUT rescanning ([[Profiling
    * .mergeHistogramQuantiles]]). The oracle computes the identical grid
    * arithmetic from one direct scan — legal because integer bin counts
    * merge exactly, the property native sketches (t-digest/KLL) don't have. */
  def eventsQuantileSketch(spark: SparkSession, dir: String): DataFrame =
    Profiling.mergeHistogramQuantiles(
      Profiling.histogramPartials(
        Tables.events(spark, dir).withColumn("shard", pmod(col("user_id"), lit(16L))),
        "shard", "value", lo = 0.0, width = 8.0, nBins = 64),
      Seq(0.25, 0.5, 0.75, 0.95), lo = 0.0, width = 8.0)

  /** Mergeable HLL distinct-user sketch over events: 16 shard partials
    * merged by register-MAX into the raw HyperLogLog estimate — the
    * approximate-distinct profiling path made oracle-checkable (portable
    * hash, integer ranks, dyadic power sums; Spark's own
    * approx_count_distinct sketch buffer could never be compared bitwise). */
  def eventsHllDistinct(spark: SparkSession, dir: String): DataFrame =
    Profiling.mergeHllDistinct(
      Profiling.hllPartials(
        Tables.events(spark, dir).withColumn("shard", pmod(col("event_id"), lit(16L))),
        "shard", "user_id"))

  /** Per-dimension HLL: distinct users per event type from grouped register
    * sets — the dimension profile (DAU per surface, docs per domain) that
    * stays mergeable and one-scan however many groups exist. */
  def eventsHllByType(spark: SparkSession, dir: String): DataFrame =
    Profiling.mergeHllDistinctBy(
      Profiling.hllPartialsBy(
        Tables.events(spark, dir).withColumn("shard", pmod(col("event_id"), lit(16L))),
        "shard", Seq("event_type"), "user_id"),
      Seq("event_type"))
      .orderBy("event_type")

  /** HLL set algebra: distinct clickers, viewers, their union by register
    * MAX, and the click∩view audience by inclusion-exclusion — answered
    * entirely from the two cohorts' register partials, no join over raw
    * events. */
  def eventsHllOverlap(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .withColumn("shard", pmod(col("event_id"), lit(16L)))
    // ONE corpus pass (r17): both cohorts' register partials come from a
    // single grouped-partials aggregate, lazily checkpointed — hllOverlap
    // reads each cohort twice (its estimate + the union sketch), so the
    // former per-cohort builders re-scanned events FOUR times (guide §6).
    // Row-identical: grouping by event_type on the two-type filter equals
    // filtering per type, and the register/rank arithmetic is shared.
    val parts = Profiling.hllPartialsBy(
        ev.filter(col("event_type").isin("click", "view")),
        "shard", Seq("event_type"), "user_id")
      .localCheckpoint(false)
    def partials(t: String) =
      parts.filter(col("event_type") === t).drop("event_type")
    Profiling.hllOverlap(partials("click"), partials("view"))
  }

  /** Mergeable Count-Min frequency sketch over the document token stream:
    * 16 shard partials fold by counter-SUM into the global sketch, which is
    * then point-queried for the top-20 true heavy hitters — output is
    * (term, true_cnt, cms_est), every value an integer, cms_est >= true_cnt
    * by construction. The oracle builds the identical sketch from ONE direct
    * scan; direct == merged exactly because counter addition is associative
    * — the frequency leg of the mergeable-sketch trio (HLL distinct,
    * histogram quantiles, CMS frequencies). */
  def documentsCmsTopTerms(spark: SparkSession, dir: String): DataFrame = {
    graft.plans.GraftFunctions.register(spark)
    val toks = graft.operators.Scale.fanOutScan(Tables.documents(spark, dir))
      .select(pmod(col("doc_id"), lit(16L)).as("shard"),
        explode(expr("graft_tokens(text)")).as("term"))
    val truth = toks.groupBy("term")
      .agg(count(lit(1)).cast("bigint").as("true_cnt"))
      .orderBy(col("true_cnt").desc, col("term").asc)
      .limit(20)
    val merged = Profiling.mergeCms(Profiling.cmsPartials(toks, "shard", "term"))
    Profiling.cmsEstimates(merged, truth, "term")
      .orderBy(col("true_cnt").desc, col("term").asc)
  }

  /** Per-source CMS: the global top-10 terms' frequency, per source, from
    * one grouped sketch — the dimension-scoped frequency profile (which
    * corpus slice is this term's mass coming from?) answered without a
    * per-source rescan; a (source, term) pair the source never saw
    * estimates 0 via the absent-counter rule. */
  def documentsCmsBySource(spark: SparkSession, dir: String): DataFrame = {
    graft.plans.GraftFunctions.register(spark)
    val toks = graft.operators.Scale.fanOutScan(Tables.documents(spark, dir))
      .select(col("source"), pmod(col("doc_id"), lit(16L)).as("shard"),
        explode(expr("graft_tokens(text)")).as("term"))
    // TWO corpus passes, not four (r17, guide §6): the truth table is the
    // finest aggregate, so the top-10 terms RE-AGGREGATE it (integer sums —
    // global counts exactly) and the source axis is its distinct — before,
    // top10 and the grid's source-distinct each re-ran the corpus
    // tokenize+explode. Checkpointed lazily: truth feeds three consumers.
    val truth = toks.groupBy("source", "term")
      .agg(count(lit(1)).cast("bigint").as("true_cnt"))
      .localCheckpoint(false)
    val top10 = truth.groupBy("term").agg(sum(col("true_cnt")).as("cnt"))
      .orderBy(col("cnt").desc, col("term").asc).limit(10).select("term")
    val grid = truth.select("source").distinct().crossJoin(top10)
    val terms = grid.join(truth, Seq("source", "term"), "left")
      .na.fill(0L, Seq("true_cnt"))
    val merged = Profiling.mergeCmsBy(
      Profiling.cmsPartialsBy(toks, "shard", Seq("source"), "term"), Seq("source"))
    Profiling.cmsEstimatesBy(merged, Seq("source"), terms, "term")
      .orderBy("source", "term")
  }

  /** The [[Profiling.profileAll]] one-scan mixture, merged end to end: ONE
    * events scan emits all four sketch families' partials (stats + histogram
    * grid + HLL registers + CMS counters — separately they'd cost four
    * scans, the difference at 100 TB), then each family folds through its
    * standard merge and the gate hash-checks the lot against direct
    * single-scan SQL twins: per-type CMS estimates x global stats, grid
    * quantiles, and the HLL distinct estimate. */
  def eventsOneScanProfile(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables.events(spark, dir)
      .withColumn("shard", pmod(col("event_id"), lit(16L)))
    val p = Profiling.profileAll(ev, "shard", Seq("value"),
      histCol = "value", lo = 0.0, width = 8.0, nBins = 64,
      hllCol = "user_id", cmsTermCol = "event_type")
    val stats = Profiling.mergeStatsPartials(p.stats, Seq("value"))
    val quant = Profiling.mergeHistogramQuantiles(
      p.hist, Seq(0.25, 0.5, 0.75, 0.95), lo = 0.0, width = 8.0)
      .withColumnRenamed("n_rows", "hist_n_rows")
    val hll = Profiling.mergeHllDistinct(p.hll)
    val terms = Seq("click", "error", "purchase", "signup", "view").toDF("event_type")
    Profiling.cmsEstimates(Profiling.mergeCms(p.cms), terms, "event_type")
      .crossJoin(broadcast(stats)).crossJoin(broadcast(quant)).crossJoin(broadcast(hll))
      .orderBy("event_type")
  }

  /** Per-dimension histogram-quantile sketch: value quantiles PER EVENT TYPE
    * from grouped mergeable bin grids — the per-endpoint-latency shape, kept
    * one-scan and mergeable however many groups exist (the quantile leg of
    * the grouped-sketch trio with [[eventsHllByType]] and
    * [[documentsCmsBySource]]). */
  def eventsQuantilesByType(spark: SparkSession, dir: String): DataFrame =
    Profiling.mergeHistogramQuantilesBy(
      Profiling.histogramPartialsBy(
        Tables.events(spark, dir).withColumn("shard", pmod(col("user_id"), lit(16L))),
        "shard", Seq("event_type"), "value", lo = 0.0, width = 8.0, nBins = 64),
      Seq("event_type"), Seq(0.25, 0.5, 0.75, 0.95), lo = 0.0, width = 8.0)
      .orderBy("event_type")

  /** Constraint audit over the orders/lineitem/customer star
    * ([[graft.operators.Constraints]]): uniqueness, referential integrity,
    * accepted values, and ranges in one report — a mix of rules the clean
    * corpus passes and deliberately-tight rules it fails (status in (O,F)
    * flags the P rows; totalprice capped at 100k flags the long tail), so
    * the gate pins nonzero violation arithmetic, not just all-zeros. */
  def constraintAudit(spark: SparkSession, dir: String): DataFrame = {
    import graft.operators.Constraints._
    val o = Tables.orders(spark, dir)
    val c = Tables.customer(spark, dir)
    val li = Tables.lineitem(spark, dir)
    val ordersAudit = graft.operators.Constraints.audit(o, Seq(
      NotNull("o_custkey"),
      Unique(Seq("o_orderkey")),
      AcceptedValues("o_orderstatus", Seq("O", "F")),
      AcceptedValues("o_orderpriority",
        Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")),
      InRange("o_totalprice", 0.0, 100000.0),
      ForeignKey(Seq("o_custkey"), c, Seq("c_custkey"), "customer")))
    val liAudit = graft.operators.Constraints.audit(li, Seq(
      Unique(Seq("l_orderkey", "l_linenumber")),
      InRange("l_quantity", 1.0, 50.0),
      ForeignKey(Seq("l_orderkey"), o, Seq("o_orderkey"), "orders")))
    ordersAudit.unionByName(liAudit).orderBy("rule_type", "target")
  }

  /** Distribution drift between the even- and odd-event halves of the corpus
    * ([[Profiling.histogramDrift]]): both sides' histogram partials fold to
    * merged grids and the drift report (per-bin shares, integer log2-ratio
    * drift bits, exact-decimal total-variation distance) comes entirely from
    * sketch state — the between-snapshot drift monitor with no rescan. */
  def eventsHistogramDrift(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .withColumn("shard", pmod(col("user_id"), lit(16L)))
    def partials(side: Int) =
      Profiling.histogramPartials(ev.filter(pmod(col("event_id"), lit(2L)) === side),
        "shard", "value", lo = 0.0, width = 8.0, nBins = 64)
    Profiling.histogramDrift(partials(0), partials(1)).orderBy("bin")
  }

  val queries: Map[String, Q] = Map(
    "profile_skew_report"       -> (skewReport _),
    "profile_histogram_drift"   -> (eventsHistogramDrift _),
    "dq_constraint_audit"       -> (constraintAudit _),
    "profile_quantile_by_group" -> (eventsQuantilesByType _),
    "profile_one_scan"          -> (eventsOneScanProfile _),
    "profile_cms_by_group"      -> (documentsCmsBySource _),
    "profile_cms_topk"          -> (documentsCmsTopTerms _),
    "profile_hll_overlap"       -> (eventsHllOverlap _),
    "profile_hll_by_group"      -> (eventsHllByType _),
    "profile_hll_distinct"      -> (eventsHllDistinct _),
    "profile_quantile_sketch"   -> (eventsQuantileSketch _),
    "profile_incremental_stats" -> (lineitemIncrementalStats _),
    "profile_lineitem_nulls"    -> (lineitemNulls _),
    "profile_lineitem_stats"    -> (lineitemStats _),
    "profile_events_dup_keys"   -> (eventsDupKeys _),
    "profile_events_histogram"  -> (eventsValueHistogram _),
    "profile_orders_approx_dups" -> (ordersApproxDups _),
    "profile_events_type_dist"  -> (eventsTypeDist _),
    "profile_unpivot_coercion"  -> (partUnpivotCoercion _),
    "profile_schema_compare"    -> (schemaCompare _),
    "profile_lineitem_sample"   -> (lineitemSample _),
    "profile_decimal_precision" -> (eventsDecimalPrecision _),
    "profile_number_potential"  -> (ordersNumberPotential _))

  val oracle: Map[String, String] = Map(
    "profile_skew_report" ->
      """WITH c AS (SELECT l_suppkey AS key, COUNT(*) AS cnt FROM lineitem GROUP BY 1),
        |t AS (SELECT CAST(SUM(cnt) AS BIGINT) AS total_rows, COUNT(*) AS n_keys FROM c)
        |SELECT c.key, c.cnt, t.total_rows, t.n_keys,
        |  CAST(c.cnt AS DOUBLE) / t.total_rows AS share,
        |  GREATEST(1, CAST(CEIL(CAST(c.cnt AS DOUBLE) / t.total_rows * 32.0) AS BIGINT)) AS rec_salt
        |FROM c, t ORDER BY c.cnt DESC, c.key LIMIT 10""".stripMargin,
    // grouped twin: one counter grid per source, identical hash arithmetic,
    // absent (source, term) pairs estimate 0 via the missing-counter rule
    "profile_cms_by_group" -> {
      import graft.functions.Portable
      val toksD = Portable.tokensDuck("text")
      def slot(term: String) = Portable.hllScrambleDuck(
        Portable.phashDuck(s"('cms' || CAST(j AS VARCHAR) || '-' || $term)")) +
        s" % ${Profiling.CmsW}"
      s"""WITH tok AS (SELECT source, unnest($toksD) AS term FROM documents),
         |top10 AS (SELECT term FROM (SELECT term, COUNT(*) AS c FROM tok
         |  GROUP BY term ORDER BY c DESC, term ASC LIMIT 10)),
         |grid AS (SELECT source, term FROM (SELECT DISTINCT source FROM tok), top10),
         |truth AS (SELECT source, term, CAST(COUNT(*) AS BIGINT) AS cnt
         |  FROM tok GROUP BY source, term),
         |sk AS (SELECT source, j AS sk_row, ${slot("term")} AS sk_slot,
         |    CAST(COUNT(*) AS BIGINT) AS cnt
         |  FROM tok, range(${Profiling.CmsD}) r(j) GROUP BY 1, 2, 3),
         |q AS (SELECT g.source, g.term, COALESCE(t.cnt, 0) AS true_cnt,
         |    r.j AS sk_row, ${slot("g.term")} AS sk_slot
         |  FROM grid g LEFT JOIN truth t ON t.source = g.source AND t.term = g.term,
         |    range(${Profiling.CmsD}) r(j))
         |SELECT q.term, q.source, CAST(q.true_cnt AS BIGINT) AS true_cnt,
         |  CAST(MIN(COALESCE(sk.cnt, 0)) AS BIGINT) AS cms_est
         |FROM q LEFT JOIN sk ON sk.source = q.source AND sk.sk_row = q.sk_row
         |  AND sk.sk_slot = q.sk_slot
         |GROUP BY q.term, q.source, q.true_cnt
         |ORDER BY q.source, q.term""".stripMargin
    },
    // direct-scan twin of the drift report: same grids, same BIGINT cross
    // products, same floor-log2 bit widths, same exact-decimal TVD sum with
    // one final double division (denominator multiplied in the same order)
    "profile_histogram_drift" -> {
      def binCte(name: String, side: Int) =
        s"""$name AS (SELECT CAST(least(greatest(floor((value - CAST(0 AS DOUBLE)) / CAST(8 AS DOUBLE)),
           |  CAST(0 AS DOUBLE)), CAST(63 AS DOUBLE)) AS BIGINT) AS bin
           |  FROM events WHERE value IS NOT NULL AND event_id % 2 = $side)""".stripMargin
      s"""WITH ${binCte("ba", 0)},
         |${binCte("bb", 1)},
         |a AS (SELECT bin, CAST(COUNT(*) AS BIGINT) AS cnt_a FROM ba GROUP BY bin),
         |b AS (SELECT bin, CAST(COUNT(*) AS BIGINT) AS cnt_b FROM bb GROUP BY bin),
         |j AS (SELECT COALESCE(a.bin, b.bin) AS bin, COALESCE(cnt_a, 0) AS cnt_a,
         |  COALESCE(cnt_b, 0) AS cnt_b FROM a FULL OUTER JOIN b ON a.bin = b.bin),
         |tt AS (SELECT CAST(SUM(cnt_a) AS BIGINT) AS tot_a,
         |  CAST(SUM(cnt_b) AS BIGINT) AS tot_b FROM j),
         |e AS (SELECT j.bin, j.cnt_a, j.cnt_b,
         |  j.cnt_a * tt.tot_b AS xab, j.cnt_b * tt.tot_a AS xba,
         |  CAST(j.cnt_a AS DOUBLE) / CAST(tt.tot_a AS DOUBLE) AS share_a,
         |  CAST(j.cnt_b AS DOUBLE) / CAST(tt.tot_b AS DOUBLE) AS share_b,
         |  tt.tot_a, tt.tot_b FROM j, tt),
         |d AS (SELECT e.*, CASE WHEN cnt_a > 0 AND cnt_b > 0 THEN
         |  CAST(length(printf('%b', GREATEST(xab // xba, 1)))
         |    - length(printf('%b', GREATEST(xba // xab, 1))) AS BIGINT) END AS drift_bits FROM e),
         |tv AS (SELECT CAST(SUM(CAST(ABS(xab - xba) AS DECIMAL(38,0))) AS DOUBLE)
         |  / ((CAST(2 AS DOUBLE) * CAST(MAX(tot_a) AS DOUBLE)) * CAST(MAX(tot_b) AS DOUBLE)) AS tvd
         |  FROM d)
         |SELECT d.bin, d.cnt_a, d.cnt_b, d.share_a, d.share_b, d.drift_bits, tv.tvd
         |FROM d, tv ORDER BY d.bin""".stripMargin
    },
    // per-rule direct SQL twins of the constraint audit, UNIONed into the
    // same (rule_type, target, violations) report shape
    "dq_constraint_audit" ->
      s"""WITH r AS (
         |SELECT 'not_null' AS rule_type, 'o_custkey' AS target,
         |  CAST(COUNT(*) FILTER (WHERE o_custkey IS NULL) AS BIGINT) AS violations FROM orders
         |UNION ALL SELECT 'accepted_values', 'o_orderstatus',
         |  CAST(COUNT(*) FILTER (WHERE o_orderstatus IS NOT NULL
         |    AND o_orderstatus NOT IN ('O', 'F')) AS BIGINT) FROM orders
         |UNION ALL SELECT 'accepted_values', 'o_orderpriority',
         |  CAST(COUNT(*) FILTER (WHERE o_orderpriority IS NOT NULL AND o_orderpriority
         |    NOT IN ('1-URGENT', '2-HIGH', '3-MEDIUM', '4-NOT SPECIFIED', '5-LOW')) AS BIGINT) FROM orders
         |UNION ALL SELECT 'in_range', 'o_totalprice',
         |  CAST(COUNT(*) FILTER (WHERE o_totalprice IS NOT NULL
         |    AND (o_totalprice < CAST(0 AS DOUBLE) OR o_totalprice > CAST(100000 AS DOUBLE))) AS BIGINT) FROM orders
         |UNION ALL SELECT 'unique', 'o_orderkey',
         |  CAST(COALESCE((SELECT SUM(c - 1) FROM (SELECT COUNT(*) AS c FROM orders
         |    WHERE o_orderkey IS NOT NULL
         |    GROUP BY o_orderkey HAVING COUNT(*) > 1)), 0) AS BIGINT)
         |UNION ALL SELECT 'foreign_key', 'o_custkey->customer(c_custkey)',
         |  CAST((SELECT COUNT(*) FROM orders o WHERE o.o_custkey IS NOT NULL
         |    AND NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)) AS BIGINT)
         |UNION ALL SELECT 'in_range', 'l_quantity',
         |  CAST(COUNT(*) FILTER (WHERE l_quantity IS NOT NULL
         |    AND (l_quantity < CAST(1 AS DOUBLE) OR l_quantity > CAST(50 AS DOUBLE))) AS BIGINT) FROM lineitem
         |UNION ALL SELECT 'unique', 'l_orderkey,l_linenumber',
         |  CAST(COALESCE((SELECT SUM(c - 1) FROM (SELECT COUNT(*) AS c FROM lineitem
         |    WHERE l_orderkey IS NOT NULL AND l_linenumber IS NOT NULL
         |    GROUP BY l_orderkey, l_linenumber HAVING COUNT(*) > 1)), 0) AS BIGINT)
         |UNION ALL SELECT 'foreign_key', 'l_orderkey->orders(o_orderkey)',
         |  CAST((SELECT COUNT(*) FROM lineitem l WHERE l.l_orderkey IS NOT NULL
         |    AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)) AS BIGINT)
         |) SELECT * FROM r ORDER BY rule_type, target""".stripMargin,
    // grouped twin of the quantile sketch: identical grid arithmetic with
    // event_type carried through every stage — one bin grid per group
    "profile_quantile_by_group" -> {
      def estCte(q: String, name: String) =
        s"""e_$name AS (SELECT g, (CAST(0 AS DOUBLE) + CAST(8 AS DOUBLE) * bin
           |    + CAST(8 AS DOUBLE) * ((target - cum_before) / cnt)) AS $name
           |  FROM (SELECT c.*, CAST(CEIL(CAST($q AS DOUBLE) * c.n_rows) AS BIGINT) AS target FROM c)
           |  WHERE cum_before < target AND target <= cum_before + cnt)""".stripMargin
      s"""WITH b AS (SELECT event_type AS g,
         |  CAST(least(greatest(floor((value - CAST(0 AS DOUBLE)) / CAST(8 AS DOUBLE)),
         |  CAST(0 AS DOUBLE)), CAST(63 AS DOUBLE)) AS BIGINT) AS bin FROM events
         |  WHERE value IS NOT NULL),
         |m AS (SELECT g, bin, CAST(COUNT(*) AS BIGINT) AS cnt FROM b GROUP BY g, bin),
         |n AS (SELECT g, CAST(SUM(cnt) AS BIGINT) AS n_rows FROM m GROUP BY g),
         |c AS (SELECT m.g, m.bin, m.cnt, CAST(COALESCE(SUM(m.cnt) OVER (PARTITION BY m.g
         |    ORDER BY m.bin ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cum_before,
         |  n.n_rows
         |  FROM m JOIN n USING (g)),
         |${estCte("0.25", "est_p25")},
         |${estCte("0.5", "est_p50")},
         |${estCte("0.75", "est_p75")},
         |${estCte("0.95", "est_p95")}
         |SELECT n.g AS event_type, n.n_rows, est_p25, est_p50, est_p75, est_p95
         |FROM n JOIN e_est_p25 USING (g) JOIN e_est_p50 USING (g)
         |JOIN e_est_p75 USING (g) JOIN e_est_p95 USING (g)
         |ORDER BY event_type""".stripMargin
    },
    // direct-scan twins of ALL FOUR families the one-scan mixture emits:
    // stats aggregate, grid-quantile arithmetic, HLL estimator, CMS
    // point-queries over event_type — each identical to its standalone
    // gate's oracle, composed; direct == one-scan-merged exactly because
    // every family's merge is associative (decimal sums, integer bin/counter
    // sums, register MAX)
    "profile_one_scan" -> {
      import graft.functions.Portable
      val hr = Portable.hllScrambleDuck(
        Portable.phashDuck("('hll-' || CAST(user_id AS VARCHAR))"))
      val hk = Portable.hllScrambleDuck(
        Portable.phashDuck("('hllr-' || CAST(user_id AS VARCHAR))"))
      def slot(term: String) = Portable.hllScrambleDuck(
        Portable.phashDuck(s"('cms' || CAST(j AS VARCHAR) || '-' || $term)")) +
        s" % ${Profiling.CmsW}"
      def estCte(q: String, name: String) =
        s"""e_$name AS (SELECT (CAST(0 AS DOUBLE) + CAST(8 AS DOUBLE) * bin
           |    + CAST(8 AS DOUBLE) * ((target - cum_before) / cnt)) AS $name
           |  FROM (SELECT c.*, CAST(CEIL(CAST($q AS DOUBLE) * n.hist_n_rows) AS BIGINT) AS target FROM c, n)
           |  WHERE cum_before < target AND target <= cum_before + cnt)""".stripMargin
      s"""WITH s AS (SELECT CAST(COUNT(*) AS BIGINT) AS total_rows,
         |  CAST(COUNT(value) AS BIGINT) AS nn_value,
         |  MIN(value) AS min_value, MAX(value) AS max_value,
         |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
         |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / COUNT(value) AS avg_value
         |  FROM events),
         |b AS (SELECT CAST(least(greatest(floor((value - CAST(0 AS DOUBLE)) / CAST(8 AS DOUBLE)),
         |  CAST(0 AS DOUBLE)), CAST(63 AS DOUBLE)) AS BIGINT) AS bin FROM events
         |  WHERE value IS NOT NULL),
         |m AS (SELECT bin, CAST(COUNT(*) AS BIGINT) AS cnt FROM b GROUP BY bin),
         |c AS (SELECT bin, cnt, CAST(COALESCE(SUM(cnt) OVER (ORDER BY bin
         |  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cum_before FROM m),
         |n AS (SELECT CAST(SUM(cnt) AS BIGINT) AS hist_n_rows FROM m),
         |${estCte("0.25", "est_p25")},
         |${estCte("0.5", "est_p50")},
         |${estCte("0.75", "est_p75")},
         |${estCte("0.95", "est_p95")},
         |h AS (SELECT $hr AS hreg, $hk AS v FROM events WHERE user_id IS NOT NULL),
         |r AS (SELECT hreg % 256 AS reg, CASE WHEN v = 0 THEN 31
         |  ELSE 31 - length(printf('%b', v)) END AS rank FROM h),
         |regs AS (SELECT reg, CAST(MAX(rank) AS BIGINT) AS max_rank FROM r GROUP BY reg),
         |ha AS (SELECT CAST(COUNT(*) AS BIGINT) AS registers_hit,
         |  SUM(power(CAST(0.5 AS DOUBLE), CAST(max_rank AS DOUBLE))) AS hs FROM regs),
         |he AS (SELECT registers_hit,
         |  CAST(${Profiling.HllAlpha} AS DOUBLE) * 256 * 256
         |    / (hs + CAST(256 - registers_hit AS DOUBLE)) AS est_distinct FROM ha),
         |sk AS (SELECT j AS sk_row, ${slot("event_type")} AS sk_slot,
         |    CAST(COUNT(*) AS BIGINT) AS cnt
         |  FROM events, range(${Profiling.CmsD}) r(j)
         |  WHERE event_type IS NOT NULL GROUP BY 1, 2),
         |t AS (SELECT unnest(['click','error','purchase','signup','view']) AS event_type),
         |q AS (SELECT t.event_type, r.j AS sk_row, ${slot("t.event_type")} AS sk_slot
         |  FROM t, range(${Profiling.CmsD}) r(j)),
         |ce AS (SELECT q.event_type, CAST(MIN(COALESCE(sk.cnt, 0)) AS BIGINT) AS cms_est
         |  FROM q LEFT JOIN sk ON sk.sk_row = q.sk_row AND sk.sk_slot = q.sk_slot
         |  GROUP BY q.event_type)
         |SELECT ce.event_type, ce.cms_est, s.*, n.hist_n_rows,
         |  est_p25, est_p50, est_p75, est_p95, he.registers_hit, he.est_distinct
         |FROM ce, s, n, e_est_p25, e_est_p50, e_est_p75, e_est_p95, he
         |ORDER BY ce.event_type""".stripMargin
    },
    // direct-scan twin of the merged CMS sketch: same salted portable hashes
    // through the two-round scramble, same d x w grid, same min-of-counters
    // point query — direct == merged exactly because counters SUM
    "profile_cms_topk" -> {
      import graft.functions.Portable
      val toksD = Portable.tokensDuck("text")
      def slot(term: String) = Portable.hllScrambleDuck(
        Portable.phashDuck(s"('cms' || CAST(j AS VARCHAR) || '-' || $term)")) +
        s" % ${Profiling.CmsW}"
      s"""WITH tok AS (SELECT unnest($toksD) AS term FROM documents),
         |truth AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS true_cnt FROM tok
         |  GROUP BY term ORDER BY true_cnt DESC, term ASC LIMIT 20),
         |sk AS (SELECT j AS sk_row, ${slot("term")} AS sk_slot,
         |    CAST(COUNT(*) AS BIGINT) AS cnt
         |  FROM tok, range(${Profiling.CmsD}) r(j) GROUP BY 1, 2),
         |q AS (SELECT t.term, t.true_cnt, r.j AS sk_row, ${slot("t.term")} AS sk_slot
         |  FROM truth t, range(${Profiling.CmsD}) r(j))
         |SELECT q.term, q.true_cnt,
         |  CAST(MIN(COALESCE(sk.cnt, 0)) AS BIGINT) AS cms_est
         |FROM q LEFT JOIN sk ON sk.sk_row = q.sk_row AND sk.sk_slot = q.sk_slot
         |GROUP BY q.term, q.true_cnt
         |ORDER BY q.true_cnt DESC, q.term ASC""".stripMargin
    },
    // three direct-scan estimators (click / view / either): the union of the
    // Spark side's register partials sees exactly the rows of the IN-filter
    // scan, so register-MAX algebra == direct union scan, bitwise; the
    // intersection is plain double arithmetic on the three estimates
    "profile_hll_overlap" -> {
      import graft.functions.Portable
      val hr = Portable.hllScrambleDuck(
        Portable.phashDuck("('hll-' || CAST(user_id AS VARCHAR))"))
      val hk = Portable.hllScrambleDuck(
        Portable.phashDuck("('hllr-' || CAST(user_id AS VARCHAR))"))
      def estCte(tag: String, where: String) =
        s"""h_$tag AS (SELECT $hr AS hreg, $hk AS v FROM events
           |  WHERE user_id IS NOT NULL AND $where),
           |r_$tag AS (SELECT hreg % 256 AS reg, CASE WHEN v = 0 THEN 31
           |  ELSE 31 - length(printf('%b', v)) END AS rank FROM h_$tag),
           |g_$tag AS (SELECT reg, CAST(MAX(rank) AS BIGINT) AS max_rank
           |  FROM r_$tag GROUP BY reg),
           |a_$tag AS (SELECT CAST(COUNT(*) AS BIGINT) AS hit,
           |  SUM(power(CAST(0.5 AS DOUBLE), CAST(max_rank AS DOUBLE))) AS s
           |  FROM g_$tag),
           |e_$tag AS (SELECT CAST(${Profiling.HllAlpha} AS DOUBLE) * 256 * 256
           |    / (s + CAST(256 - hit AS DOUBLE)) AS est_$tag FROM a_$tag)""".stripMargin
      s"""WITH ${estCte("a", "event_type = 'click'")},
         |${estCte("b", "event_type = 'view'")},
         |${estCte("union", "event_type IN ('click', 'view')")}
         |SELECT est_a, est_b, est_union,
         |  est_a + est_b - est_union AS est_intersection
         |FROM e_a, e_b, e_union""".stripMargin
    },
    // grouped twin: identical hash/register/rank arithmetic with event_type
    // carried through — one register set per group
    "profile_hll_by_group" -> {
      import graft.functions.Portable
      val hr = Portable.hllScrambleDuck(
        Portable.phashDuck("('hll-' || CAST(user_id AS VARCHAR))"))
      val hk = Portable.hllScrambleDuck(
        Portable.phashDuck("('hllr-' || CAST(user_id AS VARCHAR))"))
      s"""WITH h AS (SELECT event_type, $hr AS hreg, $hk AS v FROM events
         |  WHERE user_id IS NOT NULL),
         |r AS (SELECT event_type, hreg % 256 AS reg, CASE WHEN v = 0 THEN 31
         |  ELSE 31 - length(printf('%b', v)) END AS rank FROM h),
         |regs AS (SELECT event_type, reg, CAST(MAX(rank) AS BIGINT) AS max_rank
         |  FROM r GROUP BY event_type, reg),
         |a AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS registers_hit,
         |  SUM(power(CAST(0.5 AS DOUBLE), CAST(max_rank AS DOUBLE))) AS s
         |  FROM regs GROUP BY event_type)
         |SELECT event_type, registers_hit,
         |  CAST(${Profiling.HllAlpha} AS DOUBLE) * 256 * 256
         |    / (s + CAST(256 - registers_hit AS DOUBLE)) AS est_distinct
         |FROM a ORDER BY event_type""".stripMargin
    },
    // direct-scan twin of the merged HLL sketch: same salted portable hash,
    // same 256 registers, same integer ranks, same dyadic power sum, same
    // alpha literal — the merge is register-MAX, so direct == merged exactly
    "profile_hll_distinct" -> {
      import graft.functions.Portable
      val hr = Portable.hllScrambleDuck(
        Portable.phashDuck("('hll-' || CAST(user_id AS VARCHAR))"))
      val hk = Portable.hllScrambleDuck(
        Portable.phashDuck("('hllr-' || CAST(user_id AS VARCHAR))"))
      s"""WITH h AS (SELECT $hr AS hreg, $hk AS v FROM events WHERE user_id IS NOT NULL),
         |r AS (SELECT hreg % 256 AS reg, CASE WHEN v = 0 THEN 31
         |  ELSE 31 - length(printf('%b', v)) END AS rank FROM h),
         |regs AS (SELECT reg, CAST(MAX(rank) AS BIGINT) AS max_rank FROM r GROUP BY reg),
         |a AS (SELECT CAST(COUNT(*) AS BIGINT) AS registers_hit,
         |  SUM(power(CAST(0.5 AS DOUBLE), CAST(max_rank AS DOUBLE))) AS s FROM regs)
         |SELECT registers_hit,
         |  CAST(${Profiling.HllAlpha} AS DOUBLE) * 256 * 256
         |    / (s + CAST(256 - registers_hit AS DOUBLE)) AS est_distinct
         |FROM a""".stripMargin
    },
    // direct-scan twin of the merged histogram sketch: same grid, same
    // integer ranks, same interpolation arithmetic (every numeric literal
    // CAST AS DOUBLE — a bare 0.95 is DECIMAL in both parsers and decimal
    // rank math can differ by one at exact multiples)
    "profile_quantile_sketch" -> {
      def estCte(q: String, name: String) =
        s"""e_$name AS (SELECT (CAST(0 AS DOUBLE) + CAST(8 AS DOUBLE) * bin
           |    + CAST(8 AS DOUBLE) * ((target - cum_before) / cnt)) AS $name
           |  FROM (SELECT c.*, CAST(CEIL(CAST($q AS DOUBLE) * n.n_rows) AS BIGINT) AS target FROM c, n)
           |  WHERE cum_before < target AND target <= cum_before + cnt)""".stripMargin
      s"""WITH v AS (SELECT value AS v FROM events WHERE value IS NOT NULL),
         |b AS (SELECT CAST(least(greatest(floor((v - CAST(0 AS DOUBLE)) / CAST(8 AS DOUBLE)),
         |  CAST(0 AS DOUBLE)), CAST(63 AS DOUBLE)) AS BIGINT) AS bin FROM v),
         |m AS (SELECT bin, CAST(COUNT(*) AS BIGINT) AS cnt FROM b GROUP BY bin),
         |c AS (SELECT bin, cnt, CAST(COALESCE(SUM(cnt) OVER (ORDER BY bin
         |  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cum_before FROM m),
         |n AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n_rows FROM m),
         |${estCte("0.25", "est_p25")},
         |${estCte("0.5", "est_p50")},
         |${estCte("0.75", "est_p75")},
         |${estCte("0.95", "est_p95")}
         |SELECT n.n_rows, est_p25, est_p50, est_p75, est_p95
         |FROM n, e_est_p25, e_est_p50, e_est_p75, e_est_p95""".stripMargin
    },
    // the DIRECT single-scan profile: the Spark side answers from 32 merged
    // shard partials instead, and must land on the identical bits
    "profile_incremental_stats" ->
      Seq("l_quantity", "l_extendedprice").map { c =>
        s"""COUNT($c) AS nn_$c, MIN($c) AS min_$c, MAX($c) AS max_$c,
           |  CAST(SUM(CAST($c AS DECIMAL(18,2))) AS DOUBLE) AS sum_$c,
           |  CAST(SUM(CAST($c AS DECIMAL(18,2))) AS DOUBLE) / COUNT($c) AS avg_$c""".stripMargin
      }.mkString("SELECT COUNT(*) AS total_rows,\n  ", ",\n  ", "\nFROM lineitem"),
    "profile_lineitem_nulls" ->
      ("SELECT COUNT(*) AS total_rows, " +
        liCols.map(c => s"COUNT($c) AS nn_$c").mkString(", ") +
        " FROM lineitem"),
    "profile_lineitem_stats" ->
      """SELECT COUNT(*) AS total_rows,
        |  MIN(l_quantity) AS min_l_quantity, MAX(l_quantity) AS max_l_quantity,
        |  MIN(l_extendedprice) AS min_l_extendedprice, MAX(l_extendedprice) AS max_l_extendedprice,
        |  MIN(l_discount) AS min_l_discount, MAX(l_discount) AS max_l_discount,
        |  MIN(l_tax) AS min_l_tax, MAX(l_tax) AS max_l_tax,
        |  MIN(l_returnflag) AS min_l_returnflag, MAX(l_returnflag) AS max_l_returnflag,
        |  MIN(l_linestatus) AS min_l_linestatus, MAX(l_linestatus) AS max_l_linestatus,
        |  COUNT(DISTINCT l_orderkey) AS ndv_l_orderkey,
        |  COUNT(DISTINCT l_partkey) AS ndv_l_partkey,
        |  COUNT(DISTINCT l_suppkey) AS ndv_l_suppkey
        |FROM (SELECT * REPLACE (CAST(l_shipdate AS DATE) AS l_shipdate) FROM lineitem)""".stripMargin,
    "profile_events_dup_keys" ->
      """SELECT user_id, event_type, COUNT(*) AS dup_count FROM events
        |GROUP BY user_id, event_type HAVING COUNT(*) > 1
        |ORDER BY dup_count DESC, user_id ASC, event_type ASC LIMIT 50""".stripMargin,
    "profile_events_histogram" ->
      """SELECT CAST(FLOOR(value / 10.0) AS BIGINT) AS bucket, COUNT(*) AS n,
        |  MIN(value) AS min_v, MAX(value) AS max_v
        |FROM events GROUP BY 1""".stripMargin,
    "profile_orders_approx_dups" ->
      """WITH t AS (SELECT md5(CAST(o_orderkey AS VARCHAR) || chr(1) ||
        |    CAST(o_custkey AS VARCHAR) || chr(1) || o_orderstatus) AS h FROM orders)
        |SELECT COUNT(*) AS total_rows, COUNT(DISTINCT h) AS distinct_rows,
        |  COUNT(*) - COUNT(DISTINCT h) AS duplicate_rows FROM t""".stripMargin,
    "profile_events_type_dist" ->
      """SELECT event_type, cnt, cnt::DOUBLE / SUM(cnt) OVER () AS pct FROM (
        |  SELECT event_type, COUNT(*) AS cnt FROM events GROUP BY event_type)""".stripMargin,
    "profile_unpivot_coercion" ->
      """WITH u AS (
        |  SELECT 'p_size' AS column_name, CAST(p_size AS VARCHAR) AS value FROM part
        |  UNION ALL
        |  SELECT 'p_retailprice', CAST(CAST(p_retailprice AS DECIMAL(12,2)) AS VARCHAR) FROM part
        |  UNION ALL
        |  SELECT 'p_brand', p_brand FROM part)
        |SELECT column_name, COUNT(value) AS non_null,
        |  COUNT(CASE WHEN regexp_full_match(value, '-?[0-9]+') THEN 1 END) AS castable_long,
        |  COUNT(TRY_CAST(value AS DOUBLE)) AS castable_double,
        |  COUNT(TRY_CAST(value AS DATE)) AS castable_date
        |FROM u GROUP BY column_name""".stripMargin,
    "profile_schema_compare" ->
      """WITH a AS (SELECT column_name, column_type AS type_a
        |    FROM (DESCRIBE SELECT * FROM orders)),
        |b AS (SELECT column_name, column_type AS type_b
        |    FROM (DESCRIBE SELECT * FROM lineitem))
        |SELECT COALESCE(a.column_name, b.column_name) AS column_name, type_a, type_b,
        |  CASE WHEN type_a IS NULL THEN 'added'
        |       WHEN type_b IS NULL THEN 'removed'
        |       WHEN type_a <> type_b THEN 'type_changed'
        |       ELSE 'unchanged' END AS change_type
        |FROM a FULL OUTER JOIN b ON a.column_name = b.column_name""".stripMargin,
    "profile_lineitem_sample" ->
      """SELECT l_orderkey, l_linenumber, l_partkey, l_quantity FROM lineitem
        |ORDER BY l_orderkey ASC, l_linenumber ASC LIMIT 100""".stripMargin,
    "profile_decimal_precision" ->
      """WITH r AS (SELECT event_type,
        |    regexp_replace(CAST(CAST(value AS DECIMAL(18,2)) AS VARCHAR), '0+$', '') AS s2,
        |    regexp_replace(CAST(CAST(CAST(value AS DECIMAL(18,2)) * CAST(value AS DECIMAL(18,2)) AS DECIMAL(22,4)) AS VARCHAR), '0+$', '') AS s4
        |  FROM events),
        |p AS (SELECT event_type,
        |    CAST(LENGTH(SPLIT_PART(s2, '.', 2)) AS INT) AS p2,
        |    CAST(LENGTH(SPLIT_PART(s4, '.', 2)) AS INT) AS p4
        |  FROM r)
        |SELECT event_type,
        |  MIN(p2) AS min_prec_value, MAX(p2) AS max_prec_value,
        |  MIN(p4) AS min_prec_sq, MAX(p4) AS max_prec_sq
        |FROM p GROUP BY event_type""".stripMargin,
    "profile_number_potential" ->
      """WITH d AS (SELECT
        |    CASE CAST(o_orderkey % 4 AS INT)
        |      WHEN 0 THEN '$' || CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS VARCHAR)
        |      WHEN 1 THEN CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS VARCHAR) || '%'
        |      WHEN 2 THEN ',' || CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS VARCHAR)
        |      ELSE o_orderstatus END AS v
        |  FROM orders)
        |SELECT COUNT(v) AS non_null,
        |  COUNT(TRY_CAST(v AS DOUBLE)) AS directly_numeric,
        |  COUNT(TRY_CAST(regexp_replace(v, '[$%,]', '', 'g') AS DOUBLE)) AS number_potential
        |FROM d""".stripMargin)
}
