package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Exact._
import graft.core.Tables

/** Gold-layer analytical queries — the Spark-native rebuild of the reference's
  * gold marts (reference: DEMO.md:73-87 `customer_metrics`, `product_performance`,
  * `daily_sales`; plus TPC-H-flavored scan/agg/star-join workloads over the driver
  * test tables).
  *
  * Scale notes (100 TB thinking):
  *  - dimension sides (region/nation/customer at TPC-H ratios, first-order dates)
  *    are broadcast — no shuffle of the fact table for them;
  *  - fact-side aggregations are plain hash aggregates with map-side partials;
  *  - top-k goes through `orderBy(...).limit(k)` which Spark plans as
  *    TakeOrderedAndProject (per-partition heaps, no full sort).
  */
object Gold {
  type Q = (SparkSession, String) => DataFrame

  /** TPC-H Q1-style pricing summary (scan → filter → wide hash agg). */
  def q1Agg(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    li.filter(col("l_shipdate") <= lit("1999-06-30").cast("date"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        dsum2(col("l_extendedprice"), lit(1.0) - col("l_discount")).as("sum_disc_price"),
        dsum3(col("l_extendedprice"), lit(1.0) - col("l_discount"),
          lit(1.0) + col("l_tax")).as("sum_charge"),
        davg(col("l_quantity")).as("avg_qty"),
        davg(col("l_extendedprice")).as("avg_price"),
        davg(col("l_discount")).as("avg_disc"),
        count(lit(1)).as("count_order"))
  }

  /** Per-day sales rollup with new-customer counts (reference DEMO.md:85-87).
    * First-order dates per customer are a small aggregate → broadcast back. */
  def dailySales(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
      .withColumn("order_date", to_date(col("o_orderdate")))
    val newCust = o.groupBy(col("o_custkey"))
      .agg(min(col("order_date")).as("order_date"))
      .groupBy(col("order_date"))
      .agg(count(lit(1)).as("new_customers"))
    val daily = o.groupBy(col("order_date"))
      .agg(
        count(lit(1)).as("n_orders"),
        dsum(col("o_totalprice")).as("revenue"),
        countDistinct(col("o_custkey")).as("n_customers"),
        davg(col("o_totalprice")).as("avg_order_value"))
    daily
      .join(broadcast(newCust), Seq("order_date"), "left")
      .withColumn("new_customers", coalesce(col("new_customers"), lit(0L)))
  }

  /** Incrementally-maintained daily sales — the summary-delta form of
    * [[dailySales]]: each ingest batch contributes one mergeable partial
    * per (order_date, o_custkey) — order count + exact DECIMAL revenue
    * ([[graft.core.Exact.dpartSum]]) — and every report metric derives from
    * the merged summary with NO rescan of ingested orders:
    *  - n_orders / revenue / avg_order_value: associative sums (decimal sums
    *    re-merge bit-identically to the direct scan);
    *  - n_customers: the summary rows of a day ARE its distinct customers;
    *  - new_customers: per-customer MIN(first day) is min-of-mins.
    * The summary is the view's true incremental state lower bound (exact
    * per-day distinct customers cannot be maintained with less), and it is
    * ~|distinct (day, customer)| — independent of how many batches landed.
    * At 100 TB this turns a nightly full-table gold rebuild into a
    * batch-sized partial + summary-sized merge. The gate derives the report
    * through the batch-partial algebra (one scan grouped by ingest batch);
    * `GoldIvmSpec` drives the same partials through real lake appends with
    * replay idempotence. Oracle = the full direct recompute: maintained
    * view == recomputed view, bitwise. */
  def dailySalesIncremental(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
      .withColumn("order_date", to_date(col("o_orderdate")))
    // per-batch mergeable partials (8 simulated ingest batches by order key)
    val partials = o
      .groupBy(col("order_date"), col("o_custkey"),
        pmod(col("o_orderkey"), lit(8L)).as("batch"))
      .agg(count(lit(1)).as("pn"), dpartSum(col("o_totalprice")).as("prev"))
    foldDailySummary(partials)
  }

  /** Fold daily-sales partials — any frame carrying (order_date, o_custkey,
    * pn, prev) rows from any batch split, in any mix of merge states — into
    * the final report. Shared by the gate (in-plan batch partials) and
    * `GoldIvmSpec` (partials re-read from real lake appends). */
  def foldDailySummary(partials: DataFrame,
                       retractions: Boolean = false): DataFrame = {
    val merged = partials.groupBy("order_date", "o_custkey")
      .agg(sum(col("pn")).as("n"), sum(col("prev")).as("rev"))
    // under retractions a fully-cancelled (day, customer) pair must VANISH —
    // it would otherwise still count toward n_customers and could hold a
    // customer's first-day minimum with zero live orders
    val summary = (if (retractions) merged.filter(col("n") > 0) else merged)
      .localCheckpoint(false) // two consumers below — compute the merge once
    val newCust = summary.groupBy(col("o_custkey"))
      .agg(min(col("order_date")).as("order_date"))
      .groupBy(col("order_date"))
      .agg(count(lit(1)).as("new_customers"))
    summary.groupBy(col("order_date"))
      .agg(
        sum(col("n")).as("n_orders"),
        sum(col("rev")).cast("double").as("revenue"),
        count(lit(1)).as("n_customers"),
        (sum(col("rev")).cast("double") / sum(col("n"))).as("avg_order_value"))
      .join(broadcast(newCust), Seq("order_date"), "left")
      .withColumn("new_customers", coalesce(col("new_customers"), lit(0L)))
  }

  /** Unsigned daily-sales partials of a full snapshot — the changefeed
    * consumer's BASE state ([[dailySalesCdc]]). */
  def dailyPartialsOf(snapshot: DataFrame): DataFrame =
    snapshot.withColumn("order_date", to_date(col("o_orderdate")))
      .groupBy("order_date", "o_custkey")
      .agg(count(lit(1)).as("pn"), dpartSum(col("o_totalprice")).as("prev"))

  /** SIGNED daily-sales partials from a lake changefeed
    * ([[graft.lake.PartitionedTable.readChanges]] rows over an orders
    * table): inserts contribute (+1, +price), deletes (-1, -price) — the
    * retraction algebra of the summary-delta view. Count and DECIMAL sum are
    * both exactly associative, so a row deleted and re-inserted by a
    * partition rewrite cancels bitwise, whatever batch boundaries the feed
    * arrives in. */
  def changefeedDailyPartials(feed: DataFrame): DataFrame =
    feed.withColumn("order_date", to_date(col("o_orderdate")))
      .withColumn("sgn",
        when(col("_change_type") === "insert", lit(1L)).otherwise(lit(-1L)))
      .groupBy("order_date", "o_custkey")
      .agg(sum(col("sgn")).as("pn"),
        dpartSum(col("o_totalprice") * col("sgn")).as("prev"))

  /** CDC-MAINTAINED daily sales — the gold view kept current by consuming
    * the lake changefeed instead of rescanning the fact table: maintained =
    * fold(base-snapshot partials ∪ signed feed partials), with fully
    * retracted (day, customer) pairs dropped. The gate's lake history makes
    * the claim sharp: version 0 lands with every `o_orderkey % 4 = 2`
    * price DOUBLED (deliberately wrong), a later append adds the missing
    * residue-3 rows, and an upsert then corrects the doubled rows — so the
    * maintained view is only right if the feed's delete leg cancels the
    * wrong decimals EXACTLY and the rewrite's delete+insert pairs for
    * untouched co-partition rows net to zero. Oracle = the from-scratch
    * [[dailySales]] recompute over the true orders table, bitwise.
    *
    * Scale shape: the consumer reads ONLY the changefeed (changed files) and
    * folds summary-sized state — a nightly gold rebuild becomes
    * feed-volume + |distinct (day, customer)| work, never a fact rescan. */
  def dailySalesCdc(spark: SparkSession, dir: String): DataFrame = {
    val root = graft.core.TempLayouts.rootFor("graft_goldcdc_", dir) { r =>
      // partitioned by order YEAR: coarse enough that the serve reads a
      // handful of dirs per leg (a month grain made the steady-state serve
      // ~2.7 s of tiny-file opens at sf0.1), fine enough that the upsert
      // still exercises partition rewrites in every partition
      val lake = new graft.lake.PartitionedTable(r, Seq("oy"))
      val o = Tables.orders(spark, dir)
        .select("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
        .withColumn("oy", date_format(to_date(col("o_orderdate")), "yyyy"))
      lake.create(o.filter(col("o_orderkey") % 4 =!= 3)
        .withColumn("o_totalprice",
          when(col("o_orderkey") % 4 === 2, col("o_totalprice") * 2)
            .otherwise(col("o_totalprice"))), "orders_cdc")
      lake.append(o.filter(col("o_orderkey") % 4 === 3), "orders_cdc")
      lake.upsert(o.filter(col("o_orderkey") % 4 === 2), "orders_cdc",
        Seq("o_orderkey"))
    }
    val lake = new graft.lake.PartitionedTable(root, Seq("oy"))
    val base = dailyPartialsOf(lake.readVersion(spark, "orders_cdc", 0))
    // bounds come from the lake itself, not the builder's commit count —
    // a future maintenance commit inside the layout must not silently
    // drop or double-count a leg relative to the v0 base snapshot
    val feed = changefeedDailyPartials(
      lake.readChanges(spark, "orders_cdc", 0,
        lake.versions("orders_cdc").last))
    foldDailySummary(base.unionByName(feed), retractions = true)
  }

  /** Per-customer lifetime metrics + churn flag (reference DEMO.md:73-77).
    * Return rate comes from lineitem return flags joined through orders. */
  def customerMetrics(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val li = Tables.lineitem(spark, dir)
    val orderCust = o.select(col("o_orderkey"), col("o_custkey"))
    val itemStats = li
      .join(orderCust, li("l_orderkey") === orderCust("o_orderkey"))
      .groupBy(col("o_custkey"))
      .agg(
        count(lit(1)).as("n_items"),
        count(when(col("l_returnflag") === "R", lit(1))).as("n_returned"))
      .withColumn("return_rate",
        col("n_returned").cast("double") / col("n_items").cast("double"))
    val orderStats = o.groupBy(col("o_custkey"))
      .agg(
        count(lit(1)).as("n_orders"),
        dsum(col("o_totalprice")).as("total_spend"),
        davg(col("o_totalprice")).as("avg_order_value"),
        min(to_date(col("o_orderdate"))).as("first_order_date"),
        max(to_date(col("o_orderdate"))).as("last_order_date"))
      .withColumn("churned",
        datediff(lit("2002-01-01").cast("date"), col("last_order_date")) > 90)
    orderStats.join(itemStats, Seq("o_custkey"), "left")
      .select(col("o_custkey"), col("n_orders"), col("total_spend"),
        col("avg_order_value"), col("first_order_date"), col("last_order_date"),
        col("churned"), col("n_items"), col("n_returned"), col("return_rate"))
  }

  /** Per-product sales metrics with margin %% and inventory turnover
    * (reference DEMO.md:79-83: "margin %%, inventory turnover"). The test
    * schema has no partsupp table, so the cost dimension (supplycost, on-hand
    * quantity) is synthesized deterministically from the part key — exact
    * IEEE arithmetic replayed identically by the oracle. All cost math rides
    * the broadcast part dimension: zero extra shuffles over the sales agg. */
  def productPerformance(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val p = Tables.part(spark, dir)
      // supplycost = 50-89% of retail; on-hand qty 50-149 units
      .withColumn("supplycost",
        expr("p_retailprice * CAST(50 + p_partkey % 40 AS DOUBLE) / 100.0"))
      .withColumn("inv_qty", expr("CAST(50 + p_partkey % 100 AS DOUBLE)"))
    val sales = li.groupBy(col("l_partkey"))
      .agg(
        dsum(col("l_quantity")).as("units_sold"),
        dsum2(col("l_extendedprice"), lit(1.0) - col("l_discount")).as("revenue"),
        count(lit(1)).as("n_line_items"),
        count(when(col("l_returnflag") === "R", lit(1))).as("n_returns"))
      .withColumn("return_rate",
        col("n_returns").cast("double") / col("n_line_items").cast("double"))
    // part is the small dimension at TPC-H ratios → broadcast.
    sales.join(broadcast(p), sales("l_partkey") === p("p_partkey"))
      .withColumn("cogs", col("units_sold") * col("supplycost"))
      .select(col("p_partkey"), col("p_name"), col("p_brand"),
        col("units_sold"), col("revenue"), col("n_line_items"),
        col("n_returns"), col("return_rate"),
        (col("revenue") / col("units_sold")).as("avg_sale_price"),
        col("cogs"),
        ((col("revenue") - col("cogs")) / col("revenue") * lit(100.0)).as("margin_pct"),
        (col("cogs") / (col("inv_qty") * col("supplycost"))).as("inventory_turnover"))
  }

  /** Revenue by region: 5-table star join (TPC-H Q5 flavor).
    * region→nation→customer chain is broadcast; only orders⋈lineitem shuffles. */
  def regionalRevenue(spark: SparkSession, dir: String): DataFrame = {
    val r = Tables.region(spark, dir)
    val n = Tables.nation(spark, dir)
    val c = Tables.customer(spark, dir)
    val o = Tables.orders(spark, dir)
    val li = Tables.lineitem(spark, dir)
    val dim = c
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .select(col("c_custkey"), col("n_name"), col("r_name"))
    val rev = li.join(o, li("l_orderkey") === o("o_orderkey"))
      .join(broadcast(dim), o("o_custkey") === dim("c_custkey"))
      .groupBy(col("r_name"))
      .agg(
        dsum2(col("l_extendedprice"), lit(1.0) - col("l_discount")).as("revenue"),
        count(lit(1)).as("n_items"))
    // distinct customers per region WITHOUT carrying the distinct through the
    // wide lineitem join: the distinct-agg input is orders-sized (~1/4 of
    // lineitem). The semi-join against lineitem's pruned l_orderkey column
    // keeps the count bitwise-equal to the join formulation (only customers
    // whose orders actually have line items are counted).
    val cust = o.join(li.select("l_orderkey"),
        o("o_orderkey") === col("l_orderkey"), "left_semi")
      .join(broadcast(dim), o("o_custkey") === dim("c_custkey"))
      .groupBy(col("r_name"))
      .agg(countDistinct(col("o_custkey")).as("n_customers"))
    rev.join(broadcast(cust), "r_name")
      .select("r_name", "revenue", "n_items", "n_customers")
  }

  /** Top-k parts by revenue — TakeOrderedAndProject, deterministic tie-break. */
  def topPartsByRevenue(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    li.groupBy(col("l_partkey"))
      .agg(dsum2(col("l_extendedprice"), lit(1.0) - col("l_discount")).as("revenue"))
      .orderBy(col("revenue").desc, col("l_partkey").asc)
      .limit(10)
  }

  /** Cohort retention (reference DEMO.md:154-171): customers grouped by
    * first-order month, tracked across subsequent months. Month indexes are
    * integer year*12+month arithmetic — portable, unlike fractional
    * months_between. Two aggregates + a broadcast-joined first-order dim. */
  def cohortRetention(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
      .withColumn("d", to_date(col("o_orderdate")))
      .withColumn("midx", year(col("d")) * 12 + month(col("d")))
    val firstOrder = o.groupBy("o_custkey")
      .agg(min(col("midx")).as("cohort_midx"))
    o.join(broadcast(firstOrder), "o_custkey")
      .withColumn("months_since", col("midx") - col("cohort_midx"))
      .groupBy("cohort_midx", "months_since")
      .agg(countDistinct(col("o_custkey")).as("n_customers"),
        count(lit(1)).as("n_orders"))
  }

  /** Currency-normalized revenue (reference DEMO.md:104-112
    * `bronze.convert_to_usd` remote function, rebuilt as a broadcast join
    * against a rates dimension — the optimizer-friendly form). Dirty prices
    * are constructed as in [[Clean.currencyExtract]]. */
  def revenueUsd(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val rates = Seq(("USD", 1.0), ("EUR", 1.1), ("GBP", 1.3), ("JPY", 0.007))
      .toDF("value_type", "rate")
    val o = Tables.orders(spark, dir)
      .withColumn("dec_str", col("o_totalprice").cast("decimal(12,2)").cast("string"))
      .withColumn("price_str", expr(
        s"""CASE CAST(o_orderkey % 5 AS INT)
           |  WHEN 0 THEN concat('$$', dec_str)
           |  WHEN 1 THEN concat('EUR ', dec_str)
           |  WHEN 2 THEN concat('£', dec_str)
           |  WHEN 3 THEN concat('¥', dec_str)
           |  ELSE dec_str END""".stripMargin))
      .withColumn("value_type",
        coalesce(graft.operators.Cleaning.currencyCode(col("price_str")), lit("USD")))
      .withColumn("value", graft.operators.Cleaning.currencyValue("price_str"))
    o.join(broadcast(rates), Seq("value_type"))
      .groupBy("value_type")
      .agg(count(lit(1)).as("n"),
        dsum(col("value")).as("total_native"),
        // exact: 2-decimal value x 3-decimal rate = 5-decimal product
        sum(col("value").cast("decimal(12,2)") * col("rate").cast("decimal(10,3)"))
          .cast("double").as("total_usd"))
  }

  /** SCD2 history of each customer's order-priority dimension, with the order
    * stream as the change log ([[graft.lake.Scd2.history]]): one window chain
    * — same-day collapse (highest o_orderkey wins), null-safe change detect,
    * interval stitch. The incremental lake merge twin
    * ([[graft.lake.Scd2.applyChanges]]) is pinned equal to this rebuild by
    * Scd2Spec. */
  def scd2Priority(spark: SparkSession, dir: String): DataFrame =
    graft.lake.Scd2.history(Tables.orders(spark, dir), "o_custkey",
      Seq("o_orderpriority"), "o_orderdate", "o_orderkey")

  /** Snapshot-diff gate: two versions of an orders snapshot land in a temp
    * [[graft.lake.ParquetDirFormat]] (v0 drops every 4th key; v1 drops every
    * 5th and rewrites priority on every 3rd), then
    * [[graft.lake.SnapshotDiff.diff]] reads both immutable versions back and
    * must reproduce the oracle's full-outer added/removed/changed ledger —
    * the write→time-travel→diff round trip, not just the join. */
  def snapshotDiff(spark: SparkSession, dir: String): DataFrame = {
    val root = graft.core.TempLayouts.rootFor("graft_snapdiff_", dir) { r =>
      val lake = new graft.lake.ParquetDirFormat(r)
      val o = Tables.orders(spark, dir)
      lake.create(o.filter(col("o_orderkey") % 4 =!= 0), "orders_snap")
      lake.overwrite(o.filter(col("o_orderkey") % 5 =!= 0)
        .withColumn("o_orderpriority",
          when(col("o_orderkey") % 3 === 0, lit("CHANGED"))
            .otherwise(col("o_orderpriority"))), "orders_snap")
    }
    val lake = new graft.lake.ParquetDirFormat(root)
    val vs = lake.versions("orders_snap")
    graft.lake.SnapshotDiff.diff(spark, lake, "orders_snap",
      vs.min, vs.max, Seq("o_orderkey"))
  }

  val queries: Map[String, Q] = Map(
    "gold_snapshot_diff"         -> (snapshotDiff _),
    "gold_scd2_priority"         -> (scd2Priority _),
    "gold_cohort_retention"      -> (cohortRetention _),
    "gold_revenue_usd"           -> (revenueUsd _),
    "gold_q1_pricing_summary"    -> (q1Agg _),
    "gold_daily_sales"           -> (dailySales _),
    "gold_daily_sales_ivm"       -> (dailySalesIncremental _),
    "gold_daily_sales_cdc"       -> (dailySalesCdc _),
    "gold_customer_metrics"      -> (customerMetrics _),
    "gold_product_performance"   -> (productPerformance _),
    "gold_regional_revenue"      -> (regionalRevenue _),
    "gold_top_parts_by_revenue"  -> (topPartsByRevenue _))

  /** The daily-sales FULL-RECOMPUTE oracle, shared verbatim by the direct
    * gate and BOTH maintained views (summary-delta IVM and the CDC
    * retraction fold): a maintained view's contract is bitwise equality
    * with the from-scratch rebuild, so all three keys pin one string. */
  private val dailySalesRecomputeSql =
    """WITH o AS (SELECT *, CAST(o_orderdate AS DATE) AS order_date FROM orders),
        |nc AS (SELECT first_date AS order_date, COUNT(*) AS new_customers FROM
        |  (SELECT o_custkey, MIN(order_date) AS first_date FROM o GROUP BY 1) GROUP BY 1),
        |d AS (SELECT order_date, COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
        |  COUNT(DISTINCT o_custkey) AS n_customers,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(o_totalprice) AS avg_order_value
        |  FROM o GROUP BY 1)
        |SELECT d.order_date, d.n_orders, d.revenue, d.n_customers, d.avg_order_value,
        |  COALESCE(nc.new_customers, 0) AS new_customers
        |FROM d LEFT JOIN nc USING (order_date)""".stripMargin

  val oracle: Map[String, String] = Map(
    "gold_snapshot_diff" -> {
      val cmp = Seq("o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate",
        "o_orderpriority")
        .map(c => s"(v1.$c IS DISTINCT FROM v2.$c)").mkString(" OR ")
      s"""WITH v1 AS (SELECT * FROM orders WHERE o_orderkey % 4 <> 0),
         |v2 AS (SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate,
         |    CASE WHEN o_orderkey % 3 = 0 THEN 'CHANGED' ELSE o_orderpriority END
         |      AS o_orderpriority
         |  FROM orders WHERE o_orderkey % 5 <> 0),
         |j AS (SELECT COALESCE(v1.o_orderkey, v2.o_orderkey) AS o_orderkey,
         |    CASE WHEN v2.o_orderkey IS NULL THEN 'removed'
         |         WHEN v1.o_orderkey IS NULL THEN 'added'
         |         WHEN $cmp THEN 'changed'
         |         ELSE 'unchanged' END AS change_type
         |  FROM v1 FULL OUTER JOIN v2 ON v1.o_orderkey = v2.o_orderkey)
         |SELECT o_orderkey, change_type FROM j WHERE change_type <> 'unchanged'""".stripMargin
    },
    "gold_scd2_priority" ->
      """WITH collapsed AS (SELECT o_custkey, o_orderdate, o_orderpriority FROM (
        |    SELECT o_custkey, o_orderdate, o_orderpriority,
        |      ROW_NUMBER() OVER (PARTITION BY o_custkey, o_orderdate
        |        ORDER BY o_orderkey DESC) AS rn FROM orders) WHERE rn = 1),
        |chg AS (SELECT o_custkey, o_orderdate, o_orderpriority FROM (
        |    SELECT o_custkey, o_orderdate, o_orderpriority,
        |      LAG(o_orderpriority) OVER (PARTITION BY o_custkey
        |        ORDER BY o_orderdate ASC) AS prev FROM collapsed)
        |  WHERE prev IS NULL OR prev IS DISTINCT FROM o_orderpriority),
        |v AS (SELECT o_custkey, o_orderpriority,
        |    o_orderdate AS valid_from,
        |    LEAD(o_orderdate) OVER (PARTITION BY o_custkey
        |      ORDER BY o_orderdate ASC) AS valid_to,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey
        |      ORDER BY o_orderdate ASC) AS BIGINT) AS version_no
        |  FROM chg)
        |SELECT o_custkey, o_orderpriority, valid_from, valid_to, version_no,
        |  valid_to IS NULL AS is_current FROM v""".stripMargin,
    "gold_cohort_retention" ->
      """WITH o AS (SELECT o_custkey, CAST(o_orderdate AS DATE) AS d FROM orders),
        |m AS (SELECT o_custkey, year(d) * 12 + month(d) AS midx FROM o),
        |f AS (SELECT o_custkey, MIN(midx) AS cohort_midx FROM m GROUP BY o_custkey)
        |SELECT cohort_midx, midx - cohort_midx AS months_since,
        |  COUNT(DISTINCT m.o_custkey) AS n_customers, COUNT(*) AS n_orders
        |FROM m JOIN f ON m.o_custkey = f.o_custkey
        |GROUP BY cohort_midx, months_since""".stripMargin,
    "gold_revenue_usd" ->
      s"""WITH rates AS (SELECT * FROM (VALUES ('USD', 1.0), ('EUR', 1.1),
         |    ('GBP', 1.3), ('JPY', 0.007)) r(value_type, rate)),
         |d AS (SELECT o_orderkey,
         |  CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS VARCHAR) AS dec_str FROM orders),
         |p AS (SELECT o_orderkey,
         |  CASE CAST(o_orderkey % 5 AS INT)
         |    WHEN 0 THEN '$$' || dec_str WHEN 1 THEN 'EUR ' || dec_str
         |    WHEN 2 THEN '£' || dec_str WHEN 3 THEN '¥' || dec_str
         |    ELSE dec_str END AS price_str
         |  FROM d),
         |e AS (SELECT
         |  COALESCE(CASE regexp_extract(trim(price_str), '^(\\$$|EUR |£|¥)', 1)
         |    WHEN '$$' THEN 'USD' WHEN 'EUR ' THEN 'EUR' WHEN '£' THEN 'GBP'
         |    WHEN '¥' THEN 'JPY' ELSE NULL END, 'USD') AS value_type,
         |  TRY_CAST(regexp_replace(trim(price_str), '^(\\$$|EUR |£|¥)', '') AS DOUBLE) AS value
         |  FROM p)
         |SELECT e.value_type, COUNT(*) AS n,
         |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_native,
         |  CAST(SUM(CAST(value AS DECIMAL(12,2)) * CAST(rate AS DECIMAL(10,3))) AS DOUBLE) AS total_usd
         |FROM e JOIN rates ON e.value_type = rates.value_type
         |GROUP BY e.value_type""".stripMargin,
    "gold_q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1.0 - l_discount AS DECIMAL(12,2))) AS DOUBLE) AS sum_disc_price,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1.0 - l_discount AS DECIMAL(12,2)) * CAST(1.0 + l_tax AS DECIMAL(12,2))) AS DOUBLE) AS sum_charge,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(l_quantity) AS avg_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(l_extendedprice) AS avg_price,
        |  CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / COUNT(l_discount) AS avg_disc,
        |  COUNT(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= DATE '1999-06-30'
        |GROUP BY l_returnflag, l_linestatus""".stripMargin,
    "gold_daily_sales" -> dailySalesRecomputeSql,
    // the IVM gate's oracle is the FULL RECOMPUTE — the maintained view must
    // equal the from-scratch rebuild bitwise, which is the IVM contract
    "gold_daily_sales_ivm" -> dailySalesRecomputeSql,
    // the CDC-maintained view's oracle is ALSO the full recompute: the lake
    // history ends at exactly the true orders table, so maintained-via-
    // retractions must equal the from-scratch rebuild bitwise
    "gold_daily_sales_cdc" -> dailySalesRecomputeSql,
    "gold_customer_metrics" ->
      """WITH item_stats AS (
        |  SELECT o_custkey, COUNT(*) AS n_items,
        |    COUNT(*) FILTER (WHERE l_returnflag = 'R') AS n_returned
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey GROUP BY 1),
        |order_stats AS (
        |  SELECT o_custkey, COUNT(*) AS n_orders,
        |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_spend,
        |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(o_totalprice) AS avg_order_value,
        |    MIN(CAST(o_orderdate AS DATE)) AS first_order_date,
        |    MAX(CAST(o_orderdate AS DATE)) AS last_order_date
        |  FROM orders GROUP BY 1)
        |SELECT s.o_custkey, s.n_orders, s.total_spend, s.avg_order_value,
        |  s.first_order_date, s.last_order_date,
        |  DATE_DIFF('day', s.last_order_date, DATE '2002-01-01') > 90 AS churned,
        |  i.n_items, i.n_returned,
        |  CAST(i.n_returned AS DOUBLE) / CAST(i.n_items AS DOUBLE) AS return_rate
        |FROM order_stats s LEFT JOIN item_stats i USING (o_custkey)""".stripMargin,
    "gold_product_performance" ->
      """WITH sales AS (
        |  SELECT l_partkey,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS units_sold,
        |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1.0 - l_discount AS DECIMAL(12,2))) AS DOUBLE) AS revenue,
        |    COUNT(*) AS n_line_items,
        |    COUNT(*) FILTER (WHERE l_returnflag = 'R') AS n_returns
        |  FROM lineitem GROUP BY 1),
        |dim AS (
        |  SELECT *,
        |    p_retailprice * CAST(50 + p_partkey % 40 AS DOUBLE) / 100.0 AS supplycost,
        |    CAST(50 + p_partkey % 100 AS DOUBLE) AS inv_qty
        |  FROM part),
        |j AS (
        |  SELECT *, units_sold * supplycost AS cogs
        |  FROM sales JOIN dim ON l_partkey = p_partkey)
        |SELECT p_partkey, p_name, p_brand, units_sold, revenue, n_line_items,
        |  n_returns,
        |  CAST(n_returns AS DOUBLE) / CAST(n_line_items AS DOUBLE) AS return_rate,
        |  revenue / units_sold AS avg_sale_price,
        |  cogs,
        |  (revenue - cogs) / revenue * 100.0 AS margin_pct,
        |  cogs / (inv_qty * supplycost) AS inventory_turnover
        |FROM j""".stripMargin,
    "gold_regional_revenue" ->
      """SELECT r_name,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1.0 - l_discount AS DECIMAL(12,2))) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n_items,
        |  COUNT(DISTINCT o_custkey) AS n_customers
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name""".stripMargin,
    "gold_top_parts_by_revenue" ->
      """SELECT l_partkey,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1.0 - l_discount AS DECIMAL(12,2))) AS DOUBLE) AS revenue
        |FROM lineitem GROUP BY l_partkey
        |ORDER BY revenue DESC, l_partkey ASC LIMIT 10""".stripMargin)
}
