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

  val queries: Map[String, Q] = Map(
    "profile_lineitem_nulls"    -> (lineitemNulls _),
    "profile_lineitem_stats"    -> (lineitemStats _),
    "profile_events_dup_keys"   -> (eventsDupKeys _),
    "profile_events_histogram"  -> (eventsValueHistogram _),
    "profile_orders_approx_dups" -> (ordersApproxDups _))

  val oracle: Map[String, String] = Map(
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
      """WITH t AS (SELECT md5(CAST(o_orderkey AS VARCHAR) || CAST(o_custkey AS VARCHAR)
        |    || o_orderstatus) AS h FROM orders)
        |SELECT COUNT(*) AS total_rows, COUNT(DISTINCT h) AS distinct_rows,
        |  COUNT(*) - COUNT(DISTINCT h) AS duplicate_rows FROM t""".stripMargin)
}
