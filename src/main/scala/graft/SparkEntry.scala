package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Query inventory is assembled from per-domain objects under [[graft.queries]];
  * each domain keeps its Spark implementations and DuckDB oracle SQL side by side.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    graft.queries.Gold.q1Agg(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.Gold.queries ++ graft.queries.Training.queries ++
    graft.queries.Events.queries ++ graft.queries.Profile.queries ++
    graft.queries.Clean.queries ++ graft.queries.Silver.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    graft.queries.Gold.oracle ++ graft.queries.Training.oracle ++
    graft.queries.Events.oracle ++ graft.queries.Profile.oracle ++
    graft.queries.Clean.oracle ++ graft.queries.Silver.oracle
}
