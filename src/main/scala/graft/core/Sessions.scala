package graft.core

import org.apache.spark.sql.SparkSession

/** SparkSession factory for the graft engine.
  *
  * Mirrors the reference's fixed-parallelism in-memory session
  * (reference: services/data-cleaning-agent/datagrunt_agent/core/duckdb_session.py:47-48,
  * `duckdb.connect(":memory:", threads=16)`) but Spark-native: AQE on, shuffle
  * partitions sized to local cores (on a real cluster this would be ~2-3x total
  * executor cores; AQE coalesces down at runtime either way).
  */
object Sessions {

  /** Local session for tests and ad-hoc runs. */
  def local(cores: Int = 4, appName: String = "graft"): SparkSession = {
    val spark = SparkSession
      .builder()
      .master(s"local[$cores]")
      .appName(appName)
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }

  /** Builder pre-configured for a real cluster run of this library — the
    * settings that matter at 100 TB, applied on top of whatever master /
    * resource configuration the deployment supplies:
    *
    *  - graft's native expressions registered via the extensions mechanism
    *    (SQL users get graft_dot/graft_phash/graft_minhash/... without code);
    *  - AQE on with skew-join splitting (fact-fact joins self-correct when a
    *    key runs hot; [[graft.operators.Scale]] covers aggregation skew);
    *  - shuffle partitions sized ~2-3x total executor cores — AQE coalesces
    *    down, it cannot split a too-coarse shuffle up;
    *  - 128 MiB scan partitions (one parquet row-group-ish per task) and
    *    a 64 MiB broadcast ceiling for star-schema dimension joins.
    */
  def clusterBuilder(totalExecutorCores: Int): SparkSession.Builder =
    SparkSession.builder()
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.shuffle.partitions", (totalExecutorCores * 3).toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", (128L * 1024 * 1024).toString)
      .config("spark.sql.autoBroadcastJoinThreshold", (64L * 1024 * 1024).toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.compression.codec", "zstd")
      // a long-lived session running this library's whole query surface
      // churns far more than the default 100 generated-class cache entries;
      // eviction silently re-compiles hot plans every execution
      .config("spark.sql.codegen.cache.maxEntries", "5000")
}
