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
}
