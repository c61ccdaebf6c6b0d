package graft.lake

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Row-level diff between two snapshots of a versioned lake table — the
  * data-versioning primitive behind incremental downstream refresh ("which
  * keys changed since the version I last processed?") and audit ("what did
  * that overwrite actually do?"). The reference keeps version history in
  * BigQuery time travel but never exposes a diff; here it composes directly
  * with [[ParquetDirFormat.readVersion]]'s immutable snapshots.
  *
  * Scale shape: one full-outer hash join keyed by the table key — each side
  * shuffles once on the key, non-key payloads travel as a single struct, and
  * the unchanged majority is dropped before anything downstream sees it. No
  * driver state, no row collection.
  */
object SnapshotDiff {

  /** Diff two same-schema frames keyed by `keys`: rows only in `before` are
    * `removed`, only in `after` are `added`, present in both with any
    * null-safe difference in a non-key column are `changed`; unchanged rows
    * are dropped. Returns keys + change_type. */
  def diffFrames(before: DataFrame, after: DataFrame, keys: Seq[String]): DataFrame = {
    require(before.columns.sameElements(after.columns),
      s"schema mismatch: ${before.columns.mkString(",")} vs ${after.columns.mkString(",")}")
    val vals = before.columns.filterNot(keys.contains).toSeq
    val a = before.select(keys.map(col) :+ struct(vals.map(col): _*).as("__va"): _*)
    val b = after.select(keys.map(col) :+ struct(vals.map(col): _*).as("__vb"): _*)
    a.join(b, keys, "full_outer")
      .withColumn("change_type",
        when(col("__vb").isNull, lit("removed"))
          .when(col("__va").isNull, lit("added"))
          .when(!(col("__va") <=> col("__vb")), lit("changed"))
          .otherwise(lit("unchanged")))
      .filter(col("change_type") =!= "unchanged")
      .select(keys.map(col) :+ col("change_type"): _*)
  }

  /** Diff two pinned versions of `table` ([[ParquetDirFormat.readVersion]] —
    * both snapshots are immutable, so the diff is reproducible forever). */
  def diff(spark: SparkSession, lake: ParquetDirFormat, table: String,
           beforeVersion: Int, afterVersion: Int, keys: Seq[String]): DataFrame =
    diffFrames(lake.readVersion(spark, table, beforeVersion),
      lake.readVersion(spark, table, afterVersion), keys)
}
