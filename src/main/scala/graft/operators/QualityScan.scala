package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The reference's quality scan as batched wide aggregates (reference:
  * datagrunt_agent/tools/quality.py:24-83 — "the entire scan is ~4 queries
  * regardless of column count"). Each check here keeps that property: one
  * conditional-count Column per (column, check), all evaluated in a single
  * scan; only flagged columns get the LIMIT-capped breakdown pass.
  */
object QualityScan {

  import Cleaning.NullSentinels

  final case class ColumnQuality(column: String, nonNull: Long, nullLike: Long,
                                 whitespacePadded: Long, distinctApprox: Long) {
    def isConstant: Boolean = distinctApprox <= 1
  }

  /** One-scan null-like + whitespace + approx-cardinality profile for string
    * columns (reference quality.py:264-318 + constant-column gate :157-170). */
  def scanStrings(df: DataFrame, cols: Seq[String]): Seq[ColumnQuality] = {
    if (cols.isEmpty) return Seq.empty
    val sentinels = NullSentinels.filter(_.nonEmpty)
    val aggs: Seq[Column] = cols.flatMap { c =>
      Seq(
        count(col(c)).as(s"nn_$c"),
        count(when(lower(trim(col(c))).isin(sentinels: _*), lit(1))).as(s"nl_$c"),
        count(when(col(c) =!= trim(col(c)), lit(1))).as(s"ws_$c"),
        approx_count_distinct(col(c)).as(s"ad_$c"))
    }
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    cols.map { c =>
      ColumnQuality(c, row.getAs[Long](s"nn_$c"), row.getAs[Long](s"nl_$c"),
        row.getAs[Long](s"ws_$c"), row.getAs[Long](s"ad_$c"))
    }
  }

  /** LIMIT-capped value-frequency breakdown for one flagged column
    * (reference null_like_values.sql / type_pollution.sql: GROUP BY value
    * ORDER BY count DESC LIMIT n, with a deterministic tie-break). */
  def valueBreakdown(df: DataFrame, c: String, limit: Int = 10): DataFrame =
    df.filter(col(c).isNotNull)
      .groupBy(col(c).as("value"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("value").asc)
      .limit(limit)

  /** Columns whose (approx) cardinality is 1 — candidates for dropping
    * (reference constant-column finding). */
  def constantColumns(df: DataFrame, cols: Seq[String]): Seq[String] =
    scanStrings(df, cols).filter(_.isConstant).map(_.column)
}
