package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative constraint audit — the dbt-tests / Deequ-style rule surface a
  * lakehouse runs after every load, extending the reference's quality scan
  * (null analysis, dup detection — datagrunt_agent/tools/quality.py:24-83)
  * with the cross-row and cross-table invariants it stops short of:
  * uniqueness, referential integrity, accepted values, numeric ranges.
  *
  * Semantics (dbt conventions, null-handling made explicit):
  *  - not_null: violation = the value IS NULL.
  *  - accepted_values / in_range: NULLs are NOT violations — missingness is
  *    [[NotNull]]'s job; a value only violates if present and out of set/range.
  *  - unique: violations = extra rows beyond the first per duplicated key
  *    tuple, SUM(cnt - 1) over groups with cnt > 1 (so the count is "rows
  *    you would have to delete"); tuples with ANY NULL column are ignored —
  *    missingness is [[NotNull]]'s job (dbt's unique test does the same).
  *  - foreign_key: SQL MATCH SIMPLE — a child tuple with ANY NULL key column
  *    is not checked; violations = non-null child tuples with no parent.
  *
  * Scale shape: every row-local rule (not_null / accepted_values / in_range)
  * folds into ONE wide conditional-count aggregate — a single table scan no
  * matter how many rules, the same FILTER-batching the reference's quality
  * engine uses. Each uniqueness rule is one column-pruned hash aggregate on
  * its key tuple; each foreign key is one anti-join against the parent's
  * distinct keys (Catalyst broadcasts dimension-sized parents itself). The
  * report is rule-count-sized — nothing here collects data rows.
  */
object Constraints {

  sealed trait Rule
  /** `col` must never be NULL. */
  final case class NotNull(col: String) extends Rule
  /** Non-null values of `col` must be one of `values`. */
  final case class AcceptedValues(col: String, values: Seq[String]) extends Rule
  /** Non-null values of `col` must lie in [lo, hi] inclusive. */
  final case class InRange(col: String, lo: Double, hi: Double) extends Rule
  /** The tuple `cols` must identify at most one row. */
  final case class Unique(cols: Seq[String]) extends Rule
  /** Every fully-non-null `cols` tuple must appear in `parent`'s
    * `parentCols`; `parentName` labels the report row. */
  final case class ForeignKey(cols: Seq[String], parent: DataFrame,
                              parentCols: Seq[String], parentName: String) extends Rule

  private def esc(s: String) = s.replace("\\", "\\\\").replace("'", "\\'")

  /** Evaluate `rules` against `df`: one report row per rule
    * `(rule_type, target, violations)`, violations always BIGINT. */
  def audit(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "audit needs at least one rule")
    val rowLocal: Seq[(String, String, Column)] = rules.collect {
      case NotNull(c) => ("not_null", c, col(c).isNull)
      case AcceptedValues(c, vs) =>
        ("accepted_values", c, col(c).isNotNull && !col(c).isin(vs: _*))
      case InRange(c, lo, hi) =>
        ("in_range", c, col(c).isNotNull && (col(c) < lo || col(c) > hi))
    }
    val frames = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    if (rowLocal.nonEmpty) {
      val aggs = rowLocal.zipWithIndex.map { case ((_, _, cond), i) =>
        count(when(cond, 1)).cast("bigint").as(s"__v$i")
      }
      val stacked = rowLocal.zipWithIndex.map { case ((t, target, _), i) =>
        s"'${esc(t)}', '${esc(target)}', __v$i"
      }.mkString(", ")
      frames += df.agg(aggs.head, aggs.tail: _*)
        .selectExpr(s"stack(${rowLocal.size}, $stacked) AS (rule_type, target, violations)")
    }
    rules.foreach {
      case Unique(cols) =>
        frames += df.select(cols.map(col): _*).na.drop()
          .groupBy(cols.map(col): _*).agg(count(lit(1)).as("__c"))
          .filter(col("__c") > 1)
          .agg(coalesce(sum(col("__c") - 1), lit(0L)).cast("bigint").as("violations"))
          .select(lit("unique").as("rule_type"),
            lit(cols.mkString(",")).as("target"), col("violations"))
      case ForeignKey(cols, parent, pCols, pName) =>
        val child = df.select(cols.map(col): _*).na.drop()
        val par = parent
          .select(pCols.zip(cols).map { case (p, c) => parent(p).as(s"__p_$c") }: _*)
          .distinct()
        val cond = cols.map(c => child(c) === par(s"__p_$c")).reduce(_ && _)
        frames += child.join(par, cond, "left_anti")
          .agg(count(lit(1)).cast("bigint").as("violations"))
          .select(lit("foreign_key").as("rule_type"),
            lit(s"${cols.mkString(",")}->$pName(${pCols.mkString(",")})").as("target"),
            col("violations"))
      case _ => () // row-local rules already folded above
    }
    frames.reduce(_ unionByName _)
  }
}
