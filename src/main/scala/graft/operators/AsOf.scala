package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join — for every left row, the payload of the latest right
  * row with the same key and `rightTs <= leftTs` (the temporal join every
  * feature/training pipeline needs: "state of X as the event happened").
  *
  * Spark has no ASOF JOIN operator, and the naive encodings both fail at
  * scale: an inequality theta-join explodes to one row per (event, every
  * prior state), and a per-key `collect_list` + binary search puts a whole
  * key's history in one task's memory. This implementation is the sort-merge
  * shape instead:
  *
  *   1. right rows are reduced to one per (key, ts) — payload of the max
  *      `tieBreak` row, so duplicate timestamps resolve deterministically;
  *   2. both sides are tagged and unioned into one (key, ts, side) stream;
  *   3. one window per key, ordered by (ts, side) with right rows sorting
  *      before left rows at equal ts (inclusive `>=` semantics), carries the
  *      last non-null payload forward (`last(..., ignoreNulls)` over an
  *      unbounded-preceding row frame);
  *   4. left rows keep the carried payload; right rows are dropped.
  *
  * Cost: ONE shuffle of each side on the key plus a per-partition sort —
  * exactly what a sort-merge join would pay — with no row amplification and
  * no per-key materialization. A hot key salts the same way any sorted window
  * does; history stays streamed, never collected.
  *
  * Left rows with no prior right row keep NULL payload columns (ASOF LEFT
  * JOIN semantics, matching DuckDB's operator of the same name).
  */
object AsOf {

  /** A payload column sharing a name with a left column would emit two output
    * columns with the same name — every downstream by-name reference becomes
    * silently ambiguous. Fail construction instead. */
  private def requireDisjoint(leftCols: Array[String], payload: Seq[String]): Unit = {
    val dup = payload.toSet.intersect(leftCols.toSet)
    require(dup.isEmpty,
      s"payload column(s) ${dup.mkString(", ")} collide with left columns — " +
        "alias them on the right side before the as-of join")
  }

  /** @param payload  right columns to carry onto each left row
    * @param tieBreak right column ordering duplicate (key, ts) rows; the max
    *                 row's payload wins. Must be non-null and totally ordered
    *                 within a (key, ts) group for a deterministic result. */
  def joinAsOf(left: DataFrame, right: DataFrame,
               leftKey: String, rightKey: String,
               leftTs: String, rightTs: String,
               payload: Seq[String], tieBreak: String): DataFrame = {
    require(payload.nonEmpty, "as-of join needs at least one payload column")
    requireDisjoint(left.columns, payload)
    val leftCols = left.columns.toSeq

    val rAgg = right.groupBy(col(rightKey).as("__k"), col(rightTs).as("__t"))
      .agg(max_by(struct(payload.map(col): _*), col(tieBreak)).as("__p"))
    val pType = rAgg.schema("__p").dataType

    val lRow = left.select(
      col(leftKey).as("__k"), col(leftTs).as("__t"), lit(1).as("__side"),
      struct(leftCols.map(col): _*).as("__l"), lit(null).cast(pType).as("__p"))
    val lType = lRow.schema("__l").dataType
    val rRow = rAgg.select(
      col("__k"), col("__t"), lit(0).as("__side"),
      lit(null).cast(lType).as("__l"), col("__p"))

    val w = Window.partitionBy("__k").orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lRow.unionByName(rRow)
      .withColumn("__m", last(col("__p"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(leftCols.map(c => col(s"__l.$c").as(c)) ++
        payload.map(c => col(s"__m.$c").as(c)): _*)
  }

  /** Forward as-of join: earliest right row with `rightTs >= leftTs`.
    * Same machinery on a reversed ordering (min-tieBreak winner). */
  def joinAsOfForward(left: DataFrame, right: DataFrame,
                      leftKey: String, rightKey: String,
                      leftTs: String, rightTs: String,
                      payload: Seq[String], tieBreak: String): DataFrame = {
    require(payload.nonEmpty, "as-of join needs at least one payload column")
    requireDisjoint(left.columns, payload)
    val leftCols = left.columns.toSeq

    val rAgg = right.groupBy(col(rightKey).as("__k"), col(rightTs).as("__t"))
      .agg(min_by(struct(payload.map(col): _*), col(tieBreak)).as("__p"))
    val pType = rAgg.schema("__p").dataType

    val lRow = left.select(
      col(leftKey).as("__k"), col(leftTs).as("__t"), lit(0).as("__side"),
      struct(leftCols.map(col): _*).as("__l"), lit(null).cast(pType).as("__p"))
    val lType = lRow.schema("__l").dataType
    val rRow = rAgg.select(
      col("__k"), col("__t"), lit(1).as("__side"),
      lit(null).cast(lType).as("__l"), col("__p"))

    // reversed frame: first right payload at or after the left timestamp;
    // left rows (side 0) sort before right rows at equal ts => inclusive.
    val w = Window.partitionBy("__k").orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    lRow.unionByName(rRow)
      .withColumn("__m", first(col("__p"), ignoreNulls = true).over(w))
      .filter(col("__side") === 0)
      .select(leftCols.map(c => col(s"__l.$c").as(c)) ++
        payload.map(c => col(s"__m.$c").as(c)): _*)
  }
}
