package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Range (interval) join — pair every left row whose `valueCol` falls inside
  * a right row's `[lo, hi)` interval. Spark plans a raw inequality join as
  * BroadcastNestedLoop (every left row probes every interval), which is
  * O(|L|·|R|) and only survives while the interval side fits in a broadcast.
  *
  * This operator is the bin-blocked shape instead: values hash to the bin
  * `floor(v / binWidth)`, intervals EXPLODE to one row per bin they overlap,
  * and the join becomes an equi-join on the bin id followed by the exact
  * interval filter. Candidate generation is distributed and linear in
  * |L| + |R|·(avg interval span / binWidth); no nested loop, no broadcast
  * requirement, and a matching pair is produced exactly once (a left value
  * lives in exactly one bin, so the same (row, interval) pair can only meet
  * in that bin — no dedup pass needed).
  *
  * `binWidth` tunes the explosion factor: pick it near the median interval
  * length so each interval covers O(1) bins. Intervals are half-open
  * `lo <= v < hi`, the natural semantics for contiguous band tables.
  */
object RangeJoin {

  /** Inner range join. Left and right column names must be disjoint. */
  def joinRange(left: DataFrame, valueCol: String,
                right: DataFrame, loCol: String, hiCol: String,
                binWidth: Double): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val lb = left.withColumn("__bin",
      floor(col(valueCol) / binWidth).cast("long"))
    val rb = right.withColumn("__bin", explode(sequence(
      floor(col(loCol) / binWidth).cast("long"),
      floor(col(hiCol) / binWidth).cast("long"))))
    lb.join(rb, Seq("__bin"))
      .filter(col(valueCol) >= col(loCol) && col(valueCol) < col(hiCol))
      .drop("__bin")
  }
}
