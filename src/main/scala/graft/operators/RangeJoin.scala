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

  /** Interval-OVERLAP join — pair every left interval `[lLo, lHi)` with every
    * right interval `[rLo, rHi)` they intersect (sessions x campaigns,
    * readings x maintenance windows, genomic ranges). Same bin-blocking idea
    * as [[joinRange]], but BOTH sides explode to the bins they cover, so a
    * pair overlapping many bins would meet once per shared bin; instead of a
    * distinct (an extra full shuffle of the output), each candidate pair is
    * kept only in its CANONICAL bin — the bin containing the overlap's start
    * `max(lLo, rLo)`. That point lies inside both intervals by definition of
    * overlap, so both sides exploded into its bin (exactly-once by
    * construction, no dedup pass). Cost: linear in rows x (interval span /
    * binWidth); pick `binWidth` near the median interval length. Column name
    * sets must be disjoint across the two frames. */
  def joinOverlap(left: DataFrame, lLo: String, lHi: String,
                  right: DataFrame, rLo: String, rHi: String,
                  binWidth: Double): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    def bins(df: DataFrame, lo: String, hi: String): DataFrame =
      df.withColumn("__bin", explode(sequence(
        floor(col(lo) / binWidth).cast("long"),
        floor(col(hi) / binWidth).cast("long"))))
    bins(left, lLo, lHi).join(bins(right, rLo, rHi), Seq("__bin"))
      // canonical overlap test max(lo) < min(hi), NOT the two-inequality
      // form (lLo < rHi && rLo < lHi): the forms agree on non-empty
      // intervals but the latter lets an EMPTY interval "overlap" anything
      // that contains its point
      .filter(greatest(col(lLo), col(rLo)) < least(col(lHi), col(rHi)))
      .filter(col("__bin") === floor(greatest(col(lLo), col(rLo)) / binWidth).cast("long"))
      .drop("__bin")
  }
}
