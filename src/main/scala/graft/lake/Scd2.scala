package graft.lake

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Type-2 slowly-changing-dimension versioning — the lake-side history
  * mechanic the reference's medallion dimensions imply but never materialize
  * (silver tables there keep only latest-wins rows,
  * services/loader/transformations.sql:1-40): every attribute change opens a
  * new row with `[valid_from, valid_to)` validity, so any fact can be joined
  * to the dimension values that were current AT ITS OWN event time.
  *
  * Two surfaces:
  *  - [[history]]: full rebuild of the versioned dimension from a change log
  *    (one window chain — collapse, change-detect, interval stitch);
  *  - [[applyChanges]]: incremental merge of a new change batch into a lake
  *    table, touching only affected keys.
  *
  * Scale shape: every window partitions by the dimension key, so the whole
  * rebuild is ONE hash-partition + per-key sort over the change log — no
  * self-joins, no driver state. The incremental path semi-joins the current
  * rows of affected keys (batch-sized, not corpus-sized), replays the same
  * window chain on current ∪ batch, and upserts on (key, version_no) —
  * serve cost scales with the batch, exactly like [[graft.operators.Dedup]]'s
  * incremental index.
  */
object Scd2 {

  /** Rebuild the SCD2 history from a change log.
    *
    * @param changes  change events: one row per observation
    * @param keyCol   dimension key
    * @param attrCols tracked attributes (a new version opens when the TUPLE
    *                 changes, null-safe)
    * @param tsCol    event/effective time of the observation
    * @param tieCol   deterministic collapse of same-(key, ts) observations:
    *                 the row with the highest `tieCol` wins
    * @return one row per version: key, attrs, valid_from, valid_to
    *         (null = open), version_no (1-based per key), is_current
    */
  def history(changes: DataFrame, keyCol: String, attrCols: Seq[String],
              tsCol: String, tieCol: String): DataFrame = {
    require(attrCols.nonEmpty, "need at least one tracked attribute")
    // Every stage rides ONE key partitioning (PlanSpec pins the single
    // exchange): the collapse window sorts (ts ASC, tie DESC) so the first
    // row of each ts run IS the max-tie winner — no (key, ts)-keyed shuffle —
    // and both later windows need only the (ts) sort prefix, which filter
    // preserves, so no re-sort either.
    val byKeyTie = Window.partitionBy(keyCol)
      .orderBy(col(tsCol).asc, col(tieCol).desc)
    val byKey = Window.partitionBy(keyCol).orderBy(col(tsCol).asc)
    val attrTuple = struct(attrCols.map(col): _*)
    val collapsed = changes
      .withColumn("__prevTs", lag(col(tsCol), 1).over(byKeyTie))
      .filter(col("__prevTs").isNull || col("__prevTs") =!= col(tsCol))
      .select(keyCol, (attrCols :+ tsCol): _*)
    val changed = collapsed
      .withColumn("__prev", lag(attrTuple, 1).over(byKey))
      // null-safe tuple compare: the first observation (prev IS NULL) and any
      // genuine change both open a version; repeats of the same tuple do not
      .filter(col("__prev").isNull || !(col("__prev") <=> attrTuple))
      .drop("__prev")
    changed
      .withColumn("valid_from", col(tsCol))
      .withColumn("valid_to", lead(col(tsCol), 1).over(byKey))
      .withColumn("version_no", row_number().over(byKey).cast("long"))
      .withColumn("is_current", col("valid_to").isNull)
      .select(col(keyCol) +: attrCols.map(col) :+ col("valid_from") :+
        col("valid_to") :+ col("version_no") :+ col("is_current"): _*)
  }

  /** Incrementally merge a change batch into the SCD2 table `table` of
    * `lake`, creating it on first use. Only keys present in the batch are
    * read back (semi-join on the current rows), the [[history]] window chain
    * replays over current ∪ batch, version numbers continue from the stored
    * counter, and the result lands via upsert on (key, version_no) — closing
    * out a formerly-current row and inserting its successors in one commit.
    * Batch observations at or before a key's current `valid_from` are stale
    * replays and are dropped (the lake row, not stream memory, is the
    * boundary — same policy as the streaming medallion's event-time floor).
    * Re-applying the same batch rewrites identical rows: idempotent. */
  def applyChanges(spark: SparkSession, lake: TableFormat, table: String,
                   batch: DataFrame, keyCol: String, attrCols: Seq[String],
                   tsCol: String, tieCol: String): Unit = {
    if (!lake.exists(table)) {
      lake.create(history(batch, keyCol, attrCols, tsCol, tieCol), table)
      return
    }
    val existing = lake.read(spark, table)
    val keys = batch.select(keyCol).distinct()
    val cur = existing.join(keys, Seq(keyCol), "left_semi")
      .filter(col("is_current"))
    // the current row re-enters the window chain as a pseudo-observation at
    // its own valid_from with the strongest tie-break, so the batch's first
    // genuine change closes it and no-op repeats collapse against it
    val pseudo = cur.select(col(keyCol) +: attrCols.map(col) :+
      col("valid_from").as(tsCol) :+ lit(Long.MaxValue).as(tieCol): _*)
    val floor = cur.select(col(keyCol), col("valid_from").as("__floor"))
    val fresh = batch.join(floor, Seq(keyCol), "left")
      .filter(col("__floor").isNull || col(tsCol) > col("__floor"))
      .select(col(keyCol) +: attrCols.map(col) :+ col(tsCol) :+
        col(tieCol).cast("long").as(tieCol): _*)
    val replay = history(pseudo.unionByName(fresh), keyCol, attrCols, tsCol, tieCol)
    val offsets = keys
      .join(cur.select(col(keyCol), (col("version_no") - 1L).as("__offset")),
        Seq(keyCol), "left")
      .na.fill(0L, Seq("__offset"))
    val renumbered = replay.join(offsets, Seq(keyCol))
      .withColumn("version_no", col("version_no") + col("__offset"))
      .drop("__offset")
    lake.upsert(renumbered, table, Seq(keyCol, "version_no"))
  }
}
