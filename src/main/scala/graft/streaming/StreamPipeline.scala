package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

/** The reference's event-driven file pipeline (GCS object.finalized ->
  * load -> clean -> export -> load, per-file exactly-once) as Structured
  * Streaming: a file source watches an inbox directory, `foreachBatch` runs
  * the batch cleaning pipeline, and the checkpoint provides the exactly-once
  * file ledger that Firestore provides in the reference
  * (services/logger/main.py:129-147 rank-monotonic upsert ≙ checkpoint commit
  * log; re-delivered files are skipped on restart).
  *
  * At scale the same topology holds: the file source lists incrementally
  * (`maxFilesPerTrigger` bounds micro-batch size), each micro-batch is a
  * normal distributed job, and state never accumulates on the driver.
  */
object StreamPipeline {

  /** Watch `inbox` for CSV files with `schema`, run `pipeline` on each
    * micro-batch, append the result to `outDir` as parquet. Exactly-once per
    * file via `checkpoint`. Caller controls lifetime via the returned query
    * (use [[runAvailableNow]] for drain-and-stop semantics). */
  def csvInbox(spark: SparkSession, inbox: String, schema: StructType,
               pipeline: DataFrame => DataFrame, outDir: String,
               checkpoint: String, maxFilesPerTrigger: Int = 16): StreamingQuery =
    spark.readStream
      .schema(schema)
      .option("header", true)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .csv(inbox)
      .writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        pipeline(batch).write.mode("append").parquet(outDir)
      }
      .start()

  /** Drain everything currently in the inbox, then stop. Re-running with the
    * same checkpoint processes only files not yet committed. */
  def runAvailableNow(q: StreamingQuery): Unit = q.awaitTermination()

  /** Continuous medallion: watch an inbox, run the silver `transform` on each
    * micro-batch, and MERGE the result into a lake table by key — late files
    * carrying newer versions of existing rows land as key-scoped upserts
    * ([[graft.lake.TableFormat.upsert]]'s atomic snapshot flip), not
    * duplicate appends. Delivery is EFFECTIVELY-once, not exactly-once:
    * `foreachBatch` is at-least-once across checkpoint recovery (a batch
    * whose upsert committed but whose checkpoint offset didn't is replayed),
    * and the replay converges only because the keyed upsert is idempotent —
    * which REQUIRES `transform` to be deterministic. A transform stamping
    * wall-clock time or generating random ids would rewrite replayed rows
    * with different values; derive any stamp from the input (or take it as a
    * parameter) instead. The lake's versioned snapshots make each
    * micro-batch commit atomic for readers. This is the streaming form of
    * the reference's load -> silver -> MERGE procedure chain (the
    * silver/spark_procedures SQL keep-latest semantics).
    *
    * The checkpoint ledger is FILE-grain: a stale file re-delivered under a
    * new name (an upstream redrive, a backfill gone wrong) is new to the
    * ledger, and a plain last-write-wins upsert would resurrect the old row
    * versions it carries. Pass `orderCol` (the transform's processed_at-like
    * version stamp) to apply the event-time floor instead:
    * [[graft.lake.TableFormat.upsertVersioned]] rejects rows not strictly
    * newer than the key's current version, so replaying ANY old file leaves
    * silver byte-identical (StreamSpec pins this). None keeps the raw
    * last-write-wins merge for inputs without a version column. */
  def silverUpsertInbox(spark: SparkSession, inbox: String, schema: StructType,
                        transform: DataFrame => DataFrame,
                        lake: graft.lake.TableFormat, table: String,
                        keys: Seq[String], checkpoint: String,
                        orderCol: Option[String] = None,
                        maxFilesPerTrigger: Int = 16): StreamingQuery =
    spark.readStream
      .schema(schema)
      .option("header", true)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .csv(inbox)
      .writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        orderCol match {
          case Some(oc) => lake.upsertVersioned(transform(batch), table, keys, oc)
          case None     => lake.upsert(transform(batch), table, keys)
        }
      }
      .start()

  /** Continuous CDC apply: watch an inbox of change files (op column
    * 'insert'/'update'/'delete' + an ordering column) and fold each
    * micro-batch into the lake via [[graft.lake.TableFormat.applyCdc]] — the
    * streaming form of a Debezium/changefeed consumer. Idempotence across
    * checkpoint replays comes from applyCdc itself (re-upserting identical
    * rows, re-deleting absent keys), the same effectively-once contract as
    * [[silverUpsertInbox]]; the latest-per-key collapse inside applyCdc also
    * makes one batch carrying a key's whole lifecycle land as its net
    * effect. NOTE the file-grain ledger caveat from silverUpsertInbox
    * applies: a stale change file under a NEW NAME replays old ops — keep
    * `orderCol` values monotone per key upstream, or route through
    * upsertVersioned semantics for the update stream. */
  def cdcInbox(spark: SparkSession, inbox: String, schema: StructType,
               lake: graft.lake.TableFormat, table: String,
               keys: Seq[String], opCol: String, orderCol: String,
               checkpoint: String, maxFilesPerTrigger: Int = 16): StreamingQuery =
    spark.readStream
      .schema(schema)
      .option("header", true)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .csv(inbox)
      .writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        lake.applyCdc(batch, table, keys, opCol, orderCol)
      }
      .start()

  /** Streaming incremental profiling: every micro-batch lands its MERGEABLE
    * sketch partials — exact moments ([[graft.operators.Profiling
    * .statsPartials]]), fixed-grid histogram bins, and HLL registers — into
    * lake tables keyed by the micro-batch id, so the exact global profile,
    * bounded-error quantiles, and a distinct estimate are all answerable at
    * any moment by folding partial rows, never by rescanning ingested data.
    * This is the streaming twin of the batch incremental-profiling path and
    * the profiling analogue of the silver upsert.
    *
    * Idempotence: partial APPENDS are not naturally idempotent (a replayed
    * foreachBatch would double-count where the keyed silver upsert would
    * converge), so each batch's partials land as an UPSERT on the batch-id
    * shard key — the replayed batch recomputes identical partials (the
    * profiled columns are deterministic functions of the file contents) and
    * overwrites its own rows. */
  def profilingInbox(spark: SparkSession, inbox: String, schema: StructType,
                     statCols: Seq[String], histCol: String,
                     histLo: Double, histWidth: Double, histBins: Int,
                     distinctCol: String,
                     lake: graft.lake.TableFormat, checkpoint: String,
                     maxFilesPerTrigger: Int = 16,
                     termCol: Option[String] = None): StreamingQuery = {
    import org.apache.spark.sql.functions._
    import graft.operators.Profiling
    spark.readStream
      .schema(schema)
      .option("header", true)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .csv(inbox)
      .writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, id: Long) =>
        val b = batch.withColumn("shard", lit(id))
        // upsert on the batch-id key = shard-scoped replace (creates the
        // table on first batch): replays overwrite their own rows
        lake.upsert(Profiling.statsPartials(b, "shard", statCols),
          "stats_partials", Seq("shard"))
        lake.upsert(Profiling.histogramPartials(b, "shard", histCol,
          histLo, histWidth, histBins), "hist_partials", Seq("shard"))
        lake.upsert(Profiling.hllPartials(b, "shard", distinctCol),
          "hll_partials", Seq("shard"))
        // optional fourth family: Count-Min frequency partials — the same
        // shard-scoped replace keeps the full sketch trio + stats mergeable
        // from the stream with no rescan
        termCol.foreach(tc => lake.upsert(Profiling.cmsPartials(b, "shard", tc),
          "cms_partials", Seq("shard")))
      }
      .start()
  }

  /** Continuous gold-view maintenance (incremental view maintenance from the
    * stream): every micro-batch lands its daily-sales SUMMARY-DELTA partials
    * — per (order_date, customer) order count + exact DECIMAL revenue — into
    * one lake table, so the full gold report (orders, revenue, distinct
    * customers, new customers, averages) is answerable at any moment by
    * [[graft.queries.Gold.foldDailySummary]] over the partial rows, never by
    * rescanning ingested facts. The streaming twin of
    * `Gold.dailySalesIncremental`, with the same algebra: decimal sums
    * re-merge exactly, distinct-customer and first-order-date questions fold
    * from the (day, customer) summary grain.
    *
    * Idempotence: same shard-scoped-replace contract as [[profilingInbox]] —
    * a replayed micro-batch recomputes identical partials and overwrites its
    * own shard's rows instead of double-counting. */
  def goldInbox(spark: SparkSession, inbox: String, schema: StructType,
                dateCol: String, custCol: String, priceCol: String,
                lake: graft.lake.TableFormat, checkpoint: String,
                maxFilesPerTrigger: Int = 16): StreamingQuery = {
    import org.apache.spark.sql.functions._
    spark.readStream
      .schema(schema)
      .option("header", true)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .csv(inbox)
      .writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, id: Long) =>
        val p = batch.select(
            to_date(col(dateCol)).as("order_date"),
            col(custCol).as("o_custkey"),
            col(priceCol).as("price"))
          .groupBy("order_date", "o_custkey")
          .agg(count(lit(1)).as("pn"),
            graft.core.Exact.dpartSum(col("price")).as("prev"))
          .withColumn("shard", lit(id))
        lake.upsert(p, "sales_partials", Seq("shard"))
      }
      .start()
  }

  /** Continuous data-quality audit: every micro-batch runs the declarative
    * constraint rules ([[graft.operators.Constraints]] — uniqueness,
    * referential integrity against a fixed parent snapshot, accepted values,
    * ranges) and lands the per-rule violation report into a lake table keyed
    * by (batch id, rule) — the always-on dbt-test topology: quality
    * regressions surface per ingest batch, queryable as a time series, with
    * no rescan of ingested data. NOTE: uniqueness here is WITHIN-batch (the
    * cross-batch key story belongs to the keyed silver upsert /
    * [[streamingDedup]]); the FK parent is the snapshot passed at start.
    *
    * Idempotence: same shard-scoped-replace contract as [[profilingInbox]] —
    * a replayed batch recomputes the identical report and overwrites its own
    * rows. */
  def dqInbox(spark: SparkSession, inbox: String, schema: StructType,
              rules: Seq[graft.operators.Constraints.Rule],
              lake: graft.lake.TableFormat, checkpoint: String,
              maxFilesPerTrigger: Int = 16): StreamingQuery = {
    import org.apache.spark.sql.functions._
    spark.readStream
      .schema(schema)
      .option("header", true)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .csv(inbox)
      .writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, id: Long) =>
        val report = graft.operators.Constraints.audit(batch, rules)
          .withColumn("batch_id", lit(id))
        lake.upsert(report, "dq_report", Seq("batch_id", "rule_type", "target"))
      }
      .start()
  }

  /** Streaming deduplication: exactly-one-row-per-key within the watermark
    * horizon (the incremental form of the batch dedup-keep-latest — state is
    * bounded by the watermark, so it runs forever on unbounded input).
    * `dropDuplicatesWithinWatermark` dedups on the KEYS alone: a replay of
    * the same key with a different event time is still dropped, which plain
    * `dropDuplicates(keys :+ ts)` would let through. */
  def streamingDedup(events: DataFrame, tsCol: String, watermark: String,
                     keys: Seq[String]): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(keys.head, keys.tail: _*)

  /** Watermarked stream-stream interval join: left rows match right rows
    * with equal `keys` whose `rightTs` lands in [leftTs, leftTs + within].
    * Both sides carry watermarks and the join condition carries the time
    * bound, which is what lets Spark EVICT state — each side buffers only
    * rows younger than watermark + within, so state is O(rate x window), not
    * O(stream), the only stream-stream shape that survives at 100 TB/day.
    * `left_outer` emits unmatched left rows (right columns NULL) once the
    * global watermark passes their join window — the ad-impression/click
    * attribution topology. Right columns clashing with left non-key names
    * come back `r_`-prefixed. */
  def streamStreamJoin(lhs: DataFrame, rhs: DataFrame, keys: Seq[String],
                       leftTs: String, rightTs: String, watermark: String,
                       within: String, joinType: String = "inner"): DataFrame = {
    import org.apache.spark.sql.functions._
    require(leftTs != rightTs,
      s"leftTs and rightTs must be distinct column names, both are '$leftTs'")
    val l = lhs.withWatermark(leftTs, watermark).alias("l")
    val r = rhs.withWatermark(rightTs, watermark).alias("r")
    val keyCond = keys.map(k => col(s"l.$k") === col(s"r.$k")).reduce(_ && _)
    val timeCond = col(s"r.$rightTs") >= col(s"l.$leftTs") &&
      col(s"r.$rightTs") <= col(s"l.$leftTs") + expr(s"INTERVAL $within")
    val leftRest = lhs.columns.filterNot(c => keys.contains(c))
    val rightRest = rhs.columns.filterNot(c => keys.contains(c))
    val out = keys.map(k => col(s"l.$k")) ++
      leftRest.map(c => col(s"l.$c")) ++
      rightRest.map(c =>
        col(s"r.$c").as(if (leftRest.contains(c)) s"r_$c" else c))
    l.join(r, keyCond && timeCond, joinType).select(out: _*)
  }

  /** Watermarked per-window aggregation over an event-time stream — the
    * standard windowed-agg topology for the 100 TB path (state is bounded by
    * the watermark; late data beyond it is dropped deterministically). */
  def windowedCounts(events: DataFrame, tsCol: String, watermark: String,
                     windowLength: String): DataFrame = {
    import org.apache.spark.sql.functions._
    events
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowLength), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("sum_value"))
  }
}
