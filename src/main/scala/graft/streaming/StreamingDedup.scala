package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

/** Streaming exact deduplication — the streaming twin of the batch
  * [[graft.operators.Dedup.exactDupGroups]]: every distinct document CONTENT
  * is emitted exactly once across all micro-batches, keyed by content hash,
  * with per-key custom state via `flatMapGroupsWithState`.
  *
  * Semantics: the first arrival of a content hash (ties within a batch break
  * to the smallest (ts, doc_id)) is emitted as the survivor; later arrivals
  * are absorbed into the state's duplicate counter and emit nothing. State is
  * evicted once the event-time watermark passes `horizon` beyond the key's
  * last sighting — so "exactly once" holds for duplicates arriving within the
  * horizon (the contract every production stream dedup documents, Spark's own
  * `dropDuplicatesWithinWatermark` included; unbounded state cannot survive
  * an unbounded stream). A re-arrival after eviction starts a fresh cycle.
  *
  * Scale shape: state per distinct content is O(1) (hash key + one summary
  * row, never the document), keys partition across the cluster with the
  * state store, and emission is append-mode. Exactly-once across restarts
  * comes from the checkpointed state store + idempotent sink, same as the
  * file pipeline's ledger guarantees in batch.
  *
  * Reference tie: flag_duplicates.sql keep-first semantics
  * (services/data-cleaning-agent/datagrunt_agent/sql/cleaning/
  * flag_duplicates.sql:3-9), lifted from per-file batch to a continuous
  * stream.
  */
object StreamingDedup {

  final case class Doc(docId: Long, ts: Timestamp, text: String)
  /** Per-content state: the emitted survivor and how many dupes it absorbed. */
  final case class Seen(firstDocId: Long, lastSeenMs: Long, nDupes: Long)
  final case class Survivor(docId: Long, ts: Timestamp, text: String)

  /** Hex MD5 of the content — same group key as the batch operator's
    * `md5(text)`, computed JVM-side for the typed stream. */
  def contentKey(text: String): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    md.digest(text.getBytes("UTF-8")).map("%02x".format(_)).mkString
  }

  private def horizonMs(horizon: String): Long = {
    // accepts the same "<n> <unit>" strings withWatermark takes
    val parts = horizon.trim.split("\\s+")
    val n = parts(0).toLong
    parts(1).toLowerCase match {
      case u if u.startsWith("second") => n * 1000L
      case u if u.startsWith("minute") => n * 60000L
      case u if u.startsWith("hour")   => n * 3600000L
      case u if u.startsWith("day")    => n * 86400000L
      case u => throw new IllegalArgumentException(s"unsupported horizon unit $u")
    }
  }

  def updateState(horizon: Long)(key: String, docs: Iterator[Doc],
                                 state: GroupState[Seen]): Iterator[Survivor] = {
    if (state.hasTimedOut) {
      state.remove()
      return Iterator.empty
    }
    val batch = docs.toSeq.sortBy(d => (d.ts.getTime, d.docId))
    val lastMs = batch.map(_.ts.getTime).max
    state.getOption match {
      case Some(seen) =>
        state.update(Seen(seen.firstDocId, lastMs max seen.lastSeenMs,
          seen.nDupes + batch.size))
        state.setTimeoutTimestamp((lastMs max seen.lastSeenMs) + horizon)
        Iterator.empty
      case None =>
        val first = batch.head
        state.update(Seen(first.docId, lastMs, batch.size - 1L))
        state.setTimeoutTimestamp(lastMs + horizon)
        Iterator.single(Survivor(first.docId, first.ts, first.text))
    }
  }

  /** Streaming NEAR-dup curation against the PERSISTED dedup index — the
    * streaming twin of the daily-increment story ([[graft.operators.Dedup
    * .incrementalDedup]]): a file source watches `inbox` for document CSVs;
    * each micro-batch is verdicted (`exact_dup` / `near_dup` / `new`)
    * against the index built over everything accepted so far, the verdict
    * record lands under `verdictDir/batch_id=N`, and ONLY `new` documents
    * fold into the corpus table and the index ([[graft.operators.Dedup
    * .appendDedupIndex]] — MinHash band appends are drift-free by
    * construction). Because the index is lake-persisted, the rejection
    * boundary survives restarts: a batch processed after a stop/start is
    * still verdicted against every previously accepted document.
    *
    * Delivery is EFFECTIVELY-once, same contract as [[StreamPipeline
    * .silverUpsertInbox]]: the verdict directory (keyed by the replay-stable
    * batchId, written LAST) is the batch's commit marker, so a batch whose
    * checkpoint offset was lost is skipped on replay instead of being
    * re-verdicted against an index that already absorbed it; the corpus
    * fold-in is a keyed upsert, so the one crash window left (appends
    * committed, marker not) re-admits nothing and loses nothing — at worst
    * that batch's re-written verdict record says `exact_dup` where the lost
    * one said `new`, while corpus and index state stay exactly correct.
    *
    * Scale shape per micro-batch: the batch side is the small side
    * everywhere (broadcast md5/band probes against the corpus-sized index),
    * candidate verification fetches corpus text only for candidate pairs —
    * serve cost O(batch + candidates), the incremental-dedup contract. */
  def curationInbox(spark: SparkSession, inbox: String, schema: StructType,
                    lake: graft.lake.ParquetDirFormat, corpusTable: String,
                    verdictDir: String, checkpoint: String,
                    n: Int = 3, tau: Double = 0.5, bands: Int = 42,
                    rowsPerBand: Int = 3, prefix: String = "dedup",
                    maxFilesPerTrigger: Int = 16): StreamingQuery =
    spark.readStream
      .schema(schema)
      .option("header", true)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .csv(inbox)
      .writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val marker = new java.io.File(s"$verdictDir/batch_id=$batchId")
        if (!marker.exists()) {
          val corpusText =
            if (lake.exists(corpusTable)) lake.read(spark, corpusTable)
            else batch.filter(lit(false))
          val verdicts = graft.operators.Dedup
            .incrementalDedup(lake, corpusText, batch, n, tau, bands, rowsPerBand, prefix)
            .localCheckpoint(true) // two consumers; freed when unreachable
          val accepted = batch.join(
            verdicts.filter(col("verdict") === "new").select("doc_id"), "doc_id")
          if (lake.exists(corpusTable)) lake.upsert(accepted, corpusTable, Seq("doc_id"))
          else lake.create(accepted, corpusTable)
          graft.operators.Dedup.appendDedupIndex(accepted, lake, n, bands, rowsPerBand, prefix)
          verdicts.write.mode("overwrite").parquet(marker.getPath) // commit marker
        }
      }
      .start()

  /** Wire the dedup onto a typed document stream. `horizon` bounds both the
    * watermark (how late a duplicate may arrive) and state retention. */
  def dedup(docs: Dataset[Doc], horizon: String = "1 hour"): Dataset[Survivor] = {
    implicit val ss = Encoders.product[Seen]
    implicit val so = Encoders.product[Survivor]
    docs
      .withWatermark("ts", horizon)
      .groupByKey(d => contentKey(d.text))(Encoders.STRING)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout())(updateState(horizonMs(horizon)))
  }
}
