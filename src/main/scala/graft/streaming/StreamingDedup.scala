package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

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
