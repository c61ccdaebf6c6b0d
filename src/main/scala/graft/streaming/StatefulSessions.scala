package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom per-key state on a stream: inactivity-gap sessionization via
  * `flatMapGroupsWithState` — the Structured Streaming twin of the batch
  * window-function sessionizer in [[graft.queries.Events.sessionize]].
  *
  * State per user is O(1) (an open session summary, not the events), the
  * timeout closes sessions when the watermark passes the gap, and emission is
  * append-mode — the shape that holds at millions of keys.
  */
object StatefulSessions {

  final case class Event(userId: Long, ts: Timestamp, value: Double)
  final case class SessionState(start: Long, last: Long, n: Long, sum: Double)
  final case class Session(userId: Long, sessionStart: Timestamp,
                           sessionEnd: Timestamp, nEvents: Long, sumValue: Double)

  val GapMs: Long = 30L * 60 * 1000

  def updateState(userId: Long, events: Iterator[Event],
                  state: GroupState[SessionState]): Iterator[Session] = {
    def close(s: SessionState) =
      Session(userId, new Timestamp(s.start), new Timestamp(s.last), s.n, s.sum)

    if (state.hasTimedOut) {
      val out = state.getOption.map(close).toIterator
      state.remove()
      return out
    }
    // Unified interval merge, identical to the batch sessionizer's gap rule
    // ([[graft.queries.Events.sessionize]]): the open session (an interval
    // with aggregates) and this batch's events (point intervals) are sorted
    // by start and merged when the gap to the running session is <= GapMs.
    // This keeps out-of-order events correct in BOTH directions: a within-gap
    // straggler extends the session backwards, while one more than GapMs
    // before sessionStart (yet above the watermark) forms its own earlier
    // session — and nearby stragglers merge with each other first — instead
    // of silently stretching sessionStart past a gap boundary.
    val items = (state.getOption.toSeq ++
        events.map(e => SessionState(e.ts.getTime, e.ts.getTime, 1, e.value)))
      .sortBy(s => (s.start, s.last))
    var closed = List.empty[Session]
    var cur = Option.empty[SessionState]
    items.foreach { it =>
      cur match {
        case Some(s) if it.start - s.last <= GapMs =>
          cur = Some(SessionState(s.start, math.max(s.last, it.last),
            s.n + it.n, s.sum + it.sum))
        case Some(s) =>
          closed ::= close(s)
          cur = Some(it)
        case None =>
          cur = Some(it)
      }
    }
    cur.foreach { s =>
      state.update(s)
      state.setTimeoutTimestamp(s.last + GapMs)
    }
    closed.reverseIterator
  }

  /** Wire the stateful sessionizer onto a stream of [[Event]]s. */
  def sessions(events: Dataset[Event]): Dataset[Session] = {
    implicit val se = Encoders.product[SessionState]
    implicit val so = Encoders.product[Session]
    events
      .withWatermark("ts", "1 hour")
      .groupByKey(_.userId)(Encoders.scalaLong)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout())(updateState)
  }
}
