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
    val sorted = events.toSeq.sortBy(_.ts.getTime)
    var closed = List.empty[Session]
    var cur = state.getOption
    sorted.foreach { e =>
      val t = e.ts.getTime
      cur match {
        case Some(s) if t - s.last <= GapMs =>
          // within-gap but out-of-order events (t < start, still above the
          // watermark) must also extend the session BACKWARDS, or the emitted
          // sessionStart diverges from the batch sessionizer
          cur = Some(s.copy(start = math.min(s.start, t),
            last = math.max(s.last, t), n = s.n + 1, sum = s.sum + e.value))
        case Some(s) =>
          closed ::= close(s)
          cur = Some(SessionState(t, t, 1, e.value))
        case None =>
          cur = Some(SessionState(t, t, 1, e.value))
      }
    }
    cur match {
      case Some(s) =>
        state.update(s)
        state.setTimeoutTimestamp(s.last + GapMs)
      case None => ()
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
