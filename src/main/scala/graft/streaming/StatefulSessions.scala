package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Stateful streaming sessionization via `flatMapGroupsWithState` — the
  * custom-state path for semantics windowed aggs can't express (emit a
  * session row only when the session CLOSES, with arbitrary per-session
  * state).
  *
  * State per user is O(1) (current session bounds + aggregates), the
  * correct shape for unbounded streams: no per-event buffering. Event-time
  * timeout closes idle sessions when the watermark passes the gap.
  */
object StatefulSessions {

  case class Event(user_id: Long, event_id: Long, ts: Timestamp, value: Double)
  case class SessionState(start: Long, lastTs: Long, n: Long, sum: Double)
  case class Session(user_id: Long, session_start: Timestamp, n_events: Long,
                     sum_value: Double)

  /** Close-out sessionization: per user, events more than `gapSeconds`
    * apart start a new session; the previous one is emitted. On state
    * timeout (watermark passed last activity + gap) the open session is
    * flushed. Input batches must arrive in event-time order per user for
    * exact parity with the batch operator (true under watermarked replay;
    * within a batch we sort the group iterator). For exactness under
    * ARBITRARY batch arrival order use [[TwsBufferedSessions]], which
    * buffers in ListState until the watermark finalizes each prefix. */
  def sessionize(events: Dataset[Event], gapSeconds: Long): Dataset[Session] = {
    import events.sparkSession.implicits._
    val gapMs = gapSeconds * 1000L

    def flush(userId: Long, st: SessionState): Session =
      Session(userId, new Timestamp(st.start), st.n, st.sum)

    events
      .withWatermark("ts", s"$gapSeconds seconds")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, it: Iterator[Event], state: GroupState[SessionState]) =>
          if (it.isEmpty && state.hasTimedOut) {
            val out = state.getOption.map(flush(userId, _)).toSeq
            state.remove()
            out.iterator
          } else {
            var closed = List.empty[Session]
            var st = state.getOption.orNull
            it.toSeq.sortBy(e => (e.ts.getTime, e.event_id)).foreach { e =>
              val t = e.ts.getTime
              st = st match {
                case null => SessionState(t, t, 1, e.value)
                case s if t - s.lastTs > gapMs =>
                  closed ::= flush(userId, s)
                  SessionState(t, t, 1, e.value)
                case s => SessionState(s.start, t, s.n + 1, s.sum + e.value)
              }
            }
            if (st != null) {
              state.update(st)
              // a late batch can leave lastTs+gap at/under the current
              // watermark; setTimeoutTimestamp would throw and kill the
              // query — clamp just past the watermark so the session
              // flushes on the next trigger instead
              val wm = state.getCurrentWatermarkMs()
              state.setTimeoutTimestamp(math.max(st.lastTs + gapMs, wm + 1))
            }
            closed.reverseIterator
          }
      }
  }
}
