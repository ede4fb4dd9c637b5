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
  *
  * All session math runs in MICROSECONDS ([[micros]]/[[foldMicros]],
  * shared by every sessionizer here): the batch operator compares
  * `unix_micros`, and `Timestamp.getTime` truncation to milliseconds
  * would both shift gap decisions at the boundary and drop the
  * sub-millisecond component of emitted `session_start`s — the events
  * corpus carries sub-millisecond timestamps on nearly every row.
  */
object StatefulSessions {

  case class Event(user_id: Long, event_id: Long, ts: Timestamp, value: Double)
  /** `start`/`lastTs` are epoch MICROSECONDS. */
  case class SessionState(start: Long, lastTs: Long, n: Long, sum: Double)
  case class Session(user_id: Long, session_start: Timestamp, n_events: Long,
                     sum_value: Double)

  /** Epoch micros of a Timestamp, keeping the sub-millisecond component
    * `getTime` truncates. floorDiv (not `/`) so pre-epoch instants with a
    * fractional second don't land one second late: getTime rounds toward
    * zero while getNanos always counts forward within the second. */
  private[streaming] def micros(t: Timestamp): Long =
    Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000

  private[streaming] def tsFromMicros(us: Long): Timestamp = {
    val t = new Timestamp(Math.floorDiv(us, 1000L))
    t.setNanos((Math.floorMod(us, 1000000L) * 1000L).toInt)
    t
  }

  private[streaming] def flushSession(userId: Long, st: SessionState): Session =
    Session(userId, tsFromMicros(st.start), st.n, st.sum)

  /** THE session gap fold, shared by all three streaming sessionizers
    * (fMGWS, transformWithState, ListState-buffered) so their semantics
    * can never diverge: sort by (event time, event_id), start a new
    * session when the gap is exceeded, flush the previous one. Returns
    * (open state or null, sessions closed by these events in order). */
  private[streaming] def foldMicros(userId: Long, initial: SessionState,
                                    events: Seq[Event],
                                    gapUs: Long): (SessionState, List[Session]) = {
    var closed = List.empty[Session]
    var st = initial
    events.sortBy(e => (micros(e.ts), e.event_id)).foreach { e =>
      val t = micros(e.ts)
      st = st match {
        case null => SessionState(t, t, 1, e.value)
        case s if t - s.lastTs > gapUs =>
          closed ::= flushSession(userId, s)
          SessionState(t, t, 1, e.value)
        case s => SessionState(s.start, t, s.n + 1, s.sum + e.value)
      }
    }
    (st, closed.reverse)
  }

  /** Millisecond instant strictly after the session's close-out micros —
    * safe for ms-granular timers/timeouts: firing at `ms` implies the
    * watermark passed `lastTs + gapUs` in micros. */
  private[streaming] def closeOutMs(st: SessionState, gapUs: Long): Long =
    (st.lastTs + gapUs) / 1000 + 1

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
    val gapUs = gapSeconds * 1000000L

    events
      .withWatermark("ts", s"$gapSeconds seconds")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, it: Iterator[Event], state: GroupState[SessionState]) =>
          if (it.isEmpty && state.hasTimedOut) {
            val out = state.getOption.map(flushSession(userId, _)).toSeq
            state.remove()
            out.iterator
          } else {
            val (st, closed) =
              foldMicros(userId, state.getOption.orNull, it.toSeq, gapUs)
            if (st != null) {
              state.update(st)
              // a late batch can leave the close-out at/under the current
              // watermark; setTimeoutTimestamp would throw and kill the
              // query — clamp just past the watermark so the session
              // flushes on the next trigger instead
              val wm = state.getCurrentWatermarkMs()
              state.setTimeoutTimestamp(math.max(closeOutMs(st, gapUs), wm + 1))
            }
            closed.iterator
          }
      }
  }
}
