package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming._
import graft.streaming.StatefulSessions.{Event, Session, SessionState}

/** Streaming sessionization on the `transformWithState` API (Spark 4's
  * arbitrary-state successor to `flatMapGroupsWithState`): typed
  * `ValueState` handles instead of a single opaque state object, and
  * explicit event-time TIMERS instead of a per-group timeout — the state
  * model that scales past one state blob per key (list/map state, TTL,
  * independent timer lifecycle) and the one new pipelines should target.
  *
  * Semantics are pinned to [[StatefulSessions.sessionize]] (same
  * gap-close rules, same flush-on-watermark) by TwsSessionsSpec, which
  * replays the same corpus through both and requires identical closed
  * sessions. State per user stays O(1): current session bounds +
  * aggregates, one pending timer.
  *
  * Requires the RocksDB state store provider
  * (`spark.sql.streaming.stateStore.providerClass` =
  * `...state.RocksDBStateStoreProvider`) — transformWithState does not
  * support the default HDFS-backed provider.
  */
object TwsSessions {

  class SessionProcessor(gapMs: Long)
      extends StatefulProcessor[Long, Event, Session] {

    @transient private var session: ValueState[SessionState] = _
    @transient private var timer: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      session = getHandle.getValueState[SessionState](
        "session", Encoders.product[SessionState], TTLConfig.NONE)
      timer = getHandle.getValueState[Long](
        "timer", Encoders.scalaLong, TTLConfig.NONE)
    }

    private def flush(userId: Long, st: SessionState): Session =
      Session(userId, new Timestamp(st.start), st.n, st.sum)

    override def handleInputRows(userId: Long, rows: Iterator[Event],
                                 timers: TimerValues): Iterator[Session] = {
      var closed = List.empty[Session]
      var st = if (session.exists()) session.get() else null
      // batch arrival order is arbitrary; event-time order decides gaps
      rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id)).foreach { e =>
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
        session.update(st)
        // one live timer per key: re-arm at the new close-out instant
        if (timer.exists()) getHandle.deleteTimer(timer.get())
        val at = math.max(st.lastTs + gapMs,
          timers.getCurrentWatermarkInMs() + 1)
        getHandle.registerTimer(at)
        timer.update(at)
      }
      closed.reverseIterator
    }

    override def handleExpiredTimer(userId: Long, timers: TimerValues,
                                    info: ExpiredTimerInfo): Iterator[Session] = {
      val out = if (session.exists()) Iterator.single(flush(userId, session.get()))
                else Iterator.empty
      session.clear()
      timer.clear()
      out
    }
  }

  /** Close-out sessionization, same contract as
    * [[StatefulSessions.sessionize]]: sessions are emitted when they
    * CLOSE — a later event beyond the gap, or the watermark passing the
    * session's close-out timer. */
  def sessionize(events: Dataset[Event], gapSeconds: Long): Dataset[Session] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", s"$gapSeconds seconds")
      .groupByKey(_.user_id)
      .transformWithState(new SessionProcessor(gapSeconds * 1000L),
        TimeMode.EventTime(), OutputMode.Append())
  }
}
