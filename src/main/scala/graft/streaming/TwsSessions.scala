package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming._
import graft.streaming.StatefulSessions.{closeOutMs, flushSession, foldMicros, Event, Session, SessionState}

/** Streaming sessionization on the `transformWithState` API (Spark 4's
  * arbitrary-state successor to `flatMapGroupsWithState`): typed
  * `ValueState` handles instead of a single opaque state object, and
  * explicit event-time TIMERS instead of a per-group timeout — the state
  * model that scales past one state blob per key (list/map state, TTL,
  * independent timer lifecycle) and the one new pipelines should target.
  *
  * Semantics are pinned to [[StatefulSessions.sessionize]] (same
  * gap-close rules via the shared micros fold, same flush-on-watermark)
  * by TwsSessionsSpec, which replays the same corpus through both and
  * requires identical closed sessions. State per user stays O(1):
  * current session bounds + aggregates, one pending timer.
  *
  * Requires the RocksDB state store provider
  * (`spark.sql.streaming.stateStore.providerClass` =
  * `...state.RocksDBStateStoreProvider`) — transformWithState does not
  * support the default HDFS-backed provider.
  */
object TwsSessions {

  class SessionProcessor(gapUs: Long)
      extends StatefulProcessor[Long, Event, Session] {

    @transient private var session: ValueState[SessionState] = _
    @transient private var timer: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      session = getHandle.getValueState[SessionState](
        "session", Encoders.product[SessionState], TTLConfig.NONE)
      timer = getHandle.getValueState[Long](
        "timer", Encoders.scalaLong, TTLConfig.NONE)
    }

    override def handleInputRows(userId: Long, rows: Iterator[Event],
                                 timers: TimerValues): Iterator[Session] = {
      val (st, closed) = foldMicros(userId,
        if (session.exists()) session.get() else null, rows.toSeq, gapUs)
      if (st != null) {
        session.update(st)
        // one live timer per key: re-arm at the new close-out instant
        if (timer.exists()) getHandle.deleteTimer(timer.get())
        val at = math.max(closeOutMs(st, gapUs),
          timers.getCurrentWatermarkInMs() + 1)
        getHandle.registerTimer(at)
        timer.update(at)
      }
      closed.iterator
    }

    override def handleExpiredTimer(userId: Long, timers: TimerValues,
                                    info: ExpiredTimerInfo): Iterator[Session] = {
      val out = if (session.exists()) Iterator.single(flushSession(userId, session.get()))
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
      .transformWithState(new SessionProcessor(gapSeconds * 1000000L),
        TimeMode.EventTime(), OutputMode.Append())
  }
}
