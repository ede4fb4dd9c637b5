package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming._
import graft.streaming.StatefulSessions.{Event, Session, SessionState}

/** Out-of-order-correct streaming sessionization.
  *
  * [[StatefulSessions]] and [[TwsSessions]] fold events into the open
  * session as they arrive, so they are exact only when micro-batches
  * arrive in per-user event-time order (they sort WITHIN a batch, but a
  * later batch carrying an earlier event is folded out of order). This
  * processor removes that caveat with the ListState pattern:
  *
  *  - `handleInputRows` only APPENDS to a per-user `ListState` buffer and
  *    arms a timer just past the current watermark.
  *  - When the timer fires, every buffered event with `ts <= watermark`
  *    is final (later batches can no longer deliver anything earlier —
  *    that is the watermark contract), so the drained prefix is folded in
  *    exact event-time order; still-open work stays buffered and the
  *    timer re-arms.
  *
  * State per user is O(events inside the watermark horizon) — the price
  * of exactness under disorder; the horizon bounds it, so unbounded
  * streams don't accumulate unbounded state.
  *
  * Requires the RocksDB state store provider (as all transformWithState
  * processors do). TwsBufferedSessionsSpec replays the corpus in
  * SCRAMBLED batch order and pins the output to the batch operator —
  * the ordering-sensitive implementations cannot pass that test.
  */
object TwsBufferedSessions {

  class BufferedSessionProcessor(gapMs: Long)
      extends StatefulProcessor[Long, Event, Session] {

    @transient private var buf: ListState[Event] = _
    @transient private var open: ValueState[SessionState] = _
    @transient private var timer: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      buf = getHandle.getListState[Event](
        "buf", Encoders.product[Event], TTLConfig.NONE)
      open = getHandle.getValueState[SessionState](
        "open", Encoders.product[SessionState], TTLConfig.NONE)
      timer = getHandle.getValueState[Long](
        "timer", Encoders.scalaLong, TTLConfig.NONE)
    }

    private def flush(userId: Long, st: SessionState): Session =
      Session(userId, new Timestamp(st.start), st.n, st.sum)

    private def rearm(at: Long): Unit = {
      if (timer.exists()) getHandle.deleteTimer(timer.get())
      getHandle.registerTimer(at)
      timer.update(at)
    }

    override def handleInputRows(userId: Long, rows: Iterator[Event],
                                 timers: TimerValues): Iterator[Session] = {
      rows.foreach(buf.appendValue)
      // fire once the watermark has moved past this batch: finalized
      // events (ts <= watermark) then drain in exact order
      rearm(timers.getCurrentWatermarkInMs() + 1)
      Iterator.empty
    }

    override def handleExpiredTimer(userId: Long, timers: TimerValues,
                                    info: ExpiredTimerInfo): Iterator[Session] = {
      val wm = timers.getCurrentWatermarkInMs()
      val all = buf.get().toSeq
      val (ripe, pending) = all.partition(_.ts.getTime <= wm)
      var closed = List.empty[Session]
      var st = if (open.exists()) open.get() else null
      ripe.sortBy(e => (e.ts.getTime, e.event_id)).foreach { e =>
        val t = e.ts.getTime
        st = st match {
          case null => SessionState(t, t, 1, e.value)
          case s if t - s.lastTs > gapMs =>
            closed ::= flush(userId, s)
            SessionState(t, t, 1, e.value)
          case s => SessionState(s.start, t, s.n + 1, s.sum + e.value)
        }
      }
      if (pending.nonEmpty) buf.put(pending.toArray) else buf.clear()
      st match {
        case null =>
          open.clear()
          if (pending.isEmpty) timer.clear() else rearm(wm + 1)
        case s if s.lastTs + gapMs <= wm && pending.isEmpty =>
          // idle past the gap with nothing buffered: close out
          closed ::= flush(userId, s)
          open.clear(); timer.clear()
        case s =>
          open.update(s)
          rearm(math.max(s.lastTs + gapMs, wm + 1))
      }
      closed.reverseIterator
    }
  }

  /** Same contract as [[StatefulSessions.sessionize]], exact under ANY
    * batch arrival order (within the watermark horizon). */
  def sessionize(events: Dataset[Event], gapSeconds: Long,
                 watermarkDelay: String): Dataset[Session] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .transformWithState(new BufferedSessionProcessor(gapSeconds * 1000L),
        TimeMode.EventTime(), OutputMode.Append())
  }
}
