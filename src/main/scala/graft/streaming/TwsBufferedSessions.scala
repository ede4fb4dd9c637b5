package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming._
import graft.streaming.StatefulSessions.{flushSession, foldMicros, micros, Event, Session, SessionState}

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
  *  - When the timer fires, every buffered event with `ts` strictly below
  *    the watermark is final (Spark's late filter admits `ts >= watermark`,
  *    so nothing earlier can still arrive), and the drained prefix folds
  *    in exact event-time order via the shared micros fold; still-open
  *    work stays buffered and the timer re-arms.
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

  class BufferedSessionProcessor(gapUs: Long)
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

    private def rearm(at: Long): Unit = {
      if (timer.exists()) getHandle.deleteTimer(timer.get())
      getHandle.registerTimer(at)
      timer.update(at)
    }

    override def handleInputRows(userId: Long, rows: Iterator[Event],
                                 timers: TimerValues): Iterator[Session] = {
      rows.foreach(buf.appendValue)
      // fire once the watermark has moved past this batch: finalized
      // events (ts strictly below the watermark) then drain in exact order
      rearm(timers.getCurrentWatermarkInMs() + 1)
      Iterator.empty
    }

    override def handleExpiredTimer(userId: Long, timers: TimerValues,
                                    info: ExpiredTimerInfo): Iterator[Session] = {
      val wmUs = timers.getCurrentWatermarkInMs() * 1000L
      val all = buf.get().toSeq
      // strict <: an on-time event AT the watermark can still arrive
      // (the late filter drops only ts < watermark)
      val (ripe, pending) = all.partition(e => micros(e.ts) < wmUs)
      val (st, closedList) = foldMicros(userId,
        if (open.exists()) open.get() else null, ripe, gapUs)
      var closed = closedList.reverse
      if (pending.nonEmpty) buf.put(pending.toArray) else buf.clear()
      st match {
        case null =>
          open.clear()
          if (pending.isEmpty) timer.clear()
          else rearm(timers.getCurrentWatermarkInMs() + 1)
        case s if s.lastTs + gapUs < wmUs && pending.isEmpty =>
          // no buffered work and no on-time event can extend it
          // (extension needs ts <= lastTs+gap < wm, which would be late)
          closed ::= flushSession(userId, s)
          open.clear(); timer.clear()
        case s =>
          open.update(s)
          rearm(math.max(StatefulSessions.closeOutMs(s, gapUs),
            timers.getCurrentWatermarkInMs() + 1))
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
      .transformWithState(new BufferedSessionProcessor(gapSeconds * 1000000L),
        TimeMode.EventTime(), OutputMode.Append())
  }
}
