package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming._

/** Streaming SCD2 CHANGE LOG — the live face of the batch
  * [[graft.ops.Events.scd2History]] (q111): per key, emit one row the
  * moment the tracked attribute CHANGES, carrying `valid_from` = the
  * changing event's timestamp. Downstream, the batch operator closes
  * intervals (`valid_to`/`is_current`) at reconciliation time — the
  * standard stream-log + batch-compact pairing, because an open stream
  * can never know a row's `valid_to` until the NEXT change arrives.
  *
  * Ordering contract (explicit, the honest part): rows are applied in
  * (ts, event_id) order WITHIN each micro-batch (the batch's rows are
  * buffered and sorted — bounded by batch size), and a row at or before
  * the last APPLIED (ts, event_id) is DROPPED as late — a ValueState
  * holds only the latest applied (attr, order-key), so re-sorting
  * history is the batch path's job, not the stream's. With in-order
  * arrival (the common log-shipping case) the emitted log equals the
  * batch change points exactly (spec-pinned); under disorder the stream
  * under-reports rather than emitting retroactive corrections.
  *
  * State per key: one (attr, tsMicros, eventId) triple — constant
  * size, no TTL needed (an SCD dimension's keys are live by
  * definition; add one via TTLConfig if the key space churns). */
object StreamingScd2 {

  case class AttrEvent(user_id: Long, event_id: Long, ts: Timestamp,
                       attr: Long)
  case class Change(user_id: Long, attr: Long, valid_from: Timestamp)
  case class Scd2State(attr: Long, tsMicros: Long, eventId: Long)

  /** Tagged stream row: `kind = "change"` is a change-log entry (`ts` =
    * valid_from, `event_id` = the changing event); `kind = "late"` is a
    * DROPPED late row replayed verbatim for the quarantine table — the
    * input [[Scd2Reconcile.converge]] needs to repair history. */
  case class Scd2Out(user_id: Long, kind: String, attr: Long,
                     ts: Timestamp, event_id: Long)

  class Scd2Processor
      extends StatefulProcessor[Long, AttrEvent, Scd2Out] {

    @transient private var last: ValueState[Scd2State] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      last = getHandle.getValueState[Scd2State]("last",
        Encoders.product[Scd2State], TTLConfig.NONE)
    }

    private def micros(ts: Timestamp): Long =
      ts.getTime * 1000L + (ts.getNanos / 1000) % 1000

    override def handleInputRows(userId: Long, rows: Iterator[AttrEvent],
                                 timers: TimerValues): Iterator[Scd2Out] = {
      val sorted = rows.toArray.sortBy(e => (micros(e.ts), e.event_id))
      val out = scala.collection.mutable.ArrayBuffer[Scd2Out]()
      var st = if (last.exists()) Option(last.get()) else None
      sorted.foreach { e =>
        val key = (micros(e.ts), e.event_id)
        val lateOrEqual = st.exists(s => (s.tsMicros, s.eventId) == key ||
          Ordering[(Long, Long)].lt(key, (s.tsMicros, s.eventId)))
        if (!lateOrEqual) {
          if (!st.map(_.attr).contains(e.attr))
            out += Scd2Out(userId, "change", e.attr, e.ts, e.event_id)
          st = Some(Scd2State(e.attr, key._1, key._2))
        } else
          out += Scd2Out(userId, "late", e.attr, e.ts, e.event_id)
      }
      st.foreach(last.update)
      out.iterator
    }
  }

  /** The TAGGED stream: change-log entries AND the late-row quarantine
    * in one Append output (split downstream on `kind`). Same state and
    * ordering contract as [[changeLog]]; a real deployment sinks the
    * "late" partition to the quarantine table that drives periodic
    * [[Scd2Reconcile.converge]] repair. */
  def taggedLog(events: Dataset[AttrEvent]): Dataset[Scd2Out] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .transformWithState(new Scd2Processor,
        TimeMode.None(), OutputMode.Append())
  }

  /** The change-log stream: Append-mode transformWithState keyed by
    * user; one shuffle on the key, constant state per key. (The
    * change-only projection of [[taggedLog]] — late rows drop here BY
    * CONTRACT; keep the tagged form when repair matters.) */
  def changeLog(events: Dataset[AttrEvent]): Dataset[Change] = {
    import events.sparkSession.implicits._
    taggedLog(events)
      .filter(_.kind == "change")
      .map(o => Change(o.user_id, o.attr, o.ts))
  }
}
