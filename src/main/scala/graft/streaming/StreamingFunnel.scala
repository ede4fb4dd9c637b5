package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming._

/** Streaming FUNNEL progress — the live face of the batch
  * [[graft.ops.Events.funnel]] (q116): per user, emit one row the moment
  * the user ADVANCES to the next funnel step (their earliest matching
  * event strictly after the previous step's time). The emitted log is
  * the per-user progress trace; the batch operator's step counts are its
  * aggregation.
  *
  * Same ordering contract as [[StreamingScd2]]: rows sort by
  * (ts, event_id) within each micro-batch; an event that would advance
  * the funnel but sits at or before the recorded previous-step time
  * cannot convert (strict `>`, exactly the batch semantics), and events
  * for steps already passed are ignored. With in-order arrival the
  * trace equals the batch funnel per user (spec-pinned against a JVM
  * replay of the batch definition).
  *
  * State per key: the reached step index + its timestamp — constant
  * size. */
object StreamingFunnel {

  case class FunnelEvent(user_id: Long, event_id: Long, ts: Timestamp,
                         event_type: String)
  case class Progress(user_id: Long, step_idx: Int, step: String,
                      ts: Timestamp)

  /** Tagged stream row: `kind = "step"` is a funnel advance (the
    * [[Progress]] payload); `kind = "late"` records DISORDER EVIDENCE —
    * the event arrived below the user's high-water mark of already-seen
    * (ts, event_id) order keys, so the user's stream trace may
    * under-report and [[FunnelReconcile.converge]] must recompute it.
    * (Unlike SCD2 the funnel has no per-row drop: a non-advancing event
    * is usually just irrelevant — only ORDER INVERSION makes the trace
    * untrustworthy, so that is what quarantines.) */
  case class FunnelOut(user_id: Long, kind: String, step_idx: Int,
                       step: String, ts: Timestamp, event_id: Long)
  case class FunnelState(stepIdx: Int, tsMicros: Long,
                         hwMicros: Long, hwEid: Long)

  class FunnelProcessor(steps: Seq[String])
      extends StatefulProcessor[Long, FunnelEvent, FunnelOut] {

    @transient private var st: ValueState[FunnelState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      st = getHandle.getValueState[FunnelState]("funnel",
        Encoders.product[FunnelState], TTLConfig.NONE)
    }

    private def micros(ts: Timestamp): Long =
      ts.getTime * 1000L + (ts.getNanos / 1000) % 1000

    override def handleInputRows(userId: Long, rows: Iterator[FunnelEvent],
                                 timers: TimerValues): Iterator[FunnelOut] = {
      val sorted = rows.toArray.sortBy(e => (micros(e.ts), e.event_id))
      val out = scala.collection.mutable.ArrayBuffer[FunnelOut]()
      // stepIdx = index of the NEXT step to match; hw = the largest
      // (ts, event_id) SEEN (any type — disorder detection, not
      // funnel progress)
      var cur = if (st.exists()) st.get()
        else FunnelState(0, Long.MinValue, Long.MinValue, Long.MinValue)
      sorted.foreach { e =>
        val key = (micros(e.ts), e.event_id)
        if (Ordering[(Long, Long)].lt(key, (cur.hwMicros, cur.hwEid))) {
          // quarantine ONLY: a late (out-of-order) event must not
          // mutate funnel state or emit a "step" row — its user is
          // recomputed by the reconcile path; letting it advance would
          // put disorder-driven rows in progress()'s trace with no
          // disorder signal attached
          out += FunnelOut(userId, "late", -1, e.event_type, e.ts,
            e.event_id)
        } else {
          cur = cur.copy(hwMicros = key._1, hwEid = key._2)
          if (cur.stepIdx < steps.length &&
            e.event_type == steps(cur.stepIdx) &&
            (cur.stepIdx == 0 || micros(e.ts) > cur.tsMicros)) {
            out += FunnelOut(userId, "step", cur.stepIdx + 1, e.event_type,
              e.ts, e.event_id)
            cur = cur.copy(stepIdx = cur.stepIdx + 1,
              tsMicros = micros(e.ts))
          }
        }
      }
      st.update(cur)
      out.iterator
    }
  }

  /** The TAGGED stream: funnel advances AND disorder-evidence rows in
    * one Append output (split downstream on `kind`); the "late"
    * partition drives [[FunnelReconcile.converge]]'s periodic repair. */
  def taggedProgress(events: Dataset[FunnelEvent],
                     steps: Seq[String]): Dataset[FunnelOut] = {
    require(steps.nonEmpty, "need at least one funnel step")
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .transformWithState(new FunnelProcessor(steps),
        TimeMode.None(), OutputMode.Append())
  }

  /** The progress stream: Append-mode transformWithState keyed by user;
    * one shuffle on the key, constant state per key. (The step-only
    * projection of [[taggedProgress]].) */
  def progress(events: Dataset[FunnelEvent],
               steps: Seq[String]): Dataset[Progress] = {
    import events.sparkSession.implicits._
    taggedProgress(events, steps)
      .filter(_.kind == "step")
      .map(o => Progress(o.user_id, o.step_idx, o.step, o.ts))
  }
}
