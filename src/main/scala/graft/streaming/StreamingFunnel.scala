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
  case class FunnelState(stepIdx: Int, tsMicros: Long)

  class FunnelProcessor(steps: Seq[String])
      extends StatefulProcessor[Long, FunnelEvent, Progress] {

    @transient private var st: ValueState[FunnelState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      st = getHandle.getValueState[FunnelState]("funnel",
        Encoders.product[FunnelState], TTLConfig.NONE)
    }

    private def micros(ts: Timestamp): Long =
      ts.getTime * 1000L + (ts.getNanos / 1000) % 1000

    override def handleInputRows(userId: Long, rows: Iterator[FunnelEvent],
                                 timers: TimerValues): Iterator[Progress] = {
      val sorted = rows.toArray.sortBy(e => (micros(e.ts), e.event_id))
      val out = scala.collection.mutable.ArrayBuffer[Progress]()
      // stepIdx = index of the NEXT step to match; -1 ts = nothing yet
      var cur = if (st.exists()) st.get() else FunnelState(0, Long.MinValue)
      sorted.foreach { e =>
        if (cur.stepIdx < steps.length &&
          e.event_type == steps(cur.stepIdx) &&
          (cur.stepIdx == 0 || micros(e.ts) > cur.tsMicros)) {
          out += Progress(userId, cur.stepIdx + 1, e.event_type, e.ts)
          cur = FunnelState(cur.stepIdx + 1, micros(e.ts))
        }
      }
      st.update(cur)
      out.iterator
    }
  }

  /** The progress stream: Append-mode transformWithState keyed by user;
    * one shuffle on the key, constant state per key. */
  def progress(events: Dataset[FunnelEvent],
               steps: Seq[String]): Dataset[Progress] = {
    require(steps.nonEmpty, "need at least one funnel step")
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .transformWithState(new FunnelProcessor(steps),
        TimeMode.None(), OutputMode.Append())
  }
}
