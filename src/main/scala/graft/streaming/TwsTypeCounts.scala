package graft.streaming

import java.sql.Timestamp
import java.time.Duration
import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming._

/** Streaming per-user running counts by event type — the `MapState`
  * member of the transformWithState family (ValueState: [[TwsSessions]],
  * ListState: [[TwsBufferedSessions]]). One map entry per (user, type),
  * optionally with a TTL: an idle key's state expires `ttl` after its
  * last update (processing time), the state-hygiene contract a
  * long-running per-entity feature store needs — counts survive as long
  * as the entity is active, and dead entities don't accumulate forever.
  *
  * TTL is processing-time based, so the TTL'd variant runs in
  * `TimeMode.ProcessingTime` — NOTE: in that mode the engine triggers
  * micro-batches continuously with the default trigger (timers/TTL can
  * fire at any instant, so there is always potential work; each batch
  * pays a state-store commit). Production queries should set a trigger
  * interval; test harnesses must poll for convergence rather than
  * `processAllAvailable` (which never settles). `ttl = None` runs in
  * `TimeMode.None` with no such behavior.
  *
  * Emits the updated running count for every (user, type) touched by a
  * batch; the latest row per key is the current count (monotonic, so
  * `max` aggregates it safely from an append sink).
  */
object TwsTypeCounts {

  case class TypedEvent(user_id: Long, event_id: Long, ts: Timestamp,
                        event_type: String)
  case class TypeCount(user_id: Long, event_type: String, n: Long)

  class TypeCountProcessor(ttl: Option[Duration])
      extends StatefulProcessor[Long, TypedEvent, TypeCount] {

    @transient private var counts: MapState[String, Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      counts = getHandle.getMapState[String, Long]("counts",
        Encoders.STRING, Encoders.scalaLong,
        ttl.map(TTLConfig(_)).getOrElse(TTLConfig.NONE))
    }

    override def handleInputRows(userId: Long, rows: Iterator[TypedEvent],
                                 timers: TimerValues): Iterator[TypeCount] = {
      val touched = scala.collection.mutable.LinkedHashMap[String, Long]()
      rows.foreach { e =>
        val next = touched.getOrElse(e.event_type,
          if (counts.containsKey(e.event_type)) counts.getValue(e.event_type)
          else 0L) + 1
        touched(e.event_type) = next
      }
      touched.foreach { case (t, n) => counts.updateValue(t, n) }
      touched.iterator.map { case (t, n) => TypeCount(userId, t, n) }
    }
  }

  /** Running (user, event_type) counts over an unbounded stream; state
    * for keys idle longer than `ttl` expires (None = keep forever). */
  def typeCounts(events: Dataset[TypedEvent],
                 ttl: Option[Duration] = Some(Duration.ofDays(1))): Dataset[TypeCount] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .transformWithState(new TypeCountProcessor(ttl),
        if (ttl.isDefined) TimeMode.ProcessingTime() else TimeMode.None(),
        OutputMode.Append())
  }
}
