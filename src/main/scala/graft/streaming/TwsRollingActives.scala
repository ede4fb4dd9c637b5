package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming._

/** Streaming rolling-actives counters — the incremental face of
  * [[graft.ops.Events.rollingActiveUsers]] (q248): per observation day,
  * how many distinct users were active that day (DAU), in the trailing
  * 7 (WAU) and trailing 28 (MAU).
  *
  * The batch face fans each distinct (user, day) presence to its ≤ 28
  * forward horizon days and count-distincts per day. That explode is
  * naturally incremental because each (day, horizon, user) indicator is
  * MONOTONE: user u counts toward horizon day t iff u has ANY active
  * day in [t − window + 1 … t], and once some arrival covers t the
  * indicator can never unflip — so the increment stream is
  * append-only (+1 exactly when the FIRST covering day arrives) and is
  * correct under ANY arrival order, including late days (a
  * later-arriving earlier day only flips indicators no other day has
  * covered yet; decrements cannot exist). That monotonicity is the
  * whole design: per-key counters need no retraction channel.
  *
  * Processor state (keyed by user): the user's distinct active-day set
  * (`ListState[Long]` — epoch days, the batch face's
  * `unix_timestamp(date_trunc(day)) div 86400` exactly). Each NEW day d
  * emits at most 28 (day, dau_inc, wau7_inc, mau28_inc) rows: +1 to
  * horizon day t for a tier iff no prior day of this user covered t at
  * that tier's window. Downstream, per-day totals are ONE combinable
  * streaming sum per day — the same counter shape as the batch agg —
  * and stickiness stays derived ((1e6·dau) div wau7), never stored.
  *
  * Scale/state bound: state is per-user DISTINCT DAYS, not events —
  * ≤ one long per user-day. In production, days older than the
  * watermark minus 27 can be pruned (they can never flip an indicator
  * for any day at or above the watermark, and later data is dropped by
  * the watermark anyway); the reconciliation spec replays a bounded
  * fixture, so the spec path keeps all days (TimeMode.None, the
  * [[TwsTypeCounts]] ttl = None contract).
  *
  * TwsRollingActivesSpec pins stream-summed counters == the batch
  * face's (dau, wau7, mau28, stickiness) row-for-row on the replayed
  * sf0.001 corpus across multi-batch, shuffled-file replay.
  */
object TwsRollingActives {

  case class UserEvent(user_id: Long, ts: Timestamp)
  /** Per-flip increments for one observation day (never negative). */
  case class ActiveInc(day: Long, dau: Long, wau7: Long, mau28: Long)

  class RollingProcessor
      extends StatefulProcessor[Long, UserEvent, ActiveInc] {

    @transient private var days: ListState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      days = getHandle.getListState[Long]("days", Encoders.scalaLong,
        TTLConfig.NONE)
    }

    override def handleInputRows(userId: Long, rows: Iterator[UserEvent],
                                 timers: TimerValues)
        : Iterator[ActiveInc] = {
      var s: Set[Long] = days.get().toSet
      val fresh = scala.collection.mutable.ArrayBuffer[Long]()
      val out = scala.collection.mutable.ArrayBuffer[ActiveInc]()
      rows.foreach { e =>
        val d = Math.floorDiv(e.ts.getTime, 86400000L)
        if (!s.contains(d)) {
          var k = 0L
          while (k <= 27L) {
            val t = d + k
            // covered(t, w): some PRIOR day of this user in (t-w, t]
            def covered(w: Long) = s.exists(x => x > t - w && x <= t)
            val mauFlip = !covered(28L)
            val wauFlip = k <= 6L && !covered(7L)
            val dauFlip = k == 0L // d itself is new by the guard above
            if (mauFlip || wauFlip || dauFlip)
              out += ActiveInc(t, if (dauFlip) 1L else 0L,
                if (wauFlip) 1L else 0L, if (mauFlip) 1L else 0L)
            k += 1
          }
          s = s + d
          fresh += d
        }
      }
      fresh.foreach(days.appendValue)
      out.iterator
    }
  }

  /** Append-only (day, dau, wau7, mau28) increment rows; per-day sums
    * are the rolling-actives counters. */
  def activeIncrements(events: Dataset[UserEvent]): Dataset[ActiveInc] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .transformWithState(new RollingProcessor, TimeMode.None(),
        OutputMode.Append())
  }
}
