package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming._

/** Streaming half of the SCD1 merge ([[graft.ops.Snapshot.applyCdc]] is
  * the batch face): maintain, per key, the HIGHEST-sequence change seen
  * so far on an unbounded CDC stream — the live "latest change" table a
  * periodic merge job joins against the base snapshot.
  *
  * Emission contract: a key emits whenever its winner IMPROVES (first
  * change, or a higher `seq` arrives), so the append sink holds a
  * monotone-in-`seq` emission history per key and `max_by(seq)` over the
  * sink is the current latest-change table — exactly the relation the
  * batch operator's window top-1 computes over the full batch
  * (StreamingCdcSpec pins stream == batch on a multi-micro-batch,
  * out-of-order replay, and that merging the streamed table reproduces
  * `applyCdc` of the full batch). Out-of-order arrivals need no
  * quarantine/repair pair, unlike SCD2: last-write-wins is
  * order-insensitive by construction — a stale change arriving late
  * simply loses the `seq` comparison. That is WHY CDC consumers prefer
  * SCD1-with-LSN when they can afford it.
  *
  * PRECONDITION (same as the batch face): `seq` totally orders each
  * key's changes; with duplicate (key, seq) pairs the winner is
  * arrival-order dependent.
  *
  * State per key is ONE change row — O(keys-with-changes), not O(log).
  * Requires the RocksDB state store provider (transformWithState
  * contract, see [[TwsSessions]]). */
object StreamingCdc {

  /** One CDC record: key, the replacement values, batch sequence, and
    * op ("U" upsert / "D" delete). */
  case class Change(k: Long, price_cents: Long, status: String,
                    seq: Long, op: String)

  class LatestProcessor extends StatefulProcessor[Long, Change, Change] {

    @transient private var latest: ValueState[Change] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      latest = getHandle.getValueState[Change](
        "latest", Encoders.product[Change], TTLConfig.NONE)
    }

    override def handleInputRows(key: Long, rows: Iterator[Change],
                                 timers: TimerValues): Iterator[Change] = {
      val incoming = rows.maxBy(_.seq)
      val cur = if (latest.exists()) Some(latest.get()) else None
      if (cur.forall(_.seq < incoming.seq)) {
        latest.update(incoming)
        Iterator.single(incoming)
      } else Iterator.empty
    }
  }

  /** Running latest-change-per-key over a CDC stream. */
  def latestChanges(changes: Dataset[Change]): Dataset[Change] = {
    import changes.sparkSession.implicits._
    changes
      .groupByKey(_.k)
      .transformWithState(new LatestProcessor,
        TimeMode.None(), OutputMode.Append())
  }
}
