package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ops.Events

/** BATCH repair for the streaming funnel trace — the funnel face of
  * [[Scd2Reconcile]]: [[StreamingFunnel.taggedProgress]] quarantines
  * DISORDER EVIDENCE (an event arriving below its user's seen-order
  * high-water mark means that user's stream trace may under-report — an
  * out-of-order step-1 arrival can retroactively unlock a step-2 event
  * the stream already passed over), and [[converge]] keeps the stream
  * trace for every undisturbed user while recomputing disturbed users
  * from the source-of-truth log via [[graft.ops.Events.funnelTrace]].
  *
  * CONVERGENCE GUARANTEE (FunnelReconcileSpec pins it): a user with no
  * disorder evidence received their whole event sequence in global
  * (ts, event_id) order — each micro-batch applies sorted and every
  * arrival was at or above the high-water mark — so the stream's
  * advance recurrence IS the batch recurrence and the traces agree row
  * for row; every other user recomputes. Union = the pure-batch
  * [[graft.ops.Events.funnelTrace]] on the full corpus.
  *
  * Scale shape: the affected-user set broadcasts into an anti-join on
  * the trace and a semi-join pushdown on the event log — the recompute
  * touches only disturbed users' history (disorder is the exception;
  * if it isn't, rerun the batch operator on everything instead). */
object FunnelReconcile {

  /** @param trace  stream trace: (`userCol`, step_idx, step, `tsCol`)
    * @param late   disorder-evidence rows; only `userCol` is consulted
    * @param events the source-of-truth event log
    * @return (`userCol`, step_idx, step, `tsCol`) — the schema of
    *         [[graft.ops.Events.funnelTrace]] */
  def converge(trace: DataFrame, late: DataFrame, events: DataFrame,
               userCol: String, tsCol: String, typeCol: String,
               steps: Seq[String]): DataFrame = {
    val affected = late.select(col(userCol)).distinct()
      .localCheckpoint(eager = false)
    val clean = trace
      .withColumn("step_idx", col("step_idx").cast("long"))
      .join(broadcast(affected), Seq(userCol), "left_anti")
      .select(col(userCol), col("step_idx"), col("step"), col(tsCol))
    val redone = Events.funnelTrace(
      events.join(broadcast(affected), Seq(userCol), "left_semi"),
      userCol, tsCol, typeCol, steps)
    clean.unionByName(redone)
  }
}
