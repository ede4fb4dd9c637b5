package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ops.Events

/** BATCH repair for the streaming SCD2 log — the composition that turns
  * "[[StreamingScd2]] drops late rows by contract" from a documented
  * limitation into a tested convergence story.
  *
  * The deployment shape: the live stream appends change rows and
  * quarantines late rows ([[StreamingScd2.taggedLog]]); a periodic batch
  * job calls [[converge]] with the accumulated quarantine and the
  * source-of-truth event log. Keys that never saw a late row keep their
  * stream-derived history (only interval CLOSING is computed — the open
  * stream can never know `valid_to`); keys with any late row are
  * recomputed from the full log by the batch operator
  * ([[graft.ops.Events.scd2History]]) — correcting history needs the
  * history, not just the dropped rows (a late row can both insert a
  * change AND erase a later one the stream already emitted, so patching
  * the log in place is not possible in general).
  *
  * CONVERGENCE GUARANTEE (Scd2ReconcileSpec pins it end-to-end): for a
  * key with no late rows the stream applied exactly its full (ts, ord)-
  * sorted event sequence, so its emitted changes equal the batch change
  * points and closing them reproduces the batch intervals; for every
  * other key the batch operator recomputes from scratch. Union = the
  * pure-batch answer on the full corpus, row for row.
  *
  * Scale shape: the affected-key set (distinct keys of the quarantine —
  * late data is the exception, not the rule) BROADCASTS into an
  * anti-join on the stream log and a semi-join pushdown on the event
  * log, so the recompute touches only affected keys' history; interval
  * closing is one window over the change log (change rows per key, not
  * events). If a pipeline ever quarantines a large fraction of keys,
  * skip the surgery and rerun the batch operator on everything —
  * reconcile exists for the sparse-late regime. */
object Scd2Reconcile {

  /** Merge the stream's change log with its late-row quarantine into the
    * converged SCD2 dimension table.
    *
    * @param changes stream change log: (`keyCol`, attr, valid_from,
    *                `ordCol`) — [[StreamingScd2.Scd2Out]] rows of kind
    *                "change" with `ts` renamed valid_from
    * @param late    quarantined rows; only `keyCol` is consulted
    * @param events  the source-of-truth event log (full history)
    * @param attr    the tracked attribute, as a Column over `events`
    * @return (`keyCol`, attr, valid_from, valid_to, is_current) — the
    *         schema of [[graft.ops.Events.scd2History]]
    */
  def converge(changes: DataFrame, late: DataFrame, events: DataFrame,
               keyCol: String, tsCol: String, ordCol: String,
               attr: Column): DataFrame = {
    val affected = late.select(col(keyCol)).distinct()
      .localCheckpoint(eager = false)
    val clean = changes.join(broadcast(affected), Seq(keyCol), "left_anti")
    // close intervals on the clean stream log — lead over CHANGE rows in
    // the same (ts, ord) total order the batch operator uses
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col("valid_from").asc, col(ordCol).asc)
    val closed = clean
      .withColumn("valid_to", lead(col("valid_from"), 1).over(w))
      .select(col(keyCol), col("attr"), col("valid_from"), col("valid_to"),
        col("valid_to").isNull.as("is_current"))
    val redone = Events.scd2History(
      events.join(broadcast(affected), Seq(keyCol), "left_semi"),
      keyCol, tsCol, ordCol, attr)
    closed.unionByName(redone)
  }
}
