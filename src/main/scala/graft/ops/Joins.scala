package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.broadcast

/** Join operators (SURVEY.md §2.5, reference fa-etl.py:357-391,459-476).
  *
  * All reference joins are left equi-joins (single or composite key, some
  * with mismatched key names). We use `join(right, Seq(keys), "left")` so
  * the key columns are coalesced into one output column (no ambiguity),
  * matching the reference's Polars join behavior.
  *
  * Scale notes:
  *  - Dimension-sized right sides should pass `broadcastRight = true`
  *    (maps the reference's `force_parallel=True` prop join,
  *    fa-etl.py:463-465, to a BroadcastHashJoin — no shuffle of the fact
  *    side).
  *  - Repeated joins on the same key (the unified join chain, J3–J5)
  *    reuse the fact side's hash partitioning: Catalyst inserts one
  *    Exchange on PropertyID and the later same-key joins reuse it.
  */
object Joins {

  /** J1/J3 (fa-etl.py:357-361,459-465): left equi-join on same-named keys. */
  def leftJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
               broadcastRight: Boolean = false): DataFrame =
    left.join(if (broadcastRight) broadcast(right) else right, keys, "left")

  /** J4/J5 (fa-etl.py:467-476): left equi-join where the right table's key
    * columns have different names — rename right-side keys to the left
    * names, then equi-join (so keys stay single columns in the output). */
  def leftJoinRenamed(left: DataFrame, right: DataFrame,
                      keyMap: Seq[(String, String)],
                      broadcastRight: Boolean = false): DataFrame = {
    val renamed = keyMap.foldLeft(right) { case (df, (lName, rName)) =>
      if (lName == rName) df else df.withColumnRenamed(rName, lName)
    }
    leftJoin(left, renamed, keyMap.map(_._1), broadcastRight)
  }

  /** Semi/anti generalization surface (not in the reference — SURVEY.md
    * §2.5 notes no semi/anti joins; exposed for the engine's library). */
  def semiJoin(left: DataFrame, right: DataFrame, keys: Seq[String]): DataFrame =
    left.join(right, keys, "left_semi")

  def antiJoin(left: DataFrame, right: DataFrame, keys: Seq[String]): DataFrame =
    left.join(right, keys, "left_anti")
}
