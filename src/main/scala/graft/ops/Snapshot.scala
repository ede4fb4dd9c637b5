package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Snapshot diff — the CDC-shaped comparison of two versions of a keyed
  * table (yesterday's corpus vs today's, a re-run vs its golden output):
  * one row per key present in either side, classified
  * `added` / `removed` / `changed` / `unchanged` with the list of
  * changed columns.
  *
  * Scale shape: ONE full-outer equi-join on the keys — each side
  * shuffles once (SMJ), the per-row comparison is codegen'd column
  * equality, and nothing aggregates: cost is two scans + two exchanges
  * regardless of how many columns are compared. Snapshots bucketed by
  * the key on disk ([[Bucketing]]) diff with no exchange at all. The
  * output is itself narrow (keys + status + changed column names), so
  * downstream consumers (incremental refresh, alerting) never touch the
  * wide payloads again.
  */
object Snapshot {

  /** Diff `newDf` against `oldDf` on `keys`. Both sides must share the
    * schema (same value columns; enforced). Null-safe comparison: a
    * column going null→non-null or non-null→null is a change, null→null
    * is not (`<=>`). `unchanged` rows are dropped unless
    * `includeUnchanged` — at 100 TB they are the overwhelming mass, and
    * filtering them before the result materializes is the point. */
  def diff(oldDf: DataFrame, newDf: DataFrame, keys: Seq[String],
           includeUnchanged: Boolean = false): DataFrame = {
    require(keys.nonEmpty, "need at least one key column")
    require(oldDf.columns.toSeq == newDf.columns.toSeq,
      s"schemas differ: ${oldDf.columns.toSeq} vs ${newDf.columns.toSeq}")
    val valueCols = oldDf.columns.filterNot(keys.contains).toSeq
    val o = oldDf.select(
      keys.map(col) :+ struct(valueCols.map(col): _*).as("__old"): _*)
    val n = newDf.select(
      keys.map(col) :+ struct(valueCols.map(col): _*).as("__new"): _*)
    val joined = o.join(n, keys, "full_outer")
    val changed: Column = filter(
      array(valueCols.map(c => when(
        !(col(s"__old.$c") <=> col(s"__new.$c")), lit(c))): _*),
      x => x.isNotNull)
    val status = when(col("__old").isNull, "added")
      .when(col("__new").isNull, "removed")
      .when(size(changed) > 0, "changed")
      .otherwise("unchanged")
    val out = joined.select(
      keys.map(col) :+ status.as("status") :+
        when(status === "changed", changed)
          .otherwise(array().cast("array<string>")).as("changed_cols"): _*)
    if (includeUnchanged) out else out.filter(col("status") =!= "unchanged")
  }
}
