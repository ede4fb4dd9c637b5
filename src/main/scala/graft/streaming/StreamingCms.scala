package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ops.Sketches

/** Continuously-maintained Count-Min counter table — the streaming face
  * of [[graft.ops.Sketches.cmsReplay]]'s deterministic d×w sketch, and
  * the strongest batch/stream reconciliation in the repo: the counter
  * table is a PURE SUM per (depth, bucket), so the streamed table is
  * EXACTLY the batch table (no estimate error, no monotone-indicator
  * argument needed — counts are merge-exact under any batching).
  *
  * The definition below is ONE declarative plan that runs in both
  * execution modes: called on a batch DataFrame it is the batch counter
  * build; called on a `readStream` DataFrame it is an incremental
  * streaming aggregation (Complete output — the result relation is
  * bounded at d·w rows REGARDLESS of stream volume, which is exactly
  * why a sketch is the thing a 100 TB stream can afford to maintain).
  * StreamingCmsSpec pins stream == batch row-for-row on a multi-batch
  * replay.
  *
  * Scale shape: per micro-batch, one row-local bucket projection
  * (depth× explode via the broadcast depth spine) + one combinable
  * count into ≤ d·w state rows. Heavy-hitter admission probes the
  * maintained table with [[graft.ops.Sketches.cmsReplay]]'s min-over-
  * depths join on the candidate keys.
  */
object StreamingCms {

  /** (i, b, c) counter table for `keys(keyCol)` — batch or streaming. */
  def cellCounts(keys: DataFrame, keyCol: String, depth: Int = 4,
                 width: Int = 256): DataFrame = {
    require(depth >= 1 && width >= 1, "need depth, width >= 1")
    val depths = broadcast(
      keys.sparkSession.range(0, depth).select(col("id").as("i")))
    keys.select(col(keyCol).as("k")).filter(col("k").isNotNull)
      .crossJoin(depths)
      .select(col("i"), Sketches.cmsBucket(col("i"), col("k"), width)
        .as("b"))
      .groupBy(col("i"), col("b")).agg(count(lit(1)).as("c"))
  }
}
