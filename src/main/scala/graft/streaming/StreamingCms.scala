package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
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

  /** Fold all cell-count partials with batch_id ≤ `upTo` into one
    * base layer ([[Archives.compact]]): counter cells are plain long
    * sums — exact fold, ≤ d·w rows remain. */
  def compactState(spark: org.apache.spark.sql.SparkSession,
                   stateDir: String, upTo: Long): Unit =
    Archives.compact(spark, stateDir, upTo, Seq("i", "b"),
      Seq(sum(col("c")).as("c")))

  /** ONLINE HEAVY-HITTER ADMISSION — the frequency gate a streaming
    * dedup/quality pipeline wants: per micro-batch, the batch's d×w
    * cell partials append to `stateDir` (bounded rows per batch — the
    * sketch property; state compaction is just a re-agg), and the
    * batch's distinct keys probe the ACCUMULATED counter table with
    * the [[graft.ops.Sketches.cmsReplay]] min-over-depths join; keys
    * whose estimate-so-far ≥ `minCount` land in `admitDir`.
    *
    * Contract (StreamingCmsSpec pins both sides): est-so-far ≥
    * exact-so-far at every batch, and a key's exact-so-far equals its
    * exact TOTAL at its last appearance, so the admitted union has
    * RECALL 1 against true total-count heavy hitters; and since
    * est-so-far ≤ final batch est, admitted ⊆ the batch sketch's
    * admission set (false positives bounded by the d×w CMS bound,
    * exactly as in batch). Idempotence: both writes land in
    * `batch_id=N` partitions with overwrite (the StreamingDedup replay
    * discipline), and the accumulation filters `batch_id <= N` so a
    * replayed batch never double-counts itself or sees a later write.
    *
    * Scale shape per trigger: one bounded cell agg + one broadcast
    * depth-spine probe of the batch's keys against a ≤ d·w-row
    * aggregated state — never a corpus re-scan, never unbounded
    * per-key state. */
  def heavyHitterAdmit(stream: DataFrame, keyCol: String, minCount: Long,
                       stateDir: String, admitDir: String,
                       checkpointDir: String, depth: Int = 4,
                       width: Int = 256): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        admitBatch(batch, batchId, keyCol, minCount, stateDir, admitDir,
          depth, width)
      }
      .start()

  /** One admission round — also the non-streaming entry a scheduled
    * ingest calls with its own batch ids. Writes the batch's cell
    * partials BEFORE probing, so a key's own batch contributes to its
    * estimate (exact-so-far at last appearance = exact total — the
    * recall-1 argument). */
  def admitBatch(batch: DataFrame, batchId: Long, keyCol: String,
                 minCount: Long, stateDir: String, admitDir: String,
                 depth: Int = 4, width: Int = 256): Unit = {
    val spark = batch.sparkSession
    cellCounts(batch, keyCol, depth, width)
      .write.mode("overwrite").parquet(s"$stateDir/batch_id=$batchId")
    val acc = Archives.read(spark, stateDir)
      .filter(col("batch_id") <= batchId)
      .groupBy(col("i"), col("b")).agg(sum(col("c")).as("c"))
    val depths = broadcast(
      spark.range(0, depth).select(col("id").as("i")))
    batch.select(col(keyCol).as("k")).filter(col("k").isNotNull)
      .distinct()
      .crossJoin(depths)
      .select(col("k"), col("i"),
        Sketches.cmsBucket(col("i"), col("k"), width).as("b"))
      .join(acc, Seq("i", "b"))
      .groupBy(col("k")).agg(min(col("c")).as("est"))
      .filter(col("est") >= minCount)
      .write.mode("overwrite").parquet(s"$admitDir/batch_id=$batchId")
  }
}
