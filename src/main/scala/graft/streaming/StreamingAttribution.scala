package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import graft.ops.Events

/** Streaming face of [[graft.ops.Events.timeDecayAttribution]] (q280) —
  * attribution is a pure function of a user's event history, so the
  * streaming form is per-user RECOMPUTE-ON-TOUCH: each micro-batch
  * appends its events to a batch_id-partitioned archive (the
  * StreamingDedup replay discipline — a replayed batch rewrites its own
  * partition), then recomputes credits ONLY for users present in the
  * batch (left-semi against the archive) and writes them under the
  * batch's partition. The live view is LATEST-WINS PER USER.
  *
  * Why latest-wins is exact (StreamingAttributionSpec pins it): a
  * recompute always runs over the user's FULL history-so-far, and q280
  * credits are append-monotone — a new touch binds to its NEXT
  * conversion, so rows for already-converted journeys never change and
  * a later recompute's output is a superset of every earlier one. The
  * per-user latest snapshot therefore equals the batch face over the
  * same events, row for row.
  *
  * Scale shape per trigger: one bounded batch write (hive-partitioned
  * by `u_bucket = hash(user) mod nBuckets` under the batch's
  * partition), then a STORAGE-PRUNED history read: the recompute scans
  * only the archive buckets the batch touched (`u_bucket IN
  * (batch's buckets)` — directory-level pruning, never a full-archive
  * scan; `batch_id <= N` prunes replayed-future partitions), refines
  * with the user left-semi inside those buckets, and runs q280's
  * two-window plan over only those users' histories. Per-trigger read
  * cost is (touched buckets / nBuckets) of the history, not all of it
  * — size nBuckets so one bucket's history fits an executor's scan
  * budget (more buckets = tighter pruning for sparse batches). */
object StreamingAttribution {

  def timeDecay(stream: DataFrame, userCol: String, tsCol: String,
                ordCol: String, typeCol: String, touchType: String,
                convType: String, eventsDir: String, creditsDir: String,
                checkpointDir: String,
                halfLifeSeconds: Long = 86400L,
                nBuckets: Int = 64): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyBatch(batch, batchId, userCol, tsCol, ordCol, typeCol,
          touchType, convType, eventsDir, creditsDir, halfLifeSeconds,
          nBuckets)
      }
      .start()

  /** One attribution round — also the non-streaming entry a scheduled
    * ingest calls with its own batch ids. `nBuckets` must stay
    * constant across a given archive's lifetime (it defines the
    * partition layout). LAYOUT COMPATIBILITY: archives written before
    * the `u_bucket` layer existed (flat batch_id partitions) are NOT
    * readable by this version — mixed partition layouts under one
    * eventsDir break Spark partition discovery (and the `u_bucket`
    * filter would error). Rewrite such an archive with the bucket
    * column (one pass: read each legacy batch partition, add
    * `pmod(hash(user), nBuckets)`, write back partitioned) or replay
    * the stream from its source before upgrading. */
  def applyBatch(batch: DataFrame, batchId: Long, userCol: String,
                 tsCol: String, ordCol: String, typeCol: String,
                 touchType: String, convType: String, eventsDir: String,
                 creditsDir: String, halfLifeSeconds: Long,
                 nBuckets: Int = 64): Unit = {
    require(nBuckets >= 1, "need nBuckets >= 1")
    val spark = batch.sparkSession
    val bucket = pmod(hash(col(userCol)), lit(nBuckets))
    batch.select(col(userCol), col(tsCol), col(ordCol), col(typeCol),
        bucket.as("u_bucket"))
      .write.mode("overwrite").partitionBy("u_bucket")
      .parquet(s"$eventsDir/batch_id=$batchId")
    val users = batch.select(col(userCol)).distinct()
    // bounded driver read: at most nBuckets values — the partition
    // directories this trigger is allowed to scan
    val touched = batch.select(bucket.as("b")).distinct()
      .collect().map(_.getInt(0))
    val hist = Archives.read(spark, eventsDir)
      .filter(col("batch_id") <= batchId &&
        col("u_bucket").isin(touched.map(Integer.valueOf): _*))
      .join(users, Seq(userCol), "left_semi")
      .select(col(userCol), col(tsCol), col(ordCol), col(typeCol))
    Events.timeDecayAttribution(hist, userCol, tsCol, ordCol, typeCol,
        touchType, convType, halfLifeSeconds)
      .write.mode("overwrite").parquet(s"$creditsDir/batch_id=$batchId")
  }

  /** Latest-wins live view: per user, the credit rows of that user's
    * most recent recompute (exact vs the batch face — see scaladoc). */
  def currentCredits(spark: SparkSession, creditsDir: String,
                     userCol: String): DataFrame = {
    val all = Archives.read(spark, creditsDir)
    val latest = all.groupBy(col(userCol))
      .agg(max(col("batch_id")).as("batch_id"))
    all.join(latest, Seq(userCol, "batch_id")).drop("batch_id")
  }
}
