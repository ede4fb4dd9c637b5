package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import graft.ops.Sketches

/** Streaming face of [[graft.ops.Sketches.hllReplay]] (q299) — the
  * live distinct-count card, and the ALGEBRAICALLY friendliest archive
  * face yet: an HLL register value is a MAX, which is associative AND
  * idempotent, so per-batch register partials merge exactly under any
  * batch split (batch==stream is exact) and re-delivering the same
  * rows — under the SAME batch id (overwrite) or even a NEW one —
  * cannot move the estimate at all. That is strictly stronger than
  * the sum-based archives (Hoover/HT/group-sequential), whose
  * exactly-once story leans on partition overwrite; here at-least-once
  * is harmless BY ALGEBRA (only the row-count column, a plain sum,
  * still wants the overwrite discipline).
  *
  * Scale shape per trigger: the batch rollup is one combinable
  * max-per-register agg whose output is ≤ m = 2^p rows REGARDLESS of
  * batch size; the archive holds ≤ m rows per batch (plus the row
  * count rolled into the same relation), so the recompute reads a
  * (#batches × m)-bounded relation — never raw history — and the card
  * is [[Sketches.hllEstimate]]'s one mirrored expression over exact
  * integer moments, byte-identical to the batch face's estimator.
  * Global card (no group key), so every trigger recomputes the one
  * card; `p` must stay constant across an archive's lifetime. */
object StreamingHll {

  def distinctCard(stream: DataFrame, keyCol: Column, regsDir: String,
                   cardsDir: String, checkpointDir: String,
                   p: Int = 8, compactEvery: Int = 0): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyBatch(batch, batchId, keyCol, regsDir, cardsDir, p,
          compactEvery)
      }
      .start()

  /** One HLL round — also the non-streaming entry a scheduled ingest
    * calls with its own batch ids. `compactEvery` > 0 folds the
    * register archive every that-many batches — up to `batchId − 1`
    * ONLY: the batch being processed is not checkpoint-committed until
    * foreachBatch returns, and a replay of it overwrites its own
    * partition — folding history INTO that partition first would let
    * the replay's overwrite destroy it. batchId − 1 is always
    * committed (foreachBatch ids are sequential), so the fold is safe
    * there ([[Archives.compact]]'s contract). */
  def applyBatch(batch: DataFrame, batchId: Long, keyCol: Column,
                 regsDir: String, cardsDir: String, p: Int,
                 compactEvery: Int = 0): Unit = {
    val spark = batch.sparkSession
    if (compactEvery > 0 && batchId > 0 && batchId % compactEvery == 0)
      compactRegisters(spark, regsDir, batchId - 1)
    val keyed = batch.select(keyCol.cast("string").as("k"))
      .filter(col("k").isNotNull)
    // one relation carries both stats: per-register max rank AND the
    // batch's row count (n summed over registers = rows hashed)
    Sketches.hllRegisters(keyed, p)
      .groupBy(col("r"))
      .agg(max(col("rho")).as("mr"), count(lit(1)).as("n"))
      .write.mode("overwrite")
      .parquet(s"$regsDir/batch_id=$batchId")
    val hist = Archives.read(spark, regsDir)
      .filter(col("batch_id") <= batchId)
    val regs = hist.groupBy(col("r")).agg(max(col("mr")).as("mr"))
    val rows = hist.agg(coalesce(sum(col("n")), lit(0L)).as("n_rows"))
    rows.join(broadcast(Sketches.hllMoments(regs, p)), lit(true))
      .select(col("n_rows"),
        col("nonempty").as("nonempty_registers"),
        (round(Sketches.hllEstimate(p), 4) + lit(0.0))
          .as("hll_estimate"))
      .write.mode("overwrite").parquet(s"$cardsDir/batch_id=$batchId")
  }

  /** Fold all register partials with batch_id ≤ `upTo` into one base
    * layer ([[Archives.compact]]) — for HLL the fold is a pure re-agg
    * (register max is associative AND idempotent; the row count is a
    * plain sum), so the archive shrinks from (#batches × ≤2^p) rows
    * to ≤ 2^p with ZERO card movement (ArchivesSpec pins it). */
  def compactRegisters(spark: SparkSession, regsDir: String,
                       upTo: Long): Unit =
    Archives.compact(spark, regsDir, upTo, Seq("r"),
      Seq(max(col("mr")).as("mr"), sum(col("n")).as("n")))

  /** Latest card: the most recent recompute always covers the full
    * history, so the max-batch-id row IS the live distinct card. */
  def currentCard(spark: SparkSession, cardsDir: String): DataFrame = {
    val all = Archives.read(spark, cardsDir)
    val latest = all.agg(max(col("batch_id")).as("batch_id"))
    all.join(broadcast(latest), Seq("batch_id")).drop("batch_id")
  }
}
