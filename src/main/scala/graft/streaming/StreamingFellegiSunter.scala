package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import graft.ops.Dedup

/** Streaming face of [[graft.ops.Dedup.fellegiSunterEm]] (q301) — the
  * unsupervised record-linkage model kept LIVE over a stream of
  * blocked candidate pairs (each row carries both sides' field
  * values, the upstream blocking stage's output). The EM input is the
  * agreement-PATTERN COUNT table, and pattern counts are
  * INCREMENT-MONOTONE: long sums merge exactly under any batch split,
  * so the archive stores only each batch's own ≤ 2^k-row pattern
  * partial and the recompute sums the partials — never raw pairs —
  * then replays the shared O(2^k) EM tail
  * ([[Dedup.fellegiSunterEmFromPatterns]], byte-identical arithmetic
  * to the batch face) and writes the per-pattern posterior card under
  * the batch's partition. batch==stream is exact
  * (StreamingFellegiSunterSpec pins it on a replayed fixture);
  * replay-idempotency comes from partition OVERWRITE of the batch's
  * own partial (the moment-archive discipline).
  *
  * Scale shape per trigger: one combinable pattern count over the
  * batch (output ≤ 2^k rows regardless of batch size), a
  * (#batches × ≤2^k)-bounded archive read ([[Archives.read]] — pinned
  * layout types), and the corpus-independent EM tail. The archive
  * grows one ≤ 2^k-row partition per trigger; [[compactPatterns]]
  * folds committed batches into one base layer exactly (counts are
  * plain sums — [[Archives.compact]]'s contract). Global card (no
  * group key): every trigger recomputes the one model. Field
  * agreement is non-null string equality — the batch face's
  * `coalesce(a = b, false)` contract, with both sides cast to string
  * exactly as the batch face casts its record projection. */
object StreamingFellegiSunter {

  def emCard(stream: DataFrame, fields: Seq[(String, (Column, Column))],
             patsDir: String, cardsDir: String, checkpointDir: String,
             iters: Int = 3, piInit: Double = 0.1, mInit: Double = 0.9,
             uInit: Double = 0.1): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyBatch(batch, batchId, fields, patsDir, cardsDir, iters,
          piInit, mInit, uInit)
      }
      .start()

  /** One EM round — also the non-streaming entry a scheduled ingest
    * calls with its own batch ids. `fields` pairs each field name
    * with the (left, right) value expressions over the pair row. */
  def applyBatch(batch: DataFrame, batchId: Long,
                 fields: Seq[(String, (Column, Column))], patsDir: String,
                 cardsDir: String, iters: Int = 3, piInit: Double = 0.1,
                 mInit: Double = 0.9, uInit: Double = 0.1): Unit = {
    require(fields.nonEmpty && iters >= 1, "need fields and iters >= 1")
    val spark = batch.sparkSession
    val k = fields.size
    batch
      .select(fields.zipWithIndex.map { case ((_, (a, b)), i) =>
        coalesce(a.cast("string") === b.cast("string"), lit(false))
          .as(s"g_$i")
      }: _*)
      .groupBy((0 until k).map(i => col(s"g_$i")): _*)
      .agg(count(lit(1)).as("n"))
      .write.mode("overwrite").parquet(s"$patsDir/batch_id=$batchId")
    val hist = Archives.read(spark, patsDir)
      .filter(col("batch_id") <= batchId)
      .groupBy((0 until k).map(i => col(s"g_$i")): _*)
      .agg(sum(col("n")).as("n"))
    Dedup.fellegiSunterEmFromPatterns(hist, fields.map(_._1), iters,
        piInit, mInit, uInit)
      .write.mode("overwrite").parquet(s"$cardsDir/batch_id=$batchId")
  }

  /** Fold all pattern partials with batch_id ≤ `upTo` into one base
    * layer — counts are plain long sums, so the fold is exact and the
    * archive shrinks to ≤ 2^k rows total. */
  def compactPatterns(spark: SparkSession, patsDir: String, upTo: Long,
                      k: Int): Unit =
    Archives.compact(spark, patsDir, upTo,
      (0 until k).map(i => s"g_$i"), Seq(sum(col("n")).as("n")))

  /** Latest card: the most recent recompute always covers the full
    * history, so the max-batch-id rows ARE the live model. */
  def currentCard(spark: SparkSession, cardsDir: String): DataFrame = {
    val all = Archives.read(spark, cardsDir)
    val latest = all.agg(max(col("batch_id")).as("batch_id"))
    all.join(broadcast(latest), Seq("batch_id")).drop("batch_id")
  }
}
