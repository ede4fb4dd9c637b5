package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming face of [[graft.ops.Sampling.horvitzThompson]] (q288) —
  * the live "sampled total vs true total" card: every moment of the
  * estimator is a plain conditional SUM over rows (kept cents, all
  * cents, kept count, row count), so the streaming form archives
  * per-batch PARTIAL moments (increment-monotone — long addition is
  * associative, the StreamingHoover contract) and recomputes the card
  * per touched group from the accumulated partials. The md5 keep test
  * is a pure function of the row's key, so a row's fate never depends
  * on which batch delivered it — batch==stream is exact row-for-row
  * (StreamingHorvitzThompsonSpec pins it on a replayed fixture, plus
  * replay idempotency: a redelivered batch overwrites its own
  * partition).
  *
  * Scale shape per trigger: the batch rollup is one combinable
  * 4-moment agg (bounded by the batch); the archive holds ONE row per
  * (batch, group) — partitioned by a SANITIZED STRING COPY of the
  * group (`__gpart`, the [[StreamingHoover]] layout: the group itself
  * stays a regular typed data column, nulls intact, so NULL groups
  * and non-string group types keep exact batch==stream; null → the
  * [[StreamingHoover.NullPart]] sentinel so the touched-set `isin`
  * prune can match it) — the recompute reads only the touched groups'
  * directories and sums a #batches-bounded relation, never raw
  * history. Archives from the pre-`__gpart` (group-partitioned)
  * layout must be rewritten or replayed; mixed layouts under one
  * momentsDir break partition discovery. The HT tail is
  * [[graft.ops.Sampling]]'s sign-symmetric exact division, shared via
  * [[htCard]]. */
object StreamingHorvitzThompson {

  def estimate(stream: DataFrame, groupCol: String, keyCol: String,
               valCol: String, num: Int, den: Int, momentsDir: String,
               cardsDir: String, checkpointDir: String): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyBatch(batch, batchId, groupCol, keyCol, valCol, num, den,
          momentsDir, cardsDir)
      }
      .start()

  /** One estimation round — also the non-streaming entry a scheduled
    * ingest calls with its own batch ids. */
  def applyBatch(batch: DataFrame, batchId: Long, groupCol: String,
                 keyCol: String, valCol: String, num: Int, den: Int,
                 momentsDir: String, cardsDir: String): Unit = {
    require(num >= 1 && den > 0 && num <= den, "rate must be in (0, 1]")
    val spark = batch.sparkSession
    val v = conv(substring(md5(col(keyCol).cast("string")), 1, 8), 16, 10)
      .cast("long")
    val kept = v * den < lit(num.toLong * 4294967296L)
    val cents = round(col(valCol) * 100).cast("long")
    val gpart = coalesce(col(groupCol).cast("string"),
      lit(StreamingHoover.NullPart))
    batch
      .select(col(groupCol), kept.as("__kept"), cents.as("__c"))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_rows"),
        sum(col("__kept").cast("long")).as("n_sampled"),
        sum(col("__c")).as("true_total_cents"),
        coalesce(sum(when(col("__kept"), col("__c"))), lit(0L))
          .as("samp_cents"))
      .withColumn("__gpart", gpart)
      .write.mode("overwrite").partitionBy("__gpart")
      .parquet(s"$momentsDir/batch_id=$batchId")
    val touched = batch.select(gpart).distinct()
      .collect().map(_.getString(0))
    val acc = Archives.read(spark, momentsDir)
      .filter(col("batch_id") <= batchId &&
        col("__gpart").isin(touched: _*))
      .groupBy(col(groupCol))
      .agg(sum(col("n_rows")).as("n_rows"),
        sum(col("n_sampled")).as("n_sampled"),
        sum(col("true_total_cents")).as("true_total_cents"),
        sum(col("samp_cents")).as("__s"))
    htCard(acc, groupCol, num, den)
      .write.mode("overwrite").parquet(s"$cardsDir/batch_id=$batchId")
  }

  /** Fold all moment partials with batch_id ≤ `upTo` into one base
    * layer ([[Archives.compact]]): all four moments are plain long
    * sums — exact fold, one row per group remains. */
  def compactMoments(spark: SparkSession, momentsDir: String,
                     upTo: Long, groupCol: String): Unit =
    Archives.compact(spark, momentsDir, upTo, Seq(groupCol),
      Seq(sum(col("n_rows")).as("n_rows"),
        sum(col("n_sampled")).as("n_sampled"),
        sum(col("true_total_cents")).as("true_total_cents"),
        sum(col("samp_cents")).as("samp_cents")))

  /** The HT tail off accumulated moments `(groupCol, n_rows,
    * n_sampled, true_total_cents, __s)` — byte-identical arithmetic to
    * the batch face's tail (sign-symmetric exact divisions, the q238
    * idiom). */
  private def htCard(g: DataFrame, groupCol: String, num: Int,
                     den: Int): DataFrame =
    g.select(col(groupCol), col("n_rows"), col("n_sampled"),
        col("true_total_cents"),
        (signum(col("__s")).cast("long") *
          expr(s"(${den}L * abs(__s)) div ${num}L"))
          .as("ht_total_cents"))
      .withColumn("err_micros",
        when(col("true_total_cents") =!= 0,
          signum(col("ht_total_cents") - col("true_total_cents"))
            .cast("long") *
            expr("(1000000L * abs(ht_total_cents - true_total_cents))" +
              " div abs(true_total_cents)")))

  /** Latest-wins live view: per group, the card row of that group's
    * most recent recompute (exact vs the batch face — a recompute
    * always sums the group's complete moment history). Null-safe group
    * equality so a NULL group's card survives. */
  def currentCards(spark: SparkSession, cardsDir: String,
                   groupCol: String): DataFrame = {
    val all = Archives.read(spark, cardsDir)
    val latest = all.groupBy(col(groupCol))
      .agg(max(col("batch_id")).as("__latest"))
      .withColumnRenamed(groupCol, "__g")
    all.join(latest, col(groupCol) <=> col("__g") &&
        col("batch_id") === col("__latest"))
      .drop("__g", "__latest", "batch_id")
  }
}
