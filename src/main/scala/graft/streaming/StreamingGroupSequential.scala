package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import graft.ops.Events

/** Streaming face of [[graft.ops.Events.groupSequential]] (q294) — the
  * LIVE interim-monitoring board: every moment the OBF ladder consumes
  * is a per-(group, day, arm) COUNT/SUM cell (increment-monotone —
  * count and sum are associative, so summing per-batch partials equals
  * summing raw rows exactly, the StreamingHoover contract), so the
  * streaming form archives per-batch partial day cells and replays the
  * ENTIRE ladder tail ([[Events.groupSequentialFromCells]], shared
  * byte-identically with the batch face) for groups the batch touched.
  * Recomputing the whole ladder — not just the newest look — is
  * REQUIRED, not a convenience: the calendar→look mapping depends on
  * the group's full observed day span, so a new day can re-slice every
  * earlier look; only full-history recompute keeps batch==stream exact
  * (StreamingGroupSequentialSpec pins it on a replayed fixture, plus
  * replay idempotency: a redelivered batch overwrites its own
  * partition).
  *
  * Scale shape per trigger: the batch rollup is one combinable agg
  * (bounded by the batch); the archive holds one row per (batch,
  * group, day, arm) — partitioned by the sanitized group copy
  * (`__gpart`, the [[StreamingHoover]] layout: group stays a regular
  * typed data column, nulls intact, null → the
  * [[StreamingHoover.NullPart]] sentinel), so the recompute reads only
  * the touched groups' directories and aggregates a
  * (#batches × #days × 2)-bounded relation, never raw history; the
  * ladder tail then runs over ≤ looks rows per touched group.
  * Archives from a group-partitioned layout must be rewritten or
  * replayed; mixed layouts under one cellsDir break partition
  * discovery. */
object StreamingGroupSequential {

  def monitor(stream: DataFrame, groupCol: String, userCol: String,
              tsCol: String, success: org.apache.spark.sql.Column,
              cellsDir: String, cardsDir: String, checkpointDir: String,
              looks: Int = 5, c: Double = 2.040): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyBatch(batch, batchId, groupCol, userCol, tsCol, success,
          cellsDir, cardsDir, looks, c)
      }
      .start()

  /** One interim round — also the non-streaming entry a scheduled
    * ingest calls with its own batch ids. `looks`/`c` must stay
    * constant across a given archive's lifetime (they define the
    * boundary ladder every recompute replays). */
  def applyBatch(batch: DataFrame, batchId: Long, groupCol: String,
                 userCol: String, tsCol: String,
                 success: org.apache.spark.sql.Column, cellsDir: String,
                 cardsDir: String, looks: Int, c: Double): Unit = {
    val spark = batch.sparkSession
    val gpart = coalesce(col("grp").cast("string"),
      lit(StreamingHoover.NullPart))
    batch
      .select(col(groupCol).as("grp"),
        expr(s"unix_timestamp(date_trunc('day', $tsCol)) div 86400")
          .as("day"),
        (col(userCol) % 2 === 1).as("treated"),
        when(success, 1L).otherwise(0L).as("y"))
      .groupBy(col("grp"), col("day"), col("treated"))
      .agg(count(lit(1)).as("n"), sum(col("y")).as("x"))
      .withColumn("__gpart", gpart)
      .write.mode("overwrite").partitionBy("__gpart")
      .parquet(s"$cellsDir/batch_id=$batchId")
    // bounded driver read: the group column is a small closed set —
    // the partition directories this trigger is allowed to scan
    val touched = batch
      .select(coalesce(col(groupCol).cast("string"),
        lit(StreamingHoover.NullPart)))
      .distinct().collect().map(_.getString(0))
    val hist = Archives.read(spark, cellsDir)
      .filter(col("batch_id") <= batchId &&
        col("__gpart").isin(touched: _*))
      .groupBy(col("grp"), col("day"), col("treated"))
      .agg(sum(col("n")).as("n"), sum(col("x")).as("x"))
    Events.groupSequentialFromCells(hist, looks, c)
      .write.mode("overwrite").parquet(s"$cardsDir/batch_id=$batchId")
  }

  /** Fold all cell partials with batch_id ≤ `upTo` into one base
    * layer ([[Archives.compact]]): (n, x) are plain long sums, so the
    * fold is exact and the archive shrinks to one row per
    * (group, day, arm) — ArchivesSpec pins card invariance, including
    * the full-ladder re-slice a later day triggers. */
  def compactCells(spark: SparkSession, cellsDir: String,
                   upTo: Long): Unit =
    Archives.compact(spark, cellsDir, upTo,
      Seq("grp", "day", "treated"),
      Seq(sum(col("n")).as("n"), sum(col("x")).as("x")))

  /** Latest-wins live view: per group, the full interim ladder of that
    * group's most recent recompute (exact vs the batch face — a
    * recompute always replays the group's complete history). Null-safe
    * group equality so a NULL group's ladder survives. */
  def currentLadders(spark: SparkSession, cardsDir: String): DataFrame = {
    val all = Archives.read(spark, cardsDir)
    val latest = all.groupBy(col("grp"))
      .agg(max(col("batch_id")).as("__latest"))
      .withColumnRenamed("grp", "__g")
    all.join(latest, col("grp") <=> col("__g") &&
        col("batch_id") === col("__latest"))
      .drop("__g", "__latest", "batch_id")
  }
}
