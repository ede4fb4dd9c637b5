package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import graft.ops.Events

/** Streaming face of [[graft.ops.Events.hooverIndex]] (q284) — the
  * Hoover index is a pure function of a group's per-entity value sums,
  * so the streaming form is per-GROUP recompute-on-touch over an
  * INCREMENT-MONOTONE archive: each micro-batch writes only its own
  * per-(group, entity) partial cent sums (long addition is associative
  * — summing the partials equals summing the raw rows exactly, the
  * batch==stream contract), then recomputes the full card ONLY for
  * groups present in the batch and writes it under the batch's
  * partition. The live view is LATEST-WINS PER GROUP: a recompute
  * always covers the group's complete history-so-far, so the latest
  * card per group equals the batch face over the same events, row for
  * row (StreamingHooverSpec pins it on a replayed fixture).
  *
  * Scale shape per trigger: the batch's own rollup is one combinable
  * agg (bounded by the batch); the archive is hive-partitioned by a
  * SANITIZED STRING COPY of the group (`__gpart`) under each batch
  * partition, so the history read is storage-pruned to the touched
  * groups' directories (`__gpart IN (batch's groups)` — the group
  * column is a small closed set, the
  * [[graft.ops.Events.sequenceSupport]] contract, so both the
  * partition fan-out and the driver-side touched list are bounded);
  * the dev ladder then runs over per-entity rows of the touched
  * groups only. Per-trigger cost grows with the touched groups'
  * entity counts, never with total history row count — the archive
  * holds one row per (batch, group, entity), already collapsed.
  *
  * Why the sanitized partition copy: partitioning by the group column
  * itself would (a) store its values as directory STRINGS, so a
  * non-string group (int "01" vs 1) round-trips with the wrong type
  * and the touched-set `isin` silently compares across types, and (b)
  * archive a NULL group under __HIVE_DEFAULT_PARTITION__, which
  * `isin` never matches (three-valued logic) — dropping that group's
  * history from every recompute while the batch face still emits its
  * row. Keeping the group as a REGULAR data column (original type,
  * nulls intact) and pruning on `__gpart` (null → a sentinel string)
  * preserves batch==stream for null groups and non-string group
  * types; the latest-wins view joins null-safe (`<=>`) for the same
  * reason. A real string group equal to the sentinel only widens
  * pruning (recompute still groups by the true column) — never wrong
  * results. All archive reads go through [[Archives.read]], which pins
  * the `__gpart`/`batch_id` directory columns to their declared
  * string/long types regardless of the hosting session's partition
  * type-inference setting — a vanilla session would otherwise
  * re-infer all-numeric `__gpart` dirs as int and the string `isin`
  * prune would silently miss them. Archives written by the
  * pre-`__gpart` layout (group-
  * partitioned) are NOT readable by this version — rewrite them (or
  * replay the stream); mixed layouts under one rollupDir break Spark
  * partition discovery. */
object StreamingHoover {

  def hoover(stream: DataFrame, groupCol: String, entityCol: String,
             valCol: String, rollupDir: String, cardsDir: String,
             checkpointDir: String,
             compactEvery: Int = 0): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyBatch(batch, batchId, groupCol, entityCol, valCol,
          rollupDir, cardsDir, compactEvery)
      }
      .start()

  /** One Hoover round — also the non-streaming entry a scheduled
    * ingest calls with its own batch ids. `compactEvery` > 0 folds
    * the rollup archive every that-many batches, up to `batchId − 1`
    * only — the in-flight batch can still REPLAY and overwrite its
    * own partition, so history must never be folded into it (see
    * [[StreamingHll.applyBatch]]; batchId − 1 is always committed). */
  def applyBatch(batch: DataFrame, batchId: Long, groupCol: String,
                 entityCol: String, valCol: String, rollupDir: String,
                 cardsDir: String, compactEvery: Int = 0): Unit = {
    val spark = batch.sparkSession
    if (compactEvery > 0 && batchId > 0 && batchId % compactEvery == 0)
      compactRollup(spark, rollupDir, batchId - 1, groupCol, entityCol)
    // sanitized partition copy: group stays a regular typed data column
    // (nulls intact); the directory key is always a non-null string
    val gpart = coalesce(col(groupCol).cast("string"), lit(NullPart))
    batch.groupBy(col(groupCol), col(entityCol))
      .agg(sum(round(col(valCol) * 100).cast("long")).as("cents"))
      .withColumn("__gpart", gpart)
      .write.mode("overwrite").partitionBy("__gpart")
      .parquet(s"$rollupDir/batch_id=$batchId")
    // bounded driver read: the group column is a small closed set —
    // the partition directories this trigger is allowed to scan
    val touched = batch.select(gpart).distinct()
      .collect().map(_.getString(0))
    val hist = Archives.read(spark, rollupDir)
      .filter(col("batch_id") <= batchId &&
        col("__gpart").isin(touched: _*))
      .groupBy(col(groupCol), col(entityCol))
      .agg(sum(col("cents")).as("x"))
    Events.hooverFromCents(hist, groupCol)
      .write.mode("overwrite").parquet(s"$cardsDir/batch_id=$batchId")
  }

  /** Fold all rollup partials with batch_id ≤ `upTo` into one base
    * layer ([[Archives.compact]]): long cent sums are associative, so
    * summing the folded partial equals summing the originals exactly
    * — the archive shrinks from one row per (batch, group, entity) to
    * one per (group, entity) with zero card movement (ArchivesSpec
    * pins it, null group included). The `__gpart` sub-partitioning is
    * preserved, so the touched-set prune still works on the base. */
  def compactRollup(spark: SparkSession, rollupDir: String, upTo: Long,
                    groupCol: String, entityCol: String): Unit =
    Archives.compact(spark, rollupDir, upTo, Seq(groupCol, entityCol),
      Seq(sum(col("cents")).as("cents")))

  /** LIVE THEIL CARD off the SAME rollup archive the Hoover cards
    * recompute from — no second archive, no extra per-trigger state:
    * the per-(group, entity) cent partials sum to exactly the
    * per-entity relation [[graft.ops.Events.theilDecomposition]]
    * needs, so the between/within inequality decomposition
    * (q308) is a free second reading of the Hoover substrate.
    * Call between triggers (or after a batch) for the
    * history-so-far card over ALL groups; a negative-mass group
    * (net-negative cent sums are possible in a refund-heavy stream)
    * violates Theil's non-negative-measure contract and should be
    * filtered by the caller. */
  def currentTheil(spark: SparkSession, rollupDir: String,
                   groupCol: String, entityCol: String): DataFrame =
    graft.ops.Events.theilFromPerEntity(
      Archives.read(spark, rollupDir)
        .groupBy(col(groupCol).as("g"), col(entityCol))
        .agg(sum(col("cents")).as("x")), groupCol)

  /** Directory sentinel for a NULL group — a non-null string so the
    * touched-set `isin` prune can match it (NULL itself never would). */
  private[streaming] val NullPart = "__graft_null__"

  /** Latest-wins live view: per group, the card row of that group's
    * most recent recompute (exact vs the batch face — see scaladoc).
    * The group equality is null-safe so a NULL group's card survives. */
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
