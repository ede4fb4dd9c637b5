package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType, StringType, StructType}

/** Shared storage-layout plumbing for the moment-archive faces
  * ([[StreamingHoover]], [[StreamingHorvitzThompson]],
  * [[StreamingGroupSequential]], [[StreamingHll]], [[StreamingCms]],
  * [[StreamingAttribution]]): every archive is a parquet tree
  * hive-partitioned by `batch_id=<long>` (and, for the grouped faces,
  * a sanitized string group copy `__gpart`), and every recompute
  * filters those two DIRECTORY columns. Directory values are raw
  * strings on disk, so their read-back type is whatever partition
  * discovery decides — which is exactly the hazard this reader closes.
  */
object Archives {

  /** Read an archive directory with its LAYOUT columns pinned:
    * `__gpart` → string, `batch_id` → long — regardless of the
    * session's `spark.sql.sources.partitionColumnTypeInference`
    * setting. Two failure modes exist without the pin:
    *
    *  - inference ON (vanilla session): an archive whose groups are
    *    all numeric-looking strings with no null group gets `__gpart`
    *    re-inferred as int (dir `__gpart=01` → int 1), and the
    *    string-valued touched-set `isin` prune then silently misses
    *    partitions — dropping a touched group's history from the
    *    recompute, the exact bug class the `__gpart` layout was built
    *    to close;
    *  - inference OFF (GraftSession): every partition column reads as
    *    STRING, so `max(batch_id)` in a latest-wins view is a
    *    LEXICOGRAPHIC max — wrong the moment an archive passes ten
    *    batches ("9" > "10").
    *
    * A user-supplied schema overrides discovery for partition columns
    * (values are cast from the raw directory string, so "01" stays
    * "01" under StringType), making reads layout-stable on ANY
    * session. Cost: one extra footer-schema inference pass per read —
    * bounded by file count, not data. Data columns keep their parquet
    * types untouched. ([[StreamingAttribution]]'s `u_bucket` directory
    * key is pinned to its declared int type for the same reason.) */
  def read(spark: SparkSession, dir: String): DataFrame = {
    val inferred = spark.read.parquet(dir).schema
    val pinned = StructType(inferred.map { f =>
      if (f.name == "__gpart") f.copy(dataType = StringType)
      else if (f.name == "batch_id") f.copy(dataType = LongType)
      else if (f.name == "u_bucket") f.copy(dataType = IntegerType)
      else f
    })
    spark.read.schema(pinned).parquet(dir)
  }

  /** ARCHIVE COMPACTION — fold every `batch_id=N` partition with
    * N ≤ `upTo` into ONE base layer at `batch_id=upTo`. The moment
    * archives are bounded PER TRIGGER but grow linearly with stream
    * LIFETIME (one partial relation per batch — months of triggers
    * mean thousands of directories under every recompute's read
    * path); because every face's recompute is a re-aggregation of
    * combinable partials, folding the partials with the SAME merge
    * (sum for the sum-based archives, max for HLL registers) is
    * exact: any recompute at a batch id ≥ `upTo` reads byte-identical
    * moments before and after (card invariance — ArchivesSpec pins it
    * on the HLL and Hoover faces).
    *
    * `keys` are the partial relation's group columns (the sanitized
    * `__gpart` directory copy, when present, is appended
    * automatically and the sub-partitioning preserved); `aggs` the
    * aliased merge expressions for the measure columns.
    *
    * CONTRACT: `upTo` must be ≤ the newest COMMITTED batch id —
    * replaying a batch id STRICTLY BELOW a folded layer is no longer
    * possible (its `batch_id <= N` filter would see the folded
    * future), which is exactly the foreachBatch checkpoint guarantee:
    * committed batch ids never re-fire, and the one batch that can
    * replay (the newest) is safe because the fold sits at `upTo` ≤
    * its own id and partition OVERWRITE of its own partial is
    * unaffected. Call between triggers from the driver (the archives
    * have a single writer by construction).
    *
    * Crash safety: the fold writes to a hidden `__compact_tmp_upto=N`
    * staging dir first (leading underscore — invisible to partition
    * discovery), with Spark's `_SUCCESS` as the commit marker; only
    * then are the folded partitions deleted and the staging dir
    * renamed in. A half-written staging dir (no `_SUCCESS`) is
    * discarded on the next call; a committed-but-unpromoted one is
    * FINISHED first (delete ≤ its recorded upTo, promote) — so the
    * utility is resumable at every step. */
  def compact(spark: SparkSession, dir: String, upTo: Long,
              keys: Seq[String], aggs: Seq[Column]): Unit = {
    val root = new Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    finishOrDiscardPending(spark, dir)
    val folded = batchIds(spark, dir).filter(_ <= upTo)
    if (folded.size <= 1) return // nothing to fold
    val df = read(spark, dir).filter(col("batch_id") <= upTo)
      .drop("batch_id")
    val gpart = if (df.columns.contains("__gpart")) Seq("__gpart")
      else Nil
    val merged = df.groupBy((keys ++ gpart).map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
    val tmp = new Path(root, s"__compact_tmp_upto=$upTo")
    fs.delete(tmp, true)
    val w = merged.write.mode("overwrite")
    (if (gpart.nonEmpty) w.partitionBy("__gpart") else w)
      .parquet(tmp.toString)
    promote(spark, dir, upTo)
  }

  /** Batch ids currently present as `batch_id=N` partitions. */
  private[streaming] def batchIds(spark: SparkSession,
                                  dir: String): Seq[Long] = {
    val root = new Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) Nil
    else fs.listStatus(root).toSeq
      .map(_.getPath.getName)
      .filter(_.startsWith("batch_id="))
      .map(_.stripPrefix("batch_id=").toLong)
  }

  /** Complete a committed-but-unpromoted fold, or drop an uncommitted
    * one (see crash-safety contract above). */
  private def finishOrDiscardPending(spark: SparkSession,
                                     dir: String): Unit = {
    val root = new Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return
    fs.listStatus(root).toSeq.map(_.getPath)
      .filter(_.getName.startsWith("__compact_tmp_upto=")).foreach { p =>
        if (fs.exists(new Path(p, "_SUCCESS")))
          promote(spark, dir, p.getName.stripPrefix("__compact_tmp_upto=").toLong)
        else fs.delete(p, true)
      }
  }

  private def promote(spark: SparkSession, dir: String,
                      upTo: Long): Unit = {
    val root = new Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    batchIds(spark, dir).filter(_ <= upTo).foreach { n =>
      fs.delete(new Path(root, s"batch_id=$n"), true)
    }
    val tmp = new Path(root, s"__compact_tmp_upto=$upTo")
    fs.rename(tmp, new Path(root, s"batch_id=$upTo"))
  }
}
