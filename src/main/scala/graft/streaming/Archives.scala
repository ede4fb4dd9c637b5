package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
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
}
