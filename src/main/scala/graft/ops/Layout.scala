package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-layout operators for the write path: z-order (Morton-curve)
  * clustering, so parquet min/max footer stats prune files for predicates
  * on ANY of the clustered columns — the lever that turns a 100 TB
  * full-scan into a few-file read when queries filter on more than one
  * dimension. Linear sort gives perfect pruning on its leading column and
  * none on the others; interleaving the columns' bits gives every
  * clustered column locality proportional to its share of the bits.
  *
  * Everything here is plain `Column` arithmetic (codegen'd, no UDFs): the
  * z-value is an unrolled bit-interleave over min-max-bucketized columns,
  * and the layout move is `repartitionByRange` + `sortWithinPartitions`
  * on it — one range shuffle, the same cost class as the linear sort it
  * replaces. Bucketization is min-max (uniform); heavily skewed columns
  * dilute their bits' selectivity, pre-transform them (log, rank) before
  * clustering — the bucket bounds are an explicit parameter for exactly
  * that reason.
  */
object Layout {

  /** Bucket index of `c` in [0, 2^bits) by uniform min-max scaling —
    * nulls land in bucket 0 (they sort first, same as a linear sort). */
  private def bucketize(c: Column, lo: Double, hi: Double, bits: Int): Column = {
    val n = 1 << bits
    val span = math.max(hi - lo, Double.MinPositiveValue)
    least(lit(n - 1), greatest(lit(0),
      floor((coalesce(c.cast("double"), lit(lo)) - lit(lo)) / lit(span / n))))
      .cast("long")
  }

  /** Morton z-value: interleave the low `bits` bits of each bucketized
    * column (column j's bit i lands at position i*ncols + j). Unrolled
    * shift/mask terms — stays inside whole-stage codegen. */
  def interleaveBits(buckets: Seq[Column], bits: Int): Column = {
    require(buckets.nonEmpty && bits * buckets.size <= 63,
      s"bits*ncols must fit a long, got $bits*${buckets.size}")
    (0 until bits).flatMap { i =>
      buckets.zipWithIndex.map { case (c, j) =>
        shiftleft(shiftright(c, i).bitwiseAND(lit(1L)), i * buckets.size + j)
      }
    }.reduce[Column](_ bitwiseOR _)
  }

  /** Z-value column over `cols` given each column's (lo, hi) bucket
    * bounds. Bounds are explicit so a pipeline can reuse stable global
    * bounds across incremental writes (per-batch min-max would make
    * bucket meanings drift between files). */
  def zValue(cols: Seq[Column], bounds: Seq[(Double, Double)],
             bits: Int = 8): Column = {
    require(cols.size == bounds.size, "one (lo, hi) per column")
    interleaveBits(cols.zip(bounds).map { case (c, (lo, hi)) =>
      bucketize(c, lo, hi, bits) }, bits)
  }

  /** Min-max bounds of numeric columns in one tiny aggregate action. */
  def minMaxBounds(df: DataFrame, cols: Seq[String]): Seq[(Double, Double)] = {
    val aggs = cols.flatMap(c => Seq(min(col(c).cast("double")),
      max(col(c).cast("double"))))
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    cols.indices.map(i => (row.getDouble(2 * i), row.getDouble(2 * i + 1)))
  }

  /** Rewrite `df` into `files` parquet files z-ordered on `zcols`: one
    * range shuffle on the z-value, a within-partition sort, stats-friendly
    * files out. The z column itself is dropped — the layout, not the
    * value, is the product. */
  def zorderWrite(df: DataFrame, zcols: Seq[String], outDir: String,
                  files: Int, bits: Int = 8): Unit = {
    val z = zValue(zcols.map(col), minMaxBounds(df, zcols), bits)
    df.withColumn("__z", z)
      .repartitionByRange(files, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(outDir)
  }

  /** Small-files compaction: rewrite a parquet directory into
    * ceil(rows / rowsPerFile) files — the periodic maintenance pass every
    * long-lived 100 TB table needs (each tiny file costs an open + footer
    * read + scheduler task; a streaming or per-batch writer leaves
    * thousands of them). With `sortCol` the rewrite is a range shuffle +
    * within-partition sort on it, so compaction REBUILDS stats-pruning
    * locality at the same time (files get disjoint min/max ranges);
    * without it, a plain round-robin repartition just right-sizes files.
    *
    * The row count is one footer-stats-only action (parquet count never
    * touches data pages). Returns the re-read compacted frame so callers
    * can chain validation. */
  def compactParquet(spark: org.apache.spark.sql.SparkSession,
                     inDir: String, outDir: String, rowsPerFile: Long,
                     sortCol: Option[String] = None): DataFrame = {
    require(rowsPerFile > 0, "rowsPerFile must be positive")
    val df = spark.read.parquet(inDir)
    val n = df.count()
    val files = math.max(1L, (n + rowsPerFile - 1) / rowsPerFile).toInt
    val sized = sortCol match {
      case Some(c) =>
        df.repartitionByRange(files, col(c)).sortWithinPartitions(c)
      case None => df.repartition(files)
    }
    sized.write.mode("overwrite").option("compression", "snappy")
      .parquet(outDir)
    spark.read.parquet(outDir)
  }

  /** Fraction of parquet files under `dir` whose [min, max] range of
    * `statCol` overlaps [lo, hi] — exactly the files a stats-pruning
    * reader must open for that predicate; the direct measure of layout
    * quality. One tiny per-file aggregate (test/audit tool, not a query
    * operator). */
  def fileOverlapFraction(dir: String, statCol: String,
                          lo: Double, hi: Double): Double = {
    val spark = org.apache.spark.sql.SparkSession.active
    val files = new java.io.File(dir).listFiles()
      .filter(f => f.getName.endsWith(".parquet")).map(_.getPath)
    require(files.nonEmpty, s"no parquet files under $dir")
    val overlapping = files.count { f =>
      val r = spark.read.parquet(f)
        .agg(min(col(statCol).cast("double")), max(col(statCol).cast("double")))
        .head()
      !(r.getDouble(1) < lo || r.getDouble(0) > hi)
    }
    overlapping.toDouble / files.length
  }
}
