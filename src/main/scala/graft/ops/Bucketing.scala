package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed tables for co-located, shuffle-free joins (100 TB pattern:
  * two fact tables repeatedly joined on the same key are written bucketed
  * on that key once; every later join skips both Exchanges AND both
  * Sorts when bucket counts match).
  *
  * Uses the session catalog's managed tables (`bucketBy` requires
  * `saveAsTable`); the warehouse dir is ordinary parquet + bucket metadata
  * in the catalog. */
object Bucketing {

  /** Write `df` as a bucketed, sorted managed table. Drops any existing
    * table AND its orphaned warehouse location (an in-memory catalog
    * forgets tables across sessions but leaves the directory behind, which
    * otherwise fails LOCATION_ALREADY_EXISTS). */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    buckets: Int): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS $table")
    val warehouse = new java.net.URI(
      spark.conf.get("spark.sql.warehouse.dir")).getPath
    val loc = java.nio.file.Paths.get(warehouse, table.toLowerCase)
    if (java.nio.file.Files.exists(loc)) {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(loc).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.deleteIfExists(_))
    }
    df.write.mode("overwrite")
      .bucketBy(buckets, key).sortBy(key)
      .option("compression", "snappy")
      .format("parquet").saveAsTable(table)
  }

  def read(spark: SparkSession, table: String): DataFrame = spark.table(table)

  /** True if the physical plan of `df` contains no shuffle exchange —
    * the observable property bucketed joins buy. */
  def isShuffleFree(df: DataFrame): Boolean =
    !df.queryExecution.executedPlan.toString.contains("Exchange hashpartitioning")
}
