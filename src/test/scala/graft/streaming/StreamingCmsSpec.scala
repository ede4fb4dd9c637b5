package graft.streaming

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** The exact batch/stream reconciliation for the CMS counter table:
  * counts are merge-exact sums, so running [[StreamingCms.cellCounts]]
  * — the SAME declarative definition — over a multi-batch replay must
  * reproduce the batch table row-for-row, with zero tolerance. */
class StreamingCmsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("streamed CMS counter table == batch table exactly on a " +
    "multi-batch replay of lineitem part keys") {
    import spark.implicits._
    val dir = Files.createTempDirectory("cms_keys").toString
    val src = spark.read
      .parquet("/root/testdata/sf0.001/lineitem.parquet")
      .select(col("l_partkey"))
    src.repartition(4).write.mode("overwrite").parquet(dir)
    val batch = StreamingCms.cellCounts(src, "l_partkey")
      .as[(Long, Long, Long)].collect().toSet
    assert(batch.nonEmpty && batch.size <= 4 * 256)

    val stream = spark.readStream.schema(src.schema)
      .option("maxFilesPerTrigger", "1").parquet(dir)
    val q = StreamingCms.cellCounts(stream, "l_partkey")
      .writeStream.format("memory").queryName("cms_out")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      val got = spark.table("cms_out")
        .as[(Long, Long, Long)].collect().toSet
      assert(got == batch,
        s"extra=${(got -- batch).take(5)} missing=${(batch -- got).take(5)}")
    } finally q.stop()
  }
}
