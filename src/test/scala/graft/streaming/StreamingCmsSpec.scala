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

  test("online heavy-hitter admission: recall 1 against true totals " +
    "(est-so-far >= exact-so-far = total at last appearance), " +
    "precision bounded by the batch sketch's admission set, and the " +
    "gate actually gates") {
    import spark.implicits._
    val dir = Files.createTempDirectory("hh_keys").toString
    val state = Files.createTempDirectory("hh_state").toString
    val admitDir = Files.createTempDirectory("hh_admit").toString
    val ck = Files.createTempDirectory("hh_ck").toString
    val src = spark.read
      .parquet("/root/testdata/sf0.001/lineitem.parquet")
      .select(col("l_partkey"))
    src.repartition(4).write.mode("overwrite").parquet(dir)
    val minCount = 40L

    val stream = spark.readStream.schema(src.schema)
      .option("maxFilesPerTrigger", "1").parquet(dir)
    val q = StreamingCms.heavyHitterAdmit(stream, "l_partkey", minCount,
      state, admitDir, ck)
    try q.processAllAvailable() finally q.stop()
    val admitted = spark.read.parquet(admitDir)
      .select(col("k")).distinct().as[Long].collect().toSet

    val exact = src.groupBy(col("l_partkey").as("k"))
      .agg(count(lit(1)).as("cnt")).persist()
    val trueHot = exact.filter(col("cnt") >= minCount)
      .select(col("k")).as[Long].collect().toSet
    assert(trueHot.nonEmpty && trueHot.subsetOf(admitted),
      s"missed=${(trueHot -- admitted).take(5)}")

    // precision: stream est-so-far <= final batch est, so admitted is
    // inside the batch sketch's own admission set
    val cells = StreamingCms.cellCounts(src, "l_partkey")
    val depths = spark.range(0, 4).select(col("id").as("i"))
    val batchAdmit = exact.select(col("k")).crossJoin(depths)
      .select(col("k"), col("i"),
        graft.ops.Sketches.cmsBucket(col("i"), col("k"), 256).as("b"))
      .join(cells, Seq("i", "b"))
      .groupBy(col("k")).agg(min(col("c")).as("est"))
      .filter(col("est") >= minCount)
      .select(col("k")).as[Long].collect().toSet
    assert(admitted.subsetOf(batchAdmit),
      s"over=${(admitted -- batchAdmit).take(5)}")
    // the gate rejected most keys (194 of 200 are below threshold)
    assert(admitted.size < exact.count() / 2, admitted.size)
    exact.unpersist()
  }
}
