package graft.streaming

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.ops.Sampling

/** Batch/stream reconciliation for the Horvitz–Thompson card (q288):
  * per-batch partial moments + recompute-on-touch + latest-wins must
  * reproduce the batch face row-for-row on a multi-batch replay —
  * exact (the md5 keep test is row-local, moments are associative
  * long sums, the HT tail is byte-identical arithmetic). */
class StreamingHorvitzThompsonSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("streamed HT cards (latest-wins per event type) == batch face " +
    "exactly on a multi-batch replay; redelivering the last batch " +
    "changes nothing; the moment archive is group-partitioned") {
    import spark.implicits._
    val dir = Files.createTempDirectory("ht_src").toString
    val momentsDir = Files.createTempDirectory("ht_moments").toString
    val cardsDir = Files.createTempDirectory("ht_cards").toString
    val ck = Files.createTempDirectory("ht_ck").toString
    val src = spark.read
      .parquet("/root/testdata/sf0.001/events.parquet")
      .select(col("event_type"), col("event_id"), col("value"))
    src.repartition(4).write.mode("overwrite").parquet(dir)

    val stream = spark.readStream.schema(src.schema)
      .option("maxFilesPerTrigger", "1").parquet(dir)
    val q = StreamingHorvitzThompson.estimate(stream, "event_type",
      "event_id", "value", num = 1, den = 10,
      momentsDir = momentsDir, cardsDir = cardsDir, checkpointDir = ck)
    try q.processAllAvailable() finally q.stop()

    val got = StreamingHorvitzThompson
      .currentCards(spark, cardsDir, "event_type")
      .as[(String, Long, Long, Long, Long, Option[Long])]
      .collect().toSet
    val want = Sampling.horvitzThompson(src, "event_type", "event_id",
        "value", num = 1, den = 10)
      .as[(String, Long, Long, Long, Long, Option[Long])]
      .collect().toSet
    assert(want.nonEmpty && got == want,
      s"extra=${(got -- want).take(5)} missing=${(want -- got).take(5)}")

    // replay idempotency: re-apply the max batch id with SOME of its
    // rows' groups touched — moments overwrite their own partition,
    // so the live view must not move
    val batchDirs = new java.io.File(momentsDir).listFiles()
      .filter(_.getName.startsWith("batch_id="))
    assert(batchDirs.nonEmpty)
    batchDirs.foreach { d =>
      assert(d.listFiles().exists(_.getName.startsWith("__gpart=")),
        s"${d.getName} not group-partitioned")
    }
    // reconstruct the last streamed batch exactly: maxFilesPerTrigger=1
    // means each batch is one source file, in the discovery order the
    // checkpoint recorded — instead of reverse-engineering that, apply
    // a NET-NEW batch id with an exact copy of ALL source rows and
    // check the card now reads a doubled corpus (associativity), then
    // redeliver THAT batch and check idempotency.
    val nextId = batchDirs.map(_.getName.stripPrefix("batch_id=").toLong)
      .max + 1
    StreamingHorvitzThompson.applyBatch(src, nextId, "event_type",
      "event_id", "value", 1, 10, momentsDir, cardsDir)
    val doubled = StreamingHorvitzThompson
      .currentCards(spark, cardsDir, "event_type")
      .as[(String, Long, Long, Long, Long, Option[Long])]
      .collect().toSet
    val wantDoubled = Sampling.horvitzThompson(src.union(src),
        "event_type", "event_id", "value", num = 1, den = 10)
      .as[(String, Long, Long, Long, Long, Option[Long])]
      .collect().toSet
    assert(doubled == wantDoubled, "doubled corpus mismatch")
    StreamingHorvitzThompson.applyBatch(src, nextId, "event_type",
      "event_id", "value", 1, 10, momentsDir, cardsDir)
    val again = StreamingHorvitzThompson
      .currentCards(spark, cardsDir, "event_type")
      .as[(String, Long, Long, Long, Long, Option[Long])]
      .collect().toSet
    assert(again == wantDoubled, "replay drifted")
  }

  test("a NULL group and a numeric-typed group survive the moment " +
    "archive round-trip (sanitized partition copy + null-safe " +
    "latest-wins): batch==stream holds exactly") {
    import spark.implicits._
    val momentsDir = Files.createTempDirectory("ht2_moments").toString
    val cardsDir = Files.createTempDirectory("ht2_cards").toString
    val rows = Seq[(Option[Int], Long, Double)](
      (Some(1), 1L, 10.0), (Some(1), 2L, 30.0), (Some(10), 3L, 5.0),
      (None, 4L, 7.0), (None, 5L, 21.0), (Some(10), 6L, 5.0),
      (None, 7L, 2.5), (Some(1), 8L, 1.0))
    val src = rows.toDF("grp", "key", "value")
    val b0 = src.filter(col("key") <= 4)
    val b1 = src.filter(col("key") > 4)
    StreamingHorvitzThompson.applyBatch(b0, 0L, "grp", "key", "value",
      1, 2, momentsDir, cardsDir)
    StreamingHorvitzThompson.applyBatch(b1, 1L, "grp", "key", "value",
      1, 2, momentsDir, cardsDir)
    val got = StreamingHorvitzThompson
      .currentCards(spark, cardsDir, "grp")
      .as[(Option[Int], Long, Long, Long, Long, Option[Long])]
      .collect().toSet
    val want = Sampling.horvitzThompson(src, "grp", "key", "value",
        num = 1, den = 2)
      .as[(Option[Int], Long, Long, Long, Long, Option[Long])]
      .collect().toSet
    assert(want.exists(_._1.isEmpty), "fixture must carry a null group")
    assert(got == want,
      s"extra=${(got -- want).take(5)} missing=${(want -- got).take(5)}")
  }
}
