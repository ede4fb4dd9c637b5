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
      assert(d.listFiles().exists(_.getName.startsWith("event_type=")),
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
}
