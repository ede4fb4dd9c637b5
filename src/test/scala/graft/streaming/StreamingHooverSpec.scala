package graft.streaming

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.ops.Events

/** Batch/stream reconciliation for the Hoover index (q284):
  * increment-monotone partial cent sums + recompute-on-touch +
  * latest-wins-per-group must reproduce the batch face row-for-row on
  * a multi-batch replay — exact, zero tolerance (cards are integer
  * micros off the same pure function, and long partial sums are
  * associative). */
class StreamingHooverSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("streamed Hoover cards (latest-wins per event type) == batch " +
    "face exactly on a multi-batch replay, and the rollup archive is " +
    "group-partitioned") {
    import spark.implicits._
    val dir = Files.createTempDirectory("hvr_src").toString
    val rollupDir = Files.createTempDirectory("hvr_rollup").toString
    val cardsDir = Files.createTempDirectory("hvr_cards").toString
    val ck = Files.createTempDirectory("hvr_ck").toString
    val src = spark.read
      .parquet("/root/testdata/sf0.001/events.parquet")
      .select(col("event_type"), col("user_id"), col("value"))
    // 4 random-ish file splits: a user's spend straddles batches, so
    // the partial-sum addition path is actually exercised
    src.repartition(4).write.mode("overwrite").parquet(dir)

    val stream = spark.readStream.schema(src.schema)
      .option("maxFilesPerTrigger", "1").parquet(dir)
    val q = StreamingHoover.hoover(stream, "event_type", "user_id",
      "value", rollupDir = rollupDir, cardsDir = cardsDir,
      checkpointDir = ck)
    try q.processAllAvailable() finally q.stop()

    val got = StreamingHoover.currentCards(spark, cardsDir, "event_type")
      .as[(String, Long, Long, Option[Long])].collect().toSet
    val want = Events.hooverIndex(src, "event_type", "user_id", "value")
      .as[(String, Long, Long, Option[Long])].collect().toSet
    assert(want.nonEmpty && got == want,
      s"extra=${(got -- want).take(5)} missing=${(want -- got).take(5)}")

    // the archive is partitioned by the sanitized group copy under each
    // batch partition — the storage-pruning contract: a trigger's
    // history read scans only its touched groups' directories
    val batchDirs = new java.io.File(rollupDir).listFiles()
      .filter(_.getName.startsWith("batch_id="))
    assert(batchDirs.nonEmpty)
    batchDirs.foreach { d =>
      assert(d.listFiles().exists(_.getName.startsWith("__gpart=")),
        s"${d.getName} not group-partitioned")
    }

  }

  test("a NULL group and a numeric-typed group survive the archive " +
    "round-trip: the sanitized partition copy keeps the group as a " +
    "typed data column, so batch==stream holds where the old " +
    "group-partitioned layout dropped the null group's history and " +
    "re-typed numeric keys") {
    import spark.implicits._
    val rollupDir = Files.createTempDirectory("hvr3_rollup").toString
    val cardsDir = Files.createTempDirectory("hvr3_cards").toString
    // group is an INT column (1, 10, null) — value "01"-style remap and
    // the isin-vs-NULL three-valued-logic drop are both exercised
    val rows = Seq[(Option[Int], Long, Double)](
      (Some(1), 1L, 10.0), (Some(1), 2L, 30.0), (Some(10), 1L, 5.0),
      (None, 3L, 7.0), (None, 4L, 21.0), (Some(10), 5L, 5.0))
    val src = rows.toDF("grp", "user_id", "value")
    val b0 = src.filter(col("user_id") <= 2)
    val b1 = src.filter(col("user_id") > 2)
    StreamingHoover.applyBatch(b0, 0L, "grp", "user_id", "value",
      rollupDir, cardsDir)
    StreamingHoover.applyBatch(b1, 1L, "grp", "user_id", "value",
      rollupDir, cardsDir)
    val got = StreamingHoover.currentCards(spark, cardsDir, "grp")
      .as[(Option[Int], Long, Long, Option[Long])].collect().toSet
    val want = Events.hooverIndex(src, "grp", "user_id", "value")
      .as[(Option[Int], Long, Long, Option[Long])].collect().toSet
    assert(want.exists(_._1.isEmpty), "fixture must carry a null group")
    assert(got == want,
      s"extra=${(got -- want).take(5)} missing=${(want -- got).take(5)}")
  }

  test("applyBatch is replay-idempotent: redelivering the same batch " +
    "id with the same rows changes nothing (partials OVERWRITE their " +
    "own partition — an append would double-count)") {
    import spark.implicits._
    val rollupDir = Files.createTempDirectory("hvr2_rollup").toString
    val cardsDir = Files.createTempDirectory("hvr2_cards").toString
    val src = spark.read
      .parquet("/root/testdata/sf0.001/events.parquet")
      .select(col("event_type"), col("user_id"), col("value"))
    val b0 = src.filter(col("user_id") % 2 === 0)
    val b1 = src.filter(col("user_id") % 2 =!= 0)
    StreamingHoover.applyBatch(b0, 0L, "event_type", "user_id",
      "value", rollupDir, cardsDir)
    StreamingHoover.applyBatch(b1, 1L, "event_type", "user_id",
      "value", rollupDir, cardsDir)
    val once = StreamingHoover
      .currentCards(spark, cardsDir, "event_type")
      .as[(String, Long, Long, Option[Long])].collect().toSet
    // at-least-once redelivery of batch 1
    StreamingHoover.applyBatch(b1, 1L, "event_type", "user_id",
      "value", rollupDir, cardsDir)
    val twice = StreamingHoover
      .currentCards(spark, cardsDir, "event_type")
      .as[(String, Long, Long, Option[Long])].collect().toSet
    val want = Events.hooverIndex(src, "event_type", "user_id", "value")
      .as[(String, Long, Long, Option[Long])].collect().toSet
    assert(once == want && twice == want,
      s"replay drifted: ${(twice -- want).take(5)}")
  }
}
