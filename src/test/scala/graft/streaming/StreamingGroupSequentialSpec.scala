package graft.streaming

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.ops.Events

/** Batch/stream reconciliation for the group-sequential OBF ladder
  * (q294): increment-monotone per-(group, day, arm) partial cells +
  * full-ladder recompute-on-touch + latest-wins-per-group must
  * reproduce the batch face row-for-row on a multi-batch replay —
  * exact, zero tolerance (counts are associative longs, the z/boundary
  * tail is the same code path as the batch face). The full-history
  * recompute is load-bearing: a new day can re-slice every earlier
  * look (the calendar→look map depends on the group's day span). */
class StreamingGroupSequentialSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private type LadderRow = (String, Long, Long, Long, Long, Long, Long,
    Option[Double], Double, Boolean, Option[Long], String)

  test("streamed OBF ladders (latest-wins per group) == batch face " +
    "exactly on a multi-batch replay; the cell archive is " +
    "group-partitioned; redelivering a batch changes nothing") {
    import spark.implicits._
    val dir = Files.createTempDirectory("gsq_src").toString
    val cellsDir = Files.createTempDirectory("gsq_cells").toString
    val cardsDir = Files.createTempDirectory("gsq_cards").toString
    val ck = Files.createTempDirectory("gsq_ck").toString
    val src = spark.read
      .parquet("/root/testdata/sf0.001/events.parquet")
      .select(col("event_type"), col("user_id"),
        col("ts").cast("timestamp").as("ts"), col("value"))
    // 4 file splits: a (group, day, arm) cell's counts straddle
    // batches, so the partial-sum addition path is exercised, and
    // later batches extend day spans (the look re-slicing path)
    src.repartition(4).write.mode("overwrite").parquet(dir)

    val stream = spark.readStream.schema(src.schema)
      .option("maxFilesPerTrigger", "1").parquet(dir)
    val q = StreamingGroupSequential.monitor(stream, "event_type",
      "user_id", "ts", col("value") >= 100.0, cellsDir = cellsDir,
      cardsDir = cardsDir, checkpointDir = ck)
    try q.processAllAvailable() finally q.stop()

    val got = StreamingGroupSequential.currentLadders(spark, cardsDir)
      .as[LadderRow].collect().toSet
    val want = Events.groupSequential(src, "event_type", "user_id",
        "ts", col("value") >= 100.0)
      .as[LadderRow].collect().toSet
    assert(want.nonEmpty && got == want,
      s"extra=${(got -- want).take(3)} missing=${(want -- got).take(3)}")

    // the archive is partitioned by the sanitized group copy under
    // each batch partition — the storage-pruning contract
    val batchDirs = new java.io.File(cellsDir).listFiles()
      .filter(_.getName.startsWith("batch_id="))
    assert(batchDirs.nonEmpty)
    batchDirs.foreach { d =>
      assert(d.listFiles().exists(_.getName.startsWith("__gpart=")),
        s"${d.getName} not group-partitioned")
    }

    // replay idempotency: redeliver the highest batch id with an
    // exact copy of ALL source rows under a NET-NEW batch id first
    // (associativity: the ladder now reads a doubled corpus), then
    // redeliver THAT batch and check the view does not move
    val nextId = batchDirs.map(_.getName.stripPrefix("batch_id=").toLong)
      .max + 1
    StreamingGroupSequential.applyBatch(src, nextId, "event_type",
      "user_id", "ts", col("value") >= 100.0, cellsDir, cardsDir,
      looks = 5, c = 2.040)
    val doubled = StreamingGroupSequential
      .currentLadders(spark, cardsDir).as[LadderRow].collect().toSet
    val wantDoubled = Events.groupSequential(src.union(src),
        "event_type", "user_id", "ts", col("value") >= 100.0)
      .as[LadderRow].collect().toSet
    assert(doubled == wantDoubled, "doubled corpus mismatch")
    StreamingGroupSequential.applyBatch(src, nextId, "event_type",
      "user_id", "ts", col("value") >= 100.0, cellsDir, cardsDir,
      looks = 5, c = 2.040)
    val again = StreamingGroupSequential
      .currentLadders(spark, cardsDir).as[LadderRow].collect().toSet
    assert(again == wantDoubled, "replay drifted")
  }
}
