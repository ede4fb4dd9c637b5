package graft.streaming

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.ops.Events

/** Batch/stream reconciliation for time-decay attribution (q280):
  * recompute-on-touch + latest-wins-per-user must reproduce the batch
  * face row-for-row on a multi-batch replay — exact, zero tolerance
  * (credits are integer micros off the same pure function). */
class StreamingAttributionSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("streamed time-decay credits (latest-wins per user) == batch " +
    "face exactly on a multi-batch replay of click/purchase events") {
    import spark.implicits._
    val dir = Files.createTempDirectory("tda_src").toString
    val eventsDir = Files.createTempDirectory("tda_events").toString
    val creditsDir = Files.createTempDirectory("tda_credits").toString
    val ck = Files.createTempDirectory("tda_ck").toString
    val src = spark.read
      .parquet("/root/testdata/sf0.001/events.parquet")
      .filter(col("event_type").isin("click", "purchase"))
      .select(col("user_id"), col("ts"), col("event_id"),
        col("event_type"))
    // 4 random-ish file splits: users' histories straddle batches, so
    // the latest-wins supersede path is actually exercised
    src.repartition(4).write.mode("overwrite").parquet(dir)

    val stream = spark.readStream.schema(src.schema)
      .option("maxFilesPerTrigger", "1").parquet(dir)
    val q = StreamingAttribution.timeDecay(stream, "user_id", "ts",
      "event_id", "event_type", touchType = "click",
      convType = "purchase", eventsDir = eventsDir,
      creditsDir = creditsDir, checkpointDir = ck,
      halfLifeSeconds = 86400L)
    try q.processAllAvailable() finally q.stop()

    val got = StreamingAttribution
      .currentCredits(spark, creditsDir, "user_id")
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    val want = Events.timeDecayAttribution(src, "user_id", "ts",
        "event_id", "event_type", touchType = "click",
        convType = "purchase", halfLifeSeconds = 86400L)
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(want.nonEmpty && got == want,
      s"extra=${(got -- want).take(5)} missing=${(want -- got).take(5)}")

    // the archive is user-bucketed under each batch partition — the
    // storage-pruning contract: a trigger's history read scans only
    // its touched u_bucket directories, never the whole archive
    val batchDirs = new java.io.File(eventsDir).listFiles()
      .filter(_.getName.startsWith("batch_id="))
    assert(batchDirs.nonEmpty)
    batchDirs.foreach { d =>
      assert(d.listFiles().exists(_.getName.startsWith("u_bucket=")),
        s"${d.getName} not user-bucketed")
    }
  }
}
