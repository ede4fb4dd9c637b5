package graft.streaming

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.ops.Events

/** Native stream-stream INTERVAL join (the built-in watermarked join —
  * no custom state needed, per the escalation order): clicks joined to
  * purchases of the same user within 1 h AFTER the click. Both sides
  * carry watermarks so the engine can bound join state (clicks older
  * than the purchase watermark minus the interval are provably
  * unmatched and evicted — the state-cleanup contract that makes
  * stream-stream joins runnable forever at 100 TB/day).
  *
  * The spec replays each side as one in-order file (no late data), so
  * the appended result must equal the batch interval join EXACTLY; late
  * rows beyond the watermark drop by the same documented contract as
  * the rest of the streaming family (StreamingScd2/Funnel), with batch
  * reconciliation as the repair path. */
class StreamStreamJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("watermarked stream-stream interval join == batch interval join " +
    "on an in-order replay") {
    import spark.implicits._
    val ev = Events.load(spark, "/root/testdata/sf0.001")
      .select(col("user_id"), col("event_id"), col("ts").cast("timestamp").as("ts"),
        col("event_type"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("click_id"),
        col("ts").as("click_ts"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("conv_id"),
        col("ts").as("conv_ts"))

    val cDir = Files.createTempDirectory("ssj_clicks").toString
    val pDir = Files.createTempDirectory("ssj_purch").toString
    clicks.coalesce(1).sortWithinPartitions("click_ts")
      .write.mode("overwrite").parquet(cDir)
    purchases.coalesce(1).sortWithinPartitions("conv_ts")
      .write.mode("overwrite").parquet(pDir)

    val cond = "s_user = p_user AND conv_ts > click_ts AND " +
      "conv_ts <= click_ts + INTERVAL 1 HOUR"
    // the REGISTERED batch face (q157) — the stream must equal the
    // relation the contract oracle-checks, not a spec-local re-derivation
    val expected = Events.intervalJoin(
        Events.load(spark, "/root/testdata/sf0.001"),
        "user_id", "ts", "event_id", "event_type",
        leftType = "click", rightType = "purchase", windowSeconds = 3600L)
      .select(col("user_id"), col("left_id"), col("right_id"))
      .as[(Long, Long, Long)].collect().toSet
    assert(expected.nonEmpty)

    val cs = spark.readStream.schema(clicks.schema).parquet(cDir)
      .withColumnRenamed("user_id", "s_user")
      .withWatermark("click_ts", "2 hours")
    val ps = spark.readStream.schema(purchases.schema).parquet(pDir)
      .withColumnRenamed("user_id", "p_user")
      .withWatermark("conv_ts", "2 hours")
    val q = cs.join(ps, expr(cond))
      .select(col("s_user"), col("click_id"), col("conv_id"))
      .writeStream.format("memory").queryName("ssj_out")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val got = spark.table("ssj_out")
        .as[(Long, Long, Long)].collect().toSet
      assert(got == expected,
        s"extra=${(got -- expected).take(5)} missing=${(expected -- got).take(5)}")
    } finally q.stop()
  }
}
