package graft.streaming

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.ops.Events

/** Streaming windowed agg == batch windowed agg on the same data
  * (batch/streaming unification check). */
class StreamingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("streaming dedup drops in-watermark duplicate keys") {
    val dir = Files.createTempDirectory("events_dedup").toString
    val src = Events.load(spark, "/root/testdata/sf0.001")
      .selectExpr("user_id", "cast(ts as timestamp) as ts", "value")
    // plant duplicates: every event twice
    src.unionAll(src).write.mode("overwrite").parquet(dir)
    val q = Streaming.runToMemory(
      Streaming.dedupedStream(
        spark.readStream.schema(
          src.schema).parquet(dir).selectExpr("user_id", "ts", "value"),
        Seq("user_id", "ts"), watermark = "10 days"),
      "dedup_out")
    try {
      val n = spark.sql("SELECT count(*) FROM dedup_out").collect()(0).getLong(0)
      val distinct = src.select("user_id", "ts").distinct().count()
      assert(n == distinct, s"streamed dedup $n != batch distinct $distinct")
    } finally q.stop()
  }

  test("stream-stream interval join matches the batch interval join") {
    import org.apache.spark.sql.functions._
    val dirL = Files.createTempDirectory("events_ij_l").toString
    val dirR = Files.createTempDirectory("events_ij_r").toString
    val ev = Events.load(spark, "/root/testdata/sf0.001")
      .select(col("user_id"), col("event_id"),
        col("ts").cast("timestamp").as("ts"), col("value"))
    val left = ev.filter(col("event_id") % 2 === 0)
    val right = ev.filter(col("event_id") % 2 === 1)
    left.write.mode("overwrite").parquet(dirL)
    right.write.mode("overwrite").parquet(dirR)
    def rd(d: String) = spark.readStream.schema(left.schema).parquet(d)
    val q = Streaming.runToMemory(
      Streaming.intervalJoin(rd(dirL), rd(dirR),
        before = "5 minutes", after = "5 minutes", watermark = "10 days"),
      "ij_out")
    try {
      val streamed = spark.sql(
          "SELECT l_event_id, r_event_id FROM ij_out")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val batch = left.select(col("user_id"), col("event_id").as("l_event_id"),
          col("ts").as("l_ts"))
        .join(right.select(col("user_id").as("r_user_id"),
          col("event_id").as("r_event_id"), col("ts").as("r_ts")),
          col("user_id") === col("r_user_id") &&
            col("r_ts") >= col("l_ts") - expr("INTERVAL 5 minutes") &&
            col("r_ts") <= col("l_ts") + expr("INTERVAL 5 minutes"))
        .select("l_event_id", "r_event_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(streamed.nonEmpty && streamed == batch,
        s"extra=${(streamed -- batch).take(5)} missing=${(batch -- streamed).take(5)}")
    } finally q.stop()
  }

  test("windowed counts over a file stream match the batch aggregation") {
    val dir = Files.createTempDirectory("events_stream").toString
    // stage the sf0.001 events (ts normalized to TimestampType) as the
    // streaming source directory
    Events.load(spark, "/root/testdata/sf0.001")
      .withColumn("ts", org.apache.spark.sql.functions.col("ts").cast("timestamp"))
      .write.mode("overwrite").parquet(dir)

    val q = Streaming.runToMemory(
      Streaming.windowedCounts(Streaming.readEvents(spark, dir)),
      "win_counts", outputMode = "append")
    try {
      val streamed = spark.sql(
        "SELECT event_type, sum(n) AS n FROM win_counts GROUP BY event_type")
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val batch = Events.load(spark, "/root/testdata/sf0.001")
        .groupBy("event_type").count()
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      // append-mode emits only windows closed by the watermark; the final
      // (open) window is withheld, so streamed counts are a subset.
      assert(streamed.nonEmpty)
      streamed.foreach { case (k, n) => assert(n <= batch(k)) }
    } finally q.stop()
  }
}
