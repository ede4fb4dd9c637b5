package graft.streaming

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.ops.Events

/** Stateful streaming sessionization emits the same closed sessions the
  * batch operator (ops.Events.sessionize) computes. */
class StatefulSessionsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("flatMapGroupsWithState sessions ⊆ batch sessions, exact on closed ones") {
    import spark.implicits._
    val dir = Files.createTempDirectory("events_state").toString
    val src = Events.load(spark, "/root/testdata/sf0.001")
      .select(col("user_id"), col("event_id"),
        col("ts").cast("timestamp").as("ts"), col("value"))
    src.write.mode("overwrite").parquet(dir)

    val stream = spark.readStream
      .schema(src.schema).parquet(dir)
      .as[StatefulSessions.Event]
    val q = Streaming.runToMemory(
      StatefulSessions.sessionize(stream, gapSeconds = 1800).toDF(),
      "sessions_out")
    try {
      val streamed = spark.sql(
          "SELECT user_id, session_start, n_events, sum_value FROM sessions_out")
        .collect()
        .map(r => (r.getLong(0), r.getTimestamp(1).getTime, r.getLong(2),
          math.round(r.getDouble(3) * 100)))
        .toSet
      val batch = Events.sessionize(
          src.withColumn("ts", col("ts")), gapSeconds = 1800)
        .select(col("user_id"), col("session_start").cast("timestamp"),
          col("n_events"), col("sum_value"))
        .collect()
        .map(r => (r.getLong(0), r.getTimestamp(1).getTime, r.getLong(2),
          math.round(r.getDouble(3) * 100)))
        .toSet
      assert(streamed.nonEmpty, "some sessions must close under the watermark")
      val missing = streamed -- batch
      assert(missing.isEmpty,
        s"streamed sessions must be exactly batch sessions; extra=$missing")
    } finally q.stop()
  }
}
