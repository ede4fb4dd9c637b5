package graft.streaming

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** transformWithState sessionization must equal the flatMapGroupsWithState
  * implementation (which is itself pinned to the batch operator): same
  * closed sessions on the same replayed corpus. */
class TwsSessionsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("transformWithState sessions == flatMapGroupsWithState sessions") {
    import spark.implicits._
    val dir = Files.createTempDirectory("events_tws").toString
    val src = graft.ops.Events.load(spark, "/root/testdata/sf0.001")
      .select(col("user_id"), col("event_id"),
        col("ts").cast("timestamp").as("ts"), col("value"))
    src.write.mode("overwrite").parquet(dir)

    def collectSessions(name: String)(
        mk: org.apache.spark.sql.Dataset[StatefulSessions.Event] =>
            org.apache.spark.sql.Dataset[StatefulSessions.Session]) = {
      val stream = spark.readStream.schema(src.schema).parquet(dir)
        .as[StatefulSessions.Event]
      val q = Streaming.runToMemory(mk(stream).toDF(), name)
      try spark.sql(
          s"SELECT user_id, session_start, n_events, sum_value FROM $name")
        .collect()
        .map(r => (r.getLong(0), r.getTimestamp(1).getTime, r.getLong(2),
          math.round(r.getDouble(3) * 100)))
        .toSet
      finally q.stop()
    }

    val prior = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val tws = collectSessions("tws_out")(TwsSessions.sessionize(_, 1800))
      val fmgws = collectSessions("fmgws_out")(StatefulSessions.sessionize(_, 1800))
      assert(tws.nonEmpty, "some sessions must close under the watermark")
      assert(tws == fmgws,
        s"extra=${(tws -- fmgws).take(5)} missing=${(fmgws -- tws).take(5)}")
    } finally {
      prior match {
        case Some(v) => spark.conf.set(
          "spark.sql.streaming.stateStore.providerClass", v)
        case None => spark.conf.unset(
          "spark.sql.streaming.stateStore.providerClass")
      }
    }
  }
}
