package graft.streaming

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.ops.Events

/** The streaming funnel trace must equal a JVM replay of the batch
  * funnel definition (earliest step-k event strictly after step-(k−1))
  * under in-order arrival, across multiple micro-batches. */
class StreamingFunnelSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("in-order replay == JVM batch-funnel trace; multi-batch state " +
    "read-back") {
    import spark.implicits._
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prior = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val steps = Seq("view", "click", "purchase")
      val src = Events.load(spark, "/root/testdata/sf0.001")
        .select(col("user_id"), col("event_id"),
          col("ts").cast("timestamp").as("ts"), col("event_type"))
      // JVM replay of the batch contract over the in-order event log
      val rows = src.as[(Long, Long, java.sql.Timestamp, String)]
        .collect().sortBy(r => (r._3.getTime, r._2))
      val expected = rows.groupBy(_._1).toSeq.flatMap { case (u, evs) =>
        var idx = 0
        var lastTs = Long.MinValue
        evs.flatMap { case (_, _, ts, tpe) =>
          if (idx < steps.length && tpe == steps(idx) &&
            (idx == 0 || ts.getTime > lastTs)) {
            idx += 1; lastTs = ts.getTime
            Some((u, idx, tpe, ts.getTime))
          } else None
        }
      }.toSet
      // batch cross-check: per-step completion counts match Events.funnel
      val batchCounts = Events.funnel(src, "user_id", "ts", "event_type",
        steps).as[(Long, String, Long)].collect()
        .map(r => r._1 -> r._3).toMap
      (1 to 3).foreach { i =>
        assert(batchCounts(i.toLong) ==
          expected.count(_._2 == i).toLong, s"step $i")
      }

      val dir = Files.createTempDirectory("funnel_stream").toString
      src.filter(col("event_id") < 500).coalesce(1)
        .write.mode("append").parquet(dir)
      Thread.sleep(1200)
      src.filter(col("event_id") >= 500).coalesce(1)
        .write.mode("append").parquet(dir)
      val stream = spark.readStream.schema(src.schema)
        .option("maxFilesPerTrigger", "1").parquet(dir)
        .as[StreamingFunnel.FunnelEvent]
      val q = StreamingFunnel.progress(stream, steps).toDF()
        .writeStream.format("memory").queryName("funnel_out")
        .outputMode("append").start()
      try {
        q.processAllAvailable()
        val got = spark.sql("SELECT user_id, step_idx, step, " +
            "unix_millis(ts) FROM funnel_out")
          .as[(Long, Int, String, Long)].collect().toSet
        assert(got == expected,
          s"missing=${(expected -- got).take(5)} extra=${(got -- expected).take(5)}")
      } finally q.stop()
    } finally prior match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }
}
