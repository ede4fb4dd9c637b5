package graft.streaming

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.ops.Events

/** Funnel repair end to end: disorder-heavy replay through the tagged
  * streaming funnel, quarantined disorder evidence, then
  * [[FunnelReconcile.converge]] must reproduce the pure-batch
  * [[graft.ops.Events.funnelTrace]] on the full corpus — with both
  * converge arms exercised and the aggregate counts matching
  * [[graft.ops.Events.funnel]]. */
class FunnelReconcileSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val steps = Seq("view", "click", "purchase")

  private def withRocks(body: => Unit): Unit = {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prior = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try body
    finally prior match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("stream trace + disorder quarantine -> converge == pure-batch " +
    "funnelTrace on the full corpus; counts == Events.funnel") {
    import spark.implicits._
    withRocks {
      val src = Events.load(spark, "/root/testdata/sf0.001")
        .select(col("user_id"), col("event_id"),
          col("ts").cast("timestamp").as("ts"), col("event_type"))
        .localCheckpoint()

      // hold back the middle slice of every third user's history —
      // their held rows arrive below the high-water mark -> disorder
      // evidence; everyone else stays clean
      val held = col("user_id") % 3 === 0 &&
        col("event_id") >= 400 && col("event_id") < 600
      val dir = Files.createTempDirectory("funnel_reconcile").toString
      def part(p: org.apache.spark.sql.Column): Unit = {
        src.filter(p).coalesce(1).write.mode("append").parquet(dir)
        Thread.sleep(1200)
      }
      part(!held)
      part(held)

      val stream = spark.readStream.schema(src.schema)
        .option("maxFilesPerTrigger", "1").parquet(dir)
        .as[StreamingFunnel.FunnelEvent]
      val q = StreamingFunnel.taggedProgress(stream, steps).toDF()
        .writeStream.format("memory").queryName("funnel_tagged")
        .outputMode("append").start()
      try q.processAllAvailable() finally q.stop()

      val tagged = spark.table("funnel_tagged").localCheckpoint()
      val trace = tagged.filter(col("kind") === "step")
        .select(col("user_id"), col("step_idx"), col("step"), col("ts"))
      val late = tagged.filter(col("kind") === "late")

      val affected = late.select("user_id").distinct()
        .as[Long].collect().toSet
      val allKeys = src.select("user_id").distinct().as[Long].collect().toSet
      assert(affected.nonEmpty, "replay produced no disorder evidence")
      assert((allKeys -- affected).nonEmpty, "no clean users survived")

      def canon(df: org.apache.spark.sql.DataFrame) = df.select(
          col("user_id"), col("step_idx").cast("long"), col("step"),
          unix_timestamp(col("ts")))
        .as[(Long, Long, String, Long)].collect().toSet

      val converged = FunnelReconcile.converge(trace, late, src,
        "user_id", "ts", "event_type", steps)
      val expected = Events.funnelTrace(src, "user_id", "ts",
        "event_type", steps)
      assert(canon(converged) == canon(expected),
        s"missing=${(canon(expected) -- canon(converged)).take(5)} " +
          s"extra=${(canon(converged) -- canon(expected)).take(5)}")

      // the aggregate face: counts of the converged trace match q116's
      // batch operator wherever a step has any conversions
      val counts = converged.groupBy("step_idx")
        .agg(count(lit(1)).as("n"))
        .as[(Long, Long)].collect().toMap
      Events.funnel(src, "user_id", "ts", "event_type", steps)
        .as[(Long, String, Long)].collect()
        .foreach { case (idx, _, n) =>
          assert(counts.getOrElse(idx, 0L) == n, s"step $idx count")
        }
    }
  }

  test("hand case: a late step-1 arrival retroactively unlocks a step-2 " +
    "event the stream passed over — converge repairs it") {
    import spark.implicits._
    withRocks {
      val dir = Files.createTempDirectory("funnel_hand").toString
      def write(rows: Seq[(Long, Long, String, String)]): Unit = {
        rows.toDF("user_id", "event_id", "ts_s", "event_type")
          .withColumn("ts", to_timestamp(col("ts_s"))).drop("ts_s")
          .coalesce(1).write.mode("append").parquet(dir)
        Thread.sleep(1200)
      }
      // batch 1: click @ 10:00 (step 2 type, but step 1 not reached)
      write(Seq((1L, 2L, "2024-01-01 10:00:00", "click")))
      // batch 2 (out of order): view @ 09:00 — in true order the funnel
      // is view(09:00) -> click(10:00); the stream can only emit the
      // view (the click is gone)
      write(Seq((1L, 1L, "2024-01-01 09:00:00", "view")))

      val schema = spark.read.parquet(dir).schema
      val stream = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(dir)
        .as[StreamingFunnel.FunnelEvent]
      val q = StreamingFunnel.taggedProgress(stream, steps).toDF()
        .writeStream.format("memory").queryName("funnel_hand_out")
        .outputMode("append").start()
      try q.processAllAvailable() finally q.stop()

      val tagged = spark.table("funnel_hand_out").localCheckpoint()
      assert(tagged.filter(col("kind") === "late").count() == 1)
      // stream alone: NOTHING advanced — the view is late (behind the
      // click's high-water mark) so it is quarantined only, never
      // mutating funnel state; progress()'s trace therefore carries no
      // disorder-driven rows, and the repair below recovers both steps
      assert(tagged.filter(col("kind") === "step").count() == 0)

      val full = spark.read.parquet(dir)
        .select(col("user_id"), col("event_id"), col("ts"),
          col("event_type"))
      val converged = FunnelReconcile.converge(
          tagged.filter(col("kind") === "step")
            .select(col("user_id"), col("step_idx"), col("step"),
              col("ts")),
          tagged.filter(col("kind") === "late"), full,
          "user_id", "ts", "event_type", steps)
        .select(col("step_idx").cast("long"), col("step"))
        .as[(Long, String)].collect().toSet
      assert(converged == Set((1L, "view"), (2L, "click")))
    }
  }
}
