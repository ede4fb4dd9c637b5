package graft.streaming

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.ops.Events

/** The late-data repair story, end to end: a late-HEAVY replay through
  * the tagged streaming SCD2 log, quarantined rows captured, then
  * [[Scd2Reconcile.converge]] must reproduce the pure-batch
  * [[graft.ops.Events.scd2History]] answer on the full corpus — and the
  * scenario must actually exercise BOTH converge arms (clean keys whose
  * stream history is kept + affected keys that recompute). */
class Scd2ReconcileSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

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

  test("stream log + late quarantine -> converge == pure-batch " +
    "scd2History on the full corpus (three-batch disorder replay)") {
    import spark.implicits._
    withRocks {
      val src = Events.load(spark, "/root/testdata/sf0.001")
        .select(col("user_id"), col("event_id"),
          col("ts").cast("timestamp").as("ts"),
          Events.jsonField(col("props"), "$.k").as("attr"))
        .filter(col("attr").isNotNull)
        .localCheckpoint()

      // hold back the MIDDLE slice of every third user's history and
      // replay it last: those users' held rows arrive after later state
      // -> dropped late; every other user is fully in-order in batch 1
      // and stays clean (event_id order == (ts, event_id) order here)
      val held = col("user_id") % 3 === 0 &&
        col("event_id") >= 400 && col("event_id") < 600
      val dir = Files.createTempDirectory("scd2_reconcile").toString
      def part(p: org.apache.spark.sql.Column): Unit = {
        src.filter(p).coalesce(1).write.mode("append").parquet(dir)
        Thread.sleep(1200)
      }
      part(!held)
      part(held)

      val stream = spark.readStream.schema(src.schema)
        .option("maxFilesPerTrigger", "1").parquet(dir)
        .as[StreamingScd2.AttrEvent]
      val q = StreamingScd2.taggedLog(stream).toDF()
        .writeStream.format("memory").queryName("scd2_tagged")
        .outputMode("append").start()
      try q.processAllAvailable() finally q.stop()

      val tagged = spark.table("scd2_tagged").localCheckpoint()
      val changes = tagged.filter(col("kind") === "change")
        .select(col("user_id"), col("attr"),
          col("ts").as("valid_from"), col("event_id"))
      val late = tagged.filter(col("kind") === "late")

      // the scenario must be late-heavy AND leave clean keys: both
      // converge arms are exercised or this spec proves nothing
      val affected = late.select("user_id").distinct()
        .as[Long].collect().toSet
      val allKeys = src.select("user_id").distinct().as[Long].collect().toSet
      assert(affected.nonEmpty, "replay produced no late rows")
      assert((allKeys -- affected).nonEmpty, "no clean keys survived")

      def canon(df: org.apache.spark.sql.DataFrame) = df.select(
          col("user_id"), col("attr"),
          unix_timestamp(col("valid_from")).as("vf"),
          unix_timestamp(col("valid_to")).as("vt"),
          col("is_current"))
        .as[(Long, Long, Long, Option[Long], Boolean)].collect().toSet

      val converged = canon(Scd2Reconcile.converge(
        changes, late, src, "user_id", "ts", "event_id", col("attr")))
      val expected = canon(Events.scd2History(
        src, "user_id", "ts", "event_id", col("attr")))
      assert(converged == expected,
        s"missing=${(expected -- converged).take(5)} " +
          s"extra=${(converged -- expected).take(5)}")
    }
  }

  test("hand case: a late row both inserts a change and erases one the " +
    "stream already emitted — converge repairs, log-patching could not") {
    import spark.implicits._
    withRocks {
      val dir = Files.createTempDirectory("scd2_hand").toString
      def write(rows: Seq[(Long, Long, String, Long)]): Unit = {
        rows.toDF("user_id", "event_id", "ts_s", "attr")
          .withColumn("ts", to_timestamp(col("ts_s"))).drop("ts_s")
          .coalesce(1).write.mode("append").parquet(dir)
        Thread.sleep(1200)
      }
      // batch 1: attr 5 @ 09:00, attr 7 @ 11:00 -> changes (5, 7)
      write(Seq((1L, 1L, "2024-01-01 09:00:00", 5L),
        (1L, 3L, "2024-01-01 11:00:00", 7L)))
      // batch 2 (late): attr 7 @ 10:00 — in true history the 11:00 row
      // is then NOT a change (7 -> 7); the stream already said it was
      write(Seq((1L, 2L, "2024-01-01 10:00:00", 7L)))

      val schema = spark.read.parquet(dir).schema
      val stream = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(dir)
        .as[StreamingScd2.AttrEvent]
      val q = StreamingScd2.taggedLog(stream).toDF()
        .writeStream.format("memory").queryName("scd2_hand_out")
        .outputMode("append").start()
      try q.processAllAvailable() finally q.stop()

      val tagged = spark.table("scd2_hand_out").localCheckpoint()
      assert(tagged.filter(col("kind") === "late").count() == 1)

      val full = spark.read.parquet(dir)
        .select(col("user_id"), col("event_id"), col("ts"), col("attr"))
      val converged = Scd2Reconcile.converge(
          tagged.filter(col("kind") === "change")
            .select(col("user_id"), col("attr"),
              col("ts").as("valid_from"), col("event_id")),
          tagged.filter(col("kind") === "late"),
          full, "user_id", "ts", "event_id", col("attr"))
        .select(col("attr"), unix_timestamp(col("valid_from")),
          col("is_current"))
        .as[(Long, Long, Boolean)].collect().toSet
      // true history: 5@09:00 (closed), 7@10:00 (current) — the 11:00
      // "change" the stream emitted is gone
      def ts(s: String) = java.sql.Timestamp.valueOf(s).getTime / 1000
      assert(converged == Set(
        (5L, ts("2024-01-01 09:00:00"), false),
        (7L, ts("2024-01-01 10:00:00"), true)))
    }
  }
}
