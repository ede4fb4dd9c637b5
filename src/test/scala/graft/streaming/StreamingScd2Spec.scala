package graft.streaming

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.ops.Events

/** The streaming SCD2 change log must equal the batch operator's change
  * points under in-order arrival (the contract), and drop late rows
  * rather than rewrite history. File-source batches are ordered by
  * mtime (oldest first), so ordered parts + a sleep give deterministic
  * multi-batch replay that exercises state read-back across batches. */
class StreamingScd2Spec extends AnyFunSuite {
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

  test("in-order replay == batch scd2History change points (multi-batch " +
    "state read-back)") {
    import spark.implicits._
    withRocks {
      val src = Events.load(spark, "/root/testdata/sf0.001")
        .select(col("user_id"), col("event_id"),
          col("ts").cast("timestamp").as("ts"),
          Events.jsonField(col("props"), "$.k").as("attr"))
        .filter(col("attr").isNotNull)
      val expected = Events.scd2History(
          src.withColumnRenamed("attr", "k"), "user_id", "ts", "event_id",
          col("k"))
        .select(col("user_id"), col("attr"),
          unix_timestamp(col("valid_from")).as("vf"))
        .as[(Long, Long, Long)].collect().toSet

      // event_id order == (ts, event_id) order in this data; two parts
      // written with an mtime gap arrive as in-order micro-batches
      val dir = Files.createTempDirectory("scd2_stream").toString
      val mid = 500L
      src.filter(col("event_id") < mid).coalesce(1)
        .write.mode("append").parquet(dir)
      Thread.sleep(1200)
      src.filter(col("event_id") >= mid).coalesce(1)
        .write.mode("append").parquet(dir)

      val stream = spark.readStream.schema(src.schema)
        .option("maxFilesPerTrigger", "1").parquet(dir)
        .as[StreamingScd2.AttrEvent]
      val q = StreamingScd2.changeLog(stream).toDF()
        .writeStream.format("memory").queryName("scd2_out")
        .outputMode("append").start()
      try {
        q.processAllAvailable()
        val got = spark.sql(
            "SELECT user_id, attr, unix_timestamp(valid_from) FROM scd2_out")
          .as[(Long, Long, Long)].collect().toSet
        assert(got == expected,
          s"missing=${(expected -- got).take(5)} extra=${(got -- expected).take(5)}")
      } finally q.stop()
    }
  }

  test("a late row (older than the last applied order key) is dropped, " +
    "not retroactively applied") {
    import spark.implicits._
    withRocks {
      val dir = Files.createTempDirectory("scd2_late").toString
      Seq((1L, 10L, "2024-01-01 10:00:00", 5L))
        .toDF("user_id", "event_id", "ts_s", "attr")
        .withColumn("ts", to_timestamp(col("ts_s"))).drop("ts_s")
        .coalesce(1).write.mode("append").parquet(dir)
      Thread.sleep(1200)
      // same attr change BEFORE the applied row: must be dropped (no
      // second change row, state still 5@10:00)
      Seq((1L, 9L, "2024-01-01 09:00:00", 7L))
        .toDF("user_id", "event_id", "ts_s", "attr")
        .withColumn("ts", to_timestamp(col("ts_s"))).drop("ts_s")
        .coalesce(1).write.mode("append").parquet(dir)

      val schema = spark.read.parquet(dir).schema
      val stream = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(dir)
        .as[StreamingScd2.AttrEvent]
      val q = StreamingScd2.changeLog(stream).toDF()
        .writeStream.format("memory").queryName("scd2_late_out")
        .outputMode("append").start()
      try {
        q.processAllAvailable()
        val got = spark.sql(
            "SELECT user_id, attr FROM scd2_late_out")
          .as[(Long, Long)].collect().toSeq
        assert(got == Seq((1L, 5L)), got)
      } finally q.stop()
    }
  }
}
