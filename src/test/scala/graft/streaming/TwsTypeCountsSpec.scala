package graft.streaming

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.ops.Events

/** MapState running counts must converge to the batch groupBy counts
  * after replaying the corpus (multiple batches exercise read-back of
  * existing map entries). The TTL'd variant runs in ProcessingTime mode,
  * where the engine triggers continuously — so the test POLLS for
  * convergence instead of processAllAvailable (see TwsTypeCounts doc). */
class TwsTypeCountsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("transformWithState MapState counts == batch groupBy counts") {
    import spark.implicits._
    val dir = Files.createTempDirectory("events_tc").toString
    val src = Events.load(spark, "/root/testdata/sf0.001")
      .select(col("user_id"), col("event_id"),
        col("ts").cast("timestamp").as("ts"), col("event_type"))
    // several files => several micro-batches => map entries are re-read
    // and incremented across batches, not just created once
    src.repartition(4).write.mode("overwrite").parquet(dir)
    val batch = src.groupBy("user_id", "event_type").count()
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet

    val prior = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val stream = spark.readStream.schema(src.schema)
        .option("maxFilesPerTrigger", "1").parquet(dir)
        .as[TwsTypeCounts.TypedEvent]
      val q = TwsTypeCounts
        .typeCounts(stream, ttl = Some(java.time.Duration.ofDays(1))).toDF()
        .writeStream.format("memory").queryName("tc_out")
        .outputMode("append").start()
      try {
        // counts are monotonic; the max emission per key is the final count
        def streamed() = spark.sql(
            """SELECT user_id, event_type, max(n) AS n
               FROM tc_out GROUP BY user_id, event_type""")
          .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
        val deadline = System.currentTimeMillis() + 120000
        var got = streamed()
        while (got != batch && System.currentTimeMillis() < deadline) {
          Thread.sleep(1000)
          got = streamed()
        }
        assert(got == batch,
          s"extra=${(got -- batch).take(5)} missing=${(batch -- got).take(5)}")
      } finally q.stop()
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
