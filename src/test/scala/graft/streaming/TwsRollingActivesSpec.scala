package graft.streaming

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.ops.Events

/** The q248 batch/stream reconciliation contract: summing the
  * append-only per-flip increments of [[TwsRollingActives]] must equal
  * the batch [[Events.rollingActiveUsers]] counters row-for-row on the
  * replayed corpus — multi-batch replay (maxFilesPerTrigger = 1 over
  * repartitioned files) exercises cross-batch state read-back and
  * arbitrary day-arrival order, where the monotone-indicator argument
  * (a +1 fires exactly when a day first covers a horizon; no
  * retractions exist) carries the equality. */
class TwsRollingActivesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("streamed increment sums == batch rollingActiveUsers " +
    "(dau, wau7, mau28, stickiness) on the replayed sf0.001 corpus") {
    import spark.implicits._
    val dir = Files.createTempDirectory("events_ra").toString
    val ev = Events.load(spark, "/root/testdata/sf0.001")
    val src = ev.select(col("user_id"),
      col("ts").cast("timestamp").as("ts"))
    // several files => several micro-batches => day sets are re-read
    // across batches and late-vs-early day order is arbitrary
    src.repartition(4).write.mode("overwrite").parquet(dir)
    val batchDf = Events.rollingActiveUsers(ev, "user_id", "ts")
      .localCheckpoint(eager = true)
    val batch = batchDf
      .as[(Long, Long, Long, Long, Option[Long])].collect().toSet
    val dmax = batchDf.agg(max(col("day"))).as[Long].collect()(0)

    val prior =
      spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val stream = spark.readStream.schema(src.schema)
        .option("maxFilesPerTrigger", "1").parquet(dir)
        .as[TwsRollingActives.UserEvent]
      val q = TwsRollingActives.activeIncrements(stream).toDF()
        .writeStream.format("memory").queryName("ra_out")
        .outputMode("append").start()
      try {
        q.processAllAvailable()
        // per-day sums of the increments; stickiness derived with the
        // batch face's exact expression; horizon days past the corpus
        // max have no batch row (the batch dmax filter) — drop them
        val got = spark.sql(
            """SELECT day, sum(dau) AS dau, sum(wau7) AS wau7,
               sum(mau28) AS mau28 FROM ra_out GROUP BY day""")
          .filter(col("day") <= dmax)
          .select(col("day"), col("dau"), col("wau7"), col("mau28"),
            when(col("wau7") > 0, expr("(1000000L * dau) div wau7"))
              .as("stickiness_micros"))
          .as[(Long, Long, Long, Long, Option[Long])].collect().toSet
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
