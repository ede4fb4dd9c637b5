package graft.streaming

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.nio.file.attribute.FileTime
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.ops.Events

/** The buffered (ListState) sessionizer must equal the BATCH operator even
  * when micro-batches arrive in scrambled event-time order — the case the
  * fold-as-you-go implementations only handle within a batch. */
class TwsBufferedSessionsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def writeOnePart(df: DataFrame, dest: Path, name: String,
                           mtimeMs: Long): Unit = {
    val tmp = Files.createTempDirectory("twsb_part")
    df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    val listing = Files.list(tmp)
    try {
      val part = listing.filter(_.toString.endsWith(".parquet"))
        .findFirst().get()
      val target = dest.resolve(name)
      Files.copy(part, target, StandardCopyOption.REPLACE_EXISTING)
      Files.setLastModifiedTime(target, FileTime.fromMillis(mtimeMs))
    } finally listing.close()
    val cleanup = Files.walk(tmp)
    try cleanup.sorted(java.util.Comparator.reverseOrder())
      .forEach(p => Files.deleteIfExists(p))
    finally cleanup.close()
  }

  test("buffered tws sessions == batch sessions under scrambled batch order") {
    import spark.implicits._
    val srcDir = Files.createTempDirectory("twsb_src")
    val src = Events.load(spark, "/root/testdata/sf0.001")
      .select(col("user_id"), col("event_id"),
        col("ts").cast("timestamp").as("ts"), col("value"))
    val maxTs = src.agg(max("ts")).collect()(0).getTimestamp(0).getTime
    val dayMs = 24L * 3600 * 1000
    // four interleaved splits, each spanning the WHOLE time range — every
    // batch after the first delivers events earlier than ones already seen
    val base = System.currentTimeMillis()
    (0 until 4).foreach { i =>
      writeOnePart(src.filter(col("event_id") % 4 === i), srcDir,
        f"split_$i.parquet", base + i * 1000)
    }
    // sentinel far in the future pushes the final watermark past every
    // real session's close-out instant so all sessions emit
    val sentinel = Seq((-1L, -1L,
      new java.sql.Timestamp(maxTs + 2 * 365 * dayMs), 0.0))
      .toDF("user_id", "event_id", "ts", "value")
    writeOnePart(sentinel, srcDir, "zz_sentinel.parquet", base + 60000)

    val prior = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val stream = spark.readStream.schema(src.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(srcDir.toString)
        .as[StatefulSessions.Event]
      val q = Streaming.runToMemory(
        TwsBufferedSessions.sessionize(stream, gapSeconds = 1800,
          watermarkDelay = "365 days").toDF(), "twsb_out")
      try {
        // MICROSECOND-precision comparison: getTime would truncate the
        // sub-millisecond component most events carry and mask a
        // session_start precision bug
        val streamed = spark.sql(
            """SELECT user_id, unix_micros(session_start), n_events, sum_value
               FROM twsb_out WHERE user_id >= 0""")
          .collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
            math.round(r.getDouble(3) * 100)))
          .toSet
        val batch = Events.sessionize(src, gapSeconds = 1800)
          .select(col("user_id"),
            unix_micros(col("session_start").cast("timestamp")),
            col("n_events"), col("sum_value"))
          .collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
            math.round(r.getDouble(3) * 100)))
          .toSet
        assert(streamed.nonEmpty)
        assert(streamed == batch,
          s"extra=${(streamed -- batch).take(5)} missing=${(batch -- streamed).take(5)}")
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
