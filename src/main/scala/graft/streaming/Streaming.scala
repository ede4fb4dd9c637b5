package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types._

/** Structured Streaming surface (extension — SURVEY.md §2.9: the reference
  * is batch-only; the `events` table drives streaming demos).
  *
  * The transforms reuse the SAME batch logic (`Events.hourlyAgg`-shaped
  * plans): in Spark the streaming/batch split is only the source/sink —
  * a design goal of this engine (write the operator once, run either way).
  */
object Streaming {

  /** Event schema as the streaming source sees it (ts already a proper
    * timestamp — streaming readers get the normalized column). */
  val eventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType), StructField("ts", TimestampType),
    StructField("user_id", LongType), StructField("event_type", StringType),
    StructField("value", DoubleType), StructField("props", StringType)))

  /** File-based streaming read of an events directory (parquet parts
    * appear → incremental batches). */
  def readEvents(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.schema(eventSchema).parquet(dir)

  /** Watermarked sliding-window aggregation — the canonical streaming agg:
    * 10-minute watermark bounds state; late events beyond it are dropped. */
  def windowedCounts(events: DataFrame,
                     window_ : String = "1 hour",
                     slide: String = "1 hour",
                     watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), window_, slide), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n"), col("sum_value"))

  /** Streaming exact dedup: state-bounded `dropDuplicatesWithinWatermark`
    * on a key column — the streaming face of `Dedup.exactGroups` (state
    * for a key is dropped once the watermark passes it, so unbounded
    * streams don't accumulate unbounded state). */
  def dedupedStream(events: DataFrame, keyCols: Seq[String],
                    watermark: String = "1 hour"): DataFrame =
    events.withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark(keyCols)

  /** Drive a streaming DataFrame to a named in-memory sink and process all
    * currently-available input synchronously (local test/demo harness). */
  def runToMemory(df: DataFrame, name: String,
                  outputMode: String = "append"): StreamingQuery = {
    val q = df.writeStream.format("memory").queryName(name)
      .outputMode(outputMode).start()
    q.processAllAvailable()
    q
  }
}
