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

  /** Stream-stream interval join: match each left event to right events
    * of the same user within `[left.ts - before, left.ts + after]`. BOTH
    * sides are watermarked and the join condition carries the time bounds
    * — exactly what Spark needs to compute how long each side's state
    * must be retained, so state stays bounded on unbounded streams (an
    * unbounded stream-stream equi-join without time bounds would buffer
    * forever and is rejected in Append mode). Inner join: rows emit as
    * soon as both sides arrive. */
  def intervalJoin(left: DataFrame, right: DataFrame,
                   before: String = "10 minutes", after: String = "10 minutes",
                   watermark: String = "30 minutes"): DataFrame = {
    val l = left.withWatermark("ts", watermark)
      .select(col("user_id"), col("event_id").as("l_event_id"),
        col("ts").as("l_ts"), col("value").as("l_value"))
    val r = right.withWatermark("ts", watermark)
      .select(col("user_id").as("r_user_id"), col("event_id").as("r_event_id"),
        col("ts").as("r_ts"), col("value").as("r_value"))
    l.join(r,
      col("user_id") === col("r_user_id") &&
        col("r_ts") >= col("l_ts") - expr(s"INTERVAL $before") &&
        col("r_ts") <= col("l_ts") + expr(s"INTERVAL $after"))
      .select(col("user_id"), col("l_event_id"), col("r_event_id"),
        col("l_ts"), col("r_ts"), col("l_value"), col("r_value"))
  }

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
