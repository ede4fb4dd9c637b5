package graft

import org.apache.spark.sql.functions._
import graft.ops.Events
import graft.streaming.{StatefulSessions, Streaming}

/** Usage-example main: drives the streaming sessionizer end-to-end from
  * the public API (also the verify surface for streaming — sbt console
  * cannot derive Timestamp encoders under JDK 17).
  *
  *   sbt "runMain graft.Demo /root/testdata/sf0.001"
  */
object Demo {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = GraftSession(master = "local[4]", shufflePartitions = Some(4),
      appName = "graft-demo")
    import spark.implicits._

    val src = Events.load(spark, dir).select(col("user_id"), col("event_id"),
      col("ts").cast("timestamp").as("ts"), col("value"))
    val stageDir = java.nio.file.Files.createTempDirectory("demo_events").toString
    src.write.mode("overwrite").parquet(stageDir)

    val stream = spark.readStream.schema(src.schema).parquet(stageDir)
      .as[StatefulSessions.Event]
    val q = Streaming.runToMemory(
      StatefulSessions.sessionize(stream, gapSeconds = 1800).toDF(),
      "demo_sessions")
    val closed = spark.sql("SELECT count(*) AS n FROM demo_sessions")
      .collect()(0).getLong(0)
    val batch = Events.sessionize(src, gapSeconds = 1800).count()
    println(s"CLOSED_STREAM_SESSIONS=$closed BATCH_SESSIONS=$batch")
    spark.sql("""SELECT user_id, session_start, n_events, sum_value
                 FROM demo_sessions ORDER BY user_id, session_start LIMIT 5""")
      .show(truncate = false)
    q.stop()

    // streaming dedup: duplicates planted by doubling the source
    val dupDir = java.nio.file.Files.createTempDirectory("demo_dup").toString
    src.unionAll(src).write.mode("overwrite").parquet(dupDir)
    val dq = Streaming.runToMemory(
      Streaming.dedupedStream(spark.readStream.schema(src.schema)
        .parquet(dupDir).selectExpr("user_id", "ts", "value"),
        Seq("user_id", "ts"), watermark = "10 days"), "demo_dedup")
    println(s"STREAM_DEDUP=${spark.sql("SELECT count(*) FROM demo_dedup")
      .collect()(0).getLong(0)} DISTINCT=${src.select("user_id", "ts")
      .distinct().count()}")
    dq.stop()

    // streaming training-data ingest: langid -> quality gate -> dedup
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .withColumn("ingest_ts",
        (lit(1700000000L) + col("doc_id")).cast("timestamp"))
    val ingestDir = java.nio.file.Files.createTempDirectory("demo_ingest").toString
    docs.write.mode("overwrite").parquet(ingestDir)
    val iq = Streaming.runToMemory(
      graft.streaming.IngestPipeline(
        spark.readStream.schema(docs.schema).parquet(ingestDir),
        watermark = "10 days"), "demo_ingest")
    println(s"INGEST_KEPT=${spark.sql("SELECT count(*) FROM demo_ingest")
      .collect()(0).getLong(0)} OF=${docs.count()}")
    iq.stop()

    // multimodal: build media table, decode features, resize images
    val media = graft.ops.Multimodal.fromDocuments(
      spark.read.parquet(s"$dir/documents.parquet"))
    val feats = graft.ops.Multimodal.decodeFeatures(media)
    val resized = graft.ops.Multimodal.resize(media, factor = 4)
    def imageBytes(df: org.apache.spark.sql.DataFrame): Long =
      df.filter(col("kind") === "image")
        .agg(coalesce(sum(col("meta.n_bytes")), lit(0L)))
        .collect()(0).getLong(0)
    println(s"MEDIA=${media.count()} FEATURES=${feats.count()} " +
      s"RESIZED_IMAGE_BYTES=${imageBytes(resized)} " +
      s"ORIG_IMAGE_BYTES=${imageBytes(media)}")
    spark.stop()
  }
}
