package graft.streaming

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Streaming ingest == batch ingest on the same documents (modulo the
  * kept-row identity for duplicates, which both resolve deterministically:
  * batch keeps min doc_id; streaming keeps first-seen). */
class IngestPipelineSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def docs() = {
    val base = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .withColumn("ingest_ts",
        (lit(1700000000L) + col("doc_id")).cast("timestamp"))
    // plant an exact duplicate (same tokens, new id) + a degenerate doc
    val dup = base.limit(1).withColumn("doc_id", lit(100000L))
    val degenerate = spark.range(1).select(lit(100001L).as("doc_id"),
      lit("spam spam spam spam spam spam spam spam spam spam").as("text"),
      lit("en").as("lang"), lit("synthetic").as("source"),
      lit(49L).as("n_chars"),
      lit(1700000000L).cast("timestamp").as("ingest_ts"))
    base.unionByName(dup).unionByName(degenerate)
  }

  test("batch mode: gates degenerate docs, dedups planted duplicate") {
    val out = IngestPipeline(docs(), streaming = false)
    val ids = out.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(!ids.contains(100001L), "degenerate repetition must be gated")
    assert(!ids.contains(100000L), "duplicate loses to the min-id original")
    assert(ids.nonEmpty)
  }

  test("streaming mode over a file source matches batch row count") {
    val dir = Files.createTempDirectory("ingest_stream").toString
    docs().write.mode("overwrite").parquet(dir)
    val stream = spark.readStream
      .schema(docs().schema).parquet(dir)
    val q = Streaming.runToMemory(
      IngestPipeline(stream, watermark = "10 days"), "ingest_out")
    try {
      val streamed = spark.sql("SELECT count(*) FROM ingest_out")
        .collect()(0).getLong(0)
      val batch = IngestPipeline(docs(), streaming = false).count()
      assert(streamed == batch,
        s"streaming kept $streamed rows, batch kept $batch")
    } finally q.stop()
  }
}
