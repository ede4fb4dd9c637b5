package graft.streaming

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark
import graft.ops.{Sampling, TextAnalysis}

/** The curation operators are STATELESS per-row transforms, so they
  * compose into Structured Streaming unchanged — streamed output must
  * equal the batch run on the same data (batch/streaming unification,
  * the property that lets one operator library serve both the backfill
  * and the nightly ingest). */
class CurationStreamSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("streaming PII scrub == batch on same docs (stateless per-row op)") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"),
        concat(col("text"), lit(" mail u"), col("doc_id").cast("string"),
          lit("@ex.org ref 1234567")).as("text"))
    val dir = Files.createTempDirectory("docs_scrub").toString
    docs.write.mode("overwrite").parquet(dir)
    val q = Streaming.runToMemory(
      TextAnalysis.scrubPii(
        spark.readStream.schema(docs.schema).parquet(dir), "doc_id", "text"),
      "scrub_out")
    try {
      val streamed = spark.sql(
        "SELECT doc_id, n_emails, n_ids, clean_text FROM scrub_out")
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2),
          r.getString(3))).sortBy(_._1)
      val batch = TextAnalysis.scrubPii(docs, "doc_id", "text")
        .select("doc_id", "n_emails", "n_ids", "clean_text")
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2),
          r.getString(3))).sortBy(_._1)
      assert(streamed.nonEmpty && streamed.sameElements(batch))
      assert(streamed.forall { case (_, e, i, _) => e == 1 && i == 1 })
    } finally q.stop()
  }

  test("streaming quality filter + weighted sample == batch on same docs") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text")
    val dir = Files.createTempDirectory("docs_curation").toString
    docs.write.mode("overwrite").parquet(dir)

    def curate(df: org.apache.spark.sql.DataFrame) = {
      val kept = TextAnalysis.repetitionMetrics(df, "doc_id", "text")
        .filter(col("keep")).select("doc_id", "top_unigram_frac")
      Sampling.weightedByHash(kept, "doc_id",
        lit(1.0) - col("top_unigram_frac"))
    }

    val q = Streaming.runToMemory(
      curate(spark.readStream.schema(docs.schema).parquet(dir)),
      "curation_out")
    try {
      val streamed = spark.sql("SELECT doc_id FROM curation_out")
        .collect().map(_.getLong(0)).sorted
      val batch = curate(docs).select("doc_id")
        .collect().map(_.getLong(0)).sorted
      assert(streamed.nonEmpty && streamed.sameElements(batch))
    } finally q.stop()
  }
}
