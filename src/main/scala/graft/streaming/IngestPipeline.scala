package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ops.TextAnalysis

/** Streaming training-data ingest: the LLM-pipeline operators composed as
  * one incremental flow — language-ID → quality gating → exact dedup
  * within a watermark — runnable over a document stream (file source) or,
  * unchanged, over a batch DataFrame (the batch/stream unification goal:
  * every transform here is incremental-safe).
  *
  * At 100 TB-ingest scale this is the shape that matters: per-row scoring
  * is map-side only; the only stateful op is the keyed dedup whose state
  * is bounded by the watermark.
  */
object IngestPipeline {

  /** Score + gate + dedup. `docs` needs (doc_id, text, ingest_ts).
    * Quality gate: ≥ minTokens tokens, distinct-token ratio ≥ minDistinct
    * (degenerate repetition filter), language confidently identified. */
  def apply(docs: DataFrame, minTokens: Int = 8, minDistinct: Double = 0.3,
            watermark: String = "1 hour", streaming: Boolean = true): DataFrame = {
    // one tokenization, shared with langId/fingerprint via TextAnalysis
    val toks = TextAnalysis.tokens(col("text"))
    val scored = docs
      .withColumn("n_tokens", size(toks))
      .withColumn("distinct_ratio",
        size(array_distinct(toks)).cast("double") / size(toks))
      .withColumn("pred_lang", TextAnalysis.langId(col("text")))
      .withColumn("fingerprint", TextAnalysis.contentFingerprint(col("text")))
    val gated = scored.filter(
      col("n_tokens") >= minTokens &&
        col("distinct_ratio") >= minDistinct &&
        col("pred_lang") =!= "und")
    if (streaming)
      gated.withWatermark("ingest_ts", watermark)
        .dropDuplicatesWithinWatermark("fingerprint")
    else
      graft.ops.Dedup.dropExact(gated, "doc_id", col("fingerprint"))
  }
}
