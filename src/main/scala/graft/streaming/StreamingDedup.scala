package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import graft.ops.Dedup

/** Streaming corpus admission — the streaming face of
  * [[graft.ops.Dedup.incrementalNearDups]]: each micro-batch of documents
  * is near-dup-deduped against the corpus admitted SO FAR (plus itself),
  * and only accepted docs join the corpus. Unlike the batch operator's
  * pairwise rule, admission across micro-batches is truly GREEDY: a doc
  * rejected in batch N never enters the index, so a later near-dup of it
  * (and of nothing admitted) is accepted — the semantics a real ingest
  * queue has.
  *
  * Built on `foreachBatch` deliberately: near-dup admission needs two
  * passes over the batch (candidate join + verify + anti-join), which no
  * single stateful streaming operator expresses, and `foreachBatch` is the
  * supported way to run full batch plans per trigger. State lives OUTSIDE
  * the stream as two growing parquet tables:
  *  - `corpusDir`  — admitted docs `(doc_id, text)`, partitioned by the
  *    admitting batch id;
  *  - `sigsDir`    — their MinHash signatures `(doc_id, sig)`, the narrow
  *    persisted index [[Dedup.incrementalNearDupsFromSigs]] consumes, so
  *    signatures are computed once per admitted doc, ever.
  * Decisions `(doc_id, status, batch_id)` append to `decisionsDir`.
  *
  * Idempotence: every write lands in a `batch_id=N` subdirectory with
  * overwrite mode, so a replayed micro-batch (restart between sink write
  * and checkpoint commit) rewrites its own partition instead of
  * duplicating rows — the classic parquet-sink replay hazard. At real
  * scale the same pattern rides a transactional table format instead of
  * raw dirs; the admission plan is unchanged.
  *
  * Scale shape per trigger: one scan of the (small) batch, one hash probe
  * of the batch's band keys (broadcast) into the corpus index, corpus text
  * touched only for verify candidates — never a corpus re-scan. */
object StreamingDedup {

  def admit(stream: DataFrame, idCol: String, textCol: String,
            corpusDir: String, sigsDir: String, decisionsDir: String,
            checkpointDir: String,
            k: Int = 16, bands: Int = 8, shingleSize: Int = 3,
            minEstJaccard: Double = 0.5, threshold: Double = 0.8): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        admitBatch(batch, batchId, idCol, textCol, corpusDir, sigsDir,
          decisionsDir, k, bands, shingleSize, minEstJaccard, threshold)
      }
      .start()

  /** One admission round — also the non-streaming entry a scheduled batch
    * ingest calls directly with its own batch ids. */
  def admitBatch(batch: DataFrame, batchId: Long, idCol: String,
                 textCol: String, corpusDir: String, sigsDir: String,
                 decisionsDir: String, k: Int = 16, bands: Int = 8,
                 shingleSize: Int = 3, minEstJaccard: Double = 0.5,
                 threshold: Double = 0.8): Unit = {
    val spark = batch.sparkSession
    val fs = new Path(corpusDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val bootstrap = !fs.exists(new Path(corpusDir))
    // Only partitions from STRICTLY earlier batches count as corpus: a
    // replayed batch must not see its own prior write in the index (it
    // would reject every doc it previously accepted as a self-dup), and
    // the `batch_id` partition filter prunes at the directory level.
    val corpus =
      if (bootstrap) batch.select(col(idCol), col(textCol)).limit(0)
      else Archives.read(spark, corpusDir).filter(col("batch_id") < batchId)
        .select(col(idCol), col(textCol))
    val sigs =
      if (bootstrap)
        Dedup.minHashSignatures(batch.limit(0), idCol, textCol, k, shingleSize)
      else Archives.read(spark, sigsDir).filter(col("batch_id") < batchId)
        .select(col("doc_id"), col("sig"))
    val decisions = Dedup.incrementalNearDupsFromSigs(sigs, corpus, batch,
      idCol, textCol, k, bands, shingleSize, minEstJaccard, threshold)
    // The corpus/sigs reads above are LAZY — materialize the decisions
    // BEFORE appending to the dirs they scan, or the writes below would
    // feed back into the plan that decides them.
    decisions.persist()
    try {
      decisions.count()
      val accepted = batch
        .join(decisions.filter(col("status") === "accepted")
            .select(col("doc_id").as("__accepted_id")),
          batch(idCol) === col("__accepted_id"), "left_semi")
        .select(col(idCol), col(textCol))
      accepted.write.mode("overwrite")
        .parquet(s"$corpusDir/batch_id=$batchId")
      Dedup.minHashSignatures(accepted, idCol, textCol, k, shingleSize)
        .write.mode("overwrite").parquet(s"$sigsDir/batch_id=$batchId")
      decisions.write.mode("overwrite")
        .parquet(s"$decisionsDir/batch_id=$batchId")
    } finally decisions.unpersist()
  }
}
