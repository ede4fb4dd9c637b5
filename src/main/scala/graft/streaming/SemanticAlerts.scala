package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.ops.Similarity

/** STREAM-STATIC semantic contamination alerts: a stream of incoming
  * vectors probes a static, pre-built IVF index
  * ([[graft.ops.Similarity.ivfIndex]]) and emits one row per (incoming,
  * indexed) pair within `threshold` round-4 cosine — the live face of
  * eval-set decontamination: the alert feed a curation pipeline watches
  * while new data lands, with the index frozen between rebuilds (the
  * q102 incremental-IR contract).
  *
  * This is the one streaming join shape the rest of the streaming layer
  * doesn't exercise: a STATELESS stream-static equi-join. Structured
  * Streaming plans the static cell table once and re-probes it each
  * micro-batch — no watermark, no state store, Append-mode clean
  * (stream-stream joins need time bounds, [[Streaming]]'s interval join;
  * stream-static needs nothing).
  *
  * The probe routing avoids a per-row WINDOW (unsupported over streams):
  * the centroid table is collected ONCE at plan build into literal
  * arrays — the coarse quantizer is tiny by definition (that is what
  * makes it a coarse quantizer) — and each row ranks its nProbe nearest
  * cells with an in-row `array_sort` over (−cos₆, cent_id) structs, the
  * exact assignment order of the batch IVF ops. Alerts per pair, not
  * per vector: counting per vector would be a streaming aggregation
  * (state); the pair feed is strictly more informative and stateless —
  * the consumer aggregates however it likes.
  */
object SemanticAlerts {

  /** @param centroids the [[Similarity.ivfIndex]] centroid table
    *                   (cent_id, cv) — collected to literals at plan
    *                   build (tiny by contract)
    * @param cells     the index cell table (cent_id, id, v) — the STATIC
    *                   join side; persist it partitioned by cent_id and
    *                   each probe prunes to its probed cells */
  def alerts(stream: DataFrame, centroids: DataFrame, cells: DataFrame,
             idCol: String, vecCol: String, threshold: Double,
             nProbe: Int = 4): DataFrame = {
    val cent: Array[(Long, Seq[Double])] = centroids
      .select(col("cent_id").cast("long"),
        col("cv").cast("array<double>"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1)))
    require(cent.nonEmpty, "empty centroid table — build the index first")
    require(nProbe >= 1 && nProbe <= cent.length,
      "need 1 <= nProbe <= centroid count")
    val v: Column = col(vecCol).cast("array<double>")
    // in-row probe ranking: struct sort carries (−cos₆, cent_id) — the
    // same order the batch assignment's window uses, without a window
    val ranked = array_sort(array(cent.map { case (cid, cv) =>
      struct(
        (-round(Similarity.cosine(v, lit(cv.toArray)), 6)).as("negcos"),
        lit(cid).as("cent_id"))
    }: _*))
    val probed = stream.select(col(idCol).as("incoming_id"), v.as("__v"),
        explode(slice(ranked, 1, nProbe)).as("__p"))
      .select(col("incoming_id"), col("__v"),
        col("__p.cent_id").as("cent_id"))
    probed
      .join(cells.select(col("cent_id"), col("id").as("corpus_id"),
        col("v").as("__cv")), Seq("cent_id"))
      .filter(col("incoming_id") =!= col("corpus_id"))
      .withColumn("cos", round(Similarity.cosine(col("__v"), col("__cv")), 4))
      .filter(col("cos") >= threshold)
      .select(col("incoming_id"), col("corpus_id"), col("cent_id"), col("cos"))
  }
}
