package graft.streaming

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark
import graft.ops.Similarity

/** Stream-static semantic alerts vs the batch index ops: the streamed
  * pair feed, re-aggregated, must agree with
  * [[Similarity.ivfAdmitFromIndex]]'s per-vector hit counts on the same
  * (index, batch) pair — the batch/streaming unification property, here
  * across a genuine stream-STATIC equi-join. */
class SemanticAlertsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("streamed alert pairs re-aggregate to the batch admission counts") {
    val emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    val corpus = emb.filter($"vec_id" % 10 =!= 0)
    val incoming = emb.filter($"vec_id" % 10 === 0)
    val (cent, cells) = Similarity.ivfIndex(corpus, "vec_id", "embedding",
      nCentroids = 16)

    val dir = Files.createTempDirectory("sem_alerts").toString
    incoming.write.mode("overwrite").parquet(dir)
    val q = Streaming.runToMemory(
      SemanticAlerts.alerts(
        spark.readStream.schema(incoming.schema).parquet(dir),
        cent, cells, "vec_id", "embedding", threshold = 0.25, nProbe = 4),
      "sem_alerts_out")
    try {
      val streamed = spark.sql(
        "SELECT incoming_id, count(*) AS n FROM sem_alerts_out GROUP BY 1")
        .as[(Long, Long)].collect().toMap
      val batch = Similarity.ivfAdmitFromIndex(cent, cells, incoming,
          "vec_id", "embedding", threshold = 0.25, nProbe = 4)
        .select($"vec_id", $"n_hits").as[(Long, Long)].collect().toMap
      assert(batch.values.exists(_ > 0), "fixture must produce real hits")
      // the alert feed carries one row per hit pair: re-aggregated it IS
      // the batch count relation (zero-hit vectors simply emit nothing)
      assert(streamed == batch.filter(_._2 > 0))
      // and every alert pair is well-formed: no self-pairs leaked through
      val pairs = spark.sql(
        "SELECT incoming_id, corpus_id FROM sem_alerts_out")
        .as[(Long, Long)].collect()
      assert(pairs.forall { case (a, b) => a != b })
      assert(pairs.length == pairs.distinct.length,
        "a (incoming, corpus) pair must alert at most once")
    } finally q.stop()
  }
}
