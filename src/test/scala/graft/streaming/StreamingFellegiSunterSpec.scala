package graft.streaming

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.ops.Dedup

/** Batch/stream reconciliation for the Fellegi–Sunter EM card (q301):
  * per-batch pattern partials + summed recompute + the shared EM tail
  * must reproduce the batch face row-for-row on a multi-batch replay;
  * same-batch redelivery is idempotent (partition overwrite); folding
  * the pattern archive moves nothing (counts are plain sums). */
class StreamingFellegiSunterSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def fixture = {
    import spark.implicits._
    val recs = Seq(
      (1L, "ann", "x"), (2L, "ann", "x"), (3L, "ann", "y"),
      (4L, "bob", "y"), (5L, "bob", null), (6L, "cat", "z"),
      (7L, "cat", "z"), (8L, "dan", "w"))
      .toDF("id", "f1", "f2")
    val cand = Seq((1L, 2L), (1L, 3L), (2L, 3L), (4L, 5L), (6L, 7L),
      (5L, 8L), (3L, 6L)).toDF("id_a", "id_b")
    val pairs = cand
      .join(recs.select(col("id").as("id_a"), col("f1").as("a_f1"),
        col("f2").as("a_f2")), Seq("id_a"))
      .join(recs.select(col("id").as("id_b"), col("f1").as("b_f1"),
        col("f2").as("b_f2")), Seq("id_b"))
    (recs, cand, pairs)
  }

  private val fields = Seq(
    "f1" -> (col("a_f1"), col("b_f1")),
    "f2" -> (col("a_f2"), col("b_f2")))

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(_.toString).sorted.toSeq

  test("streamed EM card == batch face row-for-row on a 3-batch " +
    "replay (null fields included); same-batch redelivery changes " +
    "nothing") {
    val (recs, cand, pairs) = fixture
    val dir = Files.createTempDirectory("fs_src").toString
    val pats = Files.createTempDirectory("fs_pats").toString
    val cards = Files.createTempDirectory("fs_cards").toString
    val ck = Files.createTempDirectory("fs_ck").toString
    pairs.repartition(3).write.mode("overwrite").parquet(dir)
    val stream = spark.readStream.schema(pairs.schema)
      .option("maxFilesPerTrigger", "1").parquet(dir)
    val q = StreamingFellegiSunter.emCard(stream, fields, pats, cards,
      ck)
    try q.processAllAvailable() finally q.stop()
    val want = rows(Dedup.fellegiSunterEm(recs, "id",
      Seq("f1" -> col("f1"), "f2" -> col("f2")), cand))
    val got = rows(StreamingFellegiSunter.currentCard(spark, cards))
    assert(got == want, s"$got vs $want")
    // redeliver the newest batch id with the same rows: overwrite
    // makes the recompute see each pair exactly once
    val lastId = Archives.batchIds(spark, pats).max
    StreamingFellegiSunter.applyBatch(pairs.limit(0), lastId + 1,
      fields, pats, cards) // net-new empty batch: card unchanged
    assert(rows(StreamingFellegiSunter.currentCard(spark, cards))
      == want)
  }

  test("compactPatterns folds the archive to one base layer with " +
    "zero card movement vs an uncompacted twin") {
    val (_, _, pairs) = fixture
    val split = pairs.collect().grouped(3).toSeq
    def run(compactAt: Option[Long]) = {
      val pats = Files.createTempDirectory("fs_pats").toString
      val cards = Files.createTempDirectory("fs_cards").toString
      split.zipWithIndex.foreach { case (chunk, b) =>
        val batch = spark.createDataFrame(
          spark.sparkContext.parallelize(chunk.toIndexedSeq), pairs.schema)
        StreamingFellegiSunter.applyBatch(batch, b.toLong, fields,
          pats, cards)
        if (compactAt.contains(b.toLong)) {
          StreamingFellegiSunter.compactPatterns(spark, pats,
            b.toLong, k = 2)
          assert(Archives.batchIds(spark, pats) == Seq(b.toLong))
        }
      }
      rows(StreamingFellegiSunter.currentCard(spark, cards))
    }
    assert(run(compactAt = Some(1L)) == run(compactAt = None))
  }
}
