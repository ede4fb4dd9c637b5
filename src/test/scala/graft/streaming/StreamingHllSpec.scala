package graft.streaming

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.ops.Sketches

/** Batch/stream reconciliation for the HLL distinct card (q299):
  * per-batch register partials + max-merge recompute + latest-wins
  * must reproduce the batch face's estimate exactly on a multi-batch
  * replay — and, uniquely among the archive faces, redelivering the
  * SAME rows under a NEW batch id must not move the estimate either
  * (max is idempotent: at-least-once is harmless by algebra; only the
  * row count, a plain sum, doubles). */
class StreamingHllSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("streamed HLL card == batch face exactly on a multi-batch " +
    "replay; cross-batch redelivery moves n_rows but NEVER the " +
    "estimate; same-batch replay is fully idempotent") {
    import spark.implicits._
    val dir = Files.createTempDirectory("hll_src").toString
    val regsDir = Files.createTempDirectory("hll_regs").toString
    val cardsDir = Files.createTempDirectory("hll_cards").toString
    val ck = Files.createTempDirectory("hll_ck").toString
    val src = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select(explode(split(col("text"), " ")).as("tok"))
      .filter(length(col("tok")) > 0)
    src.repartition(4).write.mode("overwrite").parquet(dir)

    val stream = spark.readStream.schema(src.schema)
      .option("maxFilesPerTrigger", "1").parquet(dir)
    val q = StreamingHll.distinctCard(stream, col("tok"),
      regsDir = regsDir, cardsDir = cardsDir, checkpointDir = ck)
    try q.processAllAvailable() finally q.stop()

    val got = StreamingHll.currentCard(spark, cardsDir)
      .as[(Long, Long, Double)].collect().head
    val want = Sketches.hllReplay(src, col("tok"))
      .as[(Long, Long, Long, Double, Option[Long])].collect().head
    // (n_rows, nonempty_registers, hll_estimate) must all match the
    // batch face
    assert(got == ((want._1, want._3, want._4)), s"$got vs $want")

    // cross-batch at-least-once: ALL source rows again under a net-new
    // batch id — registers saturate idempotently, estimate unchanged,
    // n_rows doubles
    val nextId = new java.io.File(regsDir).listFiles()
      .filter(_.getName.startsWith("batch_id="))
      .map(_.getName.stripPrefix("batch_id=").toLong).max + 1
    StreamingHll.applyBatch(src, nextId, col("tok"), regsDir,
      cardsDir, p = 8)
    val doubled = StreamingHll.currentCard(spark, cardsDir)
      .as[(Long, Long, Double)].collect().head
    assert(doubled == ((2 * want._1, want._3, want._4)), doubled)

    // same-batch replay: overwrite makes even n_rows idempotent
    StreamingHll.applyBatch(src, nextId, col("tok"), regsDir,
      cardsDir, p = 8)
    val again = StreamingHll.currentCard(spark, cardsDir)
      .as[(Long, Long, Double)].collect().head
    assert(again == doubled, "same-batch replay drifted")
  }
}
