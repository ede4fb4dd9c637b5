package graft.streaming

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.types.{LongType, StringType}
import graft.TestSpark

/** Layout-stability pins for [[Archives.read]]: the archive directory
  * columns must come back with their DECLARED types (`__gpart` string,
  * `batch_id` long) on ANY hosting session — partition type inference
  * on (vanilla) or off (GraftSession). Without the pin, inference-on
  * re-parses all-numeric `__gpart` dirs as int so the string `isin`
  * prune misses them, and inference-off makes `max(batch_id)` a
  * lexicographic string max ("9" > "10") so every latest-wins view
  * serves a stale card once an archive passes ten batches. */
class ArchivesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val InferKey =
    "spark.sql.sources.partitionColumnTypeInference.enabled"

  test("__gpart survives as a string (leading zero intact) and " +
    "batch_id as a long under BOTH inference settings") {
    import spark.implicits._
    val dir = Files.createTempDirectory("arch_pin").toString
    Seq(("01", 1L), ("2", 5L)).toDF("__gpart", "v")
      .write.partitionBy("__gpart").parquet(s"$dir/batch_id=0")
    Seq(("01", 2L)).toDF("__gpart", "v")
      .write.partitionBy("__gpart").parquet(s"$dir/batch_id=1")
    val saved = spark.conf.get(InferKey)
    try {
      for (infer <- Seq("true", "false")) {
        spark.conf.set(InferKey, infer)
        val df = Archives.read(spark, dir)
        val sch = df.schema.fields.map(f => f.name -> f.dataType).toMap
        assert(sch("__gpart") == StringType, s"infer=$infer: $sch")
        assert(sch("batch_id") == LongType, s"infer=$infer: $sch")
        // the exact prune the __gpart layout exists for: a raw
        // inference-on read would parse dir __gpart=01 as int 1 and
        // this string isin would silently drop the group's history
        val hist = df.filter(col("batch_id") <= 1L &&
            col("__gpart").isin("01"))
          .agg(sum(col("v"))).as[Long].collect().head
        assert(hist == 3L, s"infer=$infer: got $hist, want 1+2")
      }
    } finally spark.conf.set(InferKey, saved)
  }

  test("latest-wins survives the 11th batch: max(batch_id) is numeric " +
    "(a lexicographic string max would pick 9 over 10)") {
    val regsDir = Files.createTempDirectory("arch_regs").toString
    val cardsDir = Files.createTempDirectory("arch_cards").toString
    // 11 one-row batches through the HLL face; the current card must
    // cover ALL 11 (n_rows = 11) — under the pre-pin string max the
    // latest-wins view would read batch 9's card (n_rows = 10)
    for (b <- 0L to 10L) {
      val batch = spark.range(b, b + 1).toDF()
      StreamingHll.applyBatch(batch, b, col("id"), regsDir, cardsDir,
        p = 8)
    }
    val card = StreamingHll.currentCard(spark, cardsDir)
      .select(col("n_rows")).collect().head.getLong(0)
    assert(card == 11L, s"current card covers $card rows, want 11")
  }
}
