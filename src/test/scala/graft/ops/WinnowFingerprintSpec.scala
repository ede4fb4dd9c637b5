package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Pins the r17 row-local winnow_fingerprints expression to the
  * posexplode + frame-min window form it replaced: identical
  * (doc_id, h) sets on every convention edge — short docs (< k tokens,
  * whole text as one gram), head windows shorter than w (running-min
  * prefix), ties to the leftmost position, duplicate-hash dedup. */
class WinnowFingerprintSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val PosScale = 1048576L

  /** The pre-r17 column pipeline, verbatim. */
  private def oldForm(docs: DataFrame, k: Int, w: Int): DataFrame = {
    val toks = split(col("text"), " ")
    val grams = when(size(toks) < k, array(array_join(toks, " ")))
      .otherwise(transform(sequence(lit(0), size(toks) - k),
        i => array_join(slice(toks, i + lit(1), lit(k)), " ")))
    val wnd = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("pos").asc)
      .rowsBetween(-(w - 1), 0)
    docs.select(col("doc_id"), posexplode(grams).as(Seq("pos", "g")))
      .select(col("doc_id"), col("pos"),
        (conv(substring(md5(col("g")), 1, 8), 16, 10).cast("long") *
          PosScale + col("pos")).as("key"))
      .select(col("doc_id"), min(col("key")).over(wnd).as("wkey"))
      .select(col("doc_id"), expr(s"wkey div $PosScale").as("h"))
      .distinct()
  }

  private def sets(df: DataFrame): Map[Long, Set[Long]] =
    df.collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).map { case (d, hs) => d -> hs.map(_._2).toSet }

  test("row-local winnowing equals the window form on edge shapes") {
    val docs = Seq(
      (1L, "a b c d e f g h i j k l m n o p q r s t u v w x y z"),
      (2L, "a"),                         // short doc: one whole-text gram
      (3L, "a b"),                       // still < k for k = 3
      (4L, "x x x x x x x x x x x x"),   // all-equal grams: ties + dedup
      (5L, "the quick brown fox jumps over the lazy dog the quick brown fox"),
      (6L, "")                           // split("") = [""] single gram
    ).toDF("doc_id", "text")
    for ((k, w) <- Seq((3, 10), (3, 4), (2, 2), (1, 3))) {
      val oldR = sets(oldForm(docs, k, w))
      val newR = sets(TextAnalysis.winnowedFingerprints(
        docs, "doc_id", "text", k, w))
      assert(newR == oldR, s"k=$k w=$w")
    }
  }

  test("guarantee survives: shared run of >= w+k-1 tokens shares a hash") {
    val run = "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
      "lambda mu"
    val docs = Seq(
      (10L, s"one two $run three"),
      (20L, s"$run nine eight seven six five")).toDF("doc_id", "text")
    val f = sets(TextAnalysis.winnowedFingerprints(docs, "doc_id", "text",
      3, 4))
    assert((f(10L) intersect f(20L)).nonEmpty)
  }
}
