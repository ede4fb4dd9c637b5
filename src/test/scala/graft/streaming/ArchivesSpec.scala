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

  test("compact: folding the HLL register archive moves NOTHING — " +
    "card after a post-compaction batch equals the uncompacted twin; " +
    "directory count collapses; a junk staging dir is discarded") {
    import spark.implicits._
    def dirs() = (Files.createTempDirectory("cmp_regs").toString,
      Files.createTempDirectory("cmp_cards").toString)
    val (regsA, cardsA) = dirs()
    val (regsB, cardsB) = dirs()
    def batch(b: Long) =
      (0L until 200L).map(i => s"k${(b * 137 + i) % 600}").toDF("k")
    for (b <- 0L to 4L; (r, c) <- Seq(regsA -> cardsA, regsB -> cardsB))
      StreamingHll.applyBatch(batch(b), b, col("k"), r, c, p = 8)
    // junk staging dir (no _SUCCESS) must be discarded, not promoted
    Files.createDirectories(java.nio.file.Paths.get(
      regsB, "__compact_tmp_upto=2"))
    StreamingHll.compactRegisters(spark, regsB, upTo = 4L)
    assert(Archives.batchIds(spark, regsB) == Seq(4L),
      Archives.batchIds(spark, regsB))
    assert(!new java.io.File(regsB, "__compact_tmp_upto=2").exists())
    for ((r, c) <- Seq(regsA -> cardsA, regsB -> cardsB))
      StreamingHll.applyBatch(batch(5L), 5L, col("k"), r, c, p = 8)
    val a = StreamingHll.currentCard(spark, cardsA)
      .as[(Long, Long, Double)].collect().head
    val b = StreamingHll.currentCard(spark, cardsB)
      .as[(Long, Long, Double)].collect().head
    assert(a == b, s"$a vs $b")
  }

  test("compact: the sum-based Hoover rollup folds exactly too — " +
    "cards equal the uncompacted twin after a post-compaction batch, " +
    "null group included; __gpart sub-partitioning survives") {
    import spark.implicits._
    def dirs() = (Files.createTempDirectory("cmp_roll").toString,
      Files.createTempDirectory("cmp_cards").toString)
    val (rollA, cardsA) = dirs()
    val (rollB, cardsB) = dirs()
    def batch(b: Long) = (0L until 60L).map { i =>
      val g = if (i % 3 == 2) null
        else s"g${(i % 3).toString}"
      (g, i % 7, (b + 1) * 1.5 + i * 0.25)
    }.toDF("g", "e", "v")
    for (b <- 0L to 3L; (r, c) <- Seq(rollA -> cardsA, rollB -> cardsB))
      StreamingHoover.applyBatch(batch(b), b, "g", "e", "v", r, c)
    StreamingHoover.compactRollup(spark, rollB, upTo = 3L, "g", "e")
    assert(Archives.batchIds(spark, rollB) == Seq(3L))
    // the folded base keeps the sanitized group partitioning (null
    // group under the sentinel dir) so the touched-set prune works
    val base = new java.io.File(rollB, "batch_id=3")
      .listFiles().map(_.getName).filter(_.startsWith("__gpart="))
    assert(base.sorted.toSeq == Seq("__gpart=__graft_null__",
      "__gpart=g0", "__gpart=g1"), base.toSeq)
    for ((r, c) <- Seq(rollA -> cardsA, rollB -> cardsB))
      StreamingHoover.applyBatch(batch(4L), 4L, "g", "e", "v", r, c)
    def cards(c: String) = StreamingHoover
      .currentCards(spark, c, "g")
      .collect().map(_.toString).sorted.toSeq
    assert(cards(cardsA) == cards(cardsB))
  }

  test("compact: the group-sequential cell archive folds exactly — " +
    "ladders equal the uncompacted twin even when the post-compaction " +
    "batch adds a NEW day (the full-ladder re-slice path)") {
    import spark.implicits._
    def ts(day: Long, u: Long) = new java.sql.Timestamp(
      1704067200000L + day * 86400000L + u * 1000L)
    def batch(day: Long) = (0L until 40L).map { u =>
      (if (u % 2 == 0) "exp" else "exp2", u,
        ts(day, u), (u * (day + 3)) % 5 == 0)
    }.toDF("g", "user_id", "ts", "ok")
    def run(compactAt: Option[Long]) = {
      val cells = Files.createTempDirectory("gs_cells").toString
      val cards = Files.createTempDirectory("gs_cards").toString
      for (b <- 0L to 3L) {
        StreamingGroupSequential.applyBatch(batch(b), b, "g",
          "user_id", "ts", col("ok"), cells, cards, looks = 3,
          c = 2.004)
        if (compactAt.contains(b)) {
          StreamingGroupSequential.compactCells(spark, cells, b)
          assert(Archives.batchIds(spark, cells) == Seq(b))
        }
      }
      StreamingGroupSequential.currentLadders(spark, cards)
        .collect().map(_.toString).sorted.toSeq
    }
    val folded = run(compactAt = Some(2L))
    assert(folded == run(compactAt = None) && folded.nonEmpty)
  }

  test("auto-compaction (compactEvery) folds DURING the stream up to " +
    "the previous committed batch only — card identical to the " +
    "uncompacted twin, directory count bounded") {
    import spark.implicits._
    val dir = Files.createTempDirectory("ac_src").toString
    (0L until 600L).map(i => s"k${i % 170}").toDF("k")
      .repartition(5).write.mode("overwrite").parquet(dir)
    def run(every: Int) = {
      val regs = Files.createTempDirectory("ac_regs").toString
      val cards = Files.createTempDirectory("ac_cards").toString
      val ck = Files.createTempDirectory("ac_ck").toString
      val stream = spark.readStream
        .schema(org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("k",
            org.apache.spark.sql.types.StringType))))
        .option("maxFilesPerTrigger", "1").parquet(dir)
      val q = StreamingHll.distinctCard(stream, col("k"), regs, cards,
        ck, p = 8, compactEvery = every)
      try q.processAllAvailable() finally q.stop()
      (StreamingHll.currentCard(spark, cards)
        .as[(Long, Long, Double)].collect().head,
        Archives.batchIds(spark, regs).size)
    }
    val (cardC, dirsC) = run(every = 2)
    val (cardU, dirsU) = run(every = 0)
    assert(cardC == cardU, s"$cardC vs $cardU")
    assert(dirsC <= 2 && dirsU == 5, s"$dirsC vs $dirsU")
  }

  test("currentTheil: the live Theil decomposition reads off the SAME " +
    "Hoover rollup archive and matches the batch face on the " +
    "replayed union, null group included") {
    import spark.implicits._
    val roll = Files.createTempDirectory("th_roll").toString
    val cards = Files.createTempDirectory("th_cards").toString
    def batch(b: Long) = (0L until 50L).map { i =>
      val g = if (i % 4 == 3) null else s"s${(i % 4).toString}"
      (g, i % 9, (b + 1) * 2.0 + i * 0.31)
    }.toDF("g", "e", "v")
    for (b <- 0L to 2L)
      StreamingHoover.applyBatch(batch(b), b, "g", "e", "v", roll,
        cards)
    val all = (0L to 2L).map(batch).reduce(_ unionByName _)
    val want = graft.ops.Events.theilDecomposition(all, "g", "e",
        round(col("v") * 100).cast("long"))
      .collect().map(_.toString).sorted.toSeq
    val got = StreamingHoover.currentTheil(spark, roll, "g", "e")
      .collect().map(_.toString).sorted.toSeq
    assert(got == want && got.size == 4, s"$got vs $want")
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
