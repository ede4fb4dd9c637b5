package graft.curation

import java.nio.file.{Files, Path}
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark
import scala.jdk.CollectionConverters._

/** End-to-end golden test for the curation [[Pipeline]] — the
  * FaPipelineSpec treatment for the training-data chain: a hand-built
  * fixture whose quality verdicts, near-dup clusters, canonical picks,
  * split draws and epoch counts are all derivable OUTSIDE Spark (pure-JVM
  * md5 replay for the split; integer epoch math by construction), plus
  * the two operational properties a real corpus run leans on: stage-level
  * idempotent resume and BYTE-identical shard replay across runs.
  */
class CurationPipelineSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // ---- fixture -----------------------------------------------------
  // 60-word texts: 56 DISTINCT topic words (all letters+digits, 6-8
  // chars) + 2x "the a" — pass every gopher rule (>= 50 words, mean word
  // length in [3, 10], alpha fraction 1.0, 2 distinct stop words).
  // Distinct topic vocabularies keep the non-dup docs' 2-gram shingle
  // sets disjoint (except the shared "the a" tail, jaccard ~0.02), so
  // the ONLY near-dup pair is the deliberate one: doc 2 substitutes one
  // word of doc 1 -> 56 of 60 distinct shingles shared, jaccard 0.933.
  private def words(topic: String): Seq[String] =
    (1 to 56).map(i => s"$topic${i}w") ++ Seq("the", "a", "the", "a")

  private val textA  = words("alfa").mkString(" ")
  private val textA2 = words("alfa").updated(20, "perturbedw").mkString(" ")
  private val textB  = words("bravo").mkString(" ")
  private val textC  = words("cand").mkString(" ")
  private val textD  = words("delta").mkString(" ")
  private val textE  = words("echo").mkString(" ")

  private def fixture(): (String, String) = {
    val base = Files.createTempDirectory("curation_fix")
    val in = base.resolve("documents.parquet").toString
    Seq(
      // (doc_id, text, lang, source, n_chars)
      (1L, textA, "en", "web", 300L),   // cluster {1,2}: canonical (n_chars)
      (2L, textA2, "en", "web", 290L),  // near-dup of 1, dropped at dedup
      (3L, textB, "en", "web", 280L),   // singleton -> val (md5 draw 0)
      (4L, "too short the a", "en", "web", 15L), // fails minWords
      (5L, textC, "fr", "web", 270L),   // singleton -> train (draw 7)
      (6L, (1 to 60).map(_ => "zzzzzzzzzzzzzzzz").mkString(" "),
        "en", "web", 1019L),            // mean word len 16 > 10: dropped
      (7L, textD, "fr", "web", 260L),   // singleton -> train (draw 1)
      (8L, textE, "en", "web", 250L)    // singleton -> train (draw 3)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.parquet(in)
    (in, base.resolve("out").toString)
  }

  // pure-JVM replay of groupedSplit's md5 draw (the oracle-side integer
  // path, no Spark): first 8 hex chars of md5(label) as a long, % mod
  private def splitOf(label: Long, mod: Int, rem: Int): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(label.toString.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    if (java.lang.Long.parseLong(hex.take(8), 16) % mod == rem) "val"
    else "train"
  }

  // budget >= maxEpochs * |any source| makes every source epoch-capped:
  // alloc = cap, epochs = maxEpochs exactly — integer copies, no
  // fractional draw to reason about
  private val cfg = Config(splitMod = 10, splitRem = 0,
    budget = 100L, maxEpochs = 2.0, nShards = 2)

  test("golden end-to-end: quality -> clusters -> canonical -> split -> " +
    "2-epoch expansion -> 2 shards, every stage hand-derivable") {
    val (in, out) = fixture()
    val shards = new Pipeline(spark, in, out, cfg).run().cache()

    // stage artifacts committed
    Seq("quality", "clusters", "deduped", "split", "expanded").foreach { s =>
      assert(Files.exists(Path.of(s"$out/staging/$s/_SUCCESS")), s)
    }

    // quality: 4 and 6 fail the rules
    val quality = spark.read.parquet(s"$out/staging/quality")
      .select("doc_id").as[Long].collect().sorted
    assert(quality.toSeq == Seq(1L, 2L, 3L, 5L, 7L, 8L))

    // clusters: min-id labels; only {1,2} merge
    val clusters = spark.read.parquet(s"$out/staging/clusters")
      .as[(Long, Long)].collect().toMap
    assert(clusters == Map(1L -> 1L, 2L -> 1L, 3L -> 3L, 5L -> 5L,
      7L -> 7L, 8L -> 8L))

    // canonical: doc 1 wins its cluster by n_chars
    val dedupedIds = spark.read.parquet(s"$out/staging/deduped")
      .select("doc_id").as[Long].collect().sorted
    assert(dedupedIds.toSeq == Seq(1L, 3L, 5L, 7L, 8L))

    // split: whole-cluster md5 draw, replayed in pure JVM (1, 3 -> val;
    // 5, 7, 8 -> train, spanning both lang sources)
    val expectSplit = Seq(1L, 3L, 5L, 7L, 8L)
      .map(id => id -> splitOf(id, 10, 0)).toMap
    assert(expectSplit.values.toSet == Set("val", "train"),
      "fixture must exercise both sides of the split")
    val gotSplit = spark.read.parquet(s"$out/staging/split")
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    assert(gotSplit == expectSplit)
    val valIds = spark.read.parquet(s"$out/val.parquet")
      .select("doc_id").as[Long].collect().toSet
    assert(valIds == expectSplit.filter(_._2 == "val").keySet)

    // expansion: every train doc exactly copies 1 and 2 (budget caps all
    // sources at maxEpochs = 2.0 -> integral epochs)
    val trainIds = expectSplit.filter(_._2 == "train").keySet
    val copies = shards.select("doc_id", "copy").as[(Long, Long)]
      .collect().toSet
    assert(copies == trainIds.flatMap(id => Set((id, 1L), (id, 2L))))

    // shard layout: one committed parquet file per shard value
    val shardDirs = Files.list(Path.of(s"$out/shards")).iterator().asScala
      .filter(p => p.getFileName.toString.startsWith("shard=")).toList
    assert(shardDirs.map(_.getFileName.toString).toSet
      .subsetOf((0 until cfg.nShards).map(i => s"shard=$i").toSet))
    shardDirs.foreach { d =>
      val parts = Files.list(d).iterator().asScala
        .filter(_.getFileName.toString.endsWith(".parquet")).toList
      assert(parts.size == 1, s"$d should hold exactly one shard file")
    }

    // in-shard order: pos is 1..count within each shard
    val posOk = shards.groupBy("shard")
      .agg(count(lit(1)).as("n"), max("pos").as("mx"), min("pos").as("mn"))
      .as[(String, Long, Long, Long)].collect()
    posOk.foreach { case (s, n, mx, mn) =>
      assert(mn == 1L && mx == n, s"shard $s pos not contiguous")
    }
    shards.unpersist()
  }

  test("replay determinism: a second run into a fresh directory " +
    "reproduces the shard files byte-for-byte") {
    val (in, out1) = fixture()
    new Pipeline(spark, in, out1, cfg).run()
    val out2 = Files.createTempDirectory("curation_replay").toString
    new Pipeline(spark, in, out2, cfg).run()

    def shardBytes(out: String): Map[String, String] =
      Files.list(Path.of(s"$out/shards")).iterator().asScala
        .filter(_.getFileName.toString.startsWith("shard="))
        .map { d =>
          val part = Files.list(d).iterator().asScala
            .filter(_.getFileName.toString.endsWith(".parquet")).toList match {
            case one :: Nil => one
            case other => fail(s"expected one file in $d, got $other")
          }
          val md = java.security.MessageDigest.getInstance("MD5")
          d.getFileName.toString ->
            md.digest(Files.readAllBytes(part)).map("%02x".format(_)).mkString
        }.toMap
    // the run manifest is deterministic too (no timestamps): replay
    // produces byte-identical manifest.json, and its counts match the
    // fixture's derivation (5 deduped, 3 train -> 6 two-epoch rows)
    val m1 = Files.readString(Path.of(s"$out1/manifest.json"))
    val m2 = Files.readString(Path.of(s"$out2/manifest.json"))
    assert(m1 == m2)
    assert(m1.contains("\"deduped_rows\": 5") &&
      m1.contains("\"train_rows\": 3") && m1.contains("\"shard_rows\": 6"),
      m1)

    val a = shardBytes(out1)
    val b = shardBytes(out2)
    assert(a == b && a.nonEmpty, s"shard bytes differ: $a vs $b")
  }

  test("idempotent resume: a re-run over the same output directory skips " +
    "committed stages and lands on the identical train set") {
    val (in, out) = fixture()
    val first = new Pipeline(spark, in, out, cfg).run()
      .select("doc_id", "copy", "shard", "pos")
      .as[(Long, Long, String, Long)].collect().sorted.toSeq
    // poison the INPUT: if any stage recomputed instead of resuming from
    // its committed checkpoint, the result would change (or crash)
    val second = new Pipeline(spark, in, out, cfg).run()
      .select("doc_id", "copy", "shard", "pos")
      .as[(Long, Long, String, Long)].collect().sorted.toSeq
    assert(first == second)
  }

  test("optional CCNet stage: per-language NLL terciles drop each " +
    "language's tail — and ONLY where a language has a tail tercile") {
    val (in, out) = fixture()
    new Pipeline(spark, in, out, cfg.copy(nllBuckets = true)).run()
    assert(Files.exists(Path.of(s"$out/staging/nll_buckets/_SUCCESS")))
    val kept = spark.read.parquet(s"$out/staging/nll_buckets")
      .select("doc_id", "lang").as[(Long, String)].collect()
      .groupBy(_._2).view.mapValues(_.map(_._1).toSet).toMap
    // quality survivors: en {1,2,3,8} (4 docs -> tercile sizes 2/1/1,
    // exactly one tail doc drops), fr {5,7} (2 docs -> NTILE(3) fills
    // buckets 1..2 only, NO tail, nothing drops)
    assert(kept("en").size == 3, s"en kept ${kept("en")}")
    assert(kept("fr") == Set(5L, 7L), s"fr kept ${kept("fr")}")
    // downstream stages ride the curated set: nothing dropped here may
    // reappear in the split
    val splitIds = spark.read.parquet(s"$out/staging/split")
      .select("doc_id").as[Long].collect().toSet
    assert(splitIds.subsetOf(kept.values.flatten.toSet))
  }

  test("optional DSIR stage: only docs the target-source unigram model " +
    "prefers survive into clustering and the split") {
    // mixed-source fixture: docs 5 and 7 carry the TARGET source; their
    // vocabularies (cand*/delta*) define the target model, so the
    // web-source topic docs (alfa*/bravo*/echo*) are target-OOV and
    // score negative while 5 and 7 score positive (their topic tokens
    // are 1/t_tgt vs a 3x-larger raw pool)
    val base = Files.createTempDirectory("curation_dsir")
    val in = base.resolve("documents.parquet").toString
    Seq(
      (1L, textA, "en", "web", 300L),
      (3L, textB, "en", "web", 280L),
      (5L, textC, "fr", "good", 270L),
      (7L, textD, "fr", "good", 260L),
      (8L, textE, "en", "web", 250L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.parquet(in)
    val out = base.resolve("out").toString
    new Pipeline(spark, in, out,
      cfg.copy(dsirTargetSource = Some("good"))).run()
    assert(Files.exists(Path.of(s"$out/staging/dsir/_SUCCESS")))
    val kept = spark.read.parquet(s"$out/staging/dsir")
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(5L, 7L), s"dsir kept $kept")
    val splitIds = spark.read.parquet(s"$out/staging/split")
      .select("doc_id").as[Long].collect().toSet
    assert(splitIds.subsetOf(kept))
    // manifest records the stage
    val manifest = Files.readString(Path.of(s"$out/manifest.json"))
    assert(manifest.contains(""""selected_rows": 2"""), manifest)
    assert(manifest.contains(""""dsir_enabled": true"""), manifest)
  }

  test("optional graph-rank stage: docs below the PageRank floor drop; " +
    "docs outside the link graph pass at the isolated-node fixpoint") {
    // star graph over the quality survivors: 1, 3, 7, 8 all point at 5
    // (a TRAIN-draw singleton, so the surviving hub flows through to
    // shards), and 5 has no out-links (dangling). With mass-conserving
    // PageRank the hub's rank stays above 1.8M micros across the 5-iter
    // oscillation while the pointers hold teleport + their dangling
    // share (< 1M), and out-of-graph doc 2 scores the isolated-node
    // fixpoint (150000). Floor 1,000,000 therefore keeps exactly the
    // hub — pointers AND the uncrawled doc both fall below it.
    val (in, out) = fixture()
    val base = Path.of(out).getParent
    val edgesPath = base.resolve("edges.parquet").toString
    Seq((1L, 5L, 1L), (3L, 5L, 1L), (7L, 5L, 1L), (8L, 5L, 1L))
      .toDF("src", "dst", "w").coalesce(1).write.parquet(edgesPath)
    new Pipeline(spark, in, out,
      cfg.copy(graphEdgesPath = Some(edgesPath),
        graphRankMinMicros = 1000000L)).run()
    assert(Files.exists(Path.of(s"$out/staging/graph_rank/_SUCCESS")))
    val kept = spark.read.parquet(s"$out/staging/graph_rank")
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(5L), s"graph_rank kept $kept")
    val splitIds = spark.read.parquet(s"$out/staging/split")
      .select("doc_id").as[Long].collect().toSet
    assert(splitIds == Set(5L), s"split ids $splitIds")
    val manifest = Files.readString(Path.of(s"$out/manifest.json"))
    assert(manifest.contains(""""ranked_rows": 1"""), manifest)
    assert(manifest.contains(""""graph_rank_enabled": true"""), manifest)
  }

  test("graph-rank stage with the DEFAULT floor: out-of-graph docs pass " +
    "at the isolated-node fixpoint, nothing drops") {
    val (in, out) = fixture()
    val base = Path.of(out).getParent
    val edgesPath = base.resolve("edges_def.parquet").toString
    Seq((3L, 1L, 1L), (5L, 1L, 1L), (7L, 1L, 1L), (8L, 1L, 1L))
      .toDF("src", "dst", "w").coalesce(1).write.parquet(edgesPath)
    new Pipeline(spark, in, out,
      cfg.copy(graphEdgesPath = Some(edgesPath))).run()
    val kept = spark.read.parquet(s"$out/staging/graph_rank")
      .select("doc_id").as[Long].collect().toSet
    // default floor = teleport: in-graph docs all hold >= teleport
    // (its the rank lower bound), out-of-graph docs coalesce to exactly
    // teleport — the stage only ever cuts by link evidence
    assert(kept == Set(1L, 2L, 3L, 5L, 7L, 8L), s"graph_rank kept $kept")
  }

  test("CLI main parses the fa-style flag surface and rejects missing " +
    "required flags") {
    val opts = Main.parseArgs(Array("--input", "/x", "--output", "/y",
      "--budget", "50", "--shards", "4"))
    assert(opts("input") == "/x" && opts("budget") == "50")
    intercept[IllegalArgumentException] { Main.parseArgs(Array("--input", "/x")) }
    intercept[IllegalArgumentException] {
      Main.parseArgs(Array("--input", "--output")) }
  }
}
