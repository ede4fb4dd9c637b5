package graft.curation

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}
import graft.ops.{Dedup, Sampling, Sources, TextAnalysis}

/** Knobs for the [[Pipeline]] — every stage parameter in one place so a
  * run is a pure function of (input corpus, config) and a replay with the
  * same pair is bit-identical (every stage below is built from the
  * repo's deterministic operators: md5 draws, seeded MinHash, min-id
  * component labels).
  *
  * Defaults match the CHECKED query parameters where one exists (q83
  * quality rules, q45 near-dup clustering, q93 split) so the composed
  * pipeline exercises exactly the relations the oracles verify. */
case class Config(
    minWords: Int = 50,
    maxWords: Int = 100000,
    stopWords: Seq[String] = Seq("the", "a"),
    minStops: Int = 2,
    shingleSize: Int = 2,
    minhashK: Int = 32,
    minhashBands: Int = 16,
    minEstJaccard: Double = 0.4,
    dupThreshold: Double = 0.8,
    splitMod: Int = 10,
    splitRem: Int = 0,
    budget: Long = 1400L,
    maxEpochs: Double = 4.0,
    nShards: Int = 8,
    nllBuckets: Boolean = false,
    dsirTargetSource: Option[String] = None,
    dsirMinLogratio: Double = 0.0,
    graphEdgesPath: Option[String] = None,
    graphRankIters: Int = 5,
    graphRankMinMicros: Long = 150000L)

/** The end-to-end TRAINING-DATA CURATION driver — the curation-side
  * sibling of [[graft.fa.Pipeline]]: the same staged-parquet pattern
  * (snappy checkpoints, `_SUCCESS`-aware idempotent skip, per-stage
  * wall/memory telemetry) wrapped around the chain a real corpus run
  * composes from this library's operators:
  *
  *   1. `quality`   — Gopher-style rule filter (q83's relation): word
  *                    count, mean word length, alpha fraction, stopword
  *                    presence.
  *   1b. `nll_buckets` (optional, `Config.nllBuckets`) — CCNet
  *                    per-language unigram-NLL terciles (q103's
  *                    relation); the tail bucket drops.
  *   2. `clusters`  — MinHash-LSH near-dup pairs → connected components
  *                    (q45's relation) over the quality survivors.
  *   3. `deduped`   — one canonical doc per cluster (longest, id
  *                    tie-break — q72's pick) carrying its cluster label.
  *   4. `split`     — leakage-safe train/val by CLUSTER draw (q93's
  *                    relation): near-dups can never straddle the split.
  *   5. `expanded`  — UniMax epoch expansion of the train side by source
  *                    language under (budget, maxEpochs) (q95's
  *                    relation), each copy tagged.
  *   6. shard write — deterministic global shuffle into `nShards`
  *                    single-file shards ([[Sampling.writeShards]]), the
  *                    layout a training loader streams; plus the val set
  *                    as one parquet.
  *
  * Determinism end to end: every stage is a pure function of the data
  * (seeded signatures, md5 draws, min-id labels), so re-running the
  * pipeline into a fresh directory reproduces the shard files
  * BYTE-identically (spec-pinned) — the property that makes a 100 TB
  * training set auditable and resumable. Stage checkpoints make a
  * re-run over an existing directory resume from the last committed
  * stage (S6), exactly like the FA pipeline's national-rerun story.
  *
  * Scale notes: the stage list is linear in corpus scans — quality is
  * scan-only; clustering pays the banded candidate join + O(log d)
  * component rounds (the q45 cost, stress-gated); split is a projection;
  * expansion is a broadcast of the |sources|-row solve + explode; the
  * shard write is ONE hash exchange. Nothing collects to the driver.
  */
class Pipeline(spark: SparkSession, inputPath: String, outputDir: String,
               config: Config = Config(),
               logFile: Option[String] = None) {

  private val stagingDir = s"$outputDir/staging"

  private val log = org.apache.log4j.Logger.getLogger(classOf[Pipeline])
  log.setLevel(org.apache.log4j.Level.INFO)

  private def rssMb: Long = {
    import scala.jdk.CollectionConverters._
    try Files.readAllLines(Paths.get("/proc/self/status")).asScala
      .find(_.startsWith("VmRSS:"))
      .map(_.replaceAll("[^0-9]", "").toLong / 1024)
      .getOrElse(-1L)
    catch { case _: Exception => -1L }
  }

  private def logged(name: String)(body: => DataFrame): DataFrame = {
    val t0 = System.nanoTime()
    val out = body
    val rt = Runtime.getRuntime
    val line = f"stage=$name wall=${(System.nanoTime() - t0) / 1e9}%.1fs " +
      f"heapUsedMb=${(rt.totalMemory() - rt.freeMemory()) >> 20} rssMb=$rssMb"
    log.info(line)
    logFile.foreach { f =>
      Files.writeString(Paths.get(f),
        s"${java.time.Instant.now()} $line\n",
        java.nio.file.StandardOpenOption.CREATE,
        java.nio.file.StandardOpenOption.APPEND)
    }
    out
  }

  private def stage(name: String)(compute: => DataFrame): DataFrame =
    logged(name)(Sources.stageParquet(spark, s"$stagingDir/$name")(compute))

  /** Run every stage; returns the sharded train set read back from the
    * final layout (shard, pos ordering intact). */
  def run(): DataFrame = {
    Files.createDirectories(Paths.get(stagingDir))
    val docs = spark.read.parquet(inputPath)

    val quality = stage("quality") {
      val keep = TextAnalysis.gopherRules(docs, "doc_id", "text",
          minWords = config.minWords, maxWords = config.maxWords,
          stopWords = config.stopWords, minStops = config.minStops)
        .filter(col("keep")).select("doc_id")
      docs.join(keep, Seq("doc_id"))
    }

    // optional CCNet stage (q103's relation): per-language unigram-NLL
    // terciles over the quality survivors — the model fits on the even-id
    // half — and the tail bucket drops. A language with < 3 surviving
    // docs has no tail tercile (NTILE's remainder split), so nothing
    // drops there — the per-language calibration working as intended.
    val curated =
      if (!config.nllBuckets) quality
      else stage("nll_buckets") {
        val scored = TextAnalysis.unigramNll(
          quality.filter(col("doc_id") % 2 === 0), quality, "doc_id", "text")
        val bucketed = TextAnalysis.perplexityBuckets(
          scored.join(quality.select("doc_id", "lang"), Seq("doc_id")),
          Seq("lang"), "doc_id", "avg_nll")
        quality.join(bucketed.filter(col("bucket") =!= "tail")
          .select("doc_id"), Seq("doc_id"))
      }

    // optional DSIR stage (q109's relation): keep only documents the
    // TARGET-source unigram model prefers over the raw-pool model by at
    // least `dsirMinLogratio` nats/token — targeted selection between
    // the rule filter and the (more expensive) near-dup clustering, so
    // dedup pays only for data that already matches the target domain
    val selected =
      if (config.dsirTargetSource.isEmpty) curated
      else stage("dsir") {
        val keep = TextAnalysis.dsirWeights(curated, "doc_id", "text",
            col("source") === config.dsirTargetSource.get)
          .filter(col("avg_logratio") > config.dsirMinLogratio)
          .select("doc_id")
        curated.join(keep, Seq("doc_id"))
      }

    // optional LINK-GRAPH quality stage (q107/q123's relation — the
    // family's stated purpose): documents ranked by mass-conserving
    // PageRank over the corpus link graph (`graphEdgesPath`: a parquet
    // edge relation (src, dst, w) keyed by doc_id) and floored at
    // `graphRankMinMicros`. Documents OUTSIDE the graph score the
    // isolated-node fixpoint — exactly the teleport share, 150000 micros
    // at the default damping — so the default floor passes them and the
    // stage only ever CUTS by link evidence, never by absence of a
    // crawl. Runs between selection and clustering so near-dup pays only
    // for link-credible docs. Rank is a gate, not a carried column:
    // downstream schemas (and the default-config shard bytes) are
    // untouched.
    val ranked =
      if (config.graphEdgesPath.isEmpty) selected
      else stage("graph_rank") {
        // derived from the SAME defaults pageRank runs with below —
        // never re-derived inline (it would silently diverge if the
        // damping/scale defaults ever changed)
        val teleport = graft.ops.Graph.teleportMicros()
        val rank = graft.ops.Graph.pageRank(
          spark.read.parquet(config.graphEdgesPath.get),
          iters = config.graphRankIters, danglingRedistribute = true)
        selected
          .join(rank, selected("doc_id") === rank("node"), "left")
          .filter(coalesce(col("rank_micros"), lit(teleport))
            >= config.graphRankMinMicros)
          .drop("node", "rank_micros")
      }

    val clusters = stage("clusters") {
      val pairs = Dedup.minHashNearDups(ranked, "doc_id", "text",
        k = config.minhashK, bands = config.minhashBands,
        shingleSize = config.shingleSize,
        minEstJaccard = config.minEstJaccard,
        threshold = config.dupThreshold)
      Dedup.components(ranked.select("doc_id"),
        pairs.select("doc_a", "doc_b"))
    }

    val deduped = stage("deduped") {
      val canon = Dedup.canonicalPerCluster(clusters, ranked,
          "doc_id", "n_chars")
        .select(col("canonical_id").as("doc_id"), col("cluster_id"))
      ranked.join(canon, Seq("doc_id"))
    }

    val split = stage("split") {
      val tags = Dedup.groupedSplit(
        deduped.select(col("doc_id").as("id"), col("cluster_id").as("label")),
        mod = config.splitMod, rem = config.splitRem)
      deduped.join(tags.select(col("id").as("doc_id"), col("split")),
        Seq("doc_id"))
    }

    val expanded = stage("expanded") {
      Sampling.epochExpand(split.filter(col("split") === "train")
          .drop("split"),
        "doc_id", "lang", budget = config.budget,
        maxEpochs = config.maxEpochs)
        // the shard draw needs one key per ROW; (doc_id, copy) is the
        // row identity after expansion
        .withColumn("shard_key",
          concat(col("doc_id").cast("string"), lit("#"),
            col("copy").cast("string")))
    }

    logged("val_set") {
      Sources.sinkParquet(split.filter(col("split") === "val").drop("split"),
        s"$outputDir/val.parquet")
    }

    val shards = logged("shards") {
      Sampling.writeShards(expanded, "shard_key", config.nShards,
        s"$outputDir/shards")
      spark.read.parquet(s"$outputDir/shards")
    }
    writeManifest(docs, quality, curated, selected, ranked, deduped,
      split, shards)
    shards
  }

  /** The run MANIFEST — the audit artifact a shipped training set
    * carries: config + per-stage row counts, written as
    * `manifest.json`. Deliberately DETERMINISTIC (no timestamps, no
    * hostnames): every field is a pure function of (input, config), so
    * a replay produces a byte-identical manifest — the cheap first
    * check that two runs really were the same run (the shard files'
    * byte-identity is the strong check; CurationPipelineSpec pins
    * both). Counts come from the committed stage parquet, so the
    * manifest describes what is ON DISK, not what a plan promised. */
  private def writeManifest(docs: DataFrame, quality: DataFrame,
                            curated: DataFrame, selected: DataFrame,
                            ranked: DataFrame, deduped: DataFrame,
                            split: DataFrame,
                            shards: DataFrame): Unit = {
    val trainRows = split.filter(col("split") === "train").count()
    val valRows = split.filter(col("split") === "val").count()
    val fields = Seq(
      "input_rows" -> docs.count().toString,
      "quality_rows" -> quality.count().toString,
      "curated_rows" -> curated.count().toString,
      "selected_rows" -> selected.count().toString,
      "ranked_rows" -> ranked.count().toString,
      "deduped_rows" -> deduped.count().toString,
      "train_rows" -> trainRows.toString,
      "val_rows" -> valRows.toString,
      "shard_rows" -> shards.count().toString,
      "n_shards" -> config.nShards.toString,
      "budget" -> config.budget.toString,
      "max_epochs" -> config.maxEpochs.toString,
      "split_mod" -> config.splitMod.toString,
      "split_rem" -> config.splitRem.toString,
      "dup_threshold" -> config.dupThreshold.toString,
      "nll_buckets" -> config.nllBuckets.toString,
      "dsir_enabled" -> config.dsirTargetSource.isDefined.toString,
      "graph_rank_enabled" -> config.graphEdgesPath.isDefined.toString)
    val json = fields.map { case (k, v) => s""""$k": $v""" }
      .mkString("{\n  ", ",\n  ", "\n}\n")
    Files.writeString(Paths.get(s"$outputDir/manifest.json"), json)
  }
}

/** CLI entry point (mirrors [[graft.fa.Main]]'s flag surface):
  *
  * {{{
  * sbt "runMain graft.curation.Main
  *   --input /root/testdata/sf0.01/documents.parquet
  *   --output /tmp/curated
  *   --budget 1400 --max_epochs 4 --shards 8"
  * }}}
  */
object Main {
  private val required = Seq("input", "output")

  private[curation] def parseArgs(args: Array[String]): Map[String, String] = {
    def loop(rest: List[String], acc: Map[String, String]): Map[String, String] =
      rest match {
        case Nil => acc
        case key :: v :: more if key.startsWith("--") && !v.startsWith("--") =>
          loop(more, acc + (key.drop(2) -> v))
        case key :: _ if key.startsWith("--") =>
          throw new IllegalArgumentException(
            s"argument $key: expected one argument")
        case other :: _ =>
          throw new IllegalArgumentException(s"unexpected argument: $other")
      }
    val opts = loop(args.toList, Map.empty)
    val missing = required.filterNot(opts.contains)
    if (missing.nonEmpty)
      throw new IllegalArgumentException(
        s"the following arguments are required: ${missing.map("--" + _).mkString(", ")}")
    opts
  }

  def main(args: Array[String]): Unit = {
    val opts = parseArgs(args)
    val preexisting = org.apache.spark.sql.SparkSession.getActiveSession
      .orElse(org.apache.spark.sql.SparkSession.getDefaultSession)
    val spark = graft.GraftSession(
      master = opts.getOrElse("master",
        s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]"),
      appName = "curation")
    try {
      val cfg = Config(
        budget = opts.get("budget").map(_.toLong).getOrElse(Config().budget),
        maxEpochs = opts.get("max_epochs").map(_.toDouble)
          .getOrElse(Config().maxEpochs),
        nShards = opts.get("shards").map(_.toInt).getOrElse(Config().nShards))
      val shards = new Pipeline(spark, opts("input"), opts("output"), cfg,
        logFile = opts.get("log_file")).run()
      println(s"TRAIN_SHARD_ROWS=${shards.count()}")
    } finally if (!preexisting.exists(_ eq spark)) spark.stop()
  }
}
