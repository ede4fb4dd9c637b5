package graft.curation

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}
import graft.ops.{Dedup, Multimodal, Sources}

/** Knobs for the [[MediaPipeline]] — like [[Config]], a run is a pure
  * function of (input table, config): every stage composes the repo's
  * deterministic operators (md5 exact identity, integer aHash +
  * pigeonhole banding, min-label components). */
case class MediaConfig(
    minBytes: Long = 8L,
    maxHamming: Int = 3,
    thumbFactor: Int = 2)

/** The MULTIMODAL curation driver — the media-side sibling of the text
  * [[Pipeline]]: same staged-parquet pattern (snappy checkpoints,
  * `_SUCCESS`-aware idempotent skip, per-stage wall/memory telemetry)
  * around the chain an image-corpus run composes:
  *
  *   1. `quality`    — payload-size floor (decode-free, scan-only; the
  *                     cheap gate runs first so later stages never touch
  *                     rejects).
  *   2. `exact_dedup`— byte-identical payloads collapse to the min
  *                     media_id (md5 over the raw bytes — kind-agnostic,
  *                     the checksum dedup every media lake runs first).
  *   3. `neardup`    — PERCEPTUAL dedup for decodable images:
  *                     [[Multimodal.imageHashes]] (real JDK rasters) →
  *                     pigeonhole-banded hamming pairs → components →
  *                     keep the min-id canonical per cluster. Rows
  *                     without a perceptual hash (audio/video/text
  *                     stand-ins, sub-8×8 icons) pass through — their
  *                     identity story ended at stage 2.
  *   4. `thumbs`     — [[Multimodal.resize]] derivative payloads (REAL
  *                     nearest-neighbor downsample for decodable images,
  *                     deterministic byte-stride stub otherwise), the
  *                     training-input materialization.
  *
  * Scale shape: stages 1–2 are scan + one hash aggregation; stage 3
  * joins only the (images-with-hash) relation — banding keeps candidate
  * mass ~linear (SimHash envelope) and the component loop touches only
  * pair-touched nodes; stage 4 is partition-local decode work with no
  * shuffle at all. Media BYTES cross the wire exactly twice (staging
  * write, thumb write) — metadata relations do everything else. */
class MediaPipeline(spark: SparkSession, inputPath: String, outDir: String,
                    config: MediaConfig = MediaConfig()) {

  private val log = org.slf4j.LoggerFactory.getLogger(getClass)
  private val stagingDir = s"$outDir/staging"

  private def logged(name: String)(body: => DataFrame): DataFrame = {
    val t0 = System.nanoTime()
    val out = body
    val rt = Runtime.getRuntime
    log.info(f"stage=$name wall=${(System.nanoTime() - t0) / 1e9}%.1fs " +
      f"heapUsedMb=${(rt.totalMemory() - rt.freeMemory()) >> 20}")
    out
  }

  private def stage(name: String)(compute: => DataFrame): DataFrame =
    logged(name)(Sources.stageParquet(spark, s"$stagingDir/$name")(compute))

  /** Run every stage; returns the thumbnail table read back from its
    * committed checkpoint. */
  def run(): DataFrame = {
    Files.createDirectories(Paths.get(stagingDir))
    val media = spark.read.parquet(inputPath)

    val quality = stage("quality") {
      media.filter(col("payload").isNotNull &&
        octet_length(col("payload")) >= config.minBytes)
    }

    val exact = stage("exact_dedup") {
      // min media_id per byte-identical payload: one combinable
      // aggregation on the md5 key, then keep only winners
      val winners = quality
        .groupBy(md5(col("payload")).as("__ck"))
        .agg(min(col("media_id")).as("media_id"))
        .select(col("media_id"))
      quality.join(winners, Seq("media_id"), "left_semi")
    }

    val neardup = stage("neardup") {
      val hashes = Multimodal.imageHashes(exact).localCheckpoint(eager = false)
      val pairs = Dedup.bandedHammingPairs(
        hashes.select(col("media_id").as("doc_id"), col("ahash").as("sh")),
        config.maxHamming)
      val comp = Dedup.components(hashes.select(col("media_id").as("id")),
        pairs.select(col("doc_a"), col("doc_b")))
      // component label IS the min member id — canonical by construction
      val dropped = comp.filter(col("id") =!= col("label"))
        .select(col("id").as("media_id"))
      exact.join(dropped, Seq("media_id"), "left_anti")
    }

    stage("thumbs") {
      Multimodal.resize(neardup, config.thumbFactor)
    }
  }
}
