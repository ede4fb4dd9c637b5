package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing (extension surface).
  *
  * Media (image/audio/video) are opaque `binary` payload columns plus a
  * typed metadata struct — the schema a 100 TB multimodal corpus would
  * use (payloads inline for small media; at scale the payload column holds
  * a pointer + byte-range and the same operators apply after a fetch step).
  *
  * The actual codec work (JPEG decode, audio resample, frame extraction)
  * needs native libraries that are NOT in this container — those calls are
  * STUBBED with a deterministic fake (clearly marked below). Everything
  * Spark-side is real: schema, partition-preserving mapPartitions, batch
  * shape, column pruning (metadata-only queries never touch payload bytes
  * thanks to parquet column projection).
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false), // image|audio|video
    StructField("payload", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("source", StringType, nullable = true),
      StructField("n_bytes", LongType, nullable = true),
      StructField("checksum", StringType, nullable = true))), nullable = true)))

  /** Build a media table from the documents testdata: payload = utf-8
    * bytes of the text (a deterministic stand-in for real media bytes),
    * metadata computed from the payload with built-in functions. */
  def fromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("kind"),
      encode(col("text"), "UTF-8").as("payload"),
      struct(
        col("source").as("source"),
        octet_length(encode(col("text"), "UTF-8")).cast(LongType).as("n_bytes"),
        md5(encode(col("text"), "UTF-8")).as("checksum")).as("meta"))

  /** Extracted-feature row produced by the decode step. */
  case class MediaFeatures(media_id: Long, kind: String, n_bytes: Long,
                           width: Int, height: Int, feature: Array[Float])

  /** ======================== STUB ========================
    * Deterministic FAKE decoder standing in for the real codec call
    * (e.g. javax.imageio / ffmpeg): derives "dimensions" and a fixed-size
    * "feature vector" purely from the payload bytes so tests are exact.
    * Replace the body marked STUB with the real decode when codec
    * libraries are available; the Spark plumbing around it is final. */
  private def stubDecode(mediaId: Long, kind: String,
                         payload: Array[Byte]): MediaFeatures = {
    val n = if (payload == null) 0L else payload.length.toLong
    // STUB: fake width/height from byte stats, fake 8-dim feature from a
    // rolling byte hash — deterministic, replaces real pixel decoding.
    var h = 1125899906842597L
    var i = 0
    while (i < n) { h = 31 * h + payload(i.toInt); i += 1 }
    val feat = Array.tabulate(8)(j => ((h >>> (j * 8)) & 0xFF).toFloat / 255f)
    MediaFeatures(mediaId, kind, n, (n % 640).toInt + 1, (n % 480).toInt + 1, feat)
  }

  /** Decode/feature-extract over the media table: partition-preserving
    * `mapPartitions` (the Scala analogue of `mapInPandas` batch UDFs) —
    * each task decodes its partition's payloads without any shuffle. */
  def decodeFeatures(media: DataFrame): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "kind", "payload")
      .as[(Long, String, Array[Byte])]
      .mapPartitions(_.map { case (id, kind, payload) =>
        stubDecode(id, kind, payload) })
  }

  /** "Resize" for image payloads: partition-local binary transform with
    * metadata recomputed from the new payload — the same shape a real
    * pixel-resample takes (decode → resample → re-encode per partition).
    * The resample itself is a STUB: byte-stride downsampling keeping every
    * `factor`-th byte (deterministic; replace with the codec call). */
  def resize(media: DataFrame, factor: Int): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    require(factor > 0)
    media.select("media_id", "kind", "payload")
      .as[(Long, String, Array[Byte])]
      .mapPartitions(_.map { case (id, kind, payload) =>
        val out =
          if (kind != "image" || payload == null) payload
          else payload.zipWithIndex.collect {
            case (b, i) if i % factor == 0 => b } // STUB resample
        (id, kind, out)
      })
      .toDF("media_id", "kind", "payload")
      .withColumn("meta", struct(
        lit(null).cast("string").as("source"),
        octet_length(col("payload")).cast("long").as("n_bytes"),
        md5(col("payload")).as("checksum")))
  }

  /** Frame sampling for "video" payloads: byte-range chunking + stride
    * sampling, all with built-in functions (no decode needed) — the real
    * frame boundaries would come from the container index; byte chunks
    * stand in deterministically. */
  def sampleFrames(media: DataFrame, frameBytes: Int, stride: Int): DataFrame =
    media.filter(col("kind") === "video")
      .select(col("media_id"),
        posexplode(split(base64(col("payload")), s"(?<=\\G.{$frameBytes})"))
          .as(Seq("frame_idx", "frame_b64")))
      .filter(pmod(col("frame_idx"), lit(stride)) === 0)
}
