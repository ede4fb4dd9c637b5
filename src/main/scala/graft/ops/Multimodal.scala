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
  * IMAGE decode/resample is REAL: `javax.imageio` ships with the JDK, so
  * JPEG/PNG/BMP/GIF payloads get true dimensions, a real luminance
  * histogram feature, and a real nearest-neighbor downsample re-encoded
  * as PNG. AUDIO decode is REAL for JDK-parseable formats:
  * `javax.sound.sampled` reads WAV/AIFF/AU PCM payloads into true sample
  * rate, channel count, duration and an RMS envelope feature. VIDEO
  * container metadata is REAL for MP4/QuickTime payloads: a pure
  * header-arithmetic atom walk reads duration, track count and track
  * resolution (frame decode would need codecs this container lacks).
  * Payloads no decoder can parse (the testdata's text-bytes stand-ins,
  * compressed audio, non-MP4 video) fall back to a deterministic fake
  * (clearly marked STUB below).
  * Everything Spark-side is real either way: schema, partition-preserving
  * mapPartitions, batch shape, column pruning (metadata-only queries
  * never touch payload bytes thanks to parquet column projection).
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

  /** REAL image decode via the JDK's javax.imageio: true width/height and
    * an 8-bin normalized luminance histogram as the feature vector
    * (deterministic — integer Rec.601 luma, fixed binning). Returns None
    * for null payloads and for byte streams ImageIO does not recognize
    * (text stand-ins, audio, video) — callers fall back to [[stubDecode]].
    *
    * Scale note: per-pixel getRGB is fine for thumbnail-class media; a
    * 100 TB pipeline feeding large images should read the Raster data
    * buffer per row instead — same operator shape, partition-local. */
  private[graft] def decodeImage(payload: Array[Byte])
      : Option[(Int, Int, Array[Float])] = {
    if (payload == null) return None
    try {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(payload))
      if (img == null) None
      else {
        val w = img.getWidth
        val h = img.getHeight
        val hist = new Array[Long](8)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val rgb = img.getRGB(x, y)
            val lum = (((rgb >> 16) & 0xFF) * 299 + ((rgb >> 8) & 0xFF) * 587 +
              (rgb & 0xFF) * 114) / 1000
            hist(lum >> 5) += 1
            x += 1
          }
          y += 1
        }
        val n = (w.toLong * h).toFloat
        Some((w, h, hist.map(_ / n)))
      }
      // NonFatal, not just IOException: ImageIO plugins throw
      // RuntimeException subclasses on corrupt streams, and a bad payload
      // must degrade to the stub path, not kill a 100 TB job
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** REAL image downsample: decode, nearest-neighbor sample every
    * `factor`-th pixel, re-encode as PNG (ImageIO's PNG writer is
    * deterministic for a given raster). None when the payload isn't a
    * decodable image. */
  private[ops] def resizeImage(payload: Array[Byte],
                               factor: Int): Option[Array[Byte]] = {
    if (payload == null) return None
    try {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(payload))
      if (img == null) None
      else {
        val nw = math.max(1, img.getWidth / factor)
        val nh = math.max(1, img.getHeight / factor)
        val out = new java.awt.image.BufferedImage(nw, nh,
          java.awt.image.BufferedImage.TYPE_INT_RGB)
        var y = 0
        while (y < nh) {
          var x = 0
          while (x < nw) {
            out.setRGB(x, y, img.getRGB(x * factor, y * factor))
            x += 1
          }
          y += 1
        }
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(out, "png", bos)
        Some(bos.toByteArray)
      }
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** REAL audio decode via the JDK's javax.sound.sampled (WAV/AIFF/AU
    * containers, 8/16-bit PCM — no native codecs needed). Returns
    * `(sampleRate, channels, feature)` where the 8-dim feature is
    * `[duration_sec, overall RMS, RMS of 6 equal time slices]` over the
    * mono mixdown normalized to [-1, 1] — deterministic (integer sample
    * math, fixed slicing), so the RMS envelope doubles as a cheap
    * audio fingerprint for dedup. None for null payloads, non-audio byte
    * streams, and compressed (non-PCM) encodings — callers fall back to
    * [[stubDecode]].
    *
    * Scale note: like [[decodeImage]] this is partition-local and
    * allocation-light (one pass over the frames, no sample buffer). */
  private[ops] def decodeAudio(payload: Array[Byte])
      : Option[(Int, Int, Array[Float])] = {
    if (payload == null) return None
    try {
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(payload))
      try {
        val fmt = ais.getFormat
        val enc = fmt.getEncoding
        val bits = fmt.getSampleSizeInBits
        val signed = enc == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED
        val unsigned = enc == javax.sound.sampled.AudioFormat.Encoding.PCM_UNSIGNED
        if ((!signed && !unsigned) || (bits != 8 && bits != 16)) return None
        val bytes = ais.readAllBytes()
        val channels = fmt.getChannels
        val frameBytes = fmt.getFrameSize
        val nFrames = bytes.length / frameBytes
        if (nFrames == 0) return None
        val big = fmt.isBigEndian
        // mono mixdown in [-1, 1] for frame i
        def sample(i: Int): Double = {
          var c = 0
          var acc = 0.0
          while (c < channels) {
            val off = i * frameBytes + c * (bits / 8)
            val raw =
              if (bits == 8) {
                if (signed) bytes(off).toInt else (bytes(off) & 0xFF) - 128
              } else {
                val (b0, b1) = if (big) (bytes(off), bytes(off + 1))
                               else (bytes(off + 1), bytes(off))
                // high byte sign-extends only for signed PCM
                val hi = if (signed) b0.toInt else b0 & 0xFF
                val v = (hi << 8) | (b1 & 0xFF)
                if (signed) v else v - 32768
              }
            acc += raw / (if (bits == 8) 128.0 else 32768.0)
            c += 1
          }
          acc / channels
        }
        // one pass: total sum-of-squares + 6 equal-slice sums
        val slices = 6
        val sliceSq = new Array[Double](slices)
        val sliceN = new Array[Long](slices)
        var i = 0
        while (i < nFrames) {
          val s = sample(i)
          val slice = math.min(slices - 1, (i.toLong * slices / nFrames).toInt)
          sliceSq(slice) += s * s
          sliceN(slice) += 1
          i += 1
        }
        val totalSq = sliceSq.sum
        val feat = new Array[Float](8)
        feat(0) = (nFrames / fmt.getSampleRate.toDouble).toFloat
        feat(1) = math.sqrt(totalSq / nFrames).toFloat
        var k = 0
        while (k < slices) {
          feat(2 + k) =
            if (sliceN(k) == 0) 0f else math.sqrt(sliceSq(k) / sliceN(k)).toFloat
          k += 1
        }
        Some((math.round(fmt.getSampleRate), channels, feat))
      } finally ais.close()
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** REAL video CONTAINER metadata via an MP4/QuickTime atom walk — no
    * codec needed (the JDK has none): boxes are `[u32 size][4cc type]`
    * (size 1 ⇒ 64-bit size follows; size 0 ⇒ to end of stream), nested
    * for containers. The walk finds `moov`, reads `mvhd` (timescale +
    * duration ⇒ duration seconds) and each `trak`'s `tkhd` (16.16
    * fixed-point width/height; audio tracks carry 0×0), and returns
    * `(width, height, feature)` with the max track dimensions and
    * feature = [duration_sec, n_tracks, timescale, 0…]. Deterministic
    * (pure header arithmetic). None for null payloads and anything that
    * is not a well-formed MP4 container — those keep the [[stubDecode]]
    * fallback, now only for genuinely unparseable formats. */
  private[ops] def decodeVideo(payload: Array[Byte])
      : Option[(Int, Int, Array[Float])] = {
    if (payload == null || payload.length < 16) return None
    // MJPEG-AVI: real frames, real pixels (container split + ImageIO
    // JPEG decode — no codec). feature = [duration_sec, n_frames,
    // fps, mean luma of the FIRST decodable frame (0..1), 0…]
    splitAviFrames(payload) match {
      case Some((usPerFrame, frames)) =>
        val decoded = frames.iterator.map(decodeImage).collectFirst {
          case Some(d) => d
        }
        val feat = new Array[Float](8)
        feat(0) =
          if (usPerFrame > 0) frames.size * usPerFrame / 1e6f else 0f
        feat(1) = frames.size.toFloat
        feat(2) = if (usPerFrame > 0) 1e6f / usPerFrame else 0f
        decoded match {
          case Some((w, h, hist)) =>
            // histogram bins are luma/32 buckets; mean bin center / 8
            feat(3) = hist.zipWithIndex
              .map { case (p, i) => p * (i + 0.5f) / 8f }.sum
            return Some((w, h, feat))
          case None if frames.nonEmpty =>
            // real container, undecodable frames (foreign codec in an
            // AVI shell): keep metadata, no dimensions
            return Some((0, 0, feat))
          case None => // empty movi: fall through to the MP4 walk
        }
      case None =>
    }
    def u32(off: Int): Long =
      ((payload(off) & 0xFFL) << 24) | ((payload(off + 1) & 0xFFL) << 16) |
        ((payload(off + 2) & 0xFFL) << 8) | (payload(off + 3) & 0xFFL)
    def u64(off: Int): Long = (u32(off) << 32) | u32(off + 4)
    def fourcc(off: Int): String =
      new String(payload, off, 4, java.nio.charset.StandardCharsets.US_ASCII)
    // yields (type, contentStart, contentEnd) for each box in [from, to)
    def boxes(lo: Long, hi: Long): Iterator[(String, Long, Long)] =
      new Iterator[(String, Long, Long)] {
        private var pos = lo
        def hasNext: Boolean = pos + 8 <= hi
        def next(): (String, Long, Long) = {
          val size0 = u32(pos.toInt)
          val typ = fourcc(pos.toInt + 4)
          val (hdr, size) =
            if (size0 == 1L && pos + 16 <= hi) (16L, u64(pos.toInt + 8))
            else if (size0 == 0L) (8L, hi - pos)
            else (8L, size0)
          if (size < hdr || pos + size > hi) { pos = hi; ("", 0L, 0L) }
          else { val r = (typ, pos + hdr, pos + size); pos += size; r }
        }
      }
    try {
      val top = boxes(0L, payload.length.toLong).toList
      // an MP4 leads with ftyp (or a QuickTime-style moov-first layout);
      // require a recognizable top-level structure, not just 8 bytes that
      // happen to parse
      if (!top.exists(_._1 == "moov") ||
          !top.headOption.exists(b => b._1 == "ftyp" || b._1 == "moov"))
        return None
      val (_, ms, me) = top.find(_._1 == "moov").get
      var durationSec = 0f
      var timescale = 0f
      var nTracks = 0
      var w = 0
      var h = 0
      boxes(ms, me).foreach {
        case ("mvhd", cs, _) =>
          val c = cs.toInt
          val v = payload(c) & 0xFF
          if (v == 1) {
            timescale = u32(c + 20).toFloat
            if (timescale > 0) durationSec = u64(c + 24) / timescale
          } else {
            timescale = u32(c + 12).toFloat
            if (timescale > 0) durationSec = u32(c + 16) / timescale
          }
        case ("trak", cs, ce) =>
          nTracks += 1
          boxes(cs, ce).foreach {
            case ("tkhd", tcs, _) =>
              val c = tcs.toInt
              val v = payload(c) & 0xFF
              val base = if (v == 1) c + 88 else c + 76
              // 16.16 fixed point; integer part only
              val tw = (u32(base) >> 16).toInt
              val th = (u32(base + 4) >> 16).toInt
              w = math.max(w, tw)
              h = math.max(h, th)
            case _ =>
          }
        case _ =>
      }
      val feat = new Array[Float](8)
      feat(0) = durationSec
      feat(1) = nTracks.toFloat
      feat(2) = timescale
      Some((w, h, feat))
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Pure-JVM MJPEG-AVI frame splitter — CONTAINER parsing only, no
    * codec (the r10–r12 video-decode carry closed the honest way):
    * RIFF/AVI is a little-endian chunk walk, and an MJPEG AVI's
    * '##dc'/'##db' stream chunks inside LIST-'movi' ARE standalone JPEG
    * images, which the JDK's own ImageIO decodes — so MJPEG videos get
    * REAL frame extraction and REAL pixel decode with zero native
    * dependencies. Returns (microSecPerFrame, frame payloads) — frames
    * inside one level of LIST-'rec ' grouping included (the spec's
    * interleave layout); None when the payload isn't a RIFF AVI (MP4
    * metadata stays [[decodeVideo]]'s box walk; other codecs' frames
    * simply won't ImageIO-decode and degrade to the stub). */
  private[ops] def splitAviFrames(payload: Array[Byte])
      : Option[(Long, Vector[Array[Byte]])] = {
    if (payload == null || payload.length < 12) return None
    def fourcc(off: Int): String =
      new String(payload, off, 4, java.nio.charset.StandardCharsets.ISO_8859_1)
    def u32(off: Int): Long = // RIFF is LITTLE-endian (vs MP4's big)
      (payload(off) & 0xFFL) | ((payload(off + 1) & 0xFFL) << 8) |
        ((payload(off + 2) & 0xFFL) << 16) |
        ((payload(off + 3) & 0xFFL) << 24)
    if (fourcc(0) != "RIFF" || fourcc(8) != "AVI ") return None
    try {
      val frames = Vector.newBuilder[Array[Byte]]
      var usPerFrame = 0L
      var sawMovi = false
      def walk(lo: Int, hi: Int)(f: (String, Int, Int) => Unit): Unit = {
        var pos = lo
        var ok = true
        while (ok && pos + 8 <= hi) {
          val id = fourcc(pos)
          val size = u32(pos + 4)
          val start = pos + 8
          if (size < 0 || start + size > hi) ok = false
          else {
            f(id, start, (start + size).toInt)
            pos = (start + size + (size & 1)).toInt
          }
        }
      }
      def collectFrames(lo: Int, hi: Int, depth: Int): Unit =
        walk(lo, hi) { (cid, cs, ce) =>
          if (cid == "LIST" && ce - cs >= 4 && fourcc(cs) == "rec " &&
              depth == 0)
            collectFrames(cs + 4, ce, 1)
          else if (cid.length == 4 && ce > cs &&
              (cid.substring(2) == "dc" || cid.substring(2) == "db"))
            frames += java.util.Arrays.copyOfRange(payload, cs, ce)
        }
      walk(12, payload.length) { (id, s, e) =>
        if (id == "LIST" && e - s >= 4) fourcc(s) match {
          case "movi" => sawMovi = true; collectFrames(s + 4, e, 0)
          case "hdrl" =>
            walk(s + 4, e) { (hid, hs, he) =>
              if (hid == "avih" && he - hs >= 4) usPerFrame = u32(hs)
            }
          case _ =>
        }
      }
      if (sawMovi) Some((usPerFrame, frames.result())) else None
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** ======================== STUB ========================
    * Deterministic FAKE decoder for payloads none of the real decoders
    * can parse (the testdata's media payloads are text-byte stand-ins;
    * MJPEG-AVI video gets REAL frame decode via [[splitAviFrames]] +
    * ImageIO; MP4 container METADATA is real via [[decodeVideo]]; only
    * codec-compressed frame data this JVM cannot decode lands here):
    * derives "dimensions" and a
    * fixed-size "feature vector" purely from the payload bytes so tests
    * are exact. The Spark plumbing around it is final. */
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
    * each task decodes its partition's payloads without any shuffle.
    * Image payloads get the REAL javax.imageio decode (true dimensions +
    * luminance histogram feature); audio payloads the REAL
    * javax.sound.sampled PCM decode (width := sample rate Hz,
    * height := channels, feature := duration + RMS envelope — see
    * [[decodeAudio]]); unparseable payloads and video fall back to the
    * deterministic stub. */
  def decodeFeatures(media: DataFrame): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "kind", "payload")
      .as[(Long, String, Array[Byte])]
      .mapPartitions(_.map { case (id, kind, payload) =>
        (kind match {
          case "image" => decodeImage(payload)
          case "audio" => decodeAudio(payload)
          case "video" => decodeVideo(payload)
          case _ => None
        }) match {
          case Some((w, h, feat)) =>
            MediaFeatures(id, kind, payload.length.toLong, w, h, feat)
          case None => stubDecode(id, kind, payload)
        }
      })
  }

  /** Deterministic 16-bit signed mono PCM WAV through the REAL JDK
    * encoder (javax.sound.sampled): `sample(i)` supplies frame i's raw
    * 16-bit value. The encoder's WAV container round-trips PCM
    * losslessly (OpsSpec pins the octet-level roundtrip on a constant-
    * amplitude fixture), which is what lets [[audioWindowStats]]'s
    * decoded stats be compared against a pure sample-formula oracle. */
  private[graft] def synthWav(nFrames: Int, sample: Int => Int,
                              rate: Float = 8000f): Array[Byte] = {
    import javax.sound.sampled.{AudioFileFormat, AudioFormat,
      AudioInputStream, AudioSystem}
    val pcm = new Array[Byte](nFrames * 2)
    var i = 0
    while (i < nFrames) {
      val s = sample(i)
      pcm(2 * i) = (s & 0xFF).toByte                // little-endian lo
      pcm(2 * i + 1) = ((s >> 8) & 0xFF).toByte     // hi
      i += 1
    }
    val fmt = new AudioFormat(rate, 16, 1, true, false)
    val ais = new AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, nFrames.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** One decoded audio analysis window: exact integer moments off the
    * RAW 16-bit samples (no normalization — the determinism contract). */
  case class AudioWindow(media_id: Long, w: Long, n_frames: Long,
                         sumsq: Long, zero_crossings: Long)

  /** REAL windowed audio stats — per `windowFrames`-frame window of a
    * WAV/AIFF/AU payload: frame count, exact Σs² over the RAW 16-bit
    * integer samples, and the zero-crossing count (sign(s_i) flips vs
    * s_{i−1}, both frames inside the window; the first frame of each
    * window starts no pair — window-local, so stats are a pure function
    * of the window's own samples). Output adds `rms` = round-6
    * sqrt(sumsq/n) — ONE float op over two exact integers, mirrored
    * identically in the oracle. 16-bit signed mono PCM only (the synth
    * contract); unparseable or other-format payloads contribute no rows.
    *
    * Scale shape: partition-local mapPartitions decode (the
    * [[decodeFeatures]] batch shape — no shuffle, payload bytes never
    * leave the task); output is windows-per-payload rows, ~n/windowFrames
    * per media row. */
  def audioWindowStats(media: DataFrame, idCol: String,
                       payloadCol: String, windowFrames: Int): DataFrame = {
    require(windowFrames >= 2, "need windowFrames >= 2")
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, payload) =>
        if (payload == null) Iterator.empty
        else try {
          val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
            new java.io.ByteArrayInputStream(payload))
          try {
            val fmt = ais.getFormat
            val ok = fmt.getEncoding ==
              javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED &&
              fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1
            if (!ok) Iterator.empty
            else {
              val bytes = ais.readAllBytes()
              val n = bytes.length / 2
              val big = fmt.isBigEndian
              def s(i: Int): Int = {
                val (b0, b1) =
                  if (big) (bytes(2 * i), bytes(2 * i + 1))
                  else (bytes(2 * i + 1), bytes(2 * i))
                (b0.toInt << 8) | (b1 & 0xFF)
              }
              val out = scala.collection.mutable.ArrayBuffer
                .empty[AudioWindow]
              var w = 0L
              var i = 0
              while (i < n) {
                val hi = math.min(n, i + windowFrames)
                var sumsq = 0L
                var zc = 0L
                var j = i
                while (j < hi) {
                  val v = s(j)
                  sumsq += v.toLong * v
                  if (j > i && ((v >= 0) != (s(j - 1) >= 0))) zc += 1
                  j += 1
                }
                out += AudioWindow(id, w, (hi - i).toLong, sumsq, zc)
                w += 1
                i = hi
              }
              out.iterator
            }
          } finally ais.close()
        } catch { case scala.util.control.NonFatal(_) => Iterator.empty }
      }
      .toDF()
      .withColumn("rms",
        round(sqrt(col("sumsq").cast("double") / col("n_frames")), 6))
  }

  /** Resize for image payloads: partition-local binary transform with
    * metadata recomputed from the new payload (decode → resample →
    * re-encode per partition, no shuffle). Decodable images get the REAL
    * nearest-neighbor pixel downsample re-encoded as PNG
    * ([[resizeImage]]); payloads ImageIO can't parse keep the
    * deterministic byte-stride STUB so the testdata's text stand-ins
    * still transform reproducibly. */
  def resize(media: DataFrame, factor: Int): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    require(factor > 0)
    media.select("media_id", "kind", "payload")
      .as[(Long, String, Array[Byte])]
      .mapPartitions(_.map { case (id, kind, payload) =>
        val out =
          if (kind != "image" || payload == null) payload
          else resizeImage(payload, factor).getOrElse(
            payload.zipWithIndex.collect {
              case (b, i) if i % factor == 0 => b }) // STUB fallback
        (id, kind, out)
      })
      .toDF("media_id", "kind", "payload")
      .withColumn("meta", struct(
        lit(null).cast("string").as("source"),
        octet_length(col("payload")).cast("long").as("n_bytes"),
        md5(col("payload")).as("checksum")))
  }

  /** PERCEPTUAL average-hash (aHash) of a decodable image: average-pool
    * the integer Rec.601 luma onto an 8×8 grid (cell boundaries by floor
    * division, every pixel in exactly one cell), threshold each cell mean
    * against the mean of the 64 cell means, bit (cy*8+cx) set iff
    * strictly above. All-integer arithmetic end to end, so the hash is a
    * pure function of the decoded raster — re-encodings and small local
    * edits of the same picture land within a few bits, which is what
    * makes hamming-banded near-dup joins work on images. None for
    * payloads ImageIO can't decode and for images smaller than the 8×8
    * grid (a sub-icon image has no stable perceptual content). */
  private[ops] def aHash64(payload: Array[Byte]): Option[Long] = {
    if (payload == null) return None
    try {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(payload))
      if (img == null || img.getWidth < 8 || img.getHeight < 8) None
      else {
        val w = img.getWidth
        val h = img.getHeight
        val sums = new Array[Long](64)
        val counts = new Array[Long](64)
        var y = 0
        while (y < h) {
          val cy = y * 8 / h
          var x = 0
          while (x < w) {
            val rgb = img.getRGB(x, y)
            val lum = (((rgb >> 16) & 0xFF) * 299 + ((rgb >> 8) & 0xFF) * 587 +
              (rgb & 0xFF) * 114) / 1000
            val c = cy * 8 + x * 8 / w
            sums(c) += lum
            counts(c) += 1
            x += 1
          }
          y += 1
        }
        val means = Array.tabulate(64)(i => sums(i) / counts(i))
        val thresh = means.sum / 64
        var hash = 0L
        var i = 0
        while (i < 64) {
          if (means(i) > thresh) hash |= (1L << i)
          i += 1
        }
        Some(hash)
      }
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Per-image perceptual hashes: partition-local decode (same
    * `mapPartitions` shape as [[decodeFeatures]] — no shuffle), one row
    * per DECODABLE image payload, (`media_id`, `ahash`). Undecodable or
    * sub-8×8 payloads are dropped (their near-dup story is the exact
    * checksum in `meta`, not a perceptual radius). */
  def imageHashes(media: DataFrame, idCol: String = "media_id",
                  payloadCol: String = "payload"): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col(idCol), col(payloadCol))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, payload) =>
        aHash64(payload).map(h => (id, h))
      })
      .toDF(idCol, "ahash")
  }

  /** Image near-duplicate pairs: perceptual hashes ([[imageHashes]]) →
    * pigeonhole-banded hamming join ([[Dedup.bandedHammingPairs]] — the
    * same complete-for-the-radius candidate engine the text SimHash path
    * uses). Output (`id_a`, `id_b`, `hamming`), id_a < id_b. The decode
    * is partition-local; the only shuffle is the band-key join, whose
    * candidate mass follows the SimHash envelope (maxHamming ≤ 3 ⇒
    * ≥16-bit chunk keys, the ~linear regime to 10⁵–10⁶ images per
    * shard). */
  def imageNearDups(media: DataFrame, idCol: String = "media_id",
                    payloadCol: String = "payload",
                    maxHamming: Int = 3): DataFrame =
    Dedup.bandedHammingPairs(
      imageHashes(media, idCol, payloadCol)
        .select(col(idCol).as("doc_id"), col("ahash").as("sh")),
      maxHamming)
      .select(col("doc_a").as("id_a"), col("doc_b").as("id_b"),
        col("hamming"))

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

  /** REAL video frame sampling for MJPEG-AVI payloads
    * ([[splitAviFrames]] container walk + ImageIO JPEG decode — no
    * codec, no native library): one row per stride-sampled DECODED
    * frame — (media_id, frame_idx, width, height, mean_luma_micros),
    * mean luma from the Rec.601 8-bin histogram's bin centers in
    * micros of full scale. Payloads that are not RIFF AVIs, and frames
    * a codec this JVM lacks produced, emit NO rows — the honest
    * contract ([[sampleFrames]] keeps the byte-chunk stand-in for
    * arbitrary payloads; a pipeline unions the two by kind).
    *
    * Scale shape: partition-local mapPartitions (decode where the
    * bytes already sit, zero shuffle); `stride` cuts decode cost
    * linearly, the standard frame-sampling move for video corpora. */
  def videoFrames(media: DataFrame, stride: Int = 1): DataFrame = {
    require(stride >= 1, "stride must be >= 1")
    val spark = media.sparkSession
    import spark.implicits._
    media.filter(col("kind") === "video")
      .select("media_id", "payload")
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, payload) =>
        splitAviFrames(payload).iterator.flatMap { case (_, frames) =>
          frames.iterator.zipWithIndex
            .filter(_._2 % stride == 0)
            .flatMap { case (f, i) =>
              decodeImage(f).map { case (w, h, hist) =>
                val luma = hist.zipWithIndex
                  .map { case (p, bi) => p.toDouble * (bi + 0.5) / 8.0 }
                  .sum
                (id, i.toLong, w, h, math.round(luma * 1e6))
              }
            }
        }
      })
      .toDF("media_id", "frame_idx", "width", "height",
        "mean_luma_micros")
  }
}
