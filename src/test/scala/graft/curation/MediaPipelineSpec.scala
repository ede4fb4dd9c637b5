package graft.curation

import java.nio.file.{Files, Path}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.ops.Multimodal

/** End-to-end media curation: quality floor → exact (checksum) dedup →
  * perceptual (aHash) dedup on REAL decoded rasters → thumbnail
  * derivatives; staged-parquet checkpoints with idempotent resume. */
class MediaPipelineSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def png(w: Int, h: Int, vertical: Boolean): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val v = (if (vertical) y * 255 / (h - 1) else x * 255 / (w - 1))
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  private def fixture(): (String, String) = {
    val grad = png(32, 32, vertical = false)
    val img2 = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(grad))
    img2.setRGB(0, 0, 0xFFFFFF)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img2, "png", bos)
    val rows = Seq(
      (1L, "image", grad),                       // canonical image
      (2L, "image", bos.toByteArray),            // perceptual near-dup of 1
      (3L, "image", png(32, 32, vertical = true)), // distinct layout: keeps
      (4L, "image", grad),                       // exact byte copy of 1
      (5L, "audio", "a deterministic non-image payload".getBytes),
      (6L, "image", Array[Byte](1, 2, 3)),       // under the byte floor
      (7L, "audio", "a deterministic non-image payload".getBytes) // exact dup of 5
    )
    val in = Files.createTempDirectory("media_in").toString
    rows.toDF("media_id", "kind", "payload")
      .write.mode("overwrite").parquet(in)
    (in, Files.createTempDirectory("media_out").toString)
  }

  test("stages drop exactly the right rows: byte floor, checksum dups, " +
    "perceptual near-dups — and thumbs are REAL downsampled rasters") {
    val (in, out) = fixture()
    val thumbs = new MediaPipeline(spark, in, out).run()
    for (s <- Seq("quality", "exact_dedup", "neardup", "thumbs"))
      assert(Files.exists(Path.of(s"$out/staging/$s/_SUCCESS")), s)
    val ids = thumbs.select("media_id").as[Long].collect().toSet
    assert(ids == Set(1L, 3L, 5L))
    // the kept image's thumb decodes to the true halved dimensions
    val p1 = thumbs.filter(col("media_id") === 1L)
      .select("payload").as[Array[Byte]].collect().head
    val dims = Multimodal.decodeImage(p1).map(d => (d._1, d._2))
    assert(dims.contains((16, 16)))
    // intermediate stage contents pin WHERE each drop happened
    val exact = spark.read.parquet(s"$out/staging/exact_dedup")
      .select("media_id").as[Long].collect().toSet
    assert(exact == Set(1L, 2L, 3L, 5L)) // 4,7 = checksum dups; 6 = floor
  }

  test("idempotent resume: a re-run lands on byte-identical thumbs") {
    val (in, out) = fixture()
    val first = new MediaPipeline(spark, in, out).run()
      .select("media_id", "payload").as[(Long, Array[Byte])]
      .collect().sortBy(_._1)
    val second = new MediaPipeline(spark, in, out).run()
      .select("media_id", "payload").as[(Long, Array[Byte])]
      .collect().sortBy(_._1)
    assert(first.map(_._1).toSeq == second.map(_._1).toSeq)
    first.zip(second).foreach { case ((_, a), (_, b)) =>
      assert(java.util.Arrays.equals(a, b))
    }
  }
}
