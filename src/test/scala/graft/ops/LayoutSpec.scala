package graft.ops

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Z-order layout: interleave correctness against a reference Morton
  * implementation, write round-trip, and the file-pruning property the
  * layout exists for. */
class LayoutSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def mortonRef(x: Long, y: Long, bits: Int): Long =
    (0 until bits).foldLeft(0L) { (acc, i) =>
      acc | (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))
    }

  test("interleaveBits matches a reference Morton curve over the full 2x8-bit grid") {
    val grid = for (x <- 0L until 256L by 17L; y <- 0L until 256L by 13L)
      yield (x, y)
    val got = grid.toDF("x", "y")
      .select($"x", $"y",
        Layout.interleaveBits(Seq($"x", $"y"), 8).as("z"))
      .as[(Long, Long, Long)].collect()
    got.foreach { case (x, y, z) =>
      assert(z == mortonRef(x, y, 8), s"($x, $y)")
    }
  }

  test("zorderWrite round-trips rows and prunes files on the NON-leading column") {
    val li = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet")
      .select("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey")
    val root = Files.createTempDirectory("layout").toString
    val zDir = s"$root/zorder"
    val linDir = s"$root/linear"
    Layout.zorderWrite(li, Seq("l_partkey", "l_suppkey"), zDir, files = 16)
    // the baseline every warehouse has: linear sort on the leading column
    li.repartitionByRange(16, $"l_partkey").sortWithinPartitions("l_partkey")
      .write.mode("overwrite").parquet(linDir)

    // layout must not lose or change rows
    val a = spark.read.parquet(zDir).collect().map(_.toString).sorted
    val b = li.collect().map(_.toString).sorted
    assert(a.sameElements(b))

    // a narrow predicate on the SECOND z column: a stats-pruning reader
    // opens only files whose [min,max] overlaps — z-order keeps that a
    // small fraction, the linear layout smears l_suppkey over every file
    val (lo, hi) = (10.0, 12.0)
    val zFrac = Layout.fileOverlapFraction(zDir, "l_suppkey", lo, hi)
    val linFrac = Layout.fileOverlapFraction(linDir, "l_suppkey", lo, hi)
    assert(linFrac > 0.9, s"baseline unexpectedly prunes: $linFrac")
    assert(zFrac <= 0.5 && zFrac < linFrac,
      s"z-order overlap $zFrac vs linear $linFrac")
  }
}
