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

  test("compactParquet: right-sizes file count, preserves rows, and the " +
    "sorted variant rebuilds disjoint per-file stat ranges") {
    val root = Files.createTempDirectory("compact").toString
    val small = s"$root/small"
    val li = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet")
      .select("l_orderkey", "l_linenumber", "l_quantity")
    // simulate a streaming writer's droppings: 32 shuffled small files
    li.repartition(32).write.parquet(small)
    assert(parquetFiles(small).length == 32)
    val n = li.count()
    val compacted = Layout.compactParquet(spark, small, s"$root/plain",
      rowsPerFile = (n + 3) / 4)
    assert(parquetFiles(s"$root/plain").length == 4)
    assert(compacted.count() == n)
    val sorted = Layout.compactParquet(spark, small, s"$root/sorted",
      rowsPerFile = (n + 3) / 4, sortCol = Some("l_orderkey"))
    assert(sorted.count() == n)
    // sorted compaction restores pruning: a narrow key range must overlap
    // ~1 of 4 files, while the plain rewrite overlaps all of them
    val lo = 10.0; val hi = 20.0
    val fSorted = Layout.fileOverlapFraction(s"$root/sorted", "l_orderkey", lo, hi)
    val fPlain = Layout.fileOverlapFraction(s"$root/plain", "l_orderkey", lo, hi)
    assert(fSorted <= 0.25 + 1e-9, s"sorted overlap $fSorted")
    assert(fPlain == 1.0, s"plain overlap $fPlain")
  }

  private def parquetFiles(dir: String): Array[String] =
    new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getPath)

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
