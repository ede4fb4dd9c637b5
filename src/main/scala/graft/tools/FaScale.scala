package graft.tools

import java.nio.file.{Files, Paths}
import java.util.zip.{ZipEntry, ZipOutputStream}
import org.apache.spark.sql.functions._
import graft.GraftSession
import graft.fa.Pipeline

/** Multi-county FA pipeline scale drive — the national-run story
  * (reference fa-etl.sbatch: 1 node / 32 tasks / 175 GB / 36 h for all
  * counties, looping per-file in Python; here all counties are one
  * distributed job per family).
  *
  * Generates `nCounties` synthetic counties × `propsPerCounty` properties
  * (deterministic, seeded), runs the full pipeline with FIPS partitioning,
  * and demonstrates county pruning on the staged output.
  *
  *   sbt "runMain graft.tools.FaScale 8 20000"
  */
object FaScale {

  private def writeZip(dir: String, name: String, header: String,
                       rows: Iterator[String]): Unit = {
    val zos = new ZipOutputStream(
      Files.newOutputStream(Paths.get(dir, s"$name.txt.zip")))
    zos.putNextEntry(new ZipEntry(s"$name.txt"))
    zos.write(header.getBytes("UTF-8")); zos.write('\n')
    rows.foreach { r => zos.write(r.getBytes("UTF-8")); zos.write('\n') }
    zos.closeEntry(); zos.close()
  }

  def generate(base: String, nCounties: Int, propsPerCounty: Int): Unit = {
    val raw = s"$base/raw"
    Files.createDirectories(Paths.get(raw))
    for (c <- 0 until nCounties) {
      val fips = f"${10001 + c * 2}%05d"
      val rng = new scala.util.Random(1000 + c)
      def pid(i: Int): Long = c.toLong * 10000000L + i
      writeZip(raw, s"Deed$fips",
        "PropertyID|SaleAmt|RecordingDate|FIPS|FATimeStamp|FATransactionID|TransactionType|SaleDate",
        Iterator.range(0, propsPerCounty).flatMap { i =>
          (0 until 1 + rng.nextInt(3)).map { s =>
            val yr = 2015 + rng.nextInt(8)
            val d = f"$yr${1 + rng.nextInt(12)}%02d${1 + rng.nextInt(28)}%02d"
            val tt = 1 + rng.nextInt(6)
            val fa = "1369".charAt(rng.nextInt(4))
            s"${pid(i)}|${50000 + rng.nextInt(900000)}|$d|$fips|20230101|${fa}X$s|$tt|$d"
          }
        })
      writeZip(raw, s"Prop$fips",
        "PropertyID|PropertyClassID|FATimeStamp|SitusLatitude|SitusLongitude|SitusFullStreetAddress|SitusCity|SitusState|SitusZIP5|FIPS|SitusCensusTract|SitusCensusBlock|SitusGeoStatusCode",
        Iterator.range(0, propsPerCounty).map { i =>
          val cls = if (rng.nextInt(10) == 0) "C" else "R"
          s"${pid(i)}|$cls|20230101|${30 + rng.nextDouble()}|${-90 - rng.nextDouble()}|${i} Main St|Town$c|ST|${rng.nextInt(99999)}|$fips|${rng.nextInt(999999)}|${rng.nextInt(9999)}|A"
        })
      writeZip(raw, s"TaxHist$fips",
        "PropertyID|TaxYear|TaxAmt",
        Iterator.range(0, propsPerCounty).flatMap { i =>
          (2015 to 2022).map(y => s"${pid(i)}|$y|${100000 + rng.nextInt(900000)}")
        })
      writeZip(raw, s"ValHist$fips",
        "PropertyID|AssdTotalValue|AssdYear|MarketTotalValue|MarketValueYear|ApprTotalValue|ApprYear|TaxableYear",
        Iterator.range(0, propsPerCounty).flatMap { i =>
          (2015 to 2022).map { y =>
            val assd = if (rng.nextInt(20) == 0) "" else (200000 + rng.nextInt(800000)).toString
            s"${pid(i)}|$assd|$y|${250000 + rng.nextInt(800000)}|$y|||$y"
          }
        })
    }
  }

  def main(args: Array[String]): Unit = {
    val nCounties = args.lift(0).map(_.toInt).getOrElse(8)
    val propsPerCounty = args.lift(1).map(_.toInt).getOrElse(20000)
    val base = Files.createTempDirectory("fa_scale").toString
    println(s"GENERATING $nCounties counties x $propsPerCounty props -> $base")
    generate(base, nCounties, propsPerCounty)

    val spark = GraftSession(appName = "fa-scale")
    val t0 = System.nanoTime()
    val merged = new Pipeline(spark, base, partitionByFips = true).run()
    val rows = merged.count()
    println(f"MERGED_ROWS=$rows PIPELINE_T=${(System.nanoTime() - t0) / 1e9}%.1fs")

    // County pruning: a FIPS-filtered read of the hive-partitioned staging
    // must scan only that county's partition.
    val oneFips = f"${10001}%05d"
    val pruned = spark.read.parquet(s"$base/staging/Prop")
      .filter(col("FIPS") === oneFips)
    val plan = pruned.queryExecution.executedPlan.toString
    val partFilters = plan.contains(s"FIPS#") || plan.contains("PartitionFilters")
    println(s"PRUNED_COUNT=${pruned.count()} PARTITION_FILTERED=$partFilters")
    println(plan.linesIterator.filter(_.contains("PartitionFilters"))
      .take(2).mkString("\n"))
    spark.stop()
  }
}
