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

  /** Merged-panel rows for the seeded (8 counties × 20000 props) gate
    * corpus — the generator and the deterministic-rank pipeline are both
    * pure functions of the seeds, so any drift is a cleaning/join-
    * cardinality regression. Re-pin only for an INTENTIONAL semantics
    * change. */
  private val GateRows = 50079L
  /** Pipeline wall budget (seconds, reference host): measured 18.1 s on
    * local[32]; ~2.5× headroom, scaled by [[Calib.budgetScale]]. */
  private val GateBudgetSec = 45.0

  def main(args: Array[String]): Unit = {
    val gate = args.contains("--gate")
    val positional = args.filterNot(_.startsWith("--"))
    val nCounties = positional.lift(0).map(_.toInt).getOrElse(8)
    val propsPerCounty = positional.lift(1).map(_.toInt).getOrElse(20000)
    val base = Files.createTempDirectory("fa_scale").toString
    println(s"GENERATING $nCounties counties x $propsPerCounty props -> $base")
    generate(base, nCounties, propsPerCounty)

    val spark = GraftSession(appName = "fa-scale")
    // calibrate BEFORE timing the pipeline: the warm-up it does would
    // otherwise be billed to the pipeline budget
    val budgetScale = if (gate) Calib.budgetScale(spark) else 1.0
    val t0 = System.nanoTime()
    val merged = new Pipeline(spark, base, partitionByFips = true).run()
    val rows = merged.count()
    val pipelineSec = (System.nanoTime() - t0) / 1e9
    println(f"MERGED_ROWS=$rows PIPELINE_T=$pipelineSec%.1fs")

    // County pruning: a FIPS-filtered read of the hive-partitioned staging
    // must scan only that county's partition — verified PHYSICALLY via the
    // scan's numFiles metric against the files actually in the partition
    // dir, not just by the plan mentioning a PartitionFilter.
    val oneFips = f"${10001}%05d"
    val pruned = spark.read.parquet(s"$base/staging/Prop")
      .filter(col("FIPS") === oneFips)
    val qe = pruned.queryExecution
    // one execution populates this plan instance's scan metrics
    val prunedCount = qe.executedPlan.executeCollect().length
    val scannedFiles = qe.executedPlan.collectLeaves().collectFirst {
      case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        f.metrics("numFiles").value
    }.getOrElse(-1L)
    val partitionFiles = {
      val s = Files.list(Paths.get(s"$base/staging/Prop/FIPS=$oneFips"))
      try s.filter(p => p.toString.endsWith(".parquet")).count()
      finally s.close()
    }
    println(s"PRUNED_COUNT=$prunedCount SCANNED_FILES=$scannedFiles " +
      s"PARTITION_FILES=$partitionFiles")
    println(qe.executedPlan.toString.linesIterator
      .filter(_.contains("PartitionFilters")).take(2).mkString("\n"))

    // plan hygiene on the merged panel: a lost join condition shows up as
    // a nested-loop/cartesian join long before it shows up as wall time
    val mergedPlan = merged.queryExecution.executedPlan.toString
    val joinRegression = mergedPlan.contains("CartesianProduct") ||
      mergedPlan.contains("BroadcastNestedLoopJoin")

    if (gate) {
      val budget = GateBudgetSec * budgetScale
      var failures = List.empty[String]
      def check(ok: Boolean, msg: String): Unit = if (!ok) failures ::= msg
      check(nCounties == 8 && propsPerCounty == 20000,
        s"gate corpus must be 8x20000 (got ${nCounties}x$propsPerCounty) — " +
          "GateRows is pinned to that seed")
      check(rows == GateRows, s"merged rows $rows != pinned $GateRows " +
        "(cleaning/join-cardinality drift)")
      check(pipelineSec <= budget,
        f"pipeline $pipelineSec%.1fs over budget $budget%.1fs")
      check(scannedFiles > 0 && scannedFiles == partitionFiles,
        s"partition pruning LOST: scanned $scannedFiles files, " +
          s"one county has $partitionFiles")
      check(!joinRegression, "merged plan contains a nested-loop/cartesian join")
      if (failures.nonEmpty) {
        failures.foreach(f => println(s"FASCALE_GATE_FAIL: $f"))
        spark.stop()
        sys.exit(1)
      }
      println("FASCALE_GATE=OK")
    }
    spark.stop()
  }
}
