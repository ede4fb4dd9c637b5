package graft.tools

import org.apache.spark.sql.functions._
import graft.GraftSession
import graft.ops.{Dedup, TextAnalysis}

/** Scale-stress GATE: synthesizes a 40×-replicated corpus (200k docs at
  * sf0.1) with controlled near-dup structure — each copy perturbs ~30% of
  * tokens — times the dedup family on it, and FAILS (exit 1) when any
  * shape exceeds its time budget. Budgets are ~2.5× the measured local[32]
  * times, so load noise passes but a q29-class selectivity regression
  * (candidate-generation suddenly quadratic) trips the gate before it
  * reaches the bench. Run alongside `sbt test` (tools/ci.sh).
  *
  *   sbt "runMain graft.tools.Stress /root/testdata/sf0.1 40"
  *
  * `--plant` demonstrates the gate catching a regression: it runs the
  * near-dup shape with round 1's actual q29 regression — UNIGRAM simhash
  * features at wide radius (unselective signatures: ~8% of ALL pairs land
  * under the hamming cut, so the exact-verify join sees ~N²/12 pairs;
  * measured 12.8 s on 5k docs where the shipped shape takes ~0.5 s) at
  * 1/40 scale under the proportionally tightened budget — expected
  * outcome is BUDGET_OVER and exit 1.
  */
object Stress {
  def main(args: Array[String]): Unit = {
    val positional = args.filterNot(_.startsWith("--"))
    val dir = positional.headOption.getOrElse("/root/testdata/sf0.1")
    val plant = args.contains("--plant")
    val copies0 = positional.lift(1).map(_.toInt).getOrElse(40)
    val copies = if (plant) math.max(1, copies0 / 40) else copies0
    val spark = GraftSession(appName = "graft-stress")

    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val big = docs
      .crossJoin(spark.range(0, copies).withColumnRenamed("id", "copy"))
      .select((col("doc_id") * copies + col("copy")).as("doc_id"),
        concat_ws(" ", transform(split(col("text"), " "),
          (t, i) => when(pmod(i + col("copy"), lit(10)) < 3,
            concat(t, lit("_"), col("copy"))).otherwise(t))).as("text"))
      .repartition(32)
      .cache()
    println(s"DOCS=${big.count()} (distinct=${big.select("doc_id").distinct().count()})")

    var failed = List.empty[String]
    def gated(name: String, budgetSec: Double)(body: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = body
      val t = (System.nanoTime() - t0) / 1e9
      val verdict = if (t <= budgetSec) "OK" else { failed ::= name; "BUDGET_OVER" }
      println(f"$name=$n t=$t%.1fs budget=${budgetSec}%.0fs $verdict")
    }

    if (plant) {
      // PLANTED REGRESSION DEMO (1/40 scale, proportionally tight
      // budget): unigram signature features at wide radius — round 1's
      // real q29 selectivity regression, the class this gate exists for.
      gated("SIMHASH_NEARDUPS_VERIFIED_PLANTED", budgetSec = 3) {
        Dedup.simHashNearDups(big, "doc_id", "text", maxHamming = 12,
          shingleSize = 2, threshold = 0.8, featureShingle = 1).count()
      }
    } else {
      // Budgets: measured local[32] 2026-08 (9.1 / 15.9 / 2.2 / 3.9 /
      // 1.5 / 153 s) × ~2.5 headroom.
      gated("MINHASH_PAIRS", budgetSec = 20) {
        Dedup.minHashCandidates(big, "doc_id", "text", 16, 4, 3).count()
      }
      // the q25 shape: LSH candidates then exact verification of only the
      // candidates — the scale replacement for the standalone sweep
      gated("MINHASH_NEARDUPS_VERIFIED", budgetSec = 35) {
        Dedup.minHashNearDups(big, "doc_id", "text",
          k = 16, bands = 8, shingleSize = 3,
          minEstJaccard = 0.5, threshold = 0.8).count()
      }
      gated("SIMHASH_PAIRS", budgetSec = 8) {
        Dedup.simHashPairs(big, "doc_id", "text", 3).count()
      }
      // simhash end-to-end in its scale regime: tight radius (16-bit
      // chunks), shingle features, exact-verified — the 100 TB shape.
      // Wide radii (4-bit chunk keys) are exactly what `--plant` shows
      // the budget catching.
      gated("SIMHASH_NEARDUPS_VERIFIED", budgetSec = 12) {
        Dedup.simHashNearDups(big, "doc_id", "text", maxHamming = 3,
          shingleSize = 2, threshold = 0.8, featureShingle = 2).count()
      }
      gated("EXACT_GROUPS>1", budgetSec = 6) {
        Dedup.exactGroups(big, "doc_id",
          TextAnalysis.contentFingerprint(col("text")))
          .filter(col("group_size") > 1).count()
      }
      // exact-Jaccard with the hot-shingle guard (the inverted-index skew
      // bomb protection): shingles in >1% of docs are dropped pre-join.
      // Slow by design (it IS the baseline sweep) — budget catches it
      // going quadratic past the guard.
      gated("JACCARD_PAIRS_GUARDED", budgetSec = 320) {
        Dedup.jaccardPairs(big, "doc_id", "text", 3, 0.8,
          maxShingleFreq = Some((big.count() / 100).toInt max 100)).count()
      }
    }
    spark.stop()
    if (failed.nonEmpty) {
      println(s"STRESS_GATE_FAILED: ${failed.reverse.mkString(", ")}")
      sys.exit(1)
    } else println("STRESS_GATE_OK")
  }
}
