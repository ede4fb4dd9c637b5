package graft.tools

import org.apache.spark.sql.functions._
import graft.GraftSession
import graft.ops.{Dedup, TextAnalysis}

/** Scale-stress main: synthesizes a 40×-replicated corpus (200k docs at
  * sf0.1) with controlled near-dup structure — each copy perturbs ~30% of
  * tokens — and times the dedup family on it. Evidence for PLANS.md.
  *
  *   sbt "runMain graft.tools.Stress /root/testdata/sf0.1 40"
  */
object Stress {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val copies = args.lift(1).map(_.toInt).getOrElse(40)
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

    def timed(name: String)(body: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = body
      println(f"$name=$n t=${(System.nanoTime() - t0) / 1e9}%.1fs")
    }

    timed("MINHASH_PAIRS") {
      Dedup.minHashCandidates(big, "doc_id", "text", 16, 4, 3).count()
    }
    // the q25 shape: LSH candidates then exact verification of only those
    // pairs — the scale replacement for the standalone inverted-index sweep
    timed("MINHASH_NEARDUPS_VERIFIED") {
      Dedup.minHashNearDups(big, "doc_id", "text",
        k = 16, bands = 8, shingleSize = 3,
        minEstJaccard = 0.5, threshold = 0.8).count()
    }
    timed("SIMHASH_PAIRS") {
      Dedup.simHashPairs(big, "doc_id", "text", 3).count()
    }
    // simhash end-to-end in its scale regime: tight radius (16-bit chunks),
    // shingle features, exact-verified — the 100 TB shape. Wide radii
    // (q29's corpus-calibrated maxHamming=14) intentionally NOT stressed:
    // 4-bit chunk keys explode quadratically past ~10^4 docs (see
    // Dedup.simHashNearDups scaladoc).
    timed("SIMHASH_NEARDUPS_VERIFIED") {
      Dedup.simHashNearDups(big, "doc_id", "text", maxHamming = 3,
        shingleSize = 2, threshold = 0.8, featureShingle = 2).count()
    }
    timed("EXACT_GROUPS>1") {
      Dedup.exactGroups(big, "doc_id",
        TextAnalysis.contentFingerprint(col("text")))
        .filter(col("group_size") > 1).count()
    }
    // exact-Jaccard with the hot-shingle guard (the inverted-index skew
    // bomb protection): shingles in >1% of docs are dropped pre-join
    timed("JACCARD_PAIRS_GUARDED") {
      Dedup.jaccardPairs(big, "doc_id", "text", 3, 0.8,
        maxShingleFreq = Some((big.count() / 100).toInt max 100)).count()
    }
    spark.stop()
  }
}
