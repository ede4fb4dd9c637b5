package graft.tools

import org.apache.spark.sql.functions._
import graft.GraftSession
import graft.ops.Dedup

/** Scratch profiler for the q29/q45 pair-stage cost model: times each
  * stage of the hybrid candidate generation separately at a given SF so
  * constant-factor regressions are attributable (candidate volume vs
  * est-jaccard HOF vs exact-verify join).
  */
object PairStageProfile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession(appName = "graft-pairprofile")
    val docs = spark.read.parquet(s"$dir/documents.parquet").cache()
    println(s"DOCS=${docs.count()}")

    def timed(name: String)(body: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = body
      println(f"$name=$n t=${(System.nanoTime() - t0) / 1e9}%.2fs")
    }

    timed("TIGHT_SIMHASH_PAIRS") {
      Dedup.simHashPairs(docs, "doc_id", "text", 3, 2).count()
    }
    timed("MINHASH_CANDS_k32b16_est0") {
      Dedup.minHashCandidates(docs, "doc_id", "text", 32, 16, 2, 0.0).count()
    }
    timed("MINHASH_CANDS_k32b16_NOEST") {
      // candidate pairs without the est_jaccard zip_with at all
      Dedup.minHashCandidates(docs, "doc_id", "text", 32, 16, 2, 0.0)
        .select("doc_a", "doc_b").count()
    }
    timed("MINHASH_VERIFIED_est0") {
      Dedup.minHashNearDups(docs, "doc_id", "text", 32, 16, 2, 0.0, 0.8).count()
    }
    timed("MINHASH_VERIFIED_est04_warm") {
      Dedup.minHashNearDups(docs, "doc_id", "text", 32, 16, 2, 0.4, 0.8).count()
    }
    timed("HYBRID_CURRENT") {
      Dedup.hybridNearDups(docs, "doc_id", "text", 2, 0.8).count()
    }
    spark.stop()
  }
}
