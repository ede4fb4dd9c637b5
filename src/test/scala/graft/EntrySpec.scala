package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract smoke: entry() returns rows; every declared query runs
  * at sf0.001; oracle map keys ⊆ query keys. (Value-level correctness is
  * the DuckDB oracle's job — tools/check.py / the driver's CORRECTNESS
  * gate.) */
class EntrySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a matching query") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  /** Queries whose oracle comparison would be vacuous if both sides were
    * empty — assert they return rows at sf0.001 so a silently-empty result
    * can't masquerade as a pass. */
  private val mustBeNonEmpty = Set("q20_dedup_exact", "q25_jaccard_pairs",
    "q26_ann_bruteforce", "q28_minhash_lsh", "q29_simhash_hybrid",
    "q30_ann_lsh", "q31_embed_neardup", "q35_ann_ivf", "q45_neardup_dedup",
    "q46_editdist_pairs", "q47_ann_ivf_trained", "q48_tfidf_topk",
    "q49_stratified_sample", "q53_repetition", "q54_contamination",
    "q55_range_join", "q56_bm25",
    "q57_bloom_semijoin", "q58_interval_overlap", "q59_snapshot_diff",
    "q60_curation_funnel", "q61_token_packing", "q62_containment",
    "q63_weighted_sample", "q64_source_cap", "q65_asof_forward",
    "q66_ann_multiprobe", "q67_approx_percentile", "q68_salted_agg",
    "q69_cosine_pairs", "q70_pii_scrub", "q71_cluster_stats",
    "q72_canonical_pick", "q73_salted_join", "q74_weighted_reservoir",
    "q75_cosine_admission", "q76_drift_psi", "q77_span_dedup",
    "q78_mixture_sample", "q79_shuffle_shard", "q80_winsorize",
    "q81_vocab_topk", "q82_char_entropy", "q83_gopher_rules",
    "q84_semantic_dedup", "q85_unigram_nll")

  for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
    test(s"$name runs and returns a well-formed result at sf0.001") {
      val df = fn(spark, dir)
      assert(df.columns.nonEmpty)
      val n = df.count()
      if (mustBeNonEmpty(name)) assert(n > 0, s"$name must not be empty")
    }
  }
}
