package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** The round-12 routed-mining contracts: margin mining and hard-negative
  * mining rebuilt on the IVF cell routing (the q35→q127 move applied to
  * the two mining faces the r11 verdict flagged as scale-weak).
  *
  * The load-bearing property is EXHAUSTIVE EQUIVALENCE (the q35 recall
  * contract): at nProbe = nCentroids routing probes every cell, the
  * candidate relation becomes the full brute pair set, and — because the
  * arithmetic downstream of the pair stage is byte-shared — the routed
  * output must EQUAL the brute output exactly. At nProbe < nCentroids the
  * routed candidate mass must be strictly smaller on a clustered corpus
  * (the whole point of routing).
  */
class RoutedMiningSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** 4 well-separated clusters of 10 vectors each (ids interleave
    * parities within every cluster so both margin sides populate). */
  private lazy val clustered = {
    val centers = Seq(
      Array(10.0, 0.0, 0.0, 0.0), Array(0.0, 10.0, 0.0, 0.0),
      Array(0.0, 0.0, 10.0, 0.0), Array(0.0, 0.0, 0.0, 10.0))
    val rows = for {
      c <- 0 until 4
      i <- 0 until 10
    } yield {
      val jitter = Array.tabulate(4)(d => ((c * 7 + i * 13 + d * 3) % 10) / 20.0)
      (c * 10L + i, centers(c).zip(jitter).map { case (a, b) => a + b })
    }
    rows.toDF("vec_id", "embedding")
  }

  test("marginMiningRouted at nProbe = nCentroids == brute marginMining " +
    "exactly (exhaustive equivalence)") {
    val brute = Similarity.marginMining(clustered, "vec_id", "embedding",
        k = 3, marginThresholdMicros = 0L)
      .as[(Long, Long, Long, Long)].collect().toSet
    val routed = Similarity.marginMiningRouted(clustered, "vec_id",
        "embedding", k = 3, marginThresholdMicros = 0L,
        nCentroids = 4, nProbe = 4)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(brute.nonEmpty)
    assert(routed == brute,
      s"routed-brute=${routed -- brute} brute-routed=${brute -- routed}")
  }

  test("marginRoutedPairs at nProbe = 1 is a strict subset of the " +
    "cross-parity pair set on a clustered corpus, and every pair it " +
    "keeps carries the brute pair's exact cosine micros") {
    val base = clustered.select(col("vec_id").as("id"),
      col("embedding").cast("array<double>").as("v"))
    val routed = Similarity.marginRoutedPairs(base, nCentroids = 4,
        nProbe = 1)
      .as[(Long, Long, Long)].collect().toSet
    val nEven = 20L
    val nOdd = 20L
    assert(routed.nonEmpty)
    assert(routed.size < nEven * nOdd,
      s"routing did not cut the pair mass: ${routed.size}")
    // spot-verify cosine agreement on the routed pairs vs brute compute
    val brutePairs = {
      val src = base.filter(col("id") % 2 === 0)
        .select(col("id").as("src_id"), col("v").as("sv"))
      val dst = base.filter(col("id") % 2 === 1)
        .select(col("id").as("dst_id"), col("v").as("dv"))
      src.join(dst)
        .select(col("src_id"), col("dst_id"),
          round((round(Similarity.cosine(col("sv"), col("dv")), 4) +
            lit(0.0)) * 1000000).cast("long").as("cm"))
        .as[(Long, Long, Long)].collect()
        .map(r => (r._1, r._2) -> r._3).toMap
    }
    routed.foreach { case (s, d, cm) =>
      assert(brutePairs((s, d)) == cm, s"pair ($s,$d)")
    }
  }

  test("marginMining nnAvg divides by the ACTUAL neighbor count: a " +
    "single-pair corpus at k = 4 yields margin exactly 1e6 (ratio 1), " +
    "not the pad-with-zero-inflated value") {
    val emb = Seq((0L, Array(1.0, 0.0)), (1L, Array(0.8, 0.6)))
      .toDF("vec_id", "embedding")
    // cm = 8e5; each side's only neighbor IS the pair: a_src = a_dst =
    // 8e5, margin = (2e6·8e5) div 1.6e6 = 1e6. The old divide-by-k
    // semantics gave a = 2e5 and margin 4e6 — biased upward 4×.
    val got = Similarity.marginMining(emb, "vec_id", "embedding", k = 4)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got == Set((0L, 1L, 800000L, 1000000L)), got)
  }

  test("hardNegativesRouted at nProbe = nCentroids == brute " +
    "hardNegatives exactly (exhaustive equivalence)") {
    val labels = clustered.select(col("vec_id").as("doc_id"),
      concat(lit("L"), (col("vec_id") % 3).cast("string")).as("lang"))
    val brute = Similarity.hardNegatives(clustered, labels, "vec_id",
        "embedding", stride = 4L, k = 3)
      .select("query_id", "cand_id", "cos")
      .as[(Long, Long, Double)].collect().toSet
    val routed = Similarity.hardNegativesRouted(clustered, labels,
        "vec_id", "embedding", stride = 4L, k = 3,
        nCentroids = 4, nProbe = 4)
      .select("query_id", "cand_id", "cos")
      .as[(Long, Long, Double)].collect().toSet
    assert(brute.nonEmpty)
    assert(routed == brute,
      s"routed-brute=${routed -- brute} brute-routed=${brute -- routed}")
  }

  test("hardNegativesRouted: routing cuts candidate mass at nProbe = 1 " +
    "on a clustered corpus, the label filter still precedes ranking " +
    "(no same-label candidate ever appears), and anchors stay strided") {
    val labels = clustered.select(col("vec_id").as("doc_id"),
      concat(lit("L"), (col("vec_id") % 3).cast("string")).as("lang"))
    val mass = Similarity.hardNegRoutedScored(clustered, labels,
      "vec_id", "embedding", stride = 4L, nCentroids = 4, nProbe = 1)
      .count()
    val bruteMass = 10L * (40L * 2L / 3L) // ~anchors × mismatched others
    assert(mass > 0 && mass < bruteMass, s"mass=$mass")
    val got = Similarity.hardNegativesRouted(clustered, labels, "vec_id",
        "embedding", stride = 4L, k = 3, nCentroids = 4, nProbe = 2)
      .join(labels.select(col("doc_id").as("query_id"),
        col("lang").as("ql")), Seq("query_id"))
      .join(labels.select(col("doc_id").as("cand_id"),
        col("lang").as("cl")), Seq("cand_id"))
    assert(got.filter(col("ql") === col("cl")).count() == 0)
    assert(got.filter(col("query_id") % 4 =!= 0).count() == 0)
  }

  /** The q149 split on the clustered corpus: queries = ids % 4 == 0,
    * labeled = the rest with a 3-way label. */
  private lazy val knnLabeled = clustered.filter(col("vec_id") % 4 =!= 0)
    .select(col("vec_id").as("id"), col("embedding").as("vec"),
      (col("vec_id") % 3).as("label"))
  private lazy val knnQueries = clustered.filter(col("vec_id") % 4 === 0)
    .select(col("vec_id").as("id"), col("embedding").as("vec"))

  test("knnClassifyRouted at nProbe = nCentroids == brute knnClassify " +
    "exactly (exhaustive equivalence — the vote tail is byte-shared)") {
    val brute = Similarity.knnClassify(knnLabeled, knnQueries, k = 3)
      .as[(Long, Long, Long)].collect().toSet
    val routed = Similarity.knnClassifyRouted(knnLabeled, knnQueries,
        k = 3, nCentroids = 4, nProbe = 4)
      .as[(Long, Long, Long)].collect().toSet
    assert(brute.nonEmpty)
    assert(routed == brute,
      s"routed-brute=${routed -- brute} brute-routed=${brute -- routed}")
  }

  test("knnRoutedScored: routing cuts candidate mass at nProbe = 1 on a " +
    "clustered corpus, every query still gets >= k candidates (the " +
    "over-fetch scores WHOLE probed cells), and predictions exist for " +
    "every query") {
    val mass = Similarity.knnRoutedScored(knnLabeled, knnQueries,
      nCentroids = 4, nProbe = 1)
    val nQ = knnQueries.count()
    val nL = knnLabeled.count()
    assert(mass.count() > 0 && mass.count() < nQ * nL,
      s"mass=${mass.count()} vs brute=${nQ * nL}")
    // every probed cell holds at least its own centroid (a labeled
    // row), so no query ever loses ALL candidates — every query is
    // classified even at nProbe = 1
    val perQuery = mass.groupBy(col("query_id")).count()
    assert(perQuery.count() == nQ, "a query lost all its candidates")
    val preds = Similarity.knnClassifyRouted(knnLabeled, knnQueries,
      k = 3, nCentroids = 4, nProbe = 1)
    assert(preds.count() == nQ)
  }

  test("mutualTopOneRouted at nProbe = nCentroids == brute mutualTopOne " +
    "exactly (exhaustive equivalence — the mutual tail is byte-shared)") {
    val brute = Similarity.mutualTopOne(clustered, "vec_id", "embedding",
        stride = 1)
      .as[(Long, Long, Double)].collect().toSet
    val routed = Similarity.mutualTopOneRouted(clustered, "vec_id",
        "embedding", stride = 1, nCentroids = 4, nProbe = 4)
      .as[(Long, Long, Double)].collect().toSet
    assert(brute.nonEmpty)
    assert(routed == brute,
      s"routed-brute=${routed -- brute} brute-routed=${brute -- routed}")
  }

  test("mutualRoutedScored: routing cuts the pair mass at nProbe = 1 on " +
    "a clustered corpus, kept pairs carry the brute pair's exact " +
    "round-4 cosine, and on the well-separated corpus the routed " +
    "mutual pairs EQUAL the brute pairs (both directions stay in-cell)") {
    val n = 40L
    val scored = Similarity.mutualRoutedScored(clustered, "vec_id",
      "embedding", stride = 1, nCentroids = 4, nProbe = 1)
    val mass = scored.count()
    assert(mass > 0 && mass < n * (n - 1), s"mass=$mass")
    // kept pairs score identically to the brute pair stage
    val base = clustered.select(col("vec_id").as("cand_id"),
      col("embedding").cast("array<double>").as("v"))
    val bruteScored = base
      .join(base.select(col("cand_id").as("query_id"), col("v").as("qv")),
        col("cand_id") =!= col("query_id"))
      .select(col("query_id"), col("cand_id"),
        (round(Similarity.cosine(col("qv"), col("v")), 4) + lit(0.0))
          .as("cos"))
      .as[(Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    scored.as[(Long, Long, Double)].collect().foreach {
      case (q, c, cos) => assert(bruteScored((q, c)) == cos, s"($q,$c)")
    }
    // on 4 well-separated clusters with nCentroids = 4, every true
    // best match is same-cell, so even nProbe = 1 loses nothing
    val brute = Similarity.mutualTopOne(clustered, "vec_id", "embedding",
        stride = 1)
      .as[(Long, Long, Double)].collect().toSet
    val routed = Similarity.mutualTopOneRouted(clustered, "vec_id",
        "embedding", stride = 1, nCentroids = 4, nProbe = 1)
      .as[(Long, Long, Double)].collect().toSet
    assert(routed == brute,
      s"routed-brute=${routed -- brute} brute-routed=${brute -- routed}")
  }

  test("mutualPairPurity on the routed pairs: a cluster-aligned label " +
    "is perfectly pure (purity = 1e6, lift = 1e6 - chance) and the " +
    "plan carries no corpus-proportional broadcast of the label side") {
    val labeled = clustered.withColumn("label",
      floor(col("vec_id") / 10).cast("long"))
    val got = Similarity.mutualPairPurity(labeled, "vec_id", "embedding",
        "label", stride = 1, nCentroids = 4, nProbe = 2)
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(got.length == 1)
    val (nPairs, nAgree, purity, chance, lift) = got.head
    assert(nPairs > 0 && nAgree == nPairs)
    assert(purity == 1000000L)
    // 4 equal clusters of 10 over 40: chance = 4·100·1e6 div 1600
    assert(chance == 250000L, s"chance=$chance")
    assert(lift == purity - chance)
  }
}
