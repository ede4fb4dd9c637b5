package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Hand-verified fixtures for the round-14 growth operators: each test
  * computes the expected value by hand on a fixture small enough to
  * audit. */
class Round14OpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("causeSpecificHazards: per-day integer-micros hazards and ratio " +
    "over the q266 CIF fixture, pooled person-day rates, Sa/Sb ratio, " +
    "and the closed-form log-rank z — all hand-computed") {
    def ts(s: Long) = new java.sql.Timestamp(1704067200000L + s * 1000L)
    // the Round13OpsSpec competingRisks fixture verbatim, so the day
    // rollup (the shared relation) is pinned by BOTH faces
    val ev = Seq(
      (1L, ts(0), "signup"), (1L, ts(86400), "purchase"),
      (2L, ts(0), "error"), (2L, ts(100), "signup"),
      (2L, ts(86500), "error"),
      (3L, ts(0), "signup"), (3L, ts(172800), "purchase"),
      (3L, ts(172800), "error"),
      (4L, ts(0), "signup"), (4L, ts(259200), "view")
    ).toDF("user_id", "ts", "event_type")
    val got = Events.causeSpecificHazards(ev, "user_id", "ts",
        "event_type", startType = "signup", causeA = "purchase",
        causeB = "error")
      .as[(Option[Long], Long, Long, Long, Option[Long], Option[Long],
        Option[Long], Option[Double])].collect()
      .map(r => r._1 -> r).toMap
    // day rollup (from the q266 fixture): d=1 (n=4, ea=1, eb=1),
    // d=2 (n=2, ea=0, eb=1 — the tie goes to error), d=3 (n=1, 0, 0)
    assert(got(Some(1L)) == ((Some(1L), 4L, 1L, 1L, Some(250000L),
      Some(250000L), Some(1000000L), None)), got(Some(1L)))
    assert(got(Some(2L)) == ((Some(2L), 2L, 0L, 1L, Some(0L),
      Some(500000L), Some(0L), None)), got(Some(2L)))
    assert(got(Some(3L)) == ((Some(3L), 1L, 0L, 0L, Some(0L),
      Some(0L), None, None)), got(Some(3L)))
    // pooled TOTAL row: person-days 4+2+1 = 7, Sa = 1, Sb = 2;
    // rates (1e6·1) div 7 = 142857 / (1e6·2) div 7 = 285714;
    // ratio (1e6·1) div 2 = 500000; z = (1−2)/√3 = −0.5774
    val total = got(None)
    assert(total == ((None, 7L, 1L, 2L, Some(142857L), Some(285714L),
      Some(500000L), Some(-0.5774))), total)
  }

  test("horvitzThompson: at rate 1 the estimate IS the truth (err 0, " +
    "everything sampled); at 1/10 the estimate is exactly 10x the " +
    "sampled cents and the error is the signed micros floor") {
    val df = (1L to 200L).map(i => (s"g${i % 2}", i, (i % 7) + 0.25))
      .toDF("grp", "k", "value")
    val full = Sampling.horvitzThompson(df, "grp", "k", "value",
        num = 1, den = 1)
      .as[(String, Long, Long, Long, Long, Option[Long])].collect()
    assert(full.length == 2)
    full.foreach { case (_, nRows, nSamp, truth, ht, err) =>
      assert(nRows == 100L && nSamp == nRows && ht == truth &&
        err.contains(0L))
    }
    val ten = Sampling.horvitzThompson(df, "grp", "k", "value",
        num = 1, den = 10)
      .as[(String, Long, Long, Long, Long, Option[Long])].collect()
    // replay the keep test + expected card per group in plain scala
    val cents = (1L to 200L).map(i =>
      (s"g${i % 2}", i, math.round(((i % 7) + 0.25) * 100)))
    def kept(k: Long): Boolean = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(k.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 8)
      java.lang.Long.parseLong(hex, 16) * 10L < 4294967296L
    }
    val expect = cents.groupBy(_._1).map { case (g, rows) =>
      val truth = rows.map(_._3).sum
      val s = rows.filter(r => kept(r._2)).map(_._3).sum
      val ht = 10L * s
      val err = math.signum(ht - truth) *
        (1000000L * math.abs(ht - truth)) / math.abs(truth)
      g -> ((100L, rows.count(r => kept(r._2)).toLong, truth, ht, err))
    }
    ten.foreach { case (g, nRows, nSamp, truth, ht, err) =>
      assert((nRows, nSamp, truth, ht, err.get) ==
        ((expect(g)._1, expect(g)._2, expect(g)._3, expect(g)._4,
          expect(g)._5)), s"group $g")
    }
    // the 10% design actually thinned (not everything kept)
    assert(ten.map(_._3).sum < 200L)
  }

  test("fellegiSunterWeights: m from the truth pairs, u exactly from " +
    "the value marginals, log2 weights with degenerate guards, and " +
    "null field values leave that field's relation — hand-computed") {
    def log2r4(x: Double): Double =
      BigDecimal(math.log(x) / math.log(2.0))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val recs = Seq(
      (1L, "A", "Z", Option("p")), (2L, "A", "Z", None),
      (3L, "B", "Z", Option("p")), (4L, "C", "Z", Option("q")),
      (5L, "A", "Z", Option("p")), (6L, "B", "Z", Option("q"))
    ).toDF("id", "city", "konst", "opt")
    val truth = Seq((1L, 2L), (3L, 4L)).toDF("id_a", "id_b")
    val got = Dedup.fellegiSunterWeights(recs, "id",
        Seq("city" -> col("city"), "konst" -> col("konst"),
          "opt" -> col("opt")), truth)
      .as[(String, Long, Long, Option[Long], Option[Long],
        Option[Double], Option[Double])].collect()
      .map(r => r._1 -> r).toMap
    // city: marginals A:3 B:2 C:1 -> u = (1e6·(6+2)) div 30 = 266666;
    // truth: (1,2) agree, (3,4) disagree -> m = 500000
    assert(got("city") == (("city", 6L, 2L, Some(500000L),
      Some(266666L), Some(log2r4(500000.0 / 266666.0)),
      Some(log2r4(500000.0 / 733334.0)))), got("city"))
    // konst: constant field -> u = 1e6, m = 1e6: w_agree = log2(1) = 0
    // exactly, w_disagree degenerate -> NULL (never -Inf)
    assert(got("konst") == (("konst", 6L, 2L, Some(1000000L),
      Some(1000000L), Some(0.0), None)), got("konst"))
    // opt: id 2 is NULL -> pair (1,2) leaves the relation; n_recs = 5
    // (p:3, q:2 -> u = (6+2)·1e6 div 20 = 400000); (3,4) disagrees
    // -> m = 0 -> w_agree NULL (never -Inf)
    assert(got("opt") == (("opt", 5L, 1L, Some(0L), Some(400000L),
      None, Some(log2r4(1000000.0 / 600000.0)))), got("opt"))
  }

  test("bpeFertility: the dominant pair merges once, fully-merged " +
    "words cost 1 token and unmerged words 2 — per-language fertility " +
    "and chars-per-token exactly the hand floors, and the per-group " +
    "rollup agrees with bpeEncode's per-doc relation") {
    val docs = Seq(
      (1L, "a", "xy xy xy xy"), // (x, y</w>) dominates: freq 4
      (2L, "b", "pq rs")        // 1 each — stay 2 symbols after merge 1
    ).toDF("doc_id", "lang", "text")
    val got = TextAnalysis.bpeFertility(docs, "text", "lang",
        merges = 1)
      .as[(String, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    // lang a: 4 words, 8 chars, 4 tokens -> fertility 1e6, cpt 2e6
    assert(got("a") == (("a", 4L, 8L, 4L, 1000000L, 2000000L)), got("a"))
    // lang b: 2 words, 4 chars, 4 tokens -> fertility 2e6, cpt 1e6
    assert(got("b") == (("b", 2L, 4L, 4L, 2000000L, 1000000L)), got("b"))
    // consistency with the q185 per-doc relation under the SAME vocab
    val perDoc = TextAnalysis.bpeEncode(docs, "doc_id", "text",
        merges = 1)
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(perDoc(1L)._2 == 4L && perDoc(1L)._4 == 4L) // words, tokens
    assert(perDoc(2L)._2 == 2L && perDoc(2L)._4 == 4L)
  }

  test("sourceJsdMatrix: identical sources score EXACTLY 0, a " +
    "different pair matches the nano-summed replay, and every value " +
    "sits in the [0, 1e6] log2 bound") {
    val docs = Seq(("A", "x x y"), ("B", "x z"), ("C", "x x y"))
      .toDF("source", "text")
    val got = TextAnalysis.sourceJsdMatrix(docs, "text", "source",
        minCount = 1L)
      .as[(String, String, Long, Long)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    assert(got.size == 3)
    // C is a verbatim copy of A: p = q for every term -> 0 exactly
    assert(got(("A", "C")) == ((3L, 0L)), got(("A", "C")))
    // replay the A-B pair with the same per-term nano rounding:
    // vocab {x,y,z}; pA = (2+1)/6, (1+1)/6, (0+1)/6; pB = (1+1)/5,
    // (0+1)/5, (1+1)/5
    def c(p: Double, q: Double): Long =
      math.round((p * (math.log(2 * p / (p + q)) / math.log(2.0)) +
        q * (math.log(2 * q / (p + q)) / math.log(2.0))) / 2.0 * 1e9)
    val jn = c(3.0 / 6, 2.0 / 5) + c(2.0 / 6, 1.0 / 5) +
      c(1.0 / 6, 2.0 / 5)
    assert(got(("A", "B")) == ((3L, jn / 1000L)), got(("A", "B")))
    assert(got(("B", "C")) == got(("A", "B")).copy(), got(("B", "C")))
    got.values.foreach { case (_, j) => assert(j >= 0L && j <= 1000000L) }
  }

  test("ivfCellBalance: an obvious two-direction corpus lands 6/4, " +
    "imbalance and expected-probe mass exactly the hand floors") {
    // centroids = min-id rows 0 (direction A) and 1 (direction B);
    // cosine is scale-invariant, so membership is unambiguous
    val a = Array(1.0, 0.0); val b = Array(0.0, 1.0)
    val emb = Seq(0L -> a, 1L -> b, 2L -> a.map(_ * 2), 3L -> b,
      4L -> a, 5L -> b.map(_ * 3), 6L -> a, 7L -> b, 8L -> a, 9L -> a)
      .map { case (id, v) => (id, v) }.toDF("vec_id", "embedding")
    val got = Similarity.ivfCellBalance(emb, "vec_id", "embedding",
        nCentroids = 2)
      .as[(Long, Long, Long, Long, Long, Long)].collect().head
    // cells A:6 B:4 -> imbalance (1e6·2·6) div 10 = 1.2e6;
    // expected probe (1e6·(36+16)) div 100 = 520000
    assert(got == ((2L, 10L, 2L, 6L, 1200000L, 520000L)), got)
  }
}
