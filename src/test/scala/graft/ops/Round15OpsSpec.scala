package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Hand-verified fixtures for the round-15 growth operators: each test
  * computes the expected value by hand on a fixture small enough to
  * audit. */
class Round15OpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(day: Long): java.sql.Timestamp =
    new java.sql.Timestamp(1704067200000L + day * 86400000L)
  // 2024-01-01 is epoch day 19723 — the fixture's day origin
  private val d0 = 1704067200L / 86400L

  test("groupSequential: hand two-look OBF ladder — crossing group " +
    "stops at look 1 and stays stopped, flat group continues, " +
    "one-armed group reports NULL z") {
    // looks=2, c=1.977 (the K=2 OBF critical value):
    // bounds = 1.977*sqrt(2) -> 2.795900 (round-6), then 1.977
    def rows(grp: String, day: Long, user: Long, nSucc: Int,
             nFail: Int): Seq[(Long, java.sql.Timestamp, String, Double)] =
      Seq.fill(nSucc)((user, ts(day), grp, 150.0)) ++
        Seq.fill(nFail)((user, ts(day), grp, 50.0))
    val ev = (
      // group g: days 0..3 -> look 1 = days 0-1, look 2 = days 2-3.
      // treated (user 1): 5/5 then 4/5 per look-half -> 9/10 per look;
      // control (user 2): 1/5 then 0/5 -> 1/10 per look.
      rows("g", 0, 1, 5, 0) ++ rows("g", 1, 1, 4, 1) ++
      rows("g", 0, 2, 1, 4) ++ rows("g", 1, 2, 0, 5) ++
      rows("g", 2, 1, 5, 0) ++ rows("g", 3, 1, 4, 1) ++
      rows("g", 2, 2, 1, 4) ++ rows("g", 3, 2, 0, 5) ++
      // group h: both arms 5/10 per look -> z = 0, never crosses
      rows("h", 0, 1, 3, 2) ++ rows("h", 1, 1, 2, 3) ++
      rows("h", 0, 2, 3, 2) ++ rows("h", 1, 2, 2, 3) ++
      rows("h", 2, 1, 3, 2) ++ rows("h", 3, 1, 2, 3) ++
      rows("h", 2, 2, 3, 2) ++ rows("h", 3, 2, 2, 3) ++
      // group k: treated rows only -> n_c = 0 -> NULL z
      rows("k", 0, 1, 2, 2) ++ rows("k", 3, 1, 1, 1)
    ).toDF("user_id", "ts", "event_type", "value")
    val got = Events.groupSequential(ev, "event_type", "user_id", "ts",
        col("value") >= 100.0, looks = 2, c = 1.977)
      .as[(String, Long, Long, Long, Long, Long, Long, Option[Double],
        Double, Boolean, Option[Long], String)]
      .collect().map(r => (r._1, r._2) -> r).toMap
    assert(got.size == 6, got.keys.toSeq.sorted)

    // g, look 1: pt=9/10, pc=1/10, pooled p=10/20=0.5,
    // se = sqrt(0.25*(1/10+1/10)) = sqrt(0.05) = 0.2236068,
    // z = 0.8/0.2236068 = 3.5777088 -> 3.577709 >= 2.795900 -> crossed
    assert(got(("g", 1L)) == (("g", 1L, d0 + 1, 10L, 9L, 10L, 1L,
      Some(3.577709), 2.7959, true, Some(d0 + 1), "stop_reject")),
      got(("g", 1L)))
    // g, look 2 (cumulative): 18/20 vs 2/20, se = sqrt(0.025),
    // z = 0.8/0.1581139 = 5.0596443 -> 5.059644; crossed_at_day
    // STAYS the look-1 day (sequential semantics)
    assert(got(("g", 2L)) == (("g", 2L, d0 + 3, 20L, 18L, 20L, 2L,
      Some(5.059644), 1.977, true, Some(d0 + 1), "stop_reject")),
      got(("g", 2L)))
    // h: identical arms -> z = +0.0 exactly, never crossed
    assert(got(("h", 1L)) == (("h", 1L, d0 + 1, 10L, 5L, 10L, 5L,
      Some(0.0), 2.7959, false, None, "continue")), got(("h", 1L)))
    assert(got(("h", 2L)) == (("h", 2L, d0 + 3, 20L, 10L, 20L, 10L,
      Some(0.0), 1.977, false, None, "continue")), got(("h", 2L)))
    // k: no control arm -> NULL z, never crossed
    assert(got(("k", 1L)) == (("k", 1L, d0 + 0, 0L, 0L, 4L, 2L,
      None, 2.7959, false, None, "continue")) ||
      got(("k", 1L)) == (("k", 1L, d0 + 0, 4L, 2L, 0L, 0L,
        None, 2.7959, false, None, "continue")), got(("k", 1L)))
    assert(got(("k", 2L))._8.isEmpty && got(("k", 2L))._12 == "continue",
      got(("k", 2L)))
  }

  test("rmstDiff: hand jackknife over three duration-day blocks — " +
    "point diff, exact micros moments, se = 1.0, round-4 CI; each " +
    "arm's RMST equals the q269 face on the same ladder") {
    // arm A (odd users): u1 purchase at d=1, u3 censored at horizon
    // d=4 -> ladder d1(n1,e1), d4(n1,e0) -> S(1)=.5 -> RMST(3) = 2.0
    // arm B (even users): u2 purchase at d=2, u4 censored at d=4
    // -> ladder d2(n1,e1), d4(n1,e0) -> RMST(3) = 2.5; diff = -0.5
    val ev = Seq(
      (1L, ts(0), "signup"), (1L, ts(1), "purchase"),
      (3L, ts(0), "signup"),
      (2L, ts(0), "signup"), (2L, ts(2), "purchase"),
      (4L, ts(0), "signup"), (4L, ts(4), "view")
    ).toDF("user_id", "ts", "event_type")
    val got = Events.rmstDiff(ev, "user_id", "ts", "event_type",
        startType = "signup", eventType = "purchase", tauDays = 3)
      .as[(Long, Long, Long, Double, Double, Double, Long,
        Option[Double], Option[Double], Option[Double])]
      .collect().toSeq
    // blocks: drop d=1 -> A all-censored RMST 3.0, B 2.5, delta=+0.5;
    // drop d=2 -> A 2.0, B 3.0, delta=-1.0; drop d=4 -> both arms
    // saturate (S hits 0), A 1.0, B 2.0, delta=-1.0. t_micros =
    // {5e5, -1e6, -1e6}: D=3, sum=-1.5e6, sumsq=2.25e12,
    // num = 3*2.25e12 - 2.25e12 = 4.5e12, var = 2*num/9 = 1e12
    // -> se = 1.0 day; CI = -0.5 -+ 1.959964 -> (-2.46, 1.46)
    assert(got == Seq((3L, 2L, 2L, 2.0, 2.5, -0.5, 3L,
      Some(1.0), Some(-2.46), Some(1.46))), got)
    // each arm's mirrored chain IS the q269 face: same ladder (arm
    // subset plus the horizon marker), same RMST
    val evA = Seq((1L, ts(0), "signup"), (1L, ts(1), "purchase"),
      (3L, ts(0), "signup"), (1L, ts(4), "view"))
      .toDF("user_id", "ts", "event_type")
    val a = Events.rmst(evA, "user_id", "ts", "event_type",
        startType = "signup", eventType = "purchase", tauDays = 3)
      .as[(Long, Long, Double)].collect().head
    assert(a == ((3L, 2L, 2.0)), a)
  }

  test("audioWindowStats: hand five-sample signal through the REAL WAV " +
    "encoder — exact window sumsq and zero-crossings, partial last " +
    "window, round-6 rms; unparseable payloads contribute no rows") {
    val sig = Array(256, -256, 0, -512, 512)
    val wav = Multimodal.synthWav(5, sig(_))
    val media = Seq((7L, wav), (8L, Array[Byte](1, 2, 3, 4)))
      .toDF("media_id", "payload")
    val got = Multimodal.audioWindowStats(media, "media_id", "payload",
        windowFrames = 3)
      .as[(Long, Long, Long, Long, Long, Double)].collect().toSet
    // window 0 = [256, -256, 0]: sumsq = 2*65536, crossings at both
    // in-window pairs (sign flips 256->-256 and -256->0, with 0
    // counting as non-negative); window 1 = [-512, 512]: one flip
    assert(got == Set(
      (7L, 0L, 3L, 131072L, 2L, BigDecimal(math.sqrt(131072.0 / 3))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble),
      (7L, 1L, 2L, 524288L, 1L, 512.0)), got)
  }

  test("pqDistortion: hand 4-vector, 2-subspace, seed-codebook card — " +
    "exact SSE/MSE micros, tie to lower cid, codeword usage") {
    val emb = Seq(
      (0L, Array(0.0, 0.0, 10.0, 10.0)),
      (1L, Array(4.0, 4.0, 10.0, 10.0)),
      (2L, Array(0.0, 0.0, 0.0, 0.0)),
      (3L, Array(4.0, 0.0, 10.0, 8.0))
    ).toDF("vec_id", "embedding")
    // k=2 seeds = vectors 0 and 1; trainIters=0 keeps them. Subspace 0
    // books: [0,0] and [4,4]; id3's [4,0] ties at d=16 -> lower cid.
    // Subspace 1 books are BOTH [10,10] (degenerate): id2 pays 200,
    // id3 pays 4, and only cid 0 is ever used.
    val got = Similarity.pqDistortion(emb, "vec_id", "embedding",
        m = 2, k = 2, trainIters = 0, dim = 4, trainStride = 1)
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(got == Set(
      (0L, 4L, 2L, 16000000L, 4000000L),
      (1L, 4L, 1L, 204000000L, 51000000L)), got)
  }

  test("weibullFit: two-knot ladder solves the plot line exactly " +
    "(r2 = 1), closed-form shape/scale/median; a one-point ladder " +
    "reports NULL fit") {
    // u1 purchase d1, u2 purchase d2, u3 censored at horizon d2:
    // KM knots S(1) = 2/3 (risk 3, 1 event), S(2) = 1/3 (risk 2, 1
    // event) -> two usable plot points, OLS through 2 points is exact
    val ev = Seq(
      (1L, ts(0), "signup"), (1L, ts(1), "purchase"),
      (2L, ts(0), "signup"), (2L, ts(2), "purchase"),
      (3L, ts(0), "signup")
    ).toDF("user_id", "ts", "event_type")
    val got = Events.weibullFit(ev, "user_id", "ts", "event_type",
        startType = "signup", eventType = "purchase")
      .as[(Long, Option[Double], Option[Double], Option[Double],
        Option[Double])].collect().head
    def r4(v: Double) = BigDecimal(v)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val (x2, y1, y2) = (math.log(2.0),
      math.log(-math.log(2.0 / 3)), math.log(-math.log(1.0 / 3)))
    val slope = (y2 - y1) / x2                   // 2-point closed form
    val icpt = (y1 + y2 - slope * x2) / 2
    val lam = math.exp(-icpt / slope)
    assert(got._1 == 2L && got._5 == Some(1.0), got)
    assert(got._2 == Some(r4(slope)) && got._3 == Some(r4(lam)), got)
    assert(got._4 ==
      Some(r4(lam * math.exp(math.log(math.log(2.0)) / slope))), got)
    assert(slope > 1.0, "this fixture's hazard rises: shape > 1")

    // one usable knot: S(1) = 0.5, nothing else -> guarded NULLs
    val ev1 = Seq((1L, ts(0), "signup"), (1L, ts(1), "purchase"),
      (2L, ts(0), "signup"), (2L, ts(1), "view"))
      .toDF("user_id", "ts", "event_type")
    val one = Events.weibullFit(ev1, "user_id", "ts", "event_type",
        startType = "signup", eventType = "purchase")
      .as[(Long, Option[Double], Option[Double], Option[Double],
        Option[Double])].collect().head
    assert(one == ((1L, None, None, None, None)), one)
  }

  test("hllReplay: single key lands the small-range correction exactly " +
    "(256*ln(256/255)); duplicates never move the estimate; 10k " +
    "distinct keys estimate within the HLL error envelope") {
    def card(df: org.apache.spark.sql.DataFrame) =
      Sketches.hllReplay(df, col("k"))
        .as[(Long, Long, Long, Double, Option[Long])].collect().head
    val one = card(Seq("alpha").toDF("k"))
    val expected = BigDecimal(256.0 * math.log(256.0 / 255.0))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(one._1 == 1L && one._2 == 1L && one._3 == 1L, one)
    assert(one._4 == expected, one)
    // multiplicity-blind: the register table is a max over hashes, so
    // triplicating every row changes n_rows only
    val keys = (0 until 10000).map(i => s"key_$i")
    val once = card(keys.toDF("k"))
    val thrice = card((keys ++ keys ++ keys).toDF("k"))
    assert(once._1 == 10000L && thrice._1 == 30000L)
    assert(once._4 == thrice._4 && once._5 == thrice._5,
      s"$once vs $thrice")
    // p=8 standard error is 1.04/16 = 6.5%; 5 sigma is a generous,
    // non-flaky envelope (the hash is fixed, so this is deterministic
    // — the assert documents the estimator is sane, not luck)
    assert(math.abs(once._4 / 10000.0 - 1.0) < 0.325, once)
  }

  test("kneserNeyNll: hand corpus — interpolated-KN probabilities for " +
    "seen bigram, unseen continuation, first-token backoff, and a " +
    "pure-OOV doc") {
    // ref: "a b a c" and "a b b" -> bi counts (a,b)=2 (b,a)=1 (a,c)=1
    // (b,b)=1; n_types=4, V=3; prevs: a(ctot 3, 2 followers),
    // b(ctot 2, 2 followers); continuation types: a<-1, b<-2, c<-1.
    // Pc(w) = (n1w+1)/8: a .25, b .375, c .25, OOV .125
    val ref = Seq((0L, "a b a c"), (2L, "a b b")).toDF("doc_id", "text")
    val score = Seq((1L, "a b z"), (3L, "z")).toDF("doc_id", "text")
    val got = TextAnalysis.kneserNeyNll(ref, score, "doc_id", "text")
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    // doc 1: P(a|START)=Pc(a)=.25; P(b|a)=(max(2-.75,0)+.75*2*.375)/3
    // = 1.8125/3; P(z|b)=(.75*2*.125)/2 = .09375
    // avg nll = (ln 4 + ln(3/1.8125) + ln(32/3))/3 = 1.4191
    assert(got(1L) == ((1L, 3L, 1.4191)), got(1L))
    // doc 3: single OOV first token -> Pc = 1/8 -> ln 8 = 2.0794
    assert(got(3L) == ((3L, 1L, 2.0794)), got(3L))
  }

  test("fellegiSunterEm: one-field one-round EM hand trace — exact " +
    "micros posteriors (w(agree) = .5 exactly at the init params), " +
    "M-step from integer moments, final per-pattern posterior") {
    val recs = Seq((1L, "x"), (2L, "x"), (3L, "y"), (4L, "z"))
      .toDF("id", "f")
    val cand = Seq((1L, 2L), (1L, 3L), (3L, 4L)).toDF("id_a", "id_b")
    val got = Dedup.fellegiSunterEm(recs, "id", Seq("f" -> col("f")),
        cand, iters = 1)
      .as[(Boolean, Long, Double)].collect().map(r => r._1 -> r).toMap
    // patterns: (1,2) agree; (1,3), (3,4) disagree -> n(T)=1, n(F)=2.
    // E at (.1, .9, .1): w(T) = .09/(.09+.09) = .5 -> 500000 micros;
    // w(F) = .01/.82 -> round(12195.12) = 12195.
    // M: sw = 500000 + 2*12195 = 524390; su = 500000 + 2*987805
    // = 2475610; nn = 3 -> pi' = sw/3e6, m' = 500000/sw,
    // u' = 500000/su (no clamp binds)
    val pi1 = 524390.0 / (1000000.0 * 3.0)
    val m1 = 500000.0 / 524390.0
    val u1 = 500000.0 / 2475610.0
    def w(g: Boolean): Double = {
      val pm = if (g) m1 else 1.0 - m1
      val pu = if (g) u1 else 1.0 - u1
      (pi1 * pm) / (pi1 * pm + (1.0 - pi1) * pu)
    }
    def r6(v: Double) = BigDecimal(v)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got(true) == ((true, 1L, r6(w(true)))), got(true))
    assert(got(false) == ((false, 2L, r6(w(false)))), got(false))
    // with ONE binary field the model is non-identifiable and EM is
    // stationary after a single step: pi'*m' = sw/(3e6) * 500000/sw
    // = 1/6 = (1-pi')*u' exactly, so w(agree) stays exactly 0.5 —
    // the agree pattern still dominates the disagree pattern
    assert(got(true)._3 == 0.5 && got(false)._3 < 0.05,
      (got(true), got(false)))
  }

  test("obfBounds: the textbook five-look alpha=0.05 ladder from " +
    "c=2.040 — 4.562, 3.226, 2.634, 2.281, 2.040 at 3 decimals") {
    val b = Events.obfBounds(5, 2.040)
    assert(b.map(x => math.round(x * 1000) / 1000.0) ==
      Seq(4.562, 3.226, 2.634, 2.281, 2.04), b)
    // boundary ladder is decreasing: early looks are near-unspendable
    assert(b == b.sorted.reverse, b)
  }
}
