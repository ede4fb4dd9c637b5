package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Hand-verified fixtures for the round-13 growth operators: each test
  * computes the expected value by hand on a fixture small enough to
  * audit. */
class Round13OpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("sessionMarkovFunnel: absorbing conversion, session-gap cut, " +
    "never-converting self-loop state, and branch-state conditional " +
    "expectation — all hand-computed micros") {
    def ts(s: Long) = new java.sql.Timestamp(1704067200000L + s * 1000L)
    val ev = Seq(
      // user 1: A -> B -> purchase in one session; C starts a NEW
      // session after purchase (and purchase is absorbing anyway)
      (1L, 0L, ts(0), "A"), (1L, 1L, ts(10), "B"),
      (1L, 2L, ts(20), "purchase"), (1L, 3L, ts(10000), "C"),
      // user 2: A -> purchase with a 5000 s gap: OUT of session, the
      // pair must not count (A's chain stays pure A -> B)
      (2L, 0L, ts(20000), "A"), (2L, 1L, ts(25000), "purchase"),
      // user 3: D self-loops forever, never converts
      (3L, 0L, ts(0), "D"), (3L, 1L, ts(10), "D"), (3L, 2L, ts(20), "D"),
      // users 4/5: X branches 50/50 to purchase and to D
      (4L, 0L, ts(0), "X"), (4L, 1L, ts(10), "purchase"),
      (5L, 0L, ts(0), "X"), (5L, 1L, ts(10), "D")
    ).toDF("user_id", "event_id", "ts", "event_type")
    val got = Events.sessionMarkovFunnel(ev, "user_id", "ts", "event_id",
        "event_type", convType = "purchase", gapSeconds = 1800L,
        steps = 8)
      .as[(String, Long, Option[Long])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    // A: converts via B in exactly 2 steps, prob 1 (the out-of-session
    // user-2 pair is cut); B: 1 step; D: never (NULL conditional); X:
    // half the mass converts, all of it in 1 step. C has no outgoing
    // in-session transition -> not a state; purchase is absorbing ->
    // not a state.
    assert(got == Map(
      "A" -> ((1000000L, Some(2000000L))),
      "B" -> ((1000000L, Some(1000000L))),
      "D" -> ((0L, None)),
      "X" -> ((500000L, Some(1000000L)))), got)
  }

  test("dailyPacf: period-2 series 2,4,2,4,2,4 — hand-solved " +
    "Durbin-Levinson rationals (rho1=-5/6: p11=-5/6, p22=-1/11, " +
    "p33=1/10, p44=-1/9) at round-4") {
    def ts(day: Int, i: Int) =
      new java.sql.Timestamp(1704067200000L + day * 86400000L + i * 1000L)
    val rows = for {
      day <- 0 until 6
      i <- 0 until (if (day % 2 == 0) 2 else 4)
    } yield (1L, ts(day, i), "E")
    val ev = rows.toDF("user_id", "ts", "event_type")
    val got = Events.dailyPacf(ev, "event_type", "ts", maxLag = 4)
      .as[(String, Long, Option[Double])].collect()
      .map(r => r._2 -> r._3).toMap
    assert(got == Map(1L -> Some(-0.8333), 2L -> Some(-0.0909),
      3L -> Some(0.1), 4L -> Some(-0.1111)), got)
  }

  test("dailyPacf: a group too short for a lag yields NULL pacf at " +
    "that lag (NULL rho propagates), not a crash or a dropped row") {
    def ts(day: Int) =
      new java.sql.Timestamp(1704067200000L + day * 86400000L)
    // 3 days: lags 1-2 have pairs, lags 3-4 do not
    val ev = (0 until 3).flatMap(d =>
        Seq.fill(d + 1)((1L, ts(d), "S")))
      .toDF("user_id", "ts", "event_type")
    val got = Events.dailyPacf(ev, "event_type", "ts", maxLag = 4)
      .as[(String, Long, Option[Double])].collect()
      .map(r => r._2 -> r._3).toMap
    assert(got.keySet == Set(1L, 2L, 3L, 4L), got)
    assert(got(1L).isDefined && got(3L).isEmpty && got(4L).isEmpty, got)
  }

  test("goodTuringVocab: hand-counted frequency-of-frequencies — " +
    "X: 'a a b c' (N=4 V=3 N1=2 N2=1, p0=1/2, hapax=2/3, chao1=3); " +
    "Y: 'x x' (N1=0: p0=0, chao1=V); empty tokens dropped") {
    val docs = Seq(
      ("X", "a a b  c"), // double space: empty token must drop
      ("Y", "x x")
    ).toDF("lang", "text")
    val got = TextAnalysis.goodTuringVocab(docs, "lang", "text")
      .as[(String, Long, Long, Long, Long, Long, Long, Long)]
      .collect().map(r => r._1 -> r).toMap
    assert(got("X") == (("X", 4L, 3L, 2L, 1L, 500000L, 666666L, 3L)),
      got("X"))
    assert(got("Y") == (("Y", 2L, 1L, 0L, 1L, 0L, 0L, 1L)), got("Y"))
  }

  test("markovRemovalEffects on the q257 fixture: removing the bridge " +
    "state kills the A-path conversions, removing a dead-end state " +
    "costs exactly nothing, and session weights include out-of-chain " +
    "initial states at c = 0 — all hand-computed micros") {
    def ts(s: Long) = new java.sql.Timestamp(1704067200000L + s * 1000L)
    val ev = Seq(
      (1L, 0L, ts(0), "A"), (1L, 1L, ts(10), "B"),
      (1L, 2L, ts(20), "purchase"), (1L, 3L, ts(10000), "C"),
      (2L, 0L, ts(20000), "A"), (2L, 1L, ts(25000), "purchase"),
      (3L, 0L, ts(0), "D"), (3L, 1L, ts(10), "D"), (3L, 2L, ts(20), "D"),
      (4L, 0L, ts(0), "X"), (4L, 1L, ts(10), "purchase"),
      (5L, 0L, ts(0), "X"), (5L, 1L, ts(10), "D")
    ).toDF("user_id", "event_id", "ts", "event_type")
    // session-initial weights: A:2 (u1; u2's out-of-session A), D:1,
    // X:2, purchase:1 (u2's second session), C:1 (u1's second session)
    // -> N = 7; chain c_8: A=1e6, B=1e6, D=0, X=5e5, others 0.
    // P_full = (2e6 + 1e6/2*2... ) = (2*1e6 + 2*5e5) div 7 = 428571.
    val got = Events.markovRemovalEffects(ev, "user_id", "ts",
        "event_id", "event_type", convType = "purchase",
        removeStates = Seq("B", "D", "X"), gapSeconds = 1800L,
        steps = 8)
      .as[(String, Long, Long, Option[Long])].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    val pFull = (2L * 1000000L + 2L * 500000L) / 7L // 428571
    // remove B: A dies -> (2*5e5) div 7 = 142857
    // remove D: nothing changes (D never reaches conversion)
    // remove X: (2*1e6) div 7 = 285714
    assert(got("B") == ((pFull, 142857L,
      Some(1000000L * (pFull - 142857L) / pFull))), got("B"))
    assert(got("D") == ((pFull, pFull, Some(0L))), got("D"))
    assert(got("X") == ((pFull, 285714L,
      Some(1000000L * (pFull - 285714L) / pFull))), got("X"))
  }

  test("shapleyAttribution: a channel present in every converting " +
    "coalition earns the full lift; a NULL PLAYER (never changes " +
    "conversion) earns exactly phi = 0 — hand-computed micros at " +
    "n = 2 (weights 1/2, 1/2)") {
    def ts(s: Long) = new java.sql.Timestamp(1704067200000L + s * 1000L)
    val ev = Seq(
      (1L, 0L, ts(0), "A"), (1L, 1L, ts(10), "purchase"), // {A} conv
      (2L, 0L, ts(0), "Z"),                               // {} no conv
      (3L, 0L, ts(0), "A"), (3L, 1L, ts(10), "B"),
      (3L, 2L, ts(20), "purchase"),                       // {A,B} conv
      (4L, 0L, ts(0), "B")                                // {B} no conv
    ).toDF("user_id", "event_id", "ts", "event_type")
    val got = Events.shapleyAttribution(ev, "user_id", "ts", "event_id",
        "event_type", convType = "purchase", channels = Seq("A", "B"),
        gapSeconds = 1800L)
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    // v: ""->0, "A"->1e6, "B"->0, "A,B"->1e6; w(0)=w(1)=500000
    // A: gain=.5*v(A)+.5*v(AB)=1e6, loss=.5*v()+.5*v(B)=0 -> phi=1e6
    // B: gain=.5*v(B)+.5*v(AB)=5e5, loss=.5*v()+.5*v(A)=5e5 -> phi=0
    assert(got("A") == ((1000000L, 0L, 1000000L)), got("A"))
    assert(got("B") == ((500000L, 500000L, 0L)), got("B"))
  }

  test("kaplanMeierCi: hand-solved Greenwood bands — 4 signups, 2 " +
    "purchase day 1, 1 day 3, 1 censored: S=(0.5, 0.25), " +
    "se=(0.25, 0.2165), lo clamped to 0 at day 3") {
    def ts(day: Int) =
      new java.sql.Timestamp(1704067200000L + day * 86400000L)
    val ev = Seq(
      (1L, "signup", ts(0)), (2L, "signup", ts(0)),
      (3L, "signup", ts(0)), (4L, "signup", ts(0)),
      (1L, "purchase", ts(1)), (2L, "purchase", ts(1)),
      (3L, "purchase", ts(3))
    ).toDF("user_id", "event_type", "ts")
    val got = Events.kaplanMeierCi(ev, "user_id", "ts", "event_type",
        "signup", "purchase")
      .as[(Long, Long, Long, Double, Option[Double], Option[Double],
        Option[Double])].collect().map(r => r._1 -> r).toMap
    // d=1: n=4 e=2: S=.5, gw=2/(4*2)=.25, se=.5*.5=.25,
    //   lo=.5-1.959964*.25=.0100, hi=.99
    assert(got(1L) == ((1L, 4L, 2L, 0.5, Some(0.25), Some(0.01),
      Some(0.99))), got(1L))
    // d=3: n=2 e=1 (+1 censored): S=.25, gw=.25+1/(2*1)=.75,
    //   se=.25*sqrt(.75)=.2165, lo clamps to 0, hi=.6743
    assert(got(3L) == ((3L, 2L, 1L, 0.25, Some(0.2165), Some(0.0),
      Some(0.6743))), got(3L))
  }

  test("cmsReplay: width 1 collapses every key into one bucket per " +
    "depth (est = total mass for all), wide sketch recovers exact " +
    "counts, and est >= exact always") {
    val df = (Seq.fill(3)("a") ++ Seq.fill(2)("b") ++ Seq("c"))
      .toDF("k0")
    // width 1: every bucket holds the full mass (6)
    val narrow = Sketches.cmsReplay(df, col("k0"), depth = 2, width = 1,
        topK = 2)
      .as[(String, Long, Long, Long)].collect().toSet
    assert(narrow == Set(("a", 3L, 6L, 3L), ("b", 2L, 6L, 4L)), narrow)
    // wide: 3 keys in 256 buckets x 4 depths — min bucket is exact
    val wide = Sketches.cmsReplay(df, col("k0"), depth = 4, width = 256,
        topK = 3)
      .as[(String, Long, Long, Long)].collect()
    assert(wide.map(r => (r._1, r._2)).toSet ==
      Set(("a", 3L), ("b", 2L), ("c", 1L)))
    wide.foreach { r =>
      assert(r._3 >= r._2 && r._4 == r._3 - r._2, r)
    }
  }

  test("markovPairRemovalEffects: independent paths read synergy ~ 0 " +
    "(floor artifact -1), a shared C->D->conv path reads strongly " +
    "negative (singles double-count it) — hand-computed micros") {
    def ts(s: Long) = new java.sql.Timestamp(1704067200000L + s * 1000L)
    val ev = Seq(
      // three sessions, one per path: A -> conv, B -> conv,
      // C -> D -> conv (the only path through C AND D)
      (1L, 0L, ts(0), "A"), (1L, 1L, ts(10), "purchase"),
      (2L, 0L, ts(0), "B"), (2L, 1L, ts(10), "purchase"),
      (3L, 0L, ts(0), "C"), (3L, 1L, ts(10), "D"),
      (3L, 2L, ts(20), "purchase")
    ).toDF("user_id", "event_id", "ts", "event_type")
    val got = Events.markovPairRemovalEffects(ev, "user_id", "ts",
        "event_id", "event_type", convType = "purchase",
        removePairs = Seq(("A", "B"), ("C", "D")), gapSeconds = 1800L,
        steps = 4)
      .as[(String, String, Long, Long, Option[Long], Option[Long],
        Option[Long])].collect()
      .map(r => (r._1, r._2) -> r).toMap
    // P_full = 1e6 (every session converts). Removing A: only A's
    // session dies -> P = 2e6/3 = 666666, effect = 333334; same for B.
    // Joint (A,B): P = 333333, effect 666667; singles sum 666668 ->
    // synergy -1 (pure floor artifact: the paths are independent).
    assert(got(("A", "B")) == (("A", "B", 1000000L, 333333L,
      Some(666667L), Some(666668L), Some(-1L))), got(("A", "B")))
    // C and D sit on ONE shared path: each single removal already
    // kills it (P = 666666, effect 333334), and the joint removal
    // kills nothing more (pair effect 333334) -> synergy -333334.
    assert(got(("C", "D")) == (("C", "D", 1000000L, 666666L,
      Some(333334L), Some(666668L), Some(-333334L))), got(("C", "D")))
  }

  test("positionalAttribution: closer channel earns its prefix margin " +
    "at position 2, opener with flat margins reads phi 0, and maxLen " +
    "truncation drops deep-position credit — hand-computed micros") {
    def ts(s: Long) = new java.sql.Timestamp(1704067200000L + s * 1000L)
    val ev = Seq(
      // s1: A -> purchase (conv); s2: A alone (no conv)
      (1L, 0L, ts(0), "A"), (1L, 1L, ts(10), "purchase"),
      (2L, 0L, ts(0), "A"),
      // s3: B -> A -> purchase (conv); s4: B alone (no conv)
      (3L, 0L, ts(0), "B"), (3L, 1L, ts(10), "A"),
      (3L, 2L, ts(20), "purchase"),
      (4L, 0L, ts(0), "B")
    ).toDF("user_id", "event_id", "ts", "event_type")
    // v('')=2/4=.5, v(A)=1/2=.5, v(B)=1/2=.5, v(B,A)=1/1=1.
    // A: obs (A|s1), (A|s2), (B,A|s3): gain=(5e5+5e5+1e6) div 3
    //   = 666666, loss = 5e5 -> phi 166666 (the closer position pays).
    // B: both obs have .5 -> .5 margins -> phi 0.
    val got = Events.positionalAttribution(ev, "user_id", "ts",
        "event_id", "event_type", convType = "purchase",
        channels = Seq("A", "B"), gapSeconds = 1800L, maxLen = 4)
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(got("A") == (("A", 3L, 666666L, 500000L, 166666L)), got("A"))
    assert(got("B") == (("B", 2L, 500000L, 500000L, 0L)), got("B"))
    // maxLen=1 cuts s3's position-2 A observation: every remaining
    // margin is .5 - .5 -> both channels flat at phi 0
    val trunc = Events.positionalAttribution(ev, "user_id", "ts",
        "event_id", "event_type", convType = "purchase",
        channels = Seq("A", "B"), gapSeconds = 1800L, maxLen = 1)
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(trunc("A") == (("A", 2L, 500000L, 500000L, 0L)), trunc("A"))
    assert(trunc("B") == (("B", 2L, 500000L, 500000L, 0L)), trunc("B"))
  }

  test("rmst: step-function area under the KM curve, tau clipping both " +
    "inside and beyond the horizon — hand-computed") {
    def ts(s: Long) = new java.sql.Timestamp(1704067200000L + s * 1000L)
    val ev = Seq(
      (1L, ts(0), "signup"), (1L, ts(86400), "purchase"),
      (2L, ts(0), "signup"), (2L, ts(172800), "purchase"),
      (3L, ts(0), "signup"), (4L, ts(0), "signup"),
      (4L, ts(345600), "view") // horizon day 4; u3/u4 censored there
    ).toDF("user_id", "ts", "event_type")
    // S: d1 .75, d2 .5, d4 .5 (censor only). tau=3: 1*1 + .75*1 +
    // .5*1 + tail 0 = 2.25; tau=10: 1 + .75 + .5*2 + .5*(10-4) = 5.75
    def run(tau: Int) = Events.rmst(ev, "user_id", "ts", "event_type",
        startType = "signup", eventType = "purchase", tauDays = tau)
      .as[(Long, Long, Double)].collect().head
    assert(run(3) == ((3L, 4L, 2.25)), run(3))
    assert(run(10) == ((10L, 4L, 5.75)), run(10))
  }

  test("effectiveSampleSize: uniform weights read ESS = n, a " +
    "concentrated group reads 16/10, all-zero weights read NULL — " +
    "hand-computed (Kish)") {
    val rows = Seq(("A", 1L), ("A", 1L), ("A", 1L), ("A", 1L),
      ("B", 3L), ("B", 1L), ("B", 0L), ("B", 0L),
      ("C", 0L), ("C", 0L))
    val got = Sampling.effectiveSampleSize(rows.toDF("g", "w"), "g",
        col("w"))
      .as[(String, Long, Long, Option[Double], Option[Double])]
      .collect().map(r => r._1 -> r).toMap
    assert(got("A") == (("A", 4L, 4L, Some(4.0), Some(1.0))), got("A"))
    assert(got("B") == (("B", 4L, 4L, Some(1.6), Some(0.4))), got("B"))
    assert(got("C") == (("C", 2L, 0L, None, None)), got("C"))
  }

  test("mutualTopOne: two tight pairs match, the hub-adjacent vector " +
    "whose best friend prefers someone else stays unmatched — " +
    "hand-built geometry") {
    val emb = Seq(
      (0L, Seq(1.0, 0.0)), (1L, Seq(0.9, 0.1)),   // mutual pair
      (2L, Seq(0.0, 1.0)), (3L, Seq(0.1, 0.9)),   // mutual pair
      (4L, Seq(0.8, 0.6))                          // best(4)=1, best(1)=0
    ).toDF("vec_id", "embedding")
    val got = Similarity.mutualTopOne(emb, "vec_id", "embedding",
        stride = 1)
      .as[(Long, Long, Double)].collect().toSet
    assert(got == Set((0L, 1L, 0.9939), (2L, 3L, 0.9939)), got)
  }

  test("hooverIndex: {1,1,6} cents reads 5/12 exactly (move 20/48 of " +
    "mass), equal split reads 0, zero-total group reads NULL — " +
    "hand-computed") {
    def ts(s: Long) = new java.sql.Timestamp(1704067200000L + s * 1000L)
    val ev = Seq(
      ("A", 1L, ts(0), 0.01), ("A", 2L, ts(1), 0.01),
      ("A", 3L, ts(2), 0.06),
      ("B", 1L, ts(0), 0.02), ("B", 2L, ts(1), 0.02),
      ("C", 1L, ts(0), 0.0)
    ).toDF("event_type", "user_id", "ts", "value")
    val got = Events.hooverIndex(ev, "event_type", "user_id", "value")
      .as[(String, Long, Long, Option[Long])].collect()
      .map(r => r._1 -> r).toMap
    assert(got("A") == (("A", 3L, 8L, Some(416666L))), got("A"))
    assert(got("B") == (("B", 2L, 4L, Some(0L))), got("B"))
    assert(got("C") == (("C", 1L, 0L, None)), got("C"))
  }

  test("sessionMarkovFunnel2: bigram state A>B splits 1/3 direct vs " +
    "2/3 through B>C, conditional expectation 5/3 steps; " +
    "out-of-session triple is cut — hand-computed micros") {
    def ts(s: Long) = new java.sql.Timestamp(1704067200000L + s * 1000L)
    val ev = Seq(
      (1L, 0L, ts(0), "A"), (1L, 1L, ts(10), "B"),
      (1L, 2L, ts(20), "purchase"),
      (2L, 0L, ts(0), "A"), (2L, 1L, ts(10), "B"), (2L, 2L, ts(20), "C"),
      // u3: only a pair (no triple) -> contributes nothing
      (3L, 0L, ts(0), "B"), (3L, 1L, ts(10), "purchase"),
      // u4: triple straddles the session gap (g2 = 4990 s) -> cut
      (4L, 0L, ts(0), "A"), (4L, 1L, ts(10), "B"), (4L, 2L, ts(5000), "C"),
      // u5: A,B,C,purchase -> A>B -> B>C -> purchase
      (5L, 0L, ts(0), "A"), (5L, 1L, ts(10), "B"), (5L, 2L, ts(20), "C"),
      (5L, 3L, ts(30), "purchase")
    ).toDF("user_id", "event_id", "ts", "event_type")
    val got = Events.sessionMarkovFunnel2(ev, "user_id", "ts",
        "event_id", "event_type", convType = "purchase",
        gapSeconds = 1800L, steps = 8)
      .as[(String, Long, Option[Long])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    // A>B: p(conv)=1/3, p(B>C)=2/3; B>C converts in 1 -> c = 999999,
    // E = (333333*1 + 666666*2)/999999 = 1666666 micros (floored)
    assert(got == Map(
      "A>B" -> ((999999L, Some(1666666L))),
      "B>C" -> ((1000000L, Some(1000000L)))), got)
  }

  test("timeDecayAttribution: 2-vs-1 half-life touches split 1:2 with " +
    "the remainder micro on the closest, beyond-horizon touch " +
    "degenerates to last-touch — hand-computed") {
    def ts(s: Long) = new java.sql.Timestamp(1704067200000L + s * 1000L)
    val ev = Seq(
      (1L, 1L, ts(0), "click"), (1L, 2L, ts(86400), "click"),
      (1L, 3L, ts(172800), "purchase"),
      // user 2: single click 25 half-lives out -> w = 0, remainder
      // hands it the full credit anyway
      (2L, 10L, ts(0), "click"), (2L, 11L, ts(25L * 86400), "purchase")
    ).toDF("user_id", "event_id", "ts", "event_type")
    val got = Events.timeDecayAttribution(ev, "user_id", "ts",
        "event_id", "event_type", touchType = "click",
        convType = "purchase", halfLifeSeconds = 86400L)
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    // user 1: w = (250000, 500000), shares 333333 / 666666 + 1
    assert(got == Set(
      (1L, 3L, 1L, 2L, 333333L),
      (1L, 3L, 2L, 1L, 666667L),
      (2L, 11L, 10L, 25L, 1000000L)), got)
  }

  test("doremiMix: the hard domain takes the whole excess share plus " +
    "its uniform floor, the easy domain keeps only the floor — " +
    "hand-computed micros off exact unigram NLLs") {
    val docs = Seq((1L, "a a", "X"), (2L, "a b", "Y"))
      .toDF("doc_id", "text", "source")
    // model: a:3 b:1, T=4. doc1 nll = .2877, doc2 = .8370 ->
    // base = 562350, excess Y = 274650 (all of it), eps = .2:
    // w_X = 200000 div 2 = 100000; w_Y = 800000 + 100000 = 900000
    val got = TextAnalysis.doremiMix(docs, "doc_id", "text", "source",
        smoothingMicros = 200000L)
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(got("X") == (("X", 1L, 287700L, 0L, 100000L)), got("X"))
    assert(got("Y") == (("Y", 1L, 837000L, 274650L, 900000L)), got("Y"))
    // all-equal domains: zero total excess -> exactly uniform
    val eq = TextAnalysis.doremiMix(
        Seq((1L, "a", "X"), (2L, "a", "Y")).toDF("doc_id", "text",
          "source"), "doc_id", "text", "source")
      .as[(String, Long, Long, Long, Long)].collect()
    assert(eq.forall(_._5 == 500000L), eq.toSeq)
  }

  test("mutualPairPurity: one same-label and one cross-label mutual " +
    "pair read purity 1/2 over chance 7/25 — hand-computed micros") {
    val emb = Seq(
      (0L, Seq(1.0, 0.0), "x"), (1L, Seq(0.9, 0.1), "x"),
      (2L, Seq(0.0, 1.0), "y"), (3L, Seq(0.1, 0.9), "z"),
      (4L, Seq(0.8, 0.6), "w") // unmatched hub-adjacent vector
    ).toDF("vec_id", "embedding", "label")
    val got = Similarity.mutualPairPurity(emb, "vec_id", "embedding",
        "label", stride = 1)
      .as[(Long, Long, Option[Long], Long, Option[Long])].collect().head
    // pairs (0,1) agree, (2,3) differ: purity 500000;
    // marginals (2,1,1,1)/5: chance = 7e6 div 25 = 280000; lift 220000
    assert(got == ((2L, 1L, Some(500000L), 280000L, Some(220000L))),
      got)
  }

  test("mrlTruncationEval: a prefix-2 tie flips the top-1 away from " +
    "the full-dim winner (overlap 0), full-dim vs itself reads 1e6 — " +
    "hand-built geometry") {
    val emb = Seq(
      (0L, Seq(1.0, 0.0, 0.0, 0.0)), // the only stride-100 query
      (1L, Seq(0.9, 0.0, 1.0, 1.0)), // prefix-2 cos 1.0 (tie, id wins)
      (2L, Seq(0.8, 0.0, 0.1, 0.0))  // full cos .9923 (full winner)
    ).toDF("vec_id", "embedding")
    val got = Similarity.mrlTruncationEval(emb, "vec_id", "embedding",
        dims = Seq(2, 4), k = 1, stride = 100)
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(got(2L) == ((2L, 1L, 1L, 0L)), got(2L))
    assert(got(4L) == ((4L, 1L, 1L, 1000000L)), got(4L))
  }

  test("dailyCrossCorrelation: antiphase period-2 series read ccf -1 " +
    "at lag 0, +.75 at lag +-1, NULL where no pairs survive — " +
    "hand-computed rationals") {
    def ts(day: Int, i: Int) =
      new java.sql.Timestamp(1704067200000L + day * 86400000L + i * 1000L)
    val x = Seq(2, 4, 2, 4); val y = Seq(4, 2, 4, 2)
    val rows =
      (for { d <- 0 until 4; i <- 0 until x(d) }
        yield (1L, ts(d, i), "click")) ++
      (for { d <- 0 until 4; i <- 0 until y(d) }
        yield (2L, ts(d, 100 + i), "purchase")) ++
      Seq((3L, ts(0, 500), "view")) // filtered out
    val got = Events.dailyCrossCorrelation(rows.toDF("user_id", "ts",
        "event_type"), "ts", "event_type", typeX = "click",
        typeY = "purchase", maxLag = 4)
      .as[(Long, Long, Option[Double])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    // dx = (-4,4,-4,4), dy = (4,-4,4,-4), cxx = cyy = 64
    val exp = Map(0L -> Some(-1.0), 1L -> Some(0.75), -1L -> Some(0.75),
      2L -> Some(-0.5), -2L -> Some(-0.5), 3L -> Some(0.25),
      -3L -> Some(0.25), 4L -> None, -4L -> None)
    assert(got.size == 9 && got.forall { case (l, (n, c)) =>
      n == 4L && c == exp(l) }, got)
  }

  test("competingRisks: purchase vs error racing from signup — tie day " +
    "goes to the lexicographically smaller cause, pre-start events are " +
    "ignored, censored user pins the horizon, and CIF_A + CIF_B + S " +
    "= 1 at the last day (hand-computed)") {
    def ts(s: Long) = new java.sql.Timestamp(1704067200000L + s * 1000L)
    val ev = Seq(
      // u1: signup day 0, purchase day 1
      (1L, ts(0), "signup"), (1L, ts(86400), "purchase"),
      // u2: error BEFORE signup (ignored), signup at +100s, error day 1
      (2L, ts(0), "error"), (2L, ts(100), "signup"),
      (2L, ts(86500), "error"),
      // u3: purchase and error at the SAME instant on day 2 — the tie
      // goes to 'error' (type-name asc)
      (3L, ts(0), "signup"), (3L, ts(172800), "purchase"),
      (3L, ts(172800), "error"),
      // u4: never exits; a view on day 3 pins the censoring horizon
      (4L, ts(0), "signup"), (4L, ts(259200), "view")
    ).toDF("user_id", "ts", "event_type")
    val got = Events.competingRisks(ev, "user_id", "ts", "event_type",
        startType = "signup", causeA = "purchase", causeB = "error")
      .as[(Long, Long, Long, Long, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    // d=1: n_risk 4, ea=1 (u1), eb=1 (u2): S(d-)=1,
    //   cif_a = cif_b = 1/4
    assert(got(1L) == ((1L, 4L, 1L, 1L, 0.25, 0.25)), got(1L))
    // d=2: n_risk 2, tie -> eb=1: S(d-)=1-2/4=.5, incb=.5*(1/2)=.25
    assert(got(2L) == ((2L, 2L, 0L, 1L, 0.25, 0.5)), got(2L))
    // d=3: censored only; CIFs flat; S(3-)=.25 and .25+.25+.5=1
    assert(got(3L) == ((3L, 1L, 0L, 0L, 0.25, 0.5)), got(3L))
  }

}
