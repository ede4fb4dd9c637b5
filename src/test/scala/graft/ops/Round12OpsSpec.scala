package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Hand-verified fixtures for the round-12 growth operators
  * (q216–q224): each test computes the expected value by hand (or by
  * the defining closed form) on a fixture small enough to audit. */
class Round12OpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("cramersV: a perfectly associated 2x2 table scores 1, an " +
    "independent one scores 0, a constant column yields NULL") {
    val perfect = Seq(("x", "p"), ("x", "p"), ("y", "q"), ("y", "q"))
      .toDF("a", "b")
    val got = DataQuality.cramersV(perfect, "a", "b")
      .select("v").as[Option[Double]].head()
    assert(got.contains(1.0), got)
    val indep = Seq(("x", "p"), ("x", "q"), ("y", "p"), ("y", "q"))
      .toDF("a", "b")
    assert(DataQuality.cramersV(indep, "a", "b")
      .select("v").as[Option[Double]].head().contains(0.0))
    val const = Seq(("x", "p"), ("x", "q")).toDF("a", "b")
    assert(DataQuality.cramersV(const, "a", "b")
      .select("v").as[Option[Double]].head().isEmpty)
  }

  test("mutualInformation: independent columns give 0 MI, a bijective " +
    "pairing gives NMI = 1 (MI = H)") {
    val indep = Seq(("x", "p"), ("x", "q"), ("y", "p"), ("y", "q"))
      .toDF("a", "b")
    val gi = DataQuality.mutualInformation(indep, "a", "b")
      .select("mi_micros", "nmi").as[(Long, Option[Double])].head()
    assert(gi._1 == 0L && gi._2.contains(0.0), gi)
    val bij = Seq(("x", "p"), ("y", "q"), ("z", "r"), ("x", "p"))
      .toDF("a", "b")
    val gb = DataQuality.mutualInformation(bij, "a", "b")
      .select("h_a_micros", "mi_micros", "nmi")
      .as[(Long, Long, Option[Double])].head()
    assert(gb._1 == gb._2, gb) // MI == H(a) for a bijection
    assert(gb._3.contains(1.0), gb)
  }

  test("kAnonymityAudit: hand class profile — uniques counted, " +
    "below-k rows summed, rate floored") {
    // classes: (n=1, s=A) x3, (n=1, s=B) x1, (n=2, s=A) x1 -> sizes 3,1,1
    val df = Seq((1L, "A"), (1L, "A"), (1L, "A"), (1L, "B"), (2L, "A"))
      .toDF("n", "s")
    val got = DataQuality.kAnonymityAudit(df, Seq("n", "s"), k = 2L)
      .as[(String, Long, Long, Long, Long, Long, Long)].head()
    assert(got == (("n,s", 5L, 3L, 1L, 2L, 2L, 400000L)), got)
  }

  test("hillTailIndex: an exact Pareto(alpha=2) top set recovers " +
    "alpha = 2 to rounding") {
    // x_(i) = 1000/sqrt(i): ln(x_i/x_(k+1)) = 0.5*ln((k+1)/i);
    // hill = (1/k)*sum = (1/alpha) with alpha = 2 asymptotically
    val k = 100
    val rows = (1 to k + 1).map(i =>
      ("g", i.toLong, 1000.0 / math.sqrt(i.toDouble)))
    val got = DataQuality.hillTailIndex(rows.toDF("grp", "id", "v"),
        "grp", col("v"), col("id"), k = k)
      .select("alpha").as[Option[Double]].head()
    assert(got.exists(a => math.abs(a - 2.0) < 0.1), got)
  }

  test("zipfFit: an exact power-law rank-frequency table fits " +
    "slope -1 with r2 ~ 1") {
    // term_i repeated round(2000/i) times, i = 1..40
    val docs = (1 to 40).flatMap(i =>
      Seq.fill(math.round(2000.0 / i).toInt)(s"w$i"))
    val df = Seq(docs.mkString(" ")).toDF("text")
    val got = TextAnalysis.zipfFit(df, "text", topN = 40)
      .as[(Long, Option[Double], Option[Double], Option[Double])].head()
    assert(got._1 == 40L)
    assert(got._2.exists(s => math.abs(s + 1.0) < 0.01), got)
    assert(got._4.exists(_ > 0.999), got)
  }

  test("logRankTest: mirrored cohorts (identical duration sets) give " +
    "O1 = E1 and z = 0; a cohort that converts strictly earlier gets " +
    "positive O1 - E1") {
    def ts(day: Long) =
      new java.sql.Timestamp(1704067200000L + day * 86400000L)
    // users 1,3 (g=1) and 2,4 (g=0): identical signup day 0;
    // purchases day 2 (users 1,2) and day 5 (users 3,4)
    val rows = Seq(
      (1L, "signup", ts(0)), (2L, "signup", ts(0)),
      (3L, "signup", ts(0)), (4L, "signup", ts(0)),
      (1L, "purchase", ts(2)), (2L, "purchase", ts(2)),
      (3L, "purchase", ts(5)), (4L, "purchase", ts(5)))
      .toDF("user_id", "event_type", "ts")
    val got = Events.logRankTest(rows, "user_id", "ts", "event_type",
        "signup", "purchase", pmod(col("user_id"), lit(2)) === 1)
      .as[(Long, Long, Long, Long, Long, Option[Double])].head()
    val (n1, n0, o1, e1m, _, z) = got
    assert(n1 == 2L && n0 == 2L && o1 == 2L)
    assert(e1m == 2000000L, got) // E1 = 2 exactly by symmetry
    assert(z.contains(0.0), got)
    // early cohort: odd users purchase day 1, even users day 9
    val early = Seq(
      (1L, "signup", ts(0)), (2L, "signup", ts(0)),
      (3L, "signup", ts(0)), (4L, "signup", ts(0)),
      (1L, "purchase", ts(1)), (3L, "purchase", ts(1)),
      (2L, "purchase", ts(9)), (4L, "purchase", ts(9)))
      .toDF("user_id", "event_type", "ts")
    val ge = Events.logRankTest(early, "user_id", "ts", "event_type",
        "signup", "purchase", pmod(col("user_id"), lit(2)) === 1)
      .as[(Long, Long, Long, Long, Long, Option[Double])].head()
    assert(ge._3 * 1000000L > ge._4, ge) // O1 > E1
    assert(ge._6.exists(_ > 0.0), ge)
  }

  test("markovStationary: a deterministic 2-cycle keeps the uniform " +
    "distribution; an absorbing state collects (almost) all mass") {
    def ts(s: Long) = new java.sql.Timestamp(1704067200000L + s * 1000L)
    // one user alternating A,B,A,B,... -> P(A->B)=P(B->A)=1
    val cyc = (0 until 10).map(i =>
      (1L, i.toLong, ts(i), if (i % 2 == 0) "A" else "B"))
      .toDF("user_id", "event_id", "ts", "event_type")
    val gc = Events.markovStationary(cyc, "user_id", "ts", "event_id",
        "event_type", iters = 10)
      .as[(String, Long)].collect().toMap
    assert(gc == Map("A" -> 500000L, "B" -> 500000L), gc)
    // A -> B, then B -> B forever: B absorbs
    val abs = (0 until 10).map(i =>
      (1L, i.toLong, ts(i), if (i == 0) "A" else "B"))
      .toDF("user_id", "event_id", "ts", "event_type")
    val ga = Events.markovStationary(abs, "user_id", "ts", "event_id",
        "event_type", iters = 10)
      .as[(String, Long)].collect().toMap
    assert(ga("A") == 0L && ga("B") >= 990000L, ga)
  }

  test("amsF2: a single-key column estimates F2 exactly (every " +
    "estimator is (±n)² = n²) with zero realized error") {
    val df = Seq.fill(37)("k").toDF("x")
    val got = Sketches.amsF2(df, col("x"), nSketches = 8)
      .as[(Long, Long, Long, Long, Option[Long])].head()
    assert(got == ((37L, 1L, 37L * 37L, 37L * 37L, Some(0L))), got)
  }

  test("nnMatchingAtt: hand matches — equal-covariate control wins at " +
    "distance 0, ties at equal distance go to the covariate-below " +
    "control, ATT is the exact mean gap") {
    def ts(s: Long) = new java.sql.Timestamp(1704067200000L + s * 1000L)
    // users: treated 1 (2 events, value 5.0 each -> y=1000c, cov=2),
    // treated 3 (4 events, 1.0 each -> 400c, cov=4);
    // controls 2 (2 events, 2.0 -> 400c, cov=2), 4 (6 events, 1.0 ->
    // 600c, cov=6). Matches: t1 -> c2 (cov 2 == 2, gap +600);
    // t3 (cov 4): prev c2 dist 2, next c4 dist 2 -> TIE -> prev c2
    // (gap 0). ATT = (600 + 0)/2 = 300 cents -> 3e8 micros.
    val rows =
      (0 until 2).map(i => (1L, ts(i), 5.0)) ++
      (0 until 4).map(i => (3L, ts(i), 1.0)) ++
      (0 until 2).map(i => (2L, ts(i), 2.0)) ++
      (0 until 6).map(i => (4L, ts(i), 1.0))
    val df = rows.toDF("user_id", "ts", "value")
    val got = Events.nnMatchingAtt(df, "user_id", "value",
        pmod(col("user_id"), lit(2)) === 1)
      .as[(Long, Long)].head()
    assert(got == ((2L, 300000000L)), got)
  }

  test("qiniUplift: a score that perfectly separates a persuadable " +
    "segment accumulates positive q_micros at the top and q = 0 " +
    "when treated and control convert alike") {
    def ts(s: Long) = new java.sql.Timestamp(1704067200000L + s * 1000L)
    // 20 users; high-score users (many events): treated convert,
    // controls don't; low-score users: nobody converts.
    val rows = (1L to 20L).flatMap { u =>
      val high = u <= 10
      val n = if (high) 10 else 2
      val conv = high && u % 2 == 1
      (0 until n).map(i => (u, ts(u * 100 + i), "view")) ++
        (if (conv) Seq((u, ts(u * 100 + 50), "purchase")) else Nil)
    }
    val df = rows.toDF("user_id", "ts", "event_type")
      .select(col("user_id"), col("ts"), col("event_type"))
    val got = Events.qiniUplift(df, "user_id", "event_type", "purchase",
        pmod(col("user_id"), lit(2)) === 1, buckets = 4)
      .orderBy("tile")
      .as[(Long, Long, Long, Long, Long, Option[Long])].collect()
    // all conversions are treated: q(t) = cumConvT once controls
    // enter the prefix; tile 1 is all-treated (the converters have the
    // extra purchase event) -> cnc = 0 -> NULL (no counterfactual
    // rate yet, the documented degenerate case)
    assert(got.head._6.isEmpty, got.toSeq)
    assert(got(1)._6.contains(5000000L), got.toSeq)
    assert(got.last._6.contains(5000000L), got.toSeq)
  }

  test("seasonalStrength: a pure 2-level weekly pattern scores ~1, " +
    "a constant series scores NULL (zero detrended variance)") {
    def ts(day: Long, i: Long) =
      new java.sql.Timestamp(1704067200000L + day * 86400000L + i * 1000L)
    // group a: 14 days alternating 1 vs 5 events by dow parity...
    // use dow-dependent count: day % 7 == 0 -> 8 events else 1
    val season = (0L until 21L).flatMap { d =>
      val n = if (d % 7 == 0) 8 else 1
      (0 until n).map(i => ("a", ts(d, i.toLong)))
    }
    // group b: constant 2 events every day
    val const = (0L until 21L).flatMap(d =>
      (0 until 2).map(i => ("b", ts(d, i.toLong))))
    val df = (season ++ const).toDF("event_type", "ts")
    val got = Events.seasonalStrength(df, "event_type", "ts")
      .as[(String, Long, Option[Double])].collect()
      .map(r => r._1 -> r._3).toMap
    assert(got("a").exists(_ > 0.95), got)
    assert(got("b").isEmpty, got) // constant: Var(detrended) = 0
  }

  test("reciprocity: hand dyad census — one mutual pair + one " +
    "one-way edge = 2/3 reciprocity in micros (floored)") {
    val e = Seq((1L, 2L), (2L, 1L), (1L, 3L), (3L, 3L)).toDF("src", "dst")
    val got = Graph.reciprocity(e).as[(Long, Long, Long, Long, Long)]
      .head()
    // self-loop dropped: m=3, mutual edges 2, dyads 1, asym 1
    assert(got == ((3L, 2L, 1L, 1L, 666666L)), got)
  }

  test("smdBalance: identical arms score 0 exactly; a one-unit mean " +
    "shift at unit variance scores ~1; degenerate arms yield NULL") {
    // x: treated {1,3} vs control {1,3} -> SMD 0 exactly;
    // y: treated {10,12} mean 11 var 2, control {12,14} mean 13 var 2
    // -> smd = -2/sqrt(2) = -1.4142
    val df = Seq(
      (1L, 1L, 10L), (3L, 3L, 12L),
      (2L, 1L, 12L), (4L, 3L, 14L))
      .toDF("u", "x", "y")
    val got = DataQuality.smdBalance(df, pmod(col("u"), lit(2)) === 1,
        Seq("x", "y"))
      .as[(String, Long, Long, Option[Double])].collect()
      .map(r => r._1 -> r._4).toMap
    assert(got("x").contains(0.0), got)
    assert(got("y").contains(-1.4142), got)
  }

  test("mannKendall: a strictly increasing series gets S = n(n-1)/2 " +
    "and positive z; a constant series has zero variance -> NULL z") {
    def ts(day: Long, i: Long) =
      new java.sql.Timestamp(1704067200000L + day * 86400000L + i * 1000L)
    val up = (0L until 10L).flatMap(d =>
      (0 to d.toInt).map(i => ("up", ts(d, i.toLong))))
    val const = (0L until 10L).flatMap(d =>
      (0 until 3).map(i => ("flat", ts(d, i.toLong))))
    val got = DataQuality.mannKendall((up ++ const)
        .toDF("event_type", "ts"), "event_type", "ts")
      .as[(String, Long, Long, Long, Option[Double])].collect()
      .map(r => r._1 -> r).toMap
    assert(got("up")._3 == 45L, got("up")) // all 45 pairs increasing
    assert(got("up")._5.exists(_ > 0.0))
    assert(got("flat")._3 == 0L && got("flat")._5.isEmpty, got("flat"))
  }

  test("sprt: a segment converting at p1 drifts to reject_h0 and " +
    "STAYS decided after later low days; one converting at p0 " +
    "drifts to accept_h0") {
    def ts(day: Long, i: Long) =
      new java.sql.Timestamp(1704067200000L + day * 86400000L + i * 1000L)
    // seg 0 (user 4): 40% purchases daily -> LLR climbs;
    // seg 1 (user 1): 0% purchases -> LLR sinks
    val hi = (0L until 30L).flatMap(d => (0 until 10).map(i =>
      (4L, ts(d, i.toLong), if (i < 4) "purchase" else "view")))
    val lo = (0L until 30L).flatMap(d => (0 until 10).map(i =>
      (1L, ts(d, i.toLong), "view")))
    val got = Events.sprt((hi ++ lo).toDF("user_id", "ts", "event_type"),
        "user_id", "ts", "event_type", "purchase", segments = 4L)
      .as[(Long, Long, Long, Long, Long, String)].collect()
      .groupBy(_._1)
    val seg0 = got(0L).sortBy(_._2)
    val seg1 = got(1L).sortBy(_._2)
    assert(seg0.last._6 == "reject_h0", seg0.last)
    assert(seg1.last._6 == "accept_h0", seg1.last)
    // decidedness is sticky: once rejected, every later day rejected
    val firstRej = seg0.indexWhere(_._6 == "reject_h0")
    assert(firstRej >= 0 &&
      seg0.drop(firstRej).forall(_._6 == "reject_h0"))
  }

  test("ebShrinkage: a 1-for-1 user shrinks close to the prior, a " +
    "95-for-100 user barely moves, exact integer arithmetic") {
    def ts(i: Long) = new java.sql.Timestamp(1704067200000L + i * 1000L)
    val rows =
      Seq((1L, ts(0), "purchase")) ++ // 1/1
      (0 until 100).map(i =>
        (2L, ts(i.toLong), if (i < 95) "purchase" else "view")) ++
      (0 until 99).map(i => (3L, ts(i.toLong), "view")) // 0/99
    val got = Events.ebShrinkage(rows.toDF("user_id", "ts", "event_type"),
        "user_id", "event_type", "purchase", priorStrength = 20L)
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    // global m = (1e6·96) div 200 = 480000
    val m = 480000L
    assert(got(1L)._4 == 1000000L &&
      got(1L)._5 == (1000000L + 20L * m) / 21L, got(1L))
    assert(got(2L)._4 == 950000L &&
      got(2L)._5 == (95000000L + 20L * m) / 120L, got(2L))
    assert(got(3L)._5 == (20L * m) / 119L, got(3L))
  }

  test("permutationTest: a huge separation is more extreme than every " +
    "relabeling (p = 1/(B+1)); identical groups give p near 1; " +
    "T_obs is the exact floor-division micros difference") {
    // 30 treated units at metric 1000, 30 control at 0: no fair-coin
    // relabeling of 60 units reproduces a 1000-point mean split.
    val strong = ((1L to 60L).map(u =>
      (u, if (u % 2 == 1) 1000L else 0L))).toDF("u", "x")
    val gs = DataQuality.permutationTest(strong,
        pmod(col("u"), lit(2)) === 1, "u", "x", reps = 100)
      .as[(Long, Long, Long, Long, Long, Long)].head()
    assert(gs._1 == 30L && gs._2 == 30L, gs)
    assert(gs._3 == 1000000000L, gs) // (1e6*30000) div 30 - 0
    assert(gs._5 == 0L && gs._6 == 1000000L / 101L, gs)
    // identical arms: T_obs = 0, every replicate is >= 0 in abs
    val nul = (1L to 60L).map(u => (u, 7L)).toDF("u", "x")
    val gn = DataQuality.permutationTest(nul,
        pmod(col("u"), lit(2)) === 1, "u", "x", reps = 100)
      .as[(Long, Long, Long, Long, Long, Long)].head()
    assert(gn._3 == 0L && gn._5 == 100L && gn._6 == 1000000L, gn)
  }

  test("ratioMetricCi: hand-computed 4-user fixture matches the " +
    "delta-method closed form; a single-user segment yields NULLs") {
    def ts(i: Long) = new java.sql.Timestamp(1704067200000L + i * 1000L)
    // seg 0 users {4,8,12,16}: (n,y) = (4,1),(2,1),(2,0),(4,2)
    // k=4 sy=4 sn=12 syy=6 snn=40 syn=14 -> r=1/3,
    // vy=8/12 vn=16/12 cyn=8/12 nbar=3
    // inner=(2/3 - 2*(1/3)*(2/3) + (1/9)*(4/3))/36 = 10/972
    val shapes = Seq((4L, 4, 1), (8L, 2, 1), (12L, 2, 0), (16L, 4, 2),
      (1L, 3, 1)) // seg 1: single user -> NULL CI
    val rows = shapes.flatMap { case (u, n, y) =>
      (0 until n).map(i =>
        (u, ts(u * 100 + i), if (i < y) "purchase" else "view"))
    }
    val got = Events.ratioMetricCi(rows.toDF("user_id", "ts", "event_type"),
        "user_id", "event_type", "purchase", segments = 4L)
      .as[(Long, Long, Long, Long, Option[Double], Option[Double],
        Option[Double], Option[Double])].collect()
      .map(r => r._1 -> r).toMap
    val s0 = got(0L)
    assert(s0._2 == 4L && s0._3 == 4L && s0._4 == 12L, s0)
    assert(s0._5.contains(0.333333), s0)
    assert(s0._6.contains(0.10143), s0) // sqrt(10/972) = 0.1014301...
    assert(s0._7.contains(0.13453), s0) // 1/3 - 1.96*se = 0.1345303...
    assert(s0._8.contains(0.532136), s0) // 1/3 + 1.96*se = 0.5321363...
    val s1 = got(1L)
    assert(s1._2 == 1L && s1._5.isEmpty && s1._6.isEmpty, s1)
  }

  test("fdrBh: the step-up rescues an early rank that fails its own " +
    "threshold when a later rank passes; thresholds are exact floors") {
    // p*m vs i*alpha: 120000 > 100000 (fails alone), 180000 <= 200000,
    // 270000 <= 300000 -> i* = 3 -> ALL THREE rejected (the step-up
    // signature a per-test threshold misses).
    val pv = Seq(("a", 40000L), ("b", 60000L), ("c", 90000L))
      .toDF("member", "p_micros")
    val got = DataQuality.fdrBh(pv, "member", "p_micros", 100000L)
      .as[(String, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(got("a") == (("a", 40000L, 1L, 3L, 33333L, 1L)), got("a"))
    assert(got("b")._6 == 1L && got("c")._6 == 1L, got)
    val none = Seq(("a", 500000L), ("b", 900000L))
      .toDF("member", "p_micros")
    assert(DataQuality.fdrBh(none, "member", "p_micros", 100000L)
      .filter(col("rejected") === 1).count() == 0L)
  }

  test("permutationTestByGroup: a separated member is significant " +
    "(p = 1/(B+1)), a constant member is not (p = 1)") {
    val rows = (1L to 60L).flatMap { u =>
      Seq(("sep", u, if (u % 2 == 1) 1000L else 0L), ("flat", u, 7L))
    }
    val got = DataQuality.permutationTestByGroup(rows.toDF("grp", "u", "x"),
        "grp", pmod(col("u"), lit(2)) === 1, "u", "x", reps = 100)
      .as[(String, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(got("sep")._4 == 1000000000L &&
      got("sep")._6 == 1000000L / 101L, got("sep"))
    assert(got("flat")._4 == 0L && got("flat")._6 == 1000000L,
      got("flat"))
  }

  test("fairnessAudit: hand-built 20-unit fixture — selection rates, " +
    "TPR/FPR, DI vs the max-rate group and the EO gap are exact") {
    val aUnits = Set(1L, 2L, 3L, 4L, 7L, 8L, 9L, 10L, 13L, 14L)
    val posUnits = Set(1L, 2L, 7L, 5L, 11L)
    val df = (1L to 20L).map(u => (u,
      if (aUnits(u)) "A" else "B", 100L - u,
      if (posUnits(u)) 1L else 0L)).toDF("u", "grp", "score", "label")
    val got = DataQuality.fairnessAudit(df, col("grp"), "u", "score",
        "label", topDeciles = 3)
      .as[(String, Long, Long, Long, Long, Option[Long], Option[Long],
        Option[Long], Option[Long])].collect()
      .map(r => r._1 -> r).toMap
    // top-3 deciles of 20 units = top 6 scores = units 1..6:
    // A holds {1,2,3,4}, B holds {5,6}
    val a = got("A"); val b = got("B")
    assert(a._2 == 10L && a._4 == 4L && a._5 == 400000L, a)
    assert(a._6.contains(666666L) && a._7.contains(285714L), a)
    assert(a._8.contains(1000000L) && a._9.contains(0L), a)
    assert(b._4 == 2L && b._5 == 200000L, b)
    assert(b._6.contains(500000L) && b._7.contains(125000L), b)
    assert(b._8.contains(500000L) && b._9.contains(-166666L), b)
  }

  test("jackknifeDays: 2-day fixture — leave-out means, deltas and " +
    "Tukey pseudo-values are the exact hand values") {
    def ts(day: Long, i: Long) =
      new java.sql.Timestamp(1704067200000L + day * 86400000L + i * 1000L)
    // day0: two events at $1.00 (200 cents), day1: one at $4.00
    // N=3 S=600 -> overall 2e8 micro-cents; loo(day0)=4e8, loo(day1)=1e8
    val df = Seq((ts(0, 0), 1.0), (ts(0, 1), 1.0), (ts(1, 0), 4.0))
      .toDF("ts", "value")
    val got = Events.jackknifeDays(df, "ts", "value")
      .as[(Long, Long, Long, Option[Long], Option[Long], Option[Long])]
      .collect().map(r => r._1 -> r).toMap
    val d0 = got(got.keys.min); val d1 = got(got.keys.max)
    assert(d0._2 == 2L && d0._3 == 200000000L, d0)
    assert(d0._4.contains(400000000L) && d0._5.contains(200000000L) &&
      d0._6.contains(0L), d0)
    assert(d1._4.contains(100000000L) && d1._5.contains(-100000000L) &&
      d1._6.contains(300000000L), d1)
    // single-day corpus: leave-out columns are NULL
    val one = Seq((ts(0, 0), 1.0)).toDF("ts", "value")
    val g1 = Events.jackknifeDays(one, "ts", "value")
      .as[(Long, Long, Long, Option[Long], Option[Long], Option[Long])]
      .head()
    assert(g1._4.isEmpty && g1._6.isEmpty, g1)
  }

  test("mixRateDecomposition: hand fixture — mix and rate effects " +
    "are exact and their total equals the topline move") {
    def ts(day: Long, i: Long) =
      new java.sql.Timestamp(1704067200000L + day * 86400000L + i * 1000L)
    // day0 = period 1, day1 = period 2 (mid = 0)
    // X: p1 2x$1.00, p2 1x$4.00; Y: p1 2x$3.00, p2 3x$1.00
    val rows = Seq(
      ("X", ts(0, 0), 1.0), ("X", ts(0, 1), 1.0), ("X", ts(1, 0), 4.0),
      ("Y", ts(0, 2), 3.0), ("Y", ts(0, 3), 3.0),
      ("Y", ts(1, 1), 1.0), ("Y", ts(1, 2), 1.0), ("Y", ts(1, 3), 1.0))
    val got = Events.mixRateDecomposition(
        rows.toDF("event_type", "ts", "value"), "event_type", "ts",
        "value")
      .as[(String, Long, Long, Long, Option[Long], Long, Long,
        Option[Long], Option[Long])].collect()
      .map(r => r._1 -> r).toMap
    val x = got("X"); val y = got("Y")
    // X: w2r1=25e6, w1r1=50e6 -> mix -25e6; w2r2=100e6 -> rate +75e6
    assert(x._4 == 500000L && x._5.contains(250000L), x)
    assert(x._6 == 100000000L && x._7 == 400000000L, x)
    assert(x._8.contains(-25000000L) && x._9.contains(75000000L), x)
    // Y: w2r1=225e6, w1r1=150e6 -> mix +75e6; w2r2=75e6 -> rate -150e6
    assert(y._8.contains(75000000L) && y._9.contains(-150000000L), y)
    // identity: sum(mix+rate) = m2 - m1 = 175 - 200 cents = -25e6
    assert((x._8.get + x._9.get + y._8.get + y._9.get) == -25000000L)
  }

  test("overdispersion: a constant daily series has VMR 0; a Poisson-" +
    "breaking series matches the hand moments; 1-day groups are NULL") {
    def ts(day: Long, i: Long) =
      new java.sql.Timestamp(1704067200000L + day * 86400000L + i * 1000L)
    // "burst": days (1, 1, 4) events -> n=3 sy=6 syy=18,
    // var=(3*18-36)/6=3, mean=2 -> vmr=1.5, chi2=2*1.5=3
    val burst = Seq(0L -> 1, 1L -> 1, 2L -> 4).flatMap { case (d, c) =>
      (0 until c).map(i => ("burst", ts(d, i.toLong))) }
    val flat = (0L until 3L).flatMap(d =>
      (0 until 2).map(i => ("flat", ts(d, i.toLong))))
    val one = Seq(("one", ts(0, 0)))
    val got = DataQuality.overdispersion(
        (burst ++ flat ++ one).toDF("event_type", "ts"), "event_type",
        "ts")
      .as[(String, Long, Long, Long, Option[Double], Option[Double])]
      .collect().map(r => r._1 -> r).toMap
    assert(got("burst")._4 == 2000000L &&
      got("burst")._5.contains(1.5) &&
      got("burst")._6.contains(3.0), got("burst"))
    assert(got("flat")._5.contains(0.0), got("flat"))
    assert(got("one")._5.isEmpty, got("one"))
  }

  test("topKRankChurn: hand-built two-half leaderboards — overlap, " +
    "Jaccard and the build-time RBO weights are exact") {
    assert(Events.rboWeightsMicros(3, 0.9) == Seq(172000L, 72000L,
      27000L))
    def ts(day: Long, i: Long) =
      new java.sql.Timestamp(1704067200000L + day * 86400000L + i * 1000L)
    // day0 counts: u1:5 u2:4 u3:3 u4:1 -> top3 [u1,u2,u3]
    // day1 counts: u1:5 u3:4 u5:3 u2:1 -> top3 [u1,u3,u5]
    val h1 = Seq(1L -> 5, 2L -> 4, 3L -> 3, 4L -> 1)
    val h2 = Seq(1L -> 5, 3L -> 4, 5L -> 3, 2L -> 1)
    val rows = h1.flatMap { case (u, c) =>
      (0 until c).map(i => (u, ts(0, u * 10 + i))) } ++
      h2.flatMap { case (u, c) =>
        (0 until c).map(i => (u, ts(1, u * 10 + i))) }
    val got = Events.topKRankChurn(rows.toDF("user_id", "ts"),
        "user_id", "ts", k = 3, p = 0.9)
      .as[(Long, Long, Long, Long, Long, Long)].head()
    // overlap {u1 (1,1), u3 (3,2)} -> W(1) + W(3) = 172000 + 27000
    assert(got == ((3L, 3L, 3L, 2L, 500000L, 199000L)), got)
  }

  test("captureRecapture: Chapman estimate and coverage on a " +
    "hand-built two-half population are exact") {
    def ts(day: Long, i: Long) =
      new java.sql.Timestamp(1704067200000L + day * 86400000L + i * 1000L)
    // p1 users {1,2,3,4}; p2 users {3,4,5,6,7,8}: m=2, seen=8,
    // Chapman (5*7)//3 - 1 = 10, coverage 8/10
    val rows = Seq(1L, 2L, 3L, 4L).map(u => (u, ts(0, u))) ++
      Seq(3L, 4L, 5L, 6L, 7L, 8L).map(u => (u, ts(1, u)))
    val got = Events.captureRecapture(rows.toDF("user_id", "ts"),
        "user_id", "ts")
      .as[(Long, Long, Long, Long, Long, Long)].head()
    assert(got == ((4L, 6L, 2L, 8L, 10L, 800000L)), got)
  }

  test("kendallTau: a perfectly concordant pair of daily series " +
    "scores 1; a tie-corrected discordant one matches -2/sqrt(6)") {
    def ts(day: Long, i: Long) =
      new java.sql.Timestamp(1704067200000L + day * 86400000L + i * 1000L)
    // inc: (x,y) = (1,1),(2,2),(3,3); mix: (2,2),(3,1),(4,1)
    val inc = Seq((0L, Seq(1L)), (1L, Seq(1L, 2L)),
      (2L, Seq(1L, 2L, 3L)))
    val mix = Seq((0L, Seq(1L, 2L)), (1L, Seq(1L, 1L, 1L)),
      (2L, Seq(1L, 1L, 1L, 1L)))
    val rows =
      inc.flatMap { case (d, us) => us.zipWithIndex.map { case (u, i) =>
        ("inc", u, ts(d, i.toLong)) } } ++
      mix.flatMap { case (d, us) => us.zipWithIndex.map { case (u, i) =>
        ("mix", u, ts(d, i.toLong)) } }
    val got = DataQuality.kendallTau(
        rows.toDF("event_type", "user_id", "ts"), "event_type",
        "user_id", "ts")
      .as[(String, Long, Long, Long, Long, Option[Double])].collect()
      .map(r => r._1 -> r).toMap
    assert(got("inc")._3 == 3L && got("inc")._6.contains(1.0),
      got("inc"))
    val m = got("mix")
    assert(m._3 == -2L && m._4 == 0L && m._5 == 1L, m)
    assert(m._6.contains(-0.8165), m) // -2/sqrt(6)
  }

  test("heapsFit: a 3-doc fixture yields the exact 2-checkpoint " +
    "log-log fit (r2 = 1)") {
    // seqs 1..3 (doc_id asc); bit-length buckets e=1 {doc1}, e=2
    // {doc2,doc3}: (N,V) checkpoints (2,2) then (7,5)
    val docs = Seq((10L, "a b"), (20L, "a c"), (30L, "b d e"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.heapsFit(docs, "doc_id", "text")
      .as[(Long, Option[Double], Option[Double], Option[Double])]
      .head()
    assert(got._1 == 2L, got)
    // beta = (ln5-ln2)/(ln7-ln2) on micro-rounded lns = 916291/1252763
    assert(got._2.contains(0.7314), got)
    assert(got._4.contains(1.0), got)
    val b = 916291.0 / 1252763.0
    val lnk = (2302585.0 - b * 2639057.0) / 2.0 / 1e6
    assert(got._3.exists(v => math.abs(v - lnk) < 0.0001), got)
  }

  test("hodgesLehmann: daily series (1,2,10) has HL = 3.75 exactly " +
    "(median 2, mean 4.33 — HL sits between, robustly)") {
    def ts(day: Long, i: Long) =
      new java.sql.Timestamp(1704067200000L + day * 86400000L + i * 1000L)
    val rows = Seq(0L -> 1, 1L -> 2, 2L -> 10).flatMap { case (d, c) =>
      (0 until c).map(i => ("a", ts(d, i.toLong))) }
    val got = DataQuality.hodgesLehmann(rows.toDF("event_type", "ts"),
        "event_type", "ts")
      .as[(String, Long, Long, Long)].head()
    // Walsh w2 multiset {2,3,4,11,12,20}: middles 4+11 -> hl_x4 = 15
    assert(got == (("a", 3L, 6L, 3750000L)), got)
  }

  test("runsTest: a clumped series has too few runs (z < 0), an " +
    "oscillating one too many (z > 0); both match the closed form") {
    def ts(day: Long, i: Long) =
      new java.sql.Timestamp(1704067200000L + day * 86400000L + i * 1000L)
    val clump = Seq(1, 1, 1, 5, 5, 5, 3).zipWithIndex.flatMap {
      case (c, d) => (0 until c).map(i => ("clump", ts(d.toLong, i.toLong))) }
    val osc = Seq(1, 5, 1, 5, 1, 5).zipWithIndex.flatMap {
      case (c, d) => (0 until c).map(i => ("osc", ts(d.toLong, i.toLong))) }
    val got = DataQuality.runsTest((clump ++ osc)
        .toDF("event_type", "ts"), "event_type", "ts")
      .as[(String, Long, Long, Long, Long, Option[Double])].collect()
      .map(r => r._1 -> r).toMap
    val c = got("clump") // median day (y=3) dropped; runs = 2 of 6
    assert(c._2 == 6L && c._3 == 3L && c._4 == 3L && c._5 == 2L, c)
    assert(c._6.contains(-1.8257), c) // (2-4)/sqrt(1.2)
    val o = got("osc")
    assert(o._5 == 6L && o._6.contains(1.8257), o)
  }

  test("funnelLatency: exact median (rank-pick) and nearest-rank P90 " +
    "over converted users; non-converters and pre-view purchases drop") {
    def ts(sec: Long) = new java.sql.Timestamp(1704067200000L + sec * 1000L)
    val rows = Seq(
      (4L, ts(0), "view"), (4L, ts(100), "purchase"),
      (8L, ts(0), "view"), (8L, ts(50), "purchase"),
      (12L, ts(0), "view"), (12L, ts(70), "purchase"),
      (16L, ts(0), "view"), // never converts
      (20L, ts(10), "view"), (20L, ts(5), "purchase")) // converted BEFORE view
    val got = Events.funnelLatency(rows.toDF("user_id", "ts", "event_type"),
        "user_id", "ts", "event_type", "view", "purchase", segments = 4L)
      .as[(Long, Long, Long, Long)].collect()
    // latencies {50, 70, 100}: median 70, P90 rank ceil(2.7)=3 -> 100
    assert(got.toSeq == Seq((0L, 3L, 70000000L, 100L)), got.toSeq)
  }

  test("ewmaBacktest: window-2 alpha-0.5 forecasts of (2,4,6,8) match " +
    "the hand arithmetic; weights normalize to micros") {
    assert(Events.ewmaWeightsMicros(0.5, 2) == Seq(666667L, 333333L))
    def ts(day: Long, i: Long) =
      new java.sql.Timestamp(1704067200000L + day * 86400000L + i * 1000L)
    val rows = Seq(2, 4, 6, 8).zipWithIndex.flatMap { case (c, d) =>
      (0 until c).map(i => ("g", ts(d.toLong, i.toLong))) }
    val got = Events.ewmaBacktest(rows.toDF("event_type", "ts"),
        "event_type", "ts", alpha = 0.5, window = 2)
      .as[(String, Long, Long)].head()
    // day2: f = 666667*4 + 333333*2 = 3333334, ape = 2666666//6 = 444444
    // day3: f = 666667*6 + 333333*4 = 5333334, ape = 2666666//8 = 333333
    assert(got == (("g", 2L, (444444L + 333333L) / 2L)), got)
  }

  test("rollingActiveUsers: DAU/WAU/MAU fan-out counts are exact and " +
    "days past the corpus max are not fabricated") {
    def ts(day: Long, i: Long) =
      new java.sql.Timestamp(1704067200000L + day * 86400000L + i * 1000L)
    val rows = Seq((1L, ts(0, 0)), (1L, ts(1, 0)), (1L, ts(1, 1)),
      (2L, ts(1, 0)))
    val got = Events.rollingActiveUsers(rows.toDF("user_id", "ts"),
        "user_id", "ts")
      .as[(Long, Long, Long, Long, Option[Long])].collect()
      .map(r => r._1 -> r).toMap
    assert(got.size == 2, got)
    val d0 = got(got.keys.min); val d1 = got(got.keys.max)
    assert(d0._2 == 1L && d0._3 == 1L && d0._4 == 1L &&
      d0._5.contains(1000000L), d0)
    assert(d1._2 == 2L && d1._3 == 2L && d1._4 == 2L &&
      d1._5.contains(1000000L), d1)
  }

  test("newVsReturning: a user's first day counts them (and their " +
    "events) as new, later days as returning; shares are exact") {
    def ts(day: Long, i: Long) =
      new java.sql.Timestamp(1704067200000L + day * 86400000L + i * 1000L)
    val rows = Seq((1L, ts(0, 0)), (1L, ts(0, 1)), (1L, ts(1, 0)),
      (2L, ts(1, 0)), (2L, ts(1, 1)), (2L, ts(1, 2)))
    val got = Events.newVsReturning(rows.toDF("user_id", "ts"),
        "user_id", "ts")
      .as[(Long, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    val d0 = got(got.keys.min); val d1 = got(got.keys.max)
    assert(d0._2 == 2L && d0._3 == 0L && d0._4 == 1L && d0._5 == 0L &&
      d0._6 == 1000000L, d0)
    assert(d1._2 == 3L && d1._3 == 1L && d1._4 == 1L && d1._5 == 1L &&
      d1._6 == 500000L, d1)
  }

  test("mdePower: two-unit segment matches the closed form " +
    "C*sqrt(2*s2/n); single-unit segment yields NULLs") {
    def ts(i: Long) = new java.sql.Timestamp(1704067200000L + i * 1000L)
    // seg 0: users 4 (10 events) and 8 (12 events): vx = 2, mean 11
    val rows = (0 until 10).map(i => (4L, ts(i.toLong))) ++
      (0 until 12).map(i => (8L, ts(100 + i.toLong))) ++
      (0 until 3).map(i => (1L, ts(200 + i.toLong))) // seg 1 single
    val per = rows.toDF("user_id", "ts").groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"))
    val got = DataQuality.mdePower(per, pmod(col("user_id"), lit(4)),
        "n_events")
      .as[(Long, Long, Long, Option[Double], Option[Double])].collect()
      .map(r => r._1 -> r).toMap
    val s0 = got(0L)
    assert(s0._2 == 2L && s0._3 == 11000000L, s0)
    assert(s0._4.contains(3.962), s0) // 2.8015852...*sqrt(2)
    assert(s0._5.contains(0.360185), s0)
    assert(got(1L)._4.isEmpty && got(1L)._5.isEmpty, got(1L))
  }

  test("weightedPermutationTest: a total rate split is more extreme " +
    "than every relabeling; equal rates give p = 1") {
    val strong = (1L to 60L).map(u =>
      (u, if (u % 2 == 1) 10L else 0L, 10L)).toDF("u", "x", "w")
    val gs = DataQuality.weightedPermutationTest(strong,
        pmod(col("u"), lit(2)) === 1, "u", "x", "w", reps = 100)
      .as[(Long, Long, Long, Long, Long, Long)].head()
    assert(gs._3 == 1000000L && gs._5 == 0L &&
      gs._6 == 1000000L / 101L, gs)
    val nul = (1L to 60L).map(u => (u, 5L, 10L)).toDF("u", "x", "w")
    val gn = DataQuality.weightedPermutationTest(nul,
        pmod(col("u"), lit(2)) === 1, "u", "x", "w", reps = 100)
      .as[(Long, Long, Long, Long, Long, Long)].head()
    assert(gn._3 == 0L && gn._6 == 1000000L, gn)
  }

  test("iqrOutlierDays: a spike day beyond the Tukey fence flags " +
    "high; a zero-IQR group flags ONLY true deviants; a tame group " +
    "flags nothing") {
    def ts(day: Long, i: Long) =
      new java.sql.Timestamp(1704067200000L + day * 86400000L + i * 1000L)
    // spiky: 7 days at 10 events + 1 day at 100 -> Q1 = Q3 = 10,
    // fences collapse to [20, 20] in x2 units; only the 100-day flags
    val spiky = (0L until 7L).flatMap(d =>
      (0 until 10).map(i => ("spiky", ts(d, i.toLong)))) ++
      (0 until 100).map(i => ("spiky", ts(7, i.toLong)))
    val tame = Seq(5, 6, 7, 8).zipWithIndex.flatMap { case (c, d) =>
      (0 until c).map(i => ("tame", ts(d.toLong, i.toLong))) }
    val got = DataQuality.iqrOutlierDays((spiky ++ tame)
        .toDF("event_type", "ts"), "event_type", "ts")
      .as[(String, Long, Long, Long, Long, Long, Option[Long],
        Option[Long])].collect().map(r => r._1 -> r).toMap
    val sp = got("spiky")
    assert(sp._2 == 8L && sp._3 == 10L && sp._4 == 10L, sp)
    assert(sp._5 == 0L && sp._6 == 1L && sp._8.contains(100L), sp)
    assert(sp._7.contains(1704067200000L / 86400000L + 7L), sp)
    val tm = got("tame")
    assert(tm._5 == 0L && tm._6 == 0L && tm._7.isEmpty, tm)
  }

  test("modularity: two disjoint 2-cycles under their SCC partition " +
    "score Q = 0.5 exactly; the 1-community partition scores 0") {
    val e = Seq((1L, 2L), (2L, 1L), (3L, 4L), (4L, 3L)).toDF("src", "dst")
    val labels = Graph.scc(e)
    val got = Graph.modularity(e, labels)
      .as[(Long, Long, Long)].head()
    assert(got == ((2L, 4L, 500000L)), got)
    val one = e.select(col("src").as("node")).distinct()
      .select(col("node"), lit(0L).as("comm"))
    assert(Graph.modularity(e, one).as[(Long, Long, Long)].head()
      == ((1L, 4L, 0L)))
  }
}
