package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Hand-built violations for every constraint class, exact counts. */
class DataQualitySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def df = Seq(
    (1L, Option(5.0), Option("a")),
    (1L, Option(60.0), Option.empty[String]), // dup key, over range, null
    (2L, Option.empty[Double], Option("b")),  // null value: range violation
    (3L, Option(-1.0), Option("c")),          // under range, negative
    (4L, Option(7.0), Option("d"))
  ).toDF("k", "v", "s")

  private def ref = Seq(1L, 2L, 4L).toDF("rk") // 3 is an orphan

  test("every constraint class counts its violations exactly; row-local " +
    "checks share totals; output order is suite order") {
    val out = DataQuality.check(df, Seq(
      DataQuality.NotNull("s_notnull", "s"),
      DataQuality.RangeIn("v_range", "v", 0.0, 50.0),
      DataQuality.Holds("v_nonneg", col("v") >= 0),
      DataQuality.Unique("pk", Seq("k")),
      DataQuality.ForeignKey("fk", Seq("k"), ref, Seq("rk"))))
      .as[(String, Long, Long, Boolean)].collect()
    assert(out.map(_._1).toSeq ==
      Seq("s_notnull", "v_range", "v_nonneg", "pk", "fk"))
    val m = out.map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(m("s_notnull") == ((1L, 5L, false)))
    // violations: 60.0 (over), null (unknown -> violation), -1.0 (under)
    assert(m("v_range") == ((3L, 5L, false)))
    // null >= 0 is unknown -> violation; -1 violates: 2 of 5
    assert(m("v_nonneg") == ((2L, 5L, false)))
    // key 1 appears twice: one excess row over 5 total
    assert(m("pk") == ((1L, 5L, false)))
    // key 3's single row is the orphan
    assert(m("fk") == ((1L, 5L, false)))
  }

  test("a clean table passes everything; empty input yields zero " +
    "violations, not errors") {
    val clean = Seq((1L, 2.0, "x")).toDF("k", "v", "s")
    val out = DataQuality.check(clean, Seq(
      DataQuality.NotNull("s_notnull", "s"),
      DataQuality.Unique("pk", Seq("k")),
      DataQuality.ForeignKey("fk", Seq("k"), ref, Seq("rk"))))
      .as[(String, Long, Long, Boolean)].collect()
    assert(out.forall(_._4), out.mkString(","))
    val empty = DataQuality.check(clean.filter(lit(false)), Seq(
      DataQuality.NotNull("s_notnull", "s"),
      DataQuality.Unique("pk", Seq("k"))))
      .as[(String, Long, Long, Boolean)].collect()
    assert(empty.forall(r => r._2 == 0L && r._4), empty.mkString(","))
  }

  test("cusumDrift: hand series — baseline mean 3, deviations " +
    "accumulate, a sustained shift alarms; the max(0,·) clamp resets " +
    "after a below-target run (closed-form == sequential recurrence)") {
    // day0: 2 events, day1: 4 (baseline, target = 3e6 micros)
    // monitored: day2: 3 (dd 0), day3: 5 (+2e6), day4: 1 (-2e6),
    // day5: 6 (+3e6) -> C = 0, 2e6, 0, 3e6; runmin >= 0 -> S = C
    val counts = Seq(0 -> 2, 1 -> 4, 2 -> 3, 3 -> 5, 4 -> 1, 5 -> 6)
    val ev = counts.flatMap { case (d, n) =>
      (1 to n).map(_ => ("a", f"2024-01-${d + 1}%02d 10:00:00"))
    }.toDF("g", "ts_s").withColumn("ts", to_timestamp(col("ts_s")))
    val got = DataQuality.cusumDrift(ev, "g", "ts", baselineDays = 2,
        slackMicros = 0L, thresholdMicros = 2500000L)
      .orderBy("day")
      .select("y", "cusum_micros", "alarm")
      .as[(Long, Long, Boolean)].collect().toSeq
    assert(got == Seq((3L, 0L, false), (5L, 2000000L, false),
      (1L, 0L, false), (6L, 3000000L, true)), got)
    // clamp case: a deep dip then recovery — S restarts from the dip,
    // not from the pre-dip surplus
    val counts2 = Seq(0 -> 3, 1 -> 3, 2 -> 1, 3 -> 4)
    val ev2 = counts2.flatMap { case (d, n) =>
      (1 to n).map(_ => ("b", f"2024-02-${d + 1}%02d 10:00:00"))
    }.toDF("g", "ts_s").withColumn("ts", to_timestamp(col("ts_s")))
    val got2 = DataQuality.cusumDrift(ev2, "g", "ts", baselineDays = 2,
        slackMicros = 0L, thresholdMicros = 2500000L)
      .orderBy("day").select("cusum_micros")
      .as[Long].collect().toSeq
    // day2: dd=-2e6 -> S=0 (clamped); day3: dd=+1e6 -> S=1e6
    assert(got2 == Seq(0L, 1000000L), got2)
  }

  test("spearman: monotone association is exactly 1, anti-monotone -1, " +
    "a hand permutation scores 0.5, ties keep perfection via average " +
    "ranks, zero-variance side yields NULL not NaN") {
    val rows = Seq(
      ("g", 1.0, 10.0), ("g", 2.0, 20.0), ("g", 3.0, 30.0),
      ("h", 1.0, 9.0), ("h", 2.0, 5.0), ("h", 3.0, 1.0),
      // x = 1,2,3 vs y = 2,1,3: dx = (-2,0,2), dy = (0,-2,2) doubled
      // -> rho = 4 / sqrt(8*8) = 0.5
      ("m", 1.0, 2.0), ("m", 2.0, 1.0), ("m", 3.0, 3.0),
      // tied x values get one average rank; still perfectly monotone
      ("t", 1.0, 5.0), ("t", 1.0, 5.0), ("t", 2.0, 9.0),
      ("z", 1.0, 7.0), ("z", 1.0, 8.0), ("z", 1.0, 9.0))
      .toDF("g", "x", "y")
    val got = DataQuality.spearman(rows, "g", "x", "y")
      .orderBy("grp").select("grp", "rho")
      .as[(String, Option[Double])].collect().toSeq
    assert(got == Seq(("g", Some(1.0)), ("h", Some(-1.0)),
      ("m", Some(0.5)), ("t", Some(1.0)), ("z", None)), got)
  }

  test("cohensKappa: hand confusion matrix matches the closed form, " +
    "perfect agreement is exactly 1e6, constant raters go NULL, and " +
    "skew-inflated raw agreement is corrected away") {
    // 10 rows: 8 both-'x' agreements, 1 (x,y), 1 (y,x):
    // po = 0.8; marginals rater A: x9 y1, rater B: x9 y1 ->
    // pe = (81+1)/100 = 0.82 -> kappa = (8-8.2)/(10-8.2) scaled:
    // (n*agree - e)/(n*n - e) = (80-82)/(100-82) = -2/18 -> -111111
    val rows = (Seq.fill(8)(("x", "x")) ++ Seq(("x", "y"), ("y", "x")))
      .toDF("a", "b")
    val got = DataQuality.cohensKappa(rows, col("a"), col("b"))
      .as[(Long, Long, Long, Long, Option[Long])].collect().head
    assert(got == ((10L, 8L, 800000L, 820000L, Some(-111111L))), got)
    val perfect = Seq(("x", "x"), ("y", "y"), ("z", "z"))
      .toDF("a", "b")
    assert(DataQuality.cohensKappa(perfect, col("a"), col("b"))
      .select("kappa_micros").as[Option[Long]].head()
      .contains(1000000L))
    val constant = Seq(("x", "x"), ("x", "x")).toDF("a", "b")
    assert(DataQuality.cohensKappa(constant, col("a"), col("b"))
      .select("kappa_micros").as[Option[Long]].head().isEmpty)
  }

  test("woeIv: hand 2-tile case — WOE is the exact log-odds ratio in " +
    "micros, a one-class tile goes NULL and stays out of IV, and the " +
    "total row sums the exact integer contributions") {
    // 8 rows, feature x: tile1 = x 1..4 (1 pos), tile2 = x 5..8 (4 pos
    // -> one-class)
    val rows = (1 to 8).map(i => (i.toLong, i.toDouble, i >= 4))
      .toDF("id", "x", "y")
    val got = DataQuality.woeIv(rows, col("y"), col("id"),
        Seq("x"), buckets = 2)
      .as[(String, Option[Long], Long, Long, Option[Long], Option[Long])]
      .collect().map(r => r._2 -> r).toMap
    // tile1: pos 1, neg 3; totals pos 5 neg 3 ->
    //   woe = ln((1*3)/(3*5)) = ln(0.2) -> -1609438 micros
    //   sd = 200000 - 1000000 = -800000; iv = sign* (abs(-800000 *
    //   -1609438) // 1e6) = 1287550
    val woe1 = math.round(math.log(3.0 / 15.0) * 1000000.0)
    assert(got(Some(1L)) == ((("x", Some(1L), 4L, 1L, Some(woe1),
      Some(800000L * -woe1 / 1000000L)))), got(Some(1L)))
    // tile2: neg = 0 -> NULL woe, no IV contribution
    assert(got(Some(2L))._5.isEmpty && got(Some(2L))._6.isEmpty)
    // total: IV = tile1's contribution alone
    assert(got(None) == (("x", None, 8L, 5L, None,
      Some(800000L * -woe1 / 1000000L))), got(None))
  }

  test("wassersteinDrift: hand two-group case equals the integral of " +
    "|F_g - F_rest| to term-floored micros, symmetric across the " +
    "group/rest split") {
    val rows = Seq(("a", 1L), ("a", 1L), ("a", 2L), ("b", 2L), ("b", 3L))
      .toDF("grp", "v")
    val got = DataQuality.wassersteinDrift(rows, "grp", col("v"))
      .as[(String, Long, Long, Option[Long])].collect()
      .map(r => r._1 -> r).toMap
    // W1 = |2/3-0|*1 + |1-1/2|*1 = 7/6 -> 666666 + 500000 term-floored
    assert(got("a") == (("a", 3L, 2L, Some(1166666L))), got("a"))
    assert(got("b") == (("b", 2L, 3L, Some(1166666L))), got("b"))
  }

  test("liftCurve: a perfect ranker's top tile lifts at 1/base-rate, " +
    "gains reach 1e6 exactly at the last positive tile, and the final " +
    "row's lift is exactly 1e6") {
    // 10 rows, scores 10..1, positives are the top 2 scores
    val rows = (1 to 10).map(i =>
      (i.toLong, (11 - i).toLong, i <= 2)).toSeq
      .toDF("id", "score", "y")
    val got = DataQuality.liftCurve(rows, col("score"), col("y"),
        col("id"), buckets = 5)
      .orderBy("tile")
      .as[(Long, Long, Long, Long, Long, Option[Long], Option[Long])]
      .collect().toSeq
    // tiles of 2: tile 1 holds both positives -> gain 1e6, lift 5e6
    assert(got.head == ((1L, 2L, 2L, 2L, 2L, Some(1000000L),
      Some(5000000L))), got.head)
    assert(got.last == ((5L, 2L, 0L, 10L, 2L, Some(1000000L),
      Some(1000000L))), got.last)
    assert(got.map(_._7.get) == Seq(5000000L, 2500000L, 1666666L,
      1250000L, 1000000L), got)
  }

  test("mahalanobisOutliers: the off-correlation point out-scores the " +
    "on-axis extreme, ties break id-asc, and a singular (collinear) " +
    "group reports nothing") {
    val rows = Seq(
      ("g", 1L, 1L, 1L), ("g", 2L, 2L, 2L), ("g", 3L, 3L, 3L),
      ("g", 4L, 3L, 1L),
      // collinear group: covariance singular -> no output
      ("s", 5L, 1L, 2L), ("s", 6L, 2L, 4L), ("s", 7L, 3L, 6L))
      .toDF("grp", "id", "x", "y")
    val got = DataQuality.mahalanobisOutliers(rows, "grp", "id",
        col("x"), col("y"), k = 2)
      .as[(String, Long, Long, Long, Double)].collect().toSeq
    // hand: a=b=11, c=5, det 96; (3,1) -> 288/96 = 3.0 tops;
    // (1,1) and (3,3) tie at 224/96 -> id 1 wins the second slot
    assert(got == Seq(("g", 4L, 3L, 1L, 3.0),
      ("g", 1L, 1L, 1L, 2.333333)), got)
  }

  test("integrityAudit: null keys and orphans are separate defect " +
    "classes, the rate is over keyed rows only, and duplicate parent " +
    "keys never double-count children") {
    val child = Seq(Some(1L), Some(1L), Some(2L), Some(9L), None)
      .toDF("fk")
    val parent = Seq(1L, 1L, 2L, 3L).toDF("pk") // dup parent key
    val got = DataQuality.integrityAudit(
      Seq(("c_p", child, "fk", parent, "pk")))
      .as[(String, Long, Long, Long, Option[Long])].collect().toSeq
    // 5 child rows: 1 null key, keyed = 4, orphans = the one fk=9 row
    assert(got == Seq(("c_p", 5L, 1L, 1L, Some(250000L))), got)
  }

  test("giniStump: the perfect separator scores 0 at the boundary " +
    "value; a weak feature's best split is the exact integer " +
    "impurity sum; the max value is never a threshold") {
    val rows = Seq(
      (1.0, 5.0, false), (1.0, 7.0, false), (2.0, 5.0, false),
      (3.0, 7.0, true), (3.0, 5.0, true), (3.0, 7.0, true))
      .toDF("a", "b", "y")
    val got = DataQuality.giniStump(rows, col("y"), Seq("a", "b"))
      .as[(String, Double, Long, Long, Long)].collect().toSet
    // a: threshold 2 splits (3,0)|(3,3) -> 0; threshold 1 scores 750000
    // b: only threshold 5 -> (3,1)|(3,2) -> 666666 + 666666
    assert(got == Set(("a", 2.0, 3L, 0L, 0L),
      ("b", 5.0, 3L, 1L, 1333332L)), got)
  }

  test("conformalCard: q-hat is the exact ceil((n+1)(1-alpha)) order " +
    "statistic of calib residuals and eval coverage matches an " +
    "independent JVM-md5 re-derivation; a group with an empty split " +
    "drops") {
    def md5slot(id: Long): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
      java.lang.Long.parseLong(d.take(4).map("%02x".format(_)).mkString, 16) % 3
    }
    val rows = (1L to 90L).map(i => ("a", i, (i % 7).toDouble + 1.0)) ++
      (100L to 140L).map(i => ("b", i, (i % 5).toDouble * 2.0 + 0.5))
    // group "c": ids picked so slot 1 (calib) never occurs -> dropped
    val cIds = (1000L to 3000L).filter(md5slot(_) != 1L).take(6)
    val all = rows ++ cIds.map(i => ("c", i, 3.0))
    val got = DataQuality.conformalCard(
      all.toDF("grp", "id", "v"), "grp", "id", "v")
      .as[(String, Long, Long, Long, Long, Long, Long)]
      .collect().map(r => r._1 -> r).toMap
    assert(!got.contains("c"), got.keys)
    for (g <- Seq("a", "b")) {
      val grows = all.filter(_._1 == g)
      val cents = grows.map { case (_, i, v) => (i, math.round(v * 100)) }
      val train = cents.filter(c => md5slot(c._1) == 0L)
      val pred = 1000000L * train.map(_._2).sum / train.size
      val calib = cents.filter(c => md5slot(c._1) == 1L)
        .map(c => math.abs(1000000L * c._2 - pred)).sorted
      val r = ((calib.size + 1L) * 9L + 9L) / 10L
      val qhat = calib((r - 1).toInt)
      val ev = cents.filter(c => md5slot(c._1) == 2L)
      val cov = 1000000L * ev.count(c =>
        math.abs(1000000L * c._2 - pred) <= qhat) / ev.size
      assert(got(g) == ((g, train.size.toLong, calib.size.toLong,
        ev.size.toLong, pred, qhat, cov)), (g, got(g)))
    }
  }

  test("isotonicCalibration: PAVA pools the violating adjacent pair to " +
    "their pooled rate; weights pool by counts, not bucket-equally") {
    // rates 0.2, 0.6, 0.4, 0.8 -> the 0.6/0.4 violation pools to 0.5
    val data = Seq((0, 10, 2), (1, 10, 6), (2, 10, 4), (3, 10, 8))
      .flatMap { case (b, n, pos) =>
        (1 to n).map(i => (b.toLong, i <= pos)) }
      .toDF("b", "y")
    val got = DataQuality.isotonicCalibration(data, col("b"), col("y"))
      .orderBy("b").as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      (0L, 10L, 2L, 200000L, 200000L),
      (1L, 10L, 6L, 600000L, 500000L),
      (2L, 10L, 4L, 400000L, 500000L),
      (3L, 10L, 8L, 800000L, 800000L)), got)
    // weighted: (n=1, rate 1.0) then (n=3, rate 0) pools to 1/4
    val wtd = Seq((0, 1, 1), (1, 3, 0))
      .flatMap { case (b, n, pos) =>
        (1 to n).map(i => (b.toLong, i <= pos)) }
      .toDF("b", "y")
    val got2 = DataQuality.isotonicCalibration(wtd, col("b"), col("y"))
      .orderBy("b").select("raw_micros", "fit_micros")
      .as[(Long, Long)].collect().toSeq
    assert(got2 == Seq((1000000L, 250000L), (0L, 250000L)), got2)
  }

  test("cmhOddsRatio: two strata with ORs 6 and 2/3 pool to exactly " +
    "2.0, crude collapses to 35/15 — hand-computed micros") {
    // stratum 1: a=4 b=1 c=2 d=3 (ad/n=1.2e6, bc/n=.2e6)
    // stratum 2: a=1 b=2 c=3 d=4 (ad/n=.4e6, bc/n=.6e6)
    val rows =
      Seq.fill(4)(("s1", true, true)) ++ Seq.fill(1)(("s1", true, false)) ++
      Seq.fill(2)(("s1", false, true)) ++ Seq.fill(3)(("s1", false, false)) ++
      Seq.fill(1)(("s2", true, true)) ++ Seq.fill(2)(("s2", true, false)) ++
      Seq.fill(3)(("s2", false, true)) ++ Seq.fill(4)(("s2", false, false))
    val got = DataQuality.cmhOddsRatio(rows.toDF("s", "e", "o"),
        col("s"), col("e"), col("o"))
      .as[(Long, Long, Long, Double, Double)].collect().head
    assert(got == ((2L, 1600000L, 800000L, 2.0, 2.3333)), got)
  }

  test("anovaF: groups {1,2,3} vs {4,5,6} cents — SSB 13.5, SSW 4, " +
    "F exactly 13.5, eta-squared 27/35 (hand-computed)") {
    val rows = Seq(("A", 0.01), ("A", 0.02), ("A", 0.03),
      ("B", 0.04), ("B", 0.05), ("B", 0.06))
    val got = DataQuality.anovaF(rows.toDF("g", "v"), col("g"), col("v"))
      .as[(Long, Long, Double, Double)].collect().head
    assert(got == ((2L, 6L, 13.5, 0.7714)), got)
  }

  test("mcnemar: discordant cells 5 vs 2 — chi2 = 9/7, Edwards " +
    "chi2_cc = 4/7 (hand-computed); all-concordant input yields NULL") {
    val rows = Seq.fill(3)((true, true)) ++ Seq.fill(5)((true, false)) ++
      Seq.fill(2)((false, true)) ++ Seq.fill(4)((false, false))
    val got = DataQuality.mcnemar(rows.toDF("a", "b"), col("a"), col("b"))
      .as[(Long, Long, Long, Option[Double], Option[Double])]
      .collect().head
    assert(got == ((14L, 5L, 2L, Some(1.2857), Some(0.5714))), got)
    val degen = DataQuality.mcnemar(
        Seq((true, true), (false, false)).toDF("a", "b"),
        col("a"), col("b"))
      .as[(Long, Long, Long, Option[Double], Option[Double])]
      .collect().head
    assert(degen == ((2L, 0L, 0L, None, None)), degen)
  }

  test("kruskalWallis: {1,2,2} vs {2,3,4} cents with a 3-way tie — " +
    "rank sums 7/14, H = 7/3, tie-corrected H = H/(1 - 24/210) " +
    "(hand-computed)") {
    val rows = Seq(("A", 0.01), ("A", 0.02), ("A", 0.02),
      ("B", 0.02), ("B", 0.03), ("B", 0.04))
    val got = DataQuality.kruskalWallis(rows.toDF("g", "v"),
        col("g"), col("v"))
      .as[(Long, Long, Option[Double], Option[Double])].collect().head
    assert(got == ((2L, 6L, Some(2.3333), Some(2.6344))), got)
    // all-tied input: H defined (0-ish) but the correction divides by
    // zero -> NULL h_corrected
    val tied = DataQuality.kruskalWallis(
        Seq(("A", 0.05), ("B", 0.05)).toDF("g", "v"), col("g"), col("v"))
      .as[(Long, Long, Option[Double], Option[Double])].collect().head
    assert(tied._1 == 2L && tied._2 == 2L && tied._4.isEmpty, tied)
  }

  test("lDiversityAudit: a k-safe but homogeneous class is flagged " +
    "(l = 1), diverse class passes, all-null sensitive reads l = 0") {
    val rows = Seq(
      // class (1,a): 3 rows, all sensitive 10 -> l = 1 (homogeneous)
      (1L, "a", Option(10L)), (1L, "a", Option(10L)),
      (1L, "a", Option(10L)),
      // class (2,b): 3 rows, 3 distinct -> l = 3 (passes l = 2)
      (2L, "b", Option(10L)), (2L, "b", Option(20L)),
      (2L, "b", Option(30L)),
      // class (3,c): sensitive all NULL -> l = 0
      (3L, "c", Option.empty[Long]))
      .toDF("qi1", "qi2", "sens")
    val got = DataQuality.lDiversityAudit(rows, Seq("qi1", "qi2"),
        col("sens"), l = 2)
      .as[(String, Long, Long, Long, Long, Long, Long)].collect().head
    // 7 rows, 3 classes, min_l 0, 2 classes below (l=1 and l=0),
    // 4 rows at risk -> rate 4e6 div 7 = 571428
    assert(got == (("qi1,qi2", 7L, 3L, 0L, 2L, 4L, 571428L)), got)
  }

  test("cochranQ: C = (3,2,1) over 4 rows reads Q = 12/4 = 3 exactly; " +
    "unanimous rows degenerate to NULL (hand-computed)") {
    val rows = Seq((true, true, true), (true, false, false),
      (true, true, false), (false, false, false))
      .toDF("a", "b", "c")
    val got = DataQuality.cochranQ(rows, Seq(col("a"), col("b"),
        col("c")))
      .as[(Long, Long, Option[Double])].collect().head
    assert(got == ((3L, 4L, Some(3.0))), got)
    val degen = DataQuality.cochranQ(
        Seq((true, true, true), (false, false, false)).toDF("a", "b",
          "c"), Seq(col("a"), col("b"), col("c")))
      .as[(Long, Long, Option[Double])].collect().head
    assert(degen == ((3L, 2L, None)), degen)
  }
}
