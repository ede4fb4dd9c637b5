package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Round-12 decimal-promotion contracts (verdict item 3): the five ops
  * that previously DOCUMENTED an int64 bound now carry their products in
  * decimal(38,0) (Spark) / HUGEINT (DuckDB oracle), the ladder
  * mahalanobisOutliers established. Each test builds a fixture that
  * EXCEEDS the old int64 bound — where the unpromoted arithmetic wrapped
  * (silent UB: Spark long multiplication wraps, so scores came out
  * garbage) — and checks the exact BigInt-computed expected value.
  */
class DecimalPromotionSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("giniStump past the old 6e6-row bound: 16M rows, products " +
    "1.6e19 > int64, score matches the exact BigInt value") {
    // x = id < 8M ? 0 : 1; y = (id % 2 == 0). Only threshold x=0:
    // cn=8e6, cp=4e6 -> term = 1e6·4e6·4e6 div 8e6 (product 1.6e19
    // wraps int64); both sides symmetric.
    val n = 16000000L
    val df = spark.range(n).select(
      (col("id") % 2 === 0).as("y"),
      when(col("id") < n / 2, 0.0).otherwise(1.0).as("f"))
    val got = DataQuality.giniStump(df, col("y"), Seq("f"))
      .select("threshold", "n_left", "pos_left", "score_micros")
      .as[(Double, Long, Long, Long)].collect()
    val cn = BigInt(n / 2); val cp = cn / 2
    val term = (BigInt(1000000) * cp * (cn - cp)) / cn
    val expected = (term * 2).toLong
    assert(got.toSeq == Seq((0.0, n / 2, n / 4, expected)), got.toSeq)
    assert(BigInt(1000000) * cp * (cn - cp) > BigInt(Long.MaxValue),
      "fixture must exceed the old int64 product bound")
  }

  test("binsegChangepoint past the old 3e6-event bound: 8M events in " +
    "one group, 1e6·D² far past int64, gain matches the ANOVA " +
    "identity computed in BigInt") {
    // 4 days: counts 1M, 1M, 3M, 3M -> best split after day 1 (the
    // level shift), S=8e6 (old bound ~3e6).
    val counts = Seq(1000000L, 1000000L, 3000000L, 3000000L)
    val day0 = 19000L // epoch days
    val rows = counts.zipWithIndex.map { case (c, d) => (c, d) }
    val df = rows.toDF("c", "d").select(lit("g").as("grp"),
        to_timestamp(from_unixtime((lit(day0) + col("d")) * 86400L))
          .as("ts"),
        explode(sequence(lit(1L), col("c"))).as("i"))
    val got = Events.binsegChangepoint(df, "grp", "ts")
      .select("split_day", "n_left", "n_right", "mean_left_micros",
        "mean_right_micros", "gain_micros")
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    // exact expected at the winning split (after day index 1)
    def gain(split: Int): BigInt = {
      val sl = BigInt(counts.take(split + 1).sum)
      val sr = BigInt(counts.drop(split + 1).sum)
      val nl = BigInt(split + 1); val nr = BigInt(counts.size - split - 1)
      val n = nl + nr
      val d = sl * nr - sr * nl
      (BigInt(1000000) * d * d) / (nl * nr * n)
    }
    val best = (0 until 3).maxBy(s => gain(s)) // ties impossible here
    assert(best == 1)
    val sl = BigInt(2000000); val sr = BigInt(6000000)
    assert(got.toSeq == Seq((day0 + 1, 2L, 2L,
      (sl * 1000000 / 2).toLong, (sr * 1000000 / 2).toLong,
      gain(1).toLong)), got.toSeq)
    val d = sl * 2 - sr * 2
    assert(BigInt(1000000) * d * d > BigInt(Long.MaxValue),
      "fixture must exceed int64 in the promoted product")
  }

  test("wassersteinDrift past the old 6e6-row bound: 12M rows, " +
    "cum·n_rest products ~3.6e19 > int64, W1 matches the exact " +
    "integer formula") {
    // Two groups of 6M rows each; group a all value 0, group b all
    // value 10. Grid {0, 10}: for group a at v=0: cum_g=6e6,
    // cum_rest=0 -> |Δ| = 6e6·6e6 = 3.6e13; 1e6·|Δ| = 3.6e19 > int64.
    val half = 6000000L
    val df = spark.range(2 * half).select(
      when(col("id") < half, "a").otherwise("b").as("grp"),
      when(col("id") < half, 0L).otherwise(10L).as("v"))
    val got = DataQuality.wassersteinDrift(df, "grp", col("v"))
      .select("grp", "w1_micros").as[(String, Option[Long])].collect()
      .toMap
    // per group: one gap (0 -> 10, gap 10), |Δ| = n_g·n_r exactly ->
    // term = (1e6·n_g·n_r div n_g·n_r)·10 = 1e7
    assert(got == Map("a" -> Some(10000000L), "b" -> Some(10000000L)),
      got)
  }

  test("twap out-of-domain (wsum > int64, which forces the output past " +
    "int64 too since durations partition the day): NULL, never wrapped " +
    "garbage; an in-domain huge-value day stays exact") {
    def ts(sec: Long) =
      new java.sql.Timestamp(1704067200000L + sec * 1000L) // UTC midnight
    // over-bound group: cents 1e14 / 2e14 (values 1e12 / 2e12) ->
    // wsum = 1e14·40000 + 2e14·46400 = 1.328e19 > Long.MaxValue; the
    // pure-long face returned the WRAPPED -4460046409768933300 here
    // (measured before the promotion) — the decimal face must yield
    // NULL instead.
    // in-domain group "h": cents 1e13 (value 1e11) held all day ->
    // twap = 1e13 cents -> 1e19 micros... still > int64! use value
    // 1e9 -> cents 1e11 -> twap_micros = 1e11·1e6 = 1e17, in range.
    val rows = Seq(
      ("g", 1L, ts(0L), 1.0e12),
      ("g", 2L, ts(40000L), 2.0e12),
      ("h", 3L, ts(0L), 1.0e9))
      .toDF("event_type", "event_id", "ts", "value")
    val got = Events.twap(rows, "event_type", "ts", "event_id", "value")
      .select("grp", "n", "twap_micros")
      .as[(String, Long, Option[Long])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    val wsum = BigInt("100000000000000") * 40000 +
      BigInt("200000000000000") * 46400
    assert(wsum > BigInt(Long.MaxValue),
      "fixture must exceed the int64 wsum domain")
    assert(got("g") == ((2L, None)), got("g"))
    assert(got("h") == ((1L, Some(100000000000L * 1000000L))), got("h"))
  }
}
