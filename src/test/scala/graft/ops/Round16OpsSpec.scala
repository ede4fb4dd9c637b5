package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Round-16 hand fixtures. */
class Round16OpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("hllEstimate: small m uses the Flajolet 2007 fixed bias " +
    "constants (m=16 -> 0.673), not the asymptotic formula") {
    // 200 distinct keys at p=4 sit far above the small-range branch
    // (2.5*m = 40), so the card is raw = alpha*m^2*2^(width+1)/total.
    // Recompute raw from the register moments with the PAPER constant;
    // the asymptotic 0.7213/(1+1.079/16) = 0.6759 would land ~0.9
    // higher — 4dp rounding cannot mask it.
    val df = (0 until 200).map(i => s"key_$i").toDF("k")
    val got = Sketches.hllReplay(df, col("k"), p = 4)
      .select(col("hll_estimate")).as[Double].collect().head
    val (nonempty, ssum) = Sketches.hllMoments(
        Sketches.hllRegisters(df.select(col("k")), 4)
          .groupBy(col("r")).agg(max(col("rho")).as("mr")), 4)
      .as[(Long, Long)].collect().head
    val total = ssum + (16L - nonempty) * (1L << 57)
    val want = BigDecimal(0.673 * math.pow(2.0, 65) / total.toDouble)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got == want, s"got $got want $want")
    val asymptotic = 0.7213 / (1 + 1.079 / 16) *
      math.pow(2.0, 65) / total.toDouble
    assert(math.abs(got - asymptotic) > 0.1,
      "fixture cannot tell the constants apart")
  }

  test("fellegiSunterEm: a candidates frame with extra columns is " +
    "rejected, not silently joined on the wrong pair") {
    val recs = Seq((1L, "x"), (2L, "x")).toDF("id", "f")
    val bad = Seq(("blk", 1L, 2L)).toDF("block", "id_a", "id_b")
    val e = intercept[IllegalArgumentException] {
      Dedup.fellegiSunterEm(recs, "id", Seq("f" -> col("f")), bad)
    }
    assert(e.getMessage.contains("exactly the two pair-id columns"))
  }
}
