package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Unit coverage for SURVEY.md §2.3 scalar semantics — the reference's
  * corner cases: null-on-bad-cast (E1), strict-concat null (E6), malformed
  * date → null (E4), fixed-width padding (E3), cascade preference (E8). */
class ExprsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("padKey zero-pads to fixed width and keeps wider values") {
    val got = Seq("61", "36061", "123456").toDF("v")
      .select(Exprs.padKey($"v", 5).as("p")).as[String].collect()
    assert(got.sameElements(Array("00061", "36061", "123456")))
  }

  test("parseYyyymmdd: valid, prefix-match, malformed, null") {
    val got = Seq("20200115", "20200115T99", "2020ab13", "999", null)
      .toDF("v").select(Exprs.parseYyyymmdd($"v").as("d"))
      .collect().map(r => Option(r.get(0)).map(_.toString))
    assert(got.sameElements(Array(Some("2020-01-15"), Some("2020-01-15"),
      None, None, None)))
  }

  test("castOrNull nulls unparseable input (Polars non-strict cast)") {
    val got = Seq("123", "12x", "").toDF("v")
      .select(Exprs.castOrNull($"v", LongType).as("n"))
      .collect().map(r => Option(r.get(0)))
    assert(got.sameElements(Array(Some(123L), None, None)))
  }

  test("castOrNull integral fast path ≡ try_cast on edge strings") {
    // the guarded plain-cast path must keep exact try_cast semantics:
    // sign/whitespace parse, decimals+sci+hex+overflow+garbage → null
    val edge = Seq("", " 5 ", "+5", "-5", "1.5", ".5", "5.", "5.0",
      "999999999999999999999999", "9223372036854775807",
      "-9223372036854775808", "9223372036854775808", "1e3", "abc", null,
      "0x1F", "NaN", "12a", "  -7  ",
      // zero-padded keys are this codebase's domain: >19 chars must
      // still parse when the significant digits fit
      "00000000000000000001", "0000000000000000000000042", "-0005")
    val df = edge.toDF("v")
    val both = df.select(
        Exprs.castOrNull($"v", LongType).as("fast"),
        $"v".try_cast(LongType).as("ref"))
      .collect().map(r => (Option(r.get(0)), Option(r.get(1))))
    both.zip(edge).foreach { case ((fast, ref), in) =>
      assert(fast == ref, s"input '$in': fast=$fast try_cast=$ref")
    }
  }

  test("concatStrict is null when ANY input is null (Polars concat_str)") {
    val df = Seq(("36061", Some("012345")), ("36061", None))
      .toDF("fips", "tract")
    val strict = df.select(Exprs.concatStrict("_", $"fips", $"tract").as("c"))
      .collect().map(r => Option(r.getString(0)))
    assert(strict.sameElements(Array(Some("36061_012345"), None)))
    val fb = df.select(
        Exprs.concatStrictOrElse("_", $"fips", $"fips", $"tract").as("c"))
      .as[String].collect()
    assert(fb.sameElements(Array("36061_012345", "36061")))
  }

  test("whitelistElseNull and zeroToNull") {
    val wl = Seq("2", "9").toDF("v")
      .select(Exprs.whitelistElseNull($"v", Seq("1", "2", "3")).as("w"))
      .collect().map(r => Option(r.get(0)))
    assert(wl.sameElements(Array(Some("2"), None)))
    val zn = Seq(0.0, 40.7).toDF("v")
      .select(Exprs.zeroToNull($"v").as("z"))
      .collect().map(r => Option(r.get(0)))
    assert(zn.sameElements(Array(None, Some(40.7))))
  }

  test("preferNonZero cascade picks first non-null non-zero measure") {
    val df = Seq(
      (Some(500L), Some(600L), Some(550L)), // assd wins
      (Some(0L), Some(600L), None),         // assd zero -> market
      (None, None, Some(550L)),             // appr fallback
      (Some(0L), None, None),               // nothing usable
    ).toDF("assd", "market", "appr")
    val (v, l) = Exprs.preferNonZero(Seq(
      "Assd" -> col("assd"), "Market" -> col("market"), "Appr" -> col("appr")))
    val got = df.select(v.as("v"), l.as("l")).collect()
      .map(r => (Option(r.get(0)), Option(r.get(1))))
    assert(got.sameElements(Array(
      (Some(500L), Some("Assd")), (Some(600L), Some("Market")),
      (Some(550L), Some("Appr")), (None, None))))
  }
}
