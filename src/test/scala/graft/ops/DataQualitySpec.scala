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
}
