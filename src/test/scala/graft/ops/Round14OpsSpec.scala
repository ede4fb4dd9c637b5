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
}
