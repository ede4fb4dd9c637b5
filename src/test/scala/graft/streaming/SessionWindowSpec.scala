package graft.streaming

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.ops.Events

/** Parity: Spark's built-in `session_window` aggregation (the
  * watermark-compatible gap-session operator Structured Streaming runs
  * natively) produces the SAME session partitioning as
  * [[Events.sessionize]]'s lag+cumsum formulation on the test events —
  * the proof that the custom batch op and the engine-native streaming
  * op implement one semantics, so a pipeline can swap between them per
  * deployment mode.
  *
  * Boundary note: at a gap of EXACTLY `gapSeconds`, sessionize keeps
  * the session (strict `>` on the gap) while session_window's
  * half-open [start, start+gap) windows would split; the synthetic
  * events carry microsecond timestamps, so an exact-gap collision is a
  * measure-zero event the assertion below would surface loudly if the
  * testdata ever acquired one. */
class SessionWindowSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("built-in session_window == sessionize's session starts and " +
    "event counts on the events table") {
    import spark.implicits._
    val ev = Events.load(spark, "/root/testdata/sf0.001")
    val gap = 1800L

    val native = ev.groupBy(col("user_id"),
        session_window(col("ts"), s"$gap seconds").as("w"))
      .agg(count(lit(1)).as("n"))
      .select(col("user_id"),
        col("w.start").cast("timestamp_ntz").as("session_start"),
        col("n"))
      .as[(Long, java.time.LocalDateTime, Long)].collect().toSet

    val custom = Events.sessionize(ev, gap)
      .select(col("user_id"), col("session_start"), col("n_events"))
      .as[(Long, java.time.LocalDateTime, Long)].collect().toSet

    assert(native.nonEmpty)
    assert(native == custom,
      s"missing=${(custom -- native).take(3)} extra=${(native -- custom).take(3)}")
  }
}
