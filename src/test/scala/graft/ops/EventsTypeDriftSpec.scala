package graft.ops

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.{SparkEntry, TestSpark}

/** Timestamp-encoding drift hardening for the events family.
  *
  * The testdata generator has already shipped `events.ts` in two different
  * parquet encodings across rounds — TIMESTAMP(NANOS) (arrives as long
  * nanos under `nanosAsLong`) and TIMESTAMP(MICROS, isAdjustedToUTC=false)
  * (arrives as TIMESTAMP_NTZ) — and the NTZ switch silently broke
  * sessionize's `unix_micros` gap math. This spec pins the contract that
  * [[Events.normalizeTs]] makes every events-reading query
  * encoding-agnostic: the same logical rows must come back whichever
  * physical encoding the writer chose.
  *
  * The three fixtures re-write the sf0.001 events table as
  *   - LTZ micros  (TimestampType — what Spark itself writes),
  *   - NTZ micros  (TimestampNTZType — the round-7 regen),
  *   - long nanos  (what the NANOS encoding looks like post-reader),
  * and every batch query that touches events must analyze AND return
  * identical rows on all three.
  */
class EventsTypeDriftSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val eventsQueries = Seq("q17_json_extract", "q18_time_window",
    "q19_sessionize", "q36_asof_join", "q40_lead_lag", "q44_session_window",
    "q65_asof_forward")

  // one source of truth: the real sf0.001 events, already normalized to LTZ
  private lazy val base = Events.load(spark, "/root/testdata/sf0.001")

  private lazy val dirs: Map[String, String] = {
    def stage(tag: String)(transform: DataFrame => DataFrame): (String, String) = {
      val dir = Files.createTempDirectory(s"graft-tsdrift-$tag").toString
      transform(base).coalesce(1).write.mode("overwrite")
        .parquet(s"$dir/events.parquet")
      tag -> dir
    }
    Map(
      stage("ltz")(identity),
      stage("ntz")(_.withColumn("ts", col("ts").cast(TimestampNTZType))),
      stage("nanos")(_.withColumn("ts",
        (unix_micros(col("ts")) * 1000L).cast(LongType)))
    )
  }

  test("normalizeTs lands every encoding on TIMESTAMP (LTZ)") {
    for ((tag, dir) <- dirs) {
      val loaded = Events.load(spark, dir)
      assert(loaded.schema("ts").dataType == TimestampType,
        s"encoding=$tag normalized to ${loaded.schema("ts").dataType}")
      assert(loaded.count() == base.count(), s"encoding=$tag row count")
    }
  }

  for (q <- eventsQueries)
    test(s"$q returns identical rows under LTZ / NTZ / nanos encodings") {
      def run(dir: String): Seq[String] = {
        val df = SparkEntry.queries(q)(spark, dir)
        // canonical row images: sort columns by name, null-mark before
        // concat (concat_ws silently skips nulls), rows lexicographically
        val cols = df.columns.sorted
          .map(c => coalesce(col(c).cast("string"), lit("<null>")))
        df.select(concat_ws("|", cols.toSeq: _*).as("row"))
          .collect().map(_.getString(0)).sorted.toSeq
      }
      val Seq(ltz, ntz, nanos) = Seq("ltz", "ntz", "nanos").map(t => run(dirs(t)))
      assert(ltz.nonEmpty, s"$q returned no rows")
      assert(ltz == ntz, s"$q: NTZ encoding diverges from LTZ")
      assert(ltz == nanos, s"$q: nanos encoding diverges from LTZ")
    }
}
