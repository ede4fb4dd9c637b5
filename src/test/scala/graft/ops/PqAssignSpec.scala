package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Pins the r17 row-local PQ assignment (`pq_best_cid`) to the
  * join-then-rank form it replaced: both must pick the same codeword for
  * every (vector, subspace), including round-6 distance ties (broken by
  * cid asc). The fixture forces a tie: two codewords at identical
  * distance from a probe vector. */
class PqAssignSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def oldAssign(bk: org.apache.spark.sql.DataFrame,
                        sv: org.apache.spark.sql.DataFrame,
                        sub: Int): org.apache.spark.sql.DataFrame = {
    def l2Chain(a: org.apache.spark.sql.Column,
                b: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      (0 until sub).map { i =>
        val d = element_at(a, i + 1) - element_at(b, i + 1)
        d * d
      }.reduce(_ + _)
    Windows.topOnePerGroup(
      sv.join(broadcast(bk), Seq("j"))
        .select(col("id"), col("j"), col("sv"), col("cid"),
          round(l2Chain(col("sv"), col("cv")), 6).as("d")),
      Seq(col("id"), col("j")), Seq(col("d").asc, col("cid").asc))
      .select(col("id"), col("j"), col("cid"))
  }

  private def newAssign(bk: org.apache.spark.sql.DataFrame,
                        sv: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame =
    sv.join(broadcast(bk.groupBy(col("j"))
        .agg(sort_array(collect_list(struct(col("cid"), col("cv"))))
          .as("__cands"))), Seq("j"))
      .select(col("id"), col("j"),
        graft.functions.PqAssign.pq_best_cid(col("sv"), col("__cands"))
          .as("cid"))

  test("pq_best_cid matches the join+rank assignment, ties to lowest cid") {
    val sub = 4
    // codebook: per subspace j=0, four codewords; cids 1 and 2 are
    // EQUIDISTANT from the tie probe below (mirror images)
    val bk = Seq(
      (0, 0, Array(5.0, -5.0, 5.0, -5.0)),
      (0, 1, Array(1.0, 0.0, 0.0, 0.0)),
      (0, 2, Array(-1.0, 0.0, 0.0, 0.0)),
      (0, 3, Array(5.0, 5.0, 5.0, 5.0)),
      (1, 0, Array(2.0, 2.0, 2.0, 2.0)),
      (1, 1, Array(2.0, 2.0, 2.0, 2.1))
    ).toDF("j", "cid", "cv")
    val sv = Seq(
      (10L, 0, Array(5.0, -5.0, 5.0, -5.0)),   // exact hit on cid 0
      (11L, 0, Array(0.0, 7.3, -2.2, 0.41)),   // generic
      (12L, 0, Array(0.0, 1.0, 0.0, 0.0)),     // tie between cid 1 and 2
      (10L, 1, Array(2.0, 2.0, 2.0, 2.04)),    // near-tie, decided at 1e-2
      (13L, 1, Array(1.9, 2.1, 2.0, 2.05))     // generic
    ).toDF("id", "j", "sv")
    val oldR = oldAssign(bk, sv, sub).collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> r.getInt(2)).toMap
    val newR = newAssign(bk, sv).collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> r.getInt(2)).toMap
    assert(newR == oldR)
    assert(newR((12L, 0)) == 1) // tie broken toward the lower cid
  }

  test("pq_best_cid agrees with join+rank on a 200-vector pseudo corpus") {
    val sub = 8
    // deterministic pseudo-random doubles via md5-derived integers
    val base = spark.range(200).toDF("id")
      .select(col("id"), expr(
        "transform(sequence(1, 8), p -> " +
          "(conv(substring(md5(concat(cast(id as string), '_', " +
          "cast(p as string))), 1, 6), 16, 10) % 1000) / 250.0 - 2.0)")
        .cast("array<double>").as("sv"))
      .select(col("id"), lit(0).as("j"), col("sv"))
    val bk = spark.range(16).toDF("cid")
      .select(lit(0).as("j"), col("cid").cast("int").as("cid"), expr(
        "transform(sequence(1, 8), p -> " +
          "(conv(substring(md5(concat('c', cast(cid as string), '_', " +
          "cast(p as string))), 1, 6), 16, 10) % 1000) / 250.0 - 2.0)")
        .cast("array<double>").as("cv"))
    val oldR = oldAssign(bk, base, sub).collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> r.getInt(2)).toMap
    val newR = newAssign(bk, base).collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> r.getInt(2)).toMap
    assert(newR == oldR)
  }
}
