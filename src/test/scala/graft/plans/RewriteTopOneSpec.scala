package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Pins [[RewriteTopOneToMaxBy]]: the row_number()=1 idiom plans as a
  * max_by Aggregate (no Window node), produces identical rows to the
  * un-rewritten plan, and bails out wherever the ordering-struct encoding
  * can't preserve window semantics. */
class RewriteTopOneSpec extends AnyFunSuite {
  lazy val spark: SparkSession = {
    val s = TestSpark.spark
    graft.GraftExtensions.register(s)
    s
  }
  import spark.implicits._

  private def topOne(df: DataFrame, w: org.apache.spark.sql.expressions.WindowSpec,
                     extra: org.apache.spark.sql.Column = lit(true)): DataFrame =
    df.withColumn("rn", row_number().over(w)).filter(col("rn") === 1 && extra)

  private def optimized(df: DataFrame): String =
    df.queryExecution.optimizedPlan.toString

  private def sortedRows(df: DataFrame): Array[String] =
    df.collect().map(_.toString).sorted

  private def data = Seq(
    (1L, "a", 10.0, 3), (1L, "b", 20.0, 1), (1L, "c", 20.0, 2),
    (2L, "d", 5.0, 9), (3L, "e", 7.5, 4), (3L, "f", 7.5, 4)
  ).toDF("k", "name", "v", "seq")

  test("fires: desc + asc-int order becomes max_by aggregate, same rows") {
    val w = Window.partitionBy($"k").orderBy($"v".desc, $"seq".asc, $"name".desc)
    val q = topOne(data, w)
    val plan = optimized(q)
    assert(plan.contains("max_by"), s"expected max_by in:\n$plan")
    assert(!plan.contains("Window"), s"expected no Window in:\n$plan")
    spark.conf.set("spark.graft.rewriteTopOne", "false")
    val reference = try sortedRows(topOne(data, w))
    finally spark.conf.set("spark.graft.rewriteTopOne", "true")
    assert(sortedRows(q).sameElements(reference))
  }

  test("fires on the lineitem corpus: rewritten == window form") {
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    val w = Window.partitionBy($"l_orderkey")
      .orderBy($"l_shipdate".desc, $"l_linenumber".asc,
        $"l_extendedprice".desc, $"l_partkey".asc, $"l_suppkey".asc)
    val q = topOne(li.select("l_orderkey", "l_linenumber", "l_shipdate",
      "l_extendedprice", "l_partkey", "l_suppkey"), w)
    assert(optimized(q).contains("max_by"))
    spark.conf.set("spark.graft.rewriteTopOne", "false")
    val reference = try sortedRows(topOne(li.select("l_orderkey",
      "l_linenumber", "l_shipdate", "l_extendedprice", "l_partkey",
      "l_suppkey"), w))
    finally spark.conf.set("spark.graft.rewriteTopOne", "true")
    assert(sortedRows(q).sameElements(reference) && reference.nonEmpty)
  }

  test("desc nulls-last over a nullable key keeps window null semantics") {
    val df = Seq((1, Some(2.0), "x"), (1, None, "y"), (2, None, "z"))
      .toDF("k", "v", "tag")
    val w = Window.partitionBy($"k").orderBy($"v".desc, $"tag".desc)
    val q = topOne(df, w)
    assert(optimized(q).contains("max_by"))
    // group 1: non-null 2.0 beats null (NULLS LAST); group 2: all-null survives
    val got = q.select("k", "tag").as[(Int, String)].collect().sortBy(_._1)
    assert(got.sameElements(Array((1, "x"), (2, "z"))))
  }

  test("extra filter conjuncts survive above the rewrite") {
    val w = Window.partitionBy($"k").orderBy($"v".desc, $"seq".asc, $"name".desc)
    val q = topOne(data, w, extra = col("v") > 6.0)
    assert(optimized(q).contains("max_by"))
    assert(q.select("k").as[Long].collect().sorted.sameElements(Array(1L, 3L)))
  }

  test("nulls-first keys get the indicator field and match window output") {
    // asc NULLS FIRST (the default asc) over a nullable int: null must WIN
    val df = Seq((1, Option(5L), "x"), (1, None, "y"), (2, Option(3L), "z"),
      (2, Option(7L), "w")).toDF("k", "v", "tag")
    val wAsc = Window.partitionBy($"k").orderBy($"v".asc, $"tag".desc)
    val qAsc = topOne(df, wAsc)
    assert(optimized(qAsc).contains("max_by"))
    val gotAsc = qAsc.select("k", "tag").as[(Int, String)].collect().sortBy(_._1)
    assert(gotAsc.sameElements(Array((1, "y"), (2, "z"))))

    // desc NULLS FIRST (explicit) — works for any orderable type
    val wDesc = Window.partitionBy($"k").orderBy($"v".desc_nulls_first, $"tag".desc)
    val qDesc = topOne(df, wDesc)
    assert(optimized(qDesc).contains("max_by"))
    val gotDesc = qDesc.select("k", "tag").as[(Int, String)].collect().sortBy(_._1)
    assert(gotDesc.sameElements(Array((1, "y"), (2, "w"))))
  }

  test("ascending MinValue keys rank FIRST (negation widened, no wraparound)") {
    // -Long.MinValue wraps back to Long.MinValue in 64 bits; un-widened
    // negation would rank these rows LAST instead of FIRST
    val longs = Seq((1, Long.MinValue, "min"), (1, 0L, "zero"), (1, Long.MaxValue, "max"),
      (2, Long.MinValue + 1, "near"), (2, Long.MinValue, "min")).toDF("k", "v", "tag")
    val qL = topOne(longs, Window.partitionBy($"k").orderBy($"v".asc))
    assert(optimized(qL).contains("max_by"))
    val gotL = qL.select("k", "tag").as[(Int, String)].collect().sortBy(_._1)
    assert(gotL.sameElements(Array((1, "min"), (2, "min"))), gotL.mkString(","))

    val ints = Seq((1, Int.MinValue, "min"), (1, -7, "neg"), (1, Int.MaxValue, "max"))
      .toDF("k", "v", "tag")
    val qI = topOne(ints, Window.partitionBy($"k").orderBy($"v".asc))
    assert(optimized(qI).contains("max_by"))
    assert(qI.select("tag").as[String].collect().sameElements(Array("min")))

    // window form agrees (the actual contract)
    spark.conf.set("spark.graft.rewriteTopOne", "false")
    val refL = try sortedRows(topOne(longs, Window.partitionBy($"k").orderBy($"v".asc)))
    finally spark.conf.set("spark.graft.rewriteTopOne", "true")
    assert(sortedRows(qL).sameElements(refL))
  }

  test("bails on a global (no PARTITION BY) window: empty input stays empty") {
    // a global Aggregate would emit one all-null row on empty input where
    // the window form emits zero rows — must not rewrite
    val empty = data.filter($"v" > 1e9)
    val w = Window.orderBy($"v".desc, $"seq".asc, $"name".desc)
    val q = topOne(empty, w)
    assert(!optimized(q).contains("max_by"))
    assert(q.count() == 0)
  }

  test("bails: rank(), rn<=2, asc string, asc double") {
    val wTotal = Window.partitionBy($"k").orderBy($"v".desc, $"seq".asc, $"name".desc)
    val rankQ = data.withColumn("rn", rank().over(wTotal)).filter($"rn" === 1)
    assert(!optimized(rankQ).contains("max_by"))

    val top2 = data.withColumn("rn", row_number().over(wTotal)).filter($"rn" <= 2)
    assert(!optimized(top2).contains("max_by"))

    val ascString = topOne(data, Window.partitionBy($"k").orderBy($"name".asc))
    assert(!optimized(ascString).contains("max_by"))

    val ascDouble = topOne(data, Window.partitionBy($"k").orderBy($"v".asc, $"seq".desc))
    assert(!optimized(ascDouble).contains("max_by"))
  }

  test("fires on the SQL-authored idiom") {
    data.createOrReplaceTempView("rw_t")
    val q = spark.sql(
      """SELECT k, name, v FROM (
           SELECT *, row_number() OVER (
             PARTITION BY k ORDER BY v DESC, seq ASC, name DESC) AS rn
           FROM rw_t) WHERE rn = 1""")
    assert(optimized(q.toDF()).contains("max_by"))
    val w = Window.partitionBy($"k").orderBy($"v".desc, $"seq".asc, $"name".desc)
    spark.conf.set("spark.graft.rewriteTopOne", "false")
    val reference = try sortedRows(
      topOne(data, w).select("k", "name", "v"))
    finally spark.conf.set("spark.graft.rewriteTopOne", "true")
    assert(sortedRows(q.toDF()).sameElements(reference))
  }

  test("kill-switch disables the rewrite") {
    val w = Window.partitionBy($"k").orderBy($"v".desc, $"seq".asc, $"name".desc)
    spark.conf.set("spark.graft.rewriteTopOne", "false")
    try assert(!optimized(topOne(data, w)).contains("max_by"))
    finally spark.conf.set("spark.graft.rewriteTopOne", "true")
  }
}
