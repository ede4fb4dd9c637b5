package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Sketch error-bound contracts on real testdata: HLL within its
  * configured standard error, CMS never under-counting and a superset of
  * the true heavy hitters. */
class SketchesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val events = graft.ops.Events.load(spark, "/root/testdata/sf0.01")

  test("approxDistinct within ~3 standard errors of exact distinct") {
    val exact = events.select("user_id").distinct().count()
    val est = Sketches.approxDistinct(events, "user_id", lgConfigK = 12)
    // lgConfigK=12 => ~1.6% RSE; allow 3 sigma
    assert(math.abs(est - exact).toDouble / exact < 0.05,
      s"est=$est exact=$exact")
  }

  test("heavyHitters: never under-counts, superset of true heavy set") {
    val exact = events.groupBy(col("event_type").cast("string").as("k"))
      .count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = exact.values.sum
    val minCount = n / 20 // keys above 5% of the stream
    val got = Sketches.heavyHitters(events, "event_type", minCount,
        eps = 0.001, confidence = 0.99)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val trueHeavy = exact.filter(_._2 >= minCount).keySet
    // CMS guarantees estimate >= true count...
    got.foreach { case (k, est) =>
      assert(est >= exact(k), s"under-count for $k: est=$est true=${exact(k)}")
      // ...and with high probability est <= true + eps * N
      assert(est <= exact(k) + (0.001 * n).toLong + 1,
        s"over-bound for $k: est=$est true=${exact(k)}")
    }
    // recall 1: every true heavy hitter surfaces
    assert(trueHeavy.subsetOf(got.keySet), s"missing=${trueHeavy -- got.keySet}")
  }

  test("approxPercentile: rank error within the accuracy bound, grouped + global") {
    import org.apache.spark.sql.functions._
    val n = 20000
    val df = spark.range(n).select(
      (col("id") % 2).cast("string").as("g"), col("id").cast("double").as("v"))
    val probs = Seq(0.1, 0.5, 0.9)
    val accuracy = 1000 // rank error <= n/accuracy = 20 ranks
    val got = Sketches.approxPercentile(df, "v", Seq("g"), probs, accuracy)
      .collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    for (g <- Seq("0", "1"); (p, i) <- probs.zipWithIndex) {
      // group g holds every other id: value at rank r is ~2r (+ parity)
      val groupN = n / 2
      val exact = 2.0 * p * (groupN - 1)
      val tol = 2.0 * (groupN.toDouble / accuracy + 1)
      assert(math.abs(got(g)(i) - exact) <= 2 * tol,
        s"g=$g p=$p got=${got(g)(i)} exact~$exact tol=$tol")
    }
    val global = Sketches.approxPercentile(df, "v", Nil, Seq(0.5), accuracy)
      .collect()(0).getSeq[Double](0)(0)
    assert(math.abs(global - (n - 1) / 2.0) <= 2 * (n.toDouble / accuracy + 1))
  }

  test("binnedPercentile: exact on a fixture; within binWidth/2 of the " +
    "exact nearest-rank value on lineitem (the q67 contract)") {
    // fixture: values 1..10 in one group; p=0.5 -> rank 5 -> value 5 ->
    // bin floor(5/2)=2 -> midpoint 5.0; p=0.9 -> rank 9 -> bin 4 -> 9.0
    val fix = (1 to 10).map(v => ("g", v.toDouble)).toDF("k", "v")
    def one(df: org.apache.spark.sql.DataFrame, p: Double) =
      Sketches.binnedPercentile(df, "v", Seq("k"), p, binWidth = 2.0)
        .collect()(0).getDouble(1)
    assert(one(fix, 0.5) == 5.0 && one(fix, 0.9) == 9.0)
    // null values are excluded, not counted into ranks
    val withNulls = fix.union(Seq(("g", null.asInstanceOf[java.lang.Double]))
      .toDF("k", "v").select($"k", $"v".cast("double")))
    assert(one(withNulls, 0.5) == 5.0)

    // real-data bound, grouped (the q67 shape): the exact nearest-rank
    // value must lie in the chosen bin => |mid - exact| <= w/2
    val li = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet")
    for ((vc, p, w) <- Seq(("l_quantity", 0.5, 1.0),
                           ("l_extendedprice", 0.9, 100.0))) {
      val approx = Sketches.binnedPercentile(li, vc, Seq("l_returnflag"),
          p, w).collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      val exact = li.select($"l_returnflag", col(vc).cast("double").as("v"))
        .collect().groupBy(_.getString(0))
        .map { case (g, rows) =>
          val vs = rows.map(_.getDouble(1)).sorted
          g -> vs(math.ceil(p * vs.length).toInt - 1) // 1-based nearest rank
        }
      exact.foreach { case (g, ex) =>
        assert(math.abs(approx(g) - ex) <= w / 2,
          s"group $g: approx=${approx(g)} exactNR=$ex w=$w")
      }
    }
  }

  test("winsorize: interior values pass through untouched, tails clip to " +
    "the per-group band, nulls stay null") {
    // group g: 1..100; p10 -> bin midpoint 11.0, p90 -> 91.0 (binWidth 2)
    val fix = ((1 to 100).map(v => ("g", v.toDouble)) ++
        Seq(("h", 5.0), ("h", 6.0), ("h", 7.0)))
      .toDF("k", "v")
      .union(Seq(("g", null.asInstanceOf[java.lang.Double])).toDF("k", "v")
        .select($"k", $"v".cast("double")))
    val got = Sketches.winsorize(fix, "v", Seq("k"), 0.1, 0.9,
        binWidth = 2.0, outCol = "w").collect()
      .map(r => (r.getString(0), Option(r.get(1)).map(_.toString.toDouble),
        Option(r.get(2)).map(_.toString.toDouble)))
    val g = got.filter(_._1 == "g")
    assert(g.find(_._2.contains(50.0)).get._3.contains(50.0)) // interior: identity
    assert(g.find(_._2.contains(1.0)).get._3.contains(11.0))  // low tail clips up
    assert(g.find(_._2.contains(100.0)).get._3.contains(91.0))// high tail clips down
    assert(g.find(_._2.isEmpty).get._3.isEmpty)               // null stays null
    // group h is independent: its own (narrow) band, values interior
    assert(got.filter(_._1 == "h").forall(r => r._2 == r._3))
  }
}
