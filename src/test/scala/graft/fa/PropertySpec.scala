package graft.fa

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.TestSpark
import graft.ops.Exprs

/** Property-based invariants (SURVEY.md §5.2) — the correctness contracts
  * the reference implies but never tests:
  *  - rank stage output is unique per (RecordingYear, PropertyID) and
  *    keeps that group's maximum RecordingDate;
  *  - cascade Value equals AssdTotalValue whenever Assd is usable;
  *  - padKey always yields length ≥ n and preserves the digits.
  */
class PropertySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // scalatestplus bridge is not on the offline classpath; drive ScalaCheck
  // generators directly with deterministic seeds.
  private val params = Gen.Parameters.default.withSize(40)
  private def forAllSeeded[T](g: Gen[T], n: Int = 5)(body: T => Unit): Unit =
    (1 to n).foreach { i =>
      g.apply(params, Seed(i.toLong)).foreach(body)
    }

  private val deedRow = for {
    pid <- Gen.choose(1L, 8L)
    amt <- Gen.choose(1L, 500000L)
    year <- Gen.choose(2018, 2021)
    month <- Gen.choose(1, 12)
    day <- Gen.choose(1, 28)
  } yield (pid, amt, f"$year$month%02d$day%02d")

  test("rankSales: unique per (year, id); keeps the group max RecordingDate") {
    forAllSeeded(Gen.nonEmptyListOf(deedRow)) { rows =>
      locally {
        val raw = rows.map { case (pid, amt, d) =>
          (pid.toString, amt.toString, d, "36061", "20230101", "1X", "2", d)
        }.toDF("PropertyID", "SaleAmt", "RecordingDate", "FIPS",
          "FATimeStamp", "FATransactionID", "TransactionType", "SaleDate")
        val cleaned = Stages.cleanSales(raw)
        val ranked = Stages.rankSales(cleaned)
        val n = ranked.count()
        assert(n ==
          ranked.select("PropertyID", "RecordingYear").distinct().count())
        // every ranked SaleAmt belongs to a row whose RecordingDate is the
        // max of its (pid, year) group
        val maxDates = cleaned.groupBy($"PropertyID", $"RecordingYear")
          .agg(max($"RecordingDate").as("maxd"))
        val joined = ranked.join(maxDates, Seq("PropertyID", "RecordingYear"))
        val ok = joined.join(
          cleaned.select($"PropertyID", $"RecordingYear",
            $"RecordingDate".as("maxd"), $"SaleAmt"),
          Seq("PropertyID", "RecordingYear", "maxd", "SaleAmt"))
        assert(ok.count() == n)
      }
    }
  }

  private val valRow = for {
    pid <- Gen.choose(1L, 10L)
    assd <- Gen.option(Gen.choose(0L, 900000L))
    market <- Gen.option(Gen.choose(1L, 900000L))
    appr <- Gen.option(Gen.choose(1L, 900000L))
    year <- Gen.choose(2018, 2021)
  } yield (pid, assd, market, appr, year.toLong)

  test("rankValHist: output Value == Assd, only usable-Assd rows survive") {
    forAllSeeded(Gen.nonEmptyListOf(valRow)) { rows =>
      val distinctRows: List[(Long, Option[Long], Option[Long], Option[Long], Long)] =
        rows.distinctBy(r => (r._1, r._5))
      locally {
        val cleaned = distinctRows.map { case (pid, a, m, ap, y) =>
          (pid, a, Option(y), m, Option(y), ap, Option(y), Option(y))
        }.toDF("PropertyID", "AssdTotalValue", "AssdYear", "MarketTotalValue",
          "MarketValueYear", "ApprTotalValue", "ApprYear", "TaxableYear")
        val ranked = Stages.rankValHist(cleaned).collect()
        val expected = distinctRows.filter(r => r._2.exists(_ != 0L))
        assert(ranked.length == expected.size)
        ranked.foreach { r =>
          // Value must equal the Assd measure for that (pid, year)
          val key = (r.getAs[Long]("PropertyID"), r.getAs[Long]("Year"))
          val src = expected.find(e => (e._1, e._5) == key).get
          assert(r.getAs[Long]("Value") == src._2.get)
        }
      }
    }
  }

  test("padKey: result length >= n and numeric value preserved") {
    forAllSeeded(Gen.zip(Gen.choose(0L, 99999999L), Gen.choose(1, 8)), n = 10) { case (v, n) =>
      val out = Seq(v.toString).toDF("v")
        .select(Exprs.padKey($"v", n).as("p")).as[String].collect()(0)
      assert(out.length >= n)
      assert(out.toLong == v)
      assert(out.endsWith(v.toString))
    }
  }
}
