package graft.fa

import java.nio.file.{Files, Path}
import java.util.zip.{ZipEntry, ZipOutputStream}
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** End-to-end golden test (SURVEY.md §5.4): synthetic 4-family FA fixture
  * (FIXTURES.md §A) through the full Pipeline; exact expected merged rows,
  * 17-column schema (scratch.ipynb cell-8), grain uniqueness.
  *
  * Fixture is tie-free (distinct RecordingDates within each
  * (PropertyID, year) group) so the rank stage is deterministic — the
  * reference's random tie-break (fa-etl.py:99) can't be replicated
  * cross-engine (SURVEY.md §5).
  */
class FaPipelineSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def writeZip(dir: Path, name: String, header: String,
                       rows: Seq[String]): Unit = {
    val zipPath = dir.resolve(s"$name.txt.zip")
    val zos = new ZipOutputStream(Files.newOutputStream(zipPath))
    zos.putNextEntry(new ZipEntry(s"$name.txt"))
    zos.write((header +: rows).mkString("\n").getBytes("UTF-8"))
    zos.closeEntry(); zos.close()
  }

  private def buildFixture(): String = {
    val base = Files.createTempDirectory("fa_fixture")
    val raw = Files.createDirectories(base.resolve("raw"))
    // Deed: P1 two 2020 sales (latest wins) + one 2021; P2 only
    // non-arms-length (SaleFlag=0); P3 zero/negative/null-key rows dropped,
    // one good 2019 sale, one malformed-date sale (year null, never joins).
    writeZip(raw, "Deed36061",
      "PropertyID|SaleAmt|RecordingDate|FIPS|FATimeStamp|FATransactionID|TransactionType|SaleDate",
      Seq(
        "1|100000|20200115|36061|20230101|1X|2|20200110",
        "1|120000|20200320|36061|20230101|6Y|3|20200315",
        "1|130000|20210505|36061|20230101|1A|2|20210501",
        "2|90000|20200710|36061|20230101|1B|5|20200708", // TT 5 -> flag 0
        "2|80000|20200810|36061|20230101|9C|2|20200808", // FATID 9 -> flag 0
        "3|0|20190101|36061|20230101|1D|2|20190101",     // amt 0 dropped
        "3|-5|20190201|36061|20230101|1D|2|20190201",    // amt <0 dropped
        "|70000|20190301|36061|20230101|1D|2|20190301",  // null key dropped
        "3|50000|20190404|36061|20230101|6Z|2|20190401",
        "3|60000|2019ab13|36061|20230101|1Q|3|20190501", // bad date -> null year
      ))
    // Prop: P3 is class C (filtered); P2 exercises zero-geo + null tract +
    // bad geo-status; P4 has no sales (never reaches merged).
    writeZip(raw, "Prop36061",
      "PropertyID|PropertyClassID|FATimeStamp|SitusLatitude|SitusLongitude|SitusFullStreetAddress|SitusCity|SitusState|SitusZIP5|FIPS|SitusCensusTract|SitusCensusBlock|SitusGeoStatusCode",
      Seq(
        "1|R|20230101|40.7|-73.9|1 Main St|New York|NY|1001|36061|12345|100|A",
        "2|R|20230101|0|0|2 Oak Ave|New York|NY|10002|36061||0200|Z",
        "3|C|20230101|40.8|-73.8|3 Pine Rd|New York|NY|10003|36061|54321|300|B",
        "4|R|20230101|40.9|-73.7|4 Elm Ct|New York|NY|10004|36061|11111|400|5",
      ))
    writeZip(raw, "TaxHist36061",
      "PropertyID|TaxYear|TaxAmt",
      Seq("1|2020|123456", "1|2021|200000", "2|2020|50000", "3|2019|99999"))
    // ValHist: P1 2020 full cascade + 2021 assd-only; P2 assd-only (no
    // sale -> excluded from merged); P3 assd+market 2019; P5 market-only
    // (dropped by assd anchor).
    writeZip(raw, "ValHist36061",
      "PropertyID|AssdTotalValue|AssdYear|MarketTotalValue|MarketValueYear|ApprTotalValue|ApprYear|TaxableYear",
      Seq(
        "1|500000|2020|600000|2020|550000|2020|2020",
        "1|520000|2021||||  |2021",
        "2|300000|2020|||||2020",
        "3|450000|2019|400000|2019|||2019",
        "5||  |700000|2019|||2019",
      ))
    base.toString
  }

  test("full pipeline: golden merged panel") {
    val dir = buildFixture()
    val merged = new Pipeline(spark, dir).run().cache()

    val expectedCols = Set("PropertyID", "Year", "Value", "MarketTotalValue",
      "ApprTotalValue", "SitusLatitude", "SitusLongitude",
      "SitusFullStreetAddress", "SitusCity", "SitusState", "SitusZIP5",
      "FIPS", "SitusCensusTract", "SitusCensusBlock", "SaleAmt", "TaxAmt",
      "TaxAmtAdjusted")
    assert(merged.columns.toSet == expectedCols, "17-column merged schema")
    assert(merged.columns.length == 17)

    // grain: unique (PropertyID, Year)
    assert(merged.count() == merged.select("PropertyID", "Year").distinct().count())

    val rows = merged
      .select("PropertyID", "Year", "Value", "MarketTotalValue",
        "ApprTotalValue", "SaleAmt", "TaxAmt", "TaxAmtAdjusted",
        "SitusZIP5", "SitusCensusTract", "SitusFullStreetAddress")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        Option(r.get(3)), Option(r.get(4)), r.getLong(5), Option(r.get(6)),
        Option(r.get(7)), Option(r.get(8)), Option(r.get(9)), Option(r.get(10))))
      .sortBy(t => (t._1, t._2))

    assert(rows.length == 3)
    // (P1, 2020): latest of two 2020 sales = 120000; full cascade row.
    assert(rows(0) == ((1L, 2020L, 500000L, Some(600000L), Some(550000L),
      120000L, Some(123456L), Some(1234.56), Some("01001"), Some("012345"),
      Some("1 Main St"))))
    // (P1, 2021): assd-only value; single sale.
    assert(rows(1) == ((1L, 2021L, 520000L, None, None,
      130000L, Some(200000L), Some(2000.0), Some("01001"), Some("012345"),
      Some("1 Main St"))))
    // (P3, 2019): prop filtered out (class C) -> null prop attributes.
    assert(rows(2) == ((3L, 2019L, 450000L, Some(400000L), None,
      50000L, Some(99999L), Some(999.99), None, None, None)))
  }

  test("idempotent restage: second run reuses staging, same result") {
    val dir = buildFixture()
    val p = new Pipeline(spark, dir)
    val first = p.run().count()
    // staging exists now; a fresh Pipeline over the same dir must skip
    // recompute (S6) and produce the identical panel. unzipped/ was
    // cleaned, so a recompute attempt would fail -> skipping is observable.
    val second = new Pipeline(spark, dir).run().count()
    assert(first == second)
  }

  test("Annual/ValueHistory filename variant (fa-etl.sbatch:28-29 naming)") {
    val base = Files.createTempDirectory("fa_annual")
    val raw = Files.createDirectories(base.resolve("raw"))
    writeZip(raw, "Deed10001",
      "PropertyID|SaleAmt|RecordingDate|FIPS|FATimeStamp|FATransactionID|TransactionType|SaleDate",
      Seq("1|100000|20200115|10001|20230101|1X|2|20200110"))
    writeZip(raw, "Annual10001",
      "PropertyID|PropertyClassID|FATimeStamp|SitusLatitude|SitusLongitude|SitusFullStreetAddress|SitusCity|SitusState|SitusZIP5|FIPS|SitusCensusTract|SitusCensusBlock|SitusGeoStatusCode",
      Seq("1|R|20230101|40.7|-73.9|1 Main St|Town|ST|10001|10001|123|1|A"))
    writeZip(raw, "TaxHist10001", "PropertyID|TaxYear|TaxAmt",
      Seq("1|2020|50000"))
    writeZip(raw, "ValueHistory10001",
      "PropertyID|AssdTotalValue|AssdYear|MarketTotalValue|MarketValueYear|ApprTotalValue|ApprYear|TaxableYear",
      Seq("1|500000|2020|||||2020"))
    val merged = new Pipeline(spark, base.toString,
      names = Schemas.FamilyNames(annual = "Annual",
        valueHistory = "ValueHistory")).run()
    assert(merged.count() == 1)
    assert(merged.columns.length == 17)
  }

  test("CLI main runs the fa-etl.sh invocation shape end to end") {
    val base = Files.createTempDirectory("fa_cli")
    val raw = Files.createDirectories(base.resolve("raw"))
    writeZip(raw, "Deed20001",
      "PropertyID|SaleAmt|RecordingDate|FIPS|FATimeStamp|FATransactionID|TransactionType|SaleDate",
      Seq("1|250000|20210310|20001|20230101|1X|2|20210301"))
    writeZip(raw, "Prop20001",
      "PropertyID|PropertyClassID|FATimeStamp|SitusLatitude|SitusLongitude|SitusFullStreetAddress|SitusCity|SitusState|SitusZIP5|FIPS|SitusCensusTract|SitusCensusBlock|SitusGeoStatusCode",
      Seq("1|R|20230101|41.1|-74.2|2 Oak St|Ville|ST|20001|20001|456|2|A"))
    writeZip(raw, "TaxHist20001", "PropertyID|TaxYear|TaxAmt",
      Seq("1|2021|60000"))
    writeZip(raw, "ValHist20001",
      "PropertyID|AssdTotalValue|AssdYear|MarketTotalValue|MarketValueYear|ApprTotalValue|ApprYear|TaxableYear",
      Seq("1|600000|2021|||||2021"))
    val logFile = base.resolve("deploy_etl.log")
    Main.main(Array(
      "--input_dir", base.toString,
      "--log_file", logFile.toString,
      "--annual_file_string", "Prop",
      "--value_history_file_string", "ValHist"))
    assert(spark.read.parquet(s"$base/unified/merged.parquet").count() == 1)
    val logged = Files.readString(logFile)
    assert(logged.contains("stage=Deed") && logged.contains("rssMb="))
  }

  test("CLI main rejects missing required flags argparse-style") {
    val e = intercept[IllegalArgumentException] {
      Main.parseArgs(Array("--input_dir", "/tmp/x"))
    }
    assert(e.getMessage.contains("--log_file"))
    assert(e.getMessage.contains("--value_history_file_string"))
  }

  test("CLI main errors on a value flag with a missing value") {
    // a forgotten value must be a startup error, not a silent bind to
    // "true" (which would send telemetry to a file literally named true)
    val e = intercept[IllegalArgumentException] {
      Main.parseArgs(Array("--input_dir", "/tmp/x", "--log_file",
        "--annual_file_string", "Prop",
        "--value_history_file_string", "ValHist"))
    }
    assert(e.getMessage.contains("--log_file") &&
      e.getMessage.contains("expected one argument"))
  }

  test("missing family aborts (fa-etl.py:541-545 presence validation)") {
    val base = Files.createTempDirectory("fa_missing")
    Files.createDirectories(base.resolve("raw"))
    val e = intercept[IllegalArgumentException] {
      new Pipeline(spark, base.toString).run()
    }
    assert(e.getMessage.contains("Deed"))
  }
}
