package graft.fa

/** First-American file-family metadata (reference fa-etl.py:61,162,228,298
  * select lists; FIXTURES.md §A).
  *
  * The raw extracts are pipe-delimited text with many more columns than the
  * pipeline uses; like the reference, each stage projects to its needed
  * columns immediately. We read the CSV with header-derived all-string
  * columns (no inference pass — cheaper than the reference's 1000-row
  * inference at 100 TB) and apply explicit non-strict casts per stage
  * (malformed → null, matching `ignore_errors=True` + Polars casts).
  */
object Schemas {

  /** Columns each family's stage consumes (projection applied at scan). */
  val deedColumns = Seq("PropertyID", "SaleAmt", "RecordingDate", "FIPS",
    "FATimeStamp", "FATransactionID", "TransactionType", "SaleDate")

  val propColumns = Seq("PropertyID", "PropertyClassID", "FATimeStamp",
    "SitusLatitude", "SitusLongitude", "SitusFullStreetAddress", "SitusCity",
    "SitusState", "SitusZIP5", "FIPS", "SitusCensusTract", "SitusCensusBlock",
    "SitusGeoStatusCode")

  val taxHistColumns = Seq("PropertyID", "TaxYear", "TaxAmt")

  val valHistColumns = Seq("PropertyID", "AssdTotalValue", "AssdYear",
    "MarketTotalValue", "MarketValueYear", "ApprTotalValue", "ApprYear",
    "TaxableYear")

  /** Filename-substring classification (fa-etl.py:533-545); the
    * annual/value-history substrings vary by vintage (Prop vs Annual,
    * ValHist vs ValueHistory — fa-etl.sh:10-11 vs fa-etl.sbatch:28-29). */
  case class FamilyNames(annual: String = "Prop", valueHistory: String = "ValHist") {
    val deed = "Deed"
    val taxHist = "TaxHist"
    def all: Seq[String] = Seq(deed, annual, taxHist, valueHistory)
  }
}
