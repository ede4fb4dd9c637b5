package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Scalar-expression helpers generalizing the reference's expression surface
  * (SURVEY.md §2.3, reference fa-etl.py:60-83,161-176,227-235,297-308).
  *
  * All helpers are pure `Column => Column` combinators over built-in
  * `org.apache.spark.sql.functions` — fully codegen'd, no UDFs — so Catalyst
  * can fold/push them down. Null semantics deliberately mirror the
  * reference's Polars non-strict ops: malformed input → null, never error.
  * (Run with `spark.sql.ansi.enabled=false` for exact parity; helpers are
  * additionally regex-guarded so most are ANSI-safe anyway.)
  */
object Exprs {

  /** E3 (fa-etl.py:69,170-173): zero-left-pad a key to fixed width.
    * e.g. FIPS→5, CensusTract→6, CensusBlock→4, ZIP5→5.
    * NOT plain `lpad`: Spark lpad TRUNCATES values longer than the target
    * width, Polars `pad_start` leaves them intact — guard long values. */
  def padKey(c: Column, len: Int): Column = {
    val s = c.cast(StringType)
    when(length(s) >= len, s).otherwise(lpad(s, len, "0"))
  }

  /** E2 (fa-etl.py:65,73): 1-based prefix slice of a string column. */
  def strPrefix(c: Column, len: Int): Column =
    substring(c.cast(StringType), 1, len)

  /** E4 (fa-etl.py:70-72,167): parse a yyyyMMdd digit-string to Date,
    * malformed → null (Polars `str.to_date(strict=False, exact=False)`).
    * The regex guard makes unparseable shapes null even under ANSI mode;
    * `exact=False` prefix-match is mirrored by slicing the first 8 chars. */
  def parseYyyymmdd(c: Column): Column = {
    val s = c.cast(StringType)
    to_date(when(s.rlike("^\\d{8}"), substring(s, 1, 8)), "yyyyMMdd")
  }

  /** E7 variant (fa-etl.py:168-169): 0 → null (bad lat/lon sentinel). */
  def zeroToNull(c: Column): Column = when(c === 0, lit(null)).otherwise(c)

  /** P8/E7 (fa-etl.py:74,174): keep value if in whitelist, else null. */
  def whitelistElseNull(c: Column, allowed: Seq[Any]): Column =
    when(c.isin(allowed: _*), c).otherwise(lit(null))

  /** E6 (fa-etl.py:175): separator concat with Polars `concat_str`
    * semantics — null if ANY input is null (NOT `concat_ws`, which skips
    * nulls). */
  def concatStrict(sep: String, cols: Column*): Column =
    concat(cols.flatMap(c => Seq(c.cast(StringType), lit(sep))).dropRight(1): _*)

  /** E6+E12 (fa-etl.py:175): strict concat with null fallback column. */
  def concatStrictOrElse(sep: String, fallback: Column, cols: Column*): Column =
    coalesce(concatStrict(sep, cols: _*), fallback)

  /** E8 (fa-etl.py:395-414): N-branch conditional cascade
    * `when(c1,v1).when(c2,v2)...otherwise(default)`. */
  def cascade(branches: Seq[(Column, Column)], default: Column): Column =
    branches.foldRight(default) { case ((cond, value), acc) =>
      when(cond, value).otherwise(acc)
    }

  /** Reference value-preference cascade shape (fa-etl.py:395-414): pick the
    * first measure that is non-null and non-zero; also emit which one won. */
  def preferNonZero(measures: Seq[(String, Column)]): (Column, Column) = {
    val value = cascade(
      measures.map { case (_, c) => (c.isNotNull && c =!= 0, c) },
      lit(null))
    val label = cascade(
      measures.map { case (name, c) => (c.isNotNull && c =!= 0, lit(name)) },
      lit(null))
    (value, label)
  }

  /** E1 (fa-etl.py:63,67): non-strict cast — unparseable → null.
    *
    * Integral targets take a regex-guarded plain-cast path instead of
    * `try_cast`: Spark's TRY string→integral raises and catches a JVM
    * exception per unparseable row (~11 µs each — measured 4× slower than
    * the guarded form on an all-garbage column), so a 100 TB scan of dirty
    * keys would burn executor time in exception bookkeeping. The guard
    * admits exactly the strings `try_cast` (and the reference's Polars
    * `cast(strict=False)`, fa-etl.py:63) parses — optional sign, leading
    * zeros, up to 19 significant digits, surrounding whitespace; decimals
    * like "1.5" → null — and inside the guard the cast is STILL
    * `try_cast`, so semantics stay ANSI-mode independent (the only
    * strings that reach the exception path are regex-passing overflows,
    * vanishingly rare in dirty data, where garbage is common). Input is
    * expected to be a string column (all call sites are CSV/parquet
    * string keys; a numeric input would stringify and lose try_cast's
    * numeric-truncation semantics); other targets keep `try_cast`, whose
    * non-integral semantics match plain cast anyway. */
  def castOrNull(c: Column, to: DataType): Column = to match {
    case LongType | IntegerType | ShortType | ByteType =>
      val s = c.cast(StringType)
      when(s.rlike("^\\s*[+-]?0*\\d{1,19}\\s*$"), s.try_cast(to))
        .otherwise(lit(null).cast(to))
    case _ => c.try_cast(to)
  }
}
