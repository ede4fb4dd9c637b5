package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShims
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Winnowed fingerprint selection (Schleimer et al. 2003) as ONE
  * row-local expression — custom Catalyst `Expression`.
  *
  * `winnow_fingerprints(tokens, k, w)` hashes every word k-gram
  * (md5 first-8-hex as an unsigned 32-bit integer — bit-identical to
  * `conv(substring(md5(g), 1, 8), 16, 10)`), packs `h·2^20 + pos`, takes
  * each w-window's minimum (head windows shorter than w emit their
  * running min — the `rowsBetween(-(w-1), 0)` prefix convention), strips
  * the position and returns the DISTINCT selected hashes sorted
  * ascending.
  *
  * Replaces posexplode → per-doc window min (an exchange + sort of the
  * whole gram stream on the doc key) → distinct with a per-row loop
  * (guide §2.4): the gram stream never leaves its scan task; only the
  * ~2/(w+1)-density fingerprints are ever exploded into rows. Short
  * docs (< k tokens) fingerprint their whole text as one gram, matching
  * the column form's `when(size < k, array_join(toks))` branch.
  */
case class WinnowFingerprint(child: Expression, k: Int, w: Int)
    extends UnaryExpression {

  require(k >= 1 && w >= 1, "winnow_fingerprints needs k >= 1, w >= 1")

  private val PosScale = 1048576L

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "winnow_fingerprints"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"winnow_fingerprints expects array<string>, got $other")
    }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = classOf[WinnowFingerprint].getName
    val ref = ctx.addReferenceObj("winnowExpr", this, cls)
    nullSafeCodeGen(ctx, ev, toks =>
      s"""
         |${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData)
         |  $ref.select($toks);
       """.stripMargin)
  }

  /** The whole selection pipeline on one token array; shared by the
    * interpreted and codegen paths (the per-gram md5 dominates — a
    * generated-source copy of this loop measured no faster). */
  def select(toksRaw: Any): ArrayData = {
    val toks = toksRaw.asInstanceOf[ArrayData]
    val n = toks.numElements()
    val ng = if (n < k) 1 else n - k + 1
    val keys = new Array[Long](ng)
    val sep = UTF8String.fromString(" ")
    var i = 0
    while (i < ng) {
      val len = if (n < k) n else k
      val parts = new Array[UTF8String](len)
      var j = 0
      while (j < len) {
        parts(j) = toks.getUTF8String(i + j)
        j += 1
      }
      val g = UTF8String.concatWs(sep, parts: _*)
      val dig = java.security.MessageDigest.getInstance("MD5")
        .digest(g.getBytes)
      val h = ((dig(0) & 0xffL) << 24) | ((dig(1) & 0xffL) << 16) |
        ((dig(2) & 0xffL) << 8) | (dig(3) & 0xffL)
      keys(i) = h * PosScale + i
      i += 1
    }
    val seen = new java.util.HashSet[java.lang.Long]()
    val out = new Array[Long](ng)
    var c = 0
    i = 0
    while (i < ng) {
      var mn = keys(i)
      var j = math.max(0, i - (w - 1))
      while (j < i) {
        if (keys(j) < mn) mn = keys(j)
        j += 1
      }
      val h = mn / PosScale
      if (seen.add(h)) { out(c) = h; c += 1 }
      i += 1
    }
    val res = java.util.Arrays.copyOfRange(out, 0, c)
    java.util.Arrays.sort(res)
    new GenericArrayData(res)
  }

  override def nullSafeEval(input: Any): Any = select(input)

  override protected def withNewChildInternal(
      newChild: Expression): WinnowFingerprint = copy(child = newChild)
}

object WinnowFingerprint {
  /** Distinct winnowed 32-bit gram hashes of a token array, sorted. */
  def winnow_fingerprints(tokens: Column, k: Int, w: Int): Column =
    GraftShims.toColumn(WinnowFingerprint(
      GraftShims.toExpression(tokens), k, w))
}
