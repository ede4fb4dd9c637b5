package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShims
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType, StructField, StructType}

/** Per-document repetition counts in one pass — custom Catalyst
  * `Expression` behind `TextAnalysis.repetitionMetrics`.
  *
  * Returns `struct(top_uni, top_bi, dup_tri)` over a token array:
  *  - `top_uni` / `top_bi`: occurrence count of the most frequent
  *    unigram / bigram ("a b", single-space joined)
  *  - `dup_tri`: number of trigram POSITIONS whose trigram occurs more
  *    than once in the document (total mass of repeated trigrams)
  *
  * Why custom (SURVEY.md §7 preference order, same escalation as
  * MinHashSig): the HOF formulation is CodegenFallback-interpreted at
  * ~1.6 µs per lambda eval — even after restructuring to linear
  * sorted-array folds it spends ~8n interpreted evals/row plus three
  * array sorts (q53 sf0.1: 1.9 s in one scan task). This expression is
  * one eval per row doing tight hash-map counting — no sorts, no
  * per-element lambda dispatch. Same values (OpsSpec pins equivalence
  * with the HOF baseline over the full documents corpus + edges).
  *
  * Null semantics: a null token array yields null (UnaryExpression
  * default); a null ELEMENT yields null (tokens from `split` are never
  * null — anything else is a caller bug surfaced as null, mirroring
  * HyperplaneSig's null-element contract).
  */
case class RepetitionStats(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StructType(Seq(
    StructField("top_uni", LongType, nullable = false),
    StructField("top_bi", LongType, nullable = false),
    StructField("dup_tri", LongType, nullable = false)))

  override def prettyName: String = "repetition_stats"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val toks = new Array[String](n)
    var i = 0
    while (i < n) {
      val u = arr.getUTF8String(i)
      if (u == null) return null
      toks(i) = u.toString
      i += 1
    }
    def bump(m: java.util.HashMap[String, java.lang.Long], g: String): Unit =
      m.put(g, m.getOrDefault(g, 0L) + 1L)
    def maxCount(grams: Iterator[String]): Long = {
      val m = new java.util.HashMap[String, java.lang.Long]()
      grams.foreach(bump(m, _))
      var best = 0L
      m.forEach((_, c) => if (c > best) best = c)
      best
    }
    val topUni = maxCount(toks.iterator)
    val topBi = maxCount(
      (0 until n - 1).iterator.map(j => toks(j) + " " + toks(j + 1)))
    val triCounts = new java.util.HashMap[String, java.lang.Long]()
    var j = 0
    while (j < n - 2) {
      bump(triCounts, toks(j) + " " + toks(j + 1) + " " + toks(j + 2))
      j += 1
    }
    var dupTri = 0L
    triCounts.forEach((_, c) => if (c >= 2) dupTri += c)
    InternalRow(topUni, topBi, dupTri)
  }

  override protected def withNewChildInternal(newChild: Expression): RepetitionStats =
    copy(child = newChild)
}

object RepetitionStats {
  /** repetition counts struct(top_uni, top_bi, dup_tri) of an
    * array<string> token column. */
  def repetition_stats(tokens: Column): Column =
    GraftShims.toColumn(RepetitionStats(GraftShims.toExpression(tokens)))
}
