package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShims
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Cosine similarity of two array<double> columns — custom Catalyst
  * `Expression`.
  *
  * Numerically identical to the higher-order-function baseline
  * (`Similarity.cosineHof`): left-to-right accumulation of dot and norms,
  * then dot / (√xx · √yy). The HOF form is interpreted per element
  * (zip_with + aggregate are CodegenFallback) — ~30 µs per 64-dim pair,
  * which made the 2M-pair near-dup sweep at sf0.1 take 70 s; this loop does
  * it in under a second. SURVEY.md §7.2 step 6 anticipated exactly this
  * escalation (compose built-ins first, drop to an Expression when the
  * measured baseline is too slow).
  */
case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_sim"

  /** Both children MUST be array<double>: getDouble over an array<float>'s
    * UnsafeArrayData would read 8-byte strides across 4-byte slots —
    * silent garbage, not an error. (ExpectsInputTypes is unusable outside
    * Spark — AbstractDataType is private[sql] — so check explicitly.) */
  override def checkInputDataTypes(): TypeCheckResult =
    Seq(left, right).map(_.dataType) match {
      case Seq(ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"cosine_sim expects (array<double>, array<double>), got " +
          other.map(_.simpleString).mkString(", "))
    }

  /** Full codegen (not CodegenFallback): the loop is inlined into the
    * generated Java of the enclosing WholeStageCodegen stage, so the 2M+
    * calls of a near-dup sweep pay no interpreted-expression dispatch. */
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val xx = ctx.freshName("xx")
      val yy = ctx.freshName("yy")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0; double $xx = 0.0; double $yy = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $x = $a.getDouble($i);
         |  double $y = $b.getDouble($i);
         |  $dot += $x * $y; $xx += $x * $x; $yy += $y * $y;
         |}
         |${ev.value} = $dot / (java.lang.Math.sqrt($xx) * java.lang.Math.sqrt($yy));
       """.stripMargin
    })

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0; var xx = 0.0; var yy = 0.0
    var i = 0
    while (i < n) {
      val x = a.getDouble(i); val y = b.getDouble(i)
      dot += x * y; xx += x * x; yy += y * y
      i += 1
    }
    dot / (math.sqrt(xx) * math.sqrt(yy))
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSim =
    copy(left = newLeft, right = newRight)
}

object CosineSim {
  /** cosine similarity of two vector columns (auto-cast to array<double>;
    * a float-array input would otherwise fail the expression's type check). */
  def cosine_sim(a: Column, b: Column): Column =
    GraftShims.toColumn(CosineSim(
      GraftShims.toExpression(a.cast("array<double>")),
      GraftShims.toExpression(b.cast("array<double>"))))
}
