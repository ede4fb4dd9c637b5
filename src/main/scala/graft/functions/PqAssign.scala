package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShims
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType, StructType}

/** Row-local PQ codeword assignment — custom Catalyst `Expression`.
  *
  * `pq_best_cid(sv, cands)` returns the `cid` of the candidate codeword
  * minimizing `round(l2(sv, cv), 6)` with ties broken by the candidates'
  * array order (callers pass the codebook sorted by cid ascending, so the
  * tie-break is cid asc — exactly the `Windows.topOnePerGroup(d asc, cid
  * asc)` contract the join-then-rank form implemented).
  *
  * Why an expression and not the broadcast-join + top-1 window: the
  * join form materializes N·m·k scored rows and pays a corpus-sized
  * exchange per assignment pass (the max_by partial agg still shuffles
  * one winner row per (id, j)); this form needs NO exchange at all —
  * the codebook rides in as one broadcast m-row relation collapsed to an
  * array, and the argmin is a tight codegen'd loop per (id, j) row
  * (optimization guide §2.4: remove shuffles outright). A HOF `aggregate`
  * lambda was rejected for the same reason as [[CosineSim]]: interpreted
  * per-step dispatch over k=64 candidates × sub=8 elements is ~30 µs/row.
  *
  * DETERMINISM (the load-bearing part): the distance is accumulated
  * LEFT-TO-RIGHT (`d += t·t`, identical to `Similarity.l2Chain`'s
  * left-associated expression tree) and rounded with
  * `java.math.BigDecimal.valueOf(d).setScale(6, HALF_UP)` — the exact
  * formula Spark's `Round` codegen emits for doubles — so the rounded
  * distance is bit-identical to the `round(l2Chain(sv, cv), 6)` column
  * the previous form ranked on, and the oracle's replay still matches.
  */
case class PqAssign(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "pq_best_cid"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(st: StructType, _))
          if st.length == 2 && st(0).dataType == IntegerType &&
            st(1).dataType.isInstanceOf[ArrayType] &&
            st(1).dataType.asInstanceOf[ArrayType].elementType == DoubleType =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"pq_best_cid expects (array<double>, array<struct<int, " +
          s"array<double>>>), got $other")
    }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (sv, cands) => {
      val ci = ctx.freshName("ci")
      val nc = ctx.freshName("nc")
      val st = ctx.freshName("st")
      val cv = ctx.freshName("cv")
      val m = ctx.freshName("m")
      val i = ctx.freshName("i")
      val d = ctx.freshName("d")
      val t = ctx.freshName("t")
      val r = ctx.freshName("r")
      val best = ctx.freshName("best")
      val bestCid = ctx.freshName("bestCid")
      s"""
         |int $nc = $cands.numElements();
         |double $best = Double.POSITIVE_INFINITY;
         |int $bestCid = -1;
         |for (int $ci = 0; $ci < $nc; $ci++) {
         |  org.apache.spark.sql.catalyst.InternalRow $st =
         |    $cands.getStruct($ci, 2);
         |  org.apache.spark.sql.catalyst.util.ArrayData $cv = $st.getArray(1);
         |  int $m = java.lang.Math.min($sv.numElements(), $cv.numElements());
         |  double $d = 0.0;
         |  for (int $i = 0; $i < $m; $i++) {
         |    double $t = $sv.getDouble($i) - $cv.getDouble($i);
         |    $d += $t * $t;
         |  }
         |  double $r = java.math.BigDecimal.valueOf($d)
         |    .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue();
         |  if ($r < $best) { $best = $r; $bestCid = $st.getInt(0); }
         |}
         |${ev.value} = $bestCid;
       """.stripMargin
    })

  override def nullSafeEval(l: Any, rIn: Any): Any = {
    val sv = l.asInstanceOf[ArrayData]
    val cands = rIn.asInstanceOf[ArrayData]
    var best = Double.PositiveInfinity
    var bestCid = -1
    var ci = 0
    val nc = cands.numElements()
    while (ci < nc) {
      val st = cands.getStruct(ci, 2)
      val cv = st.getArray(1)
      val m = math.min(sv.numElements(), cv.numElements())
      var d = 0.0
      var i = 0
      while (i < m) {
        val t = sv.getDouble(i) - cv.getDouble(i)
        d += t * t
        i += 1
      }
      val r = java.math.BigDecimal.valueOf(d)
        .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
      if (r < best) { best = r; bestCid = st.getInt(0) }
      ci += 1
    }
    bestCid
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqAssign =
    copy(left = newLeft, right = newRight)
}

object PqAssign {
  /** Best codeword id for a subvector against a cid-sorted codebook array. */
  def pq_best_cid(sv: Column, cands: Column): Column =
    GraftShims.toColumn(PqAssign(
      GraftShims.toExpression(sv),
      GraftShims.toExpression(cands)))
}
