package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShims
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType, StructField, StructType}

/** Row-local IVF coarse-quantizer routing — custom Catalyst `Expression`.
  *
  * `ivf_top_cents(v, cands, k)` returns the top-k candidate centroids of
  * `v` under (round-6 cosine DESC, cent_id ASC) as an array of
  * `struct<cent_id: long, cent_cos: double>` in rank order — the exact
  * ordering contract of the broadcast-join + `topKPerGroup` idiom every
  * routed face used, without the per-corpus-row fan-out to |cands| rows
  * and the (id)-keyed exchange the rank form pays (guide §2.4). Callers
  * pass `cands` sorted by cent_id ascending so the tie-break is the
  * iteration order.
  *
  * DETERMINISM, replicated bit-for-bit from the column form:
  * - cosine: LEFT-TO-RIGHT accumulation of dot/xx/yy then
  *   dot/(√xx·√yy) — [[CosineSim]]'s loop verbatim;
  * - round-6: `BigDecimal.valueOf(c).setScale(6, HALF_UP)` — Spark
  *   `Round`'s double codegen — and, like `round()` under ansi=false,
  *   a NaN/Infinite cosine rounds to NULL;
  * - ordering: DESC with nulls LAST (Spark's `desc` default), ties by
  *   candidate order (= cent_id asc), equal-and-null ties likewise.
  */
case class IvfTopCents(left: Expression, right: Expression, k: Int)
    extends BinaryExpression {

  require(k >= 1, "ivf_top_cents needs k >= 1")

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("cent_id", LongType, nullable = false),
    StructField("cent_cos", DoubleType, nullable = true))),
    containsNull = false)
  override def prettyName: String = "ivf_top_cents"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(st: StructType, _))
          if st.length == 2 && st(0).dataType == LongType &&
            st(1).dataType.isInstanceOf[ArrayType] &&
            st(1).dataType.asInstanceOf[ArrayType].elementType == DoubleType =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"ivf_top_cents expects (array<double>, array<struct<long, " +
          s"array<double>>>), got $other")
    }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, cands) => {
      val nc = ctx.freshName("nc")
      val kk = ctx.freshName("kk")
      val cid = ctx.freshName("cid")
      val cos = ctx.freshName("cos")
      val nul = ctx.freshName("nul")
      val filled = ctx.freshName("filled")
      val ci = ctx.freshName("ci")
      val st = ctx.freshName("st")
      val cv = ctx.freshName("cv")
      val m = ctx.freshName("m")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val xx = ctx.freshName("xx")
      val yy = ctx.freshName("yy")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      val c = ctx.freshName("c")
      val r = ctx.freshName("r")
      val rNul = ctx.freshName("rNul")
      val idx = ctx.freshName("idx")
      val beats = ctx.freshName("beats")
      val j = ctx.freshName("j")
      val out = ctx.freshName("out")
      val row = ctx.freshName("row")
      s"""
         |int $nc = $cands.numElements();
         |int $kk = java.lang.Math.min($k, $nc);
         |long[] $cid = new long[$kk];
         |double[] $cos = new double[$kk];
         |boolean[] $nul = new boolean[$kk];
         |int $filled = 0;
         |for (int $ci = 0; $ci < $nc; $ci++) {
         |  org.apache.spark.sql.catalyst.InternalRow $st =
         |    $cands.getStruct($ci, 2);
         |  org.apache.spark.sql.catalyst.util.ArrayData $cv = $st.getArray(1);
         |  int $m = java.lang.Math.min($v.numElements(), $cv.numElements());
         |  double $dot = 0.0; double $xx = 0.0; double $yy = 0.0;
         |  for (int $i = 0; $i < $m; $i++) {
         |    double $x = $v.getDouble($i);
         |    double $y = $cv.getDouble($i);
         |    $dot += $x * $y; $xx += $x * $x; $yy += $y * $y;
         |  }
         |  double $c = $dot /
         |    (java.lang.Math.sqrt($xx) * java.lang.Math.sqrt($yy));
         |  boolean $rNul = Double.isNaN($c) || Double.isInfinite($c);
         |  double $r = $rNul ? 0.0 : java.math.BigDecimal.valueOf($c)
         |    .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue();
         |  int $idx = -1;
         |  for (int $j = 0; $j < $filled; $j++) {
         |    boolean $beats = !$rNul && ($nul[$j] || $r > $cos[$j]);
         |    if ($beats) { $idx = $j; break; }
         |  }
         |  if ($idx < 0 && $filled < $kk) $idx = $filled;
         |  if ($idx >= 0) {
         |    for (int $j = java.lang.Math.min($filled, $kk - 1); $j > $idx; $j--) {
         |      $cid[$j] = $cid[$j - 1]; $cos[$j] = $cos[$j - 1];
         |      $nul[$j] = $nul[$j - 1];
         |    }
         |    $cid[$idx] = $st.getLong(0); $cos[$idx] = $r; $nul[$idx] = $rNul;
         |    if ($filled < $kk) $filled++;
         |  }
         |}
         |org.apache.spark.sql.catalyst.InternalRow[] $out =
         |  new org.apache.spark.sql.catalyst.InternalRow[$filled];
         |for (int $j = 0; $j < $filled; $j++) {
         |  Object[] $row = new Object[2];
         |  $row[0] = $cid[$j];
         |  $row[1] = $nul[$j] ? null : (Object) $cos[$j];
         |  $out[$j] = new org.apache.spark.sql.catalyst.expressions
         |    .GenericInternalRow($row);
         |}
         |${ev.value} =
         |  new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override def nullSafeEval(l: Any, rIn: Any): Any = {
    val v = l.asInstanceOf[ArrayData]
    val cands = rIn.asInstanceOf[ArrayData]
    val nc = cands.numElements()
    val kk = math.min(k, nc)
    val cid = new Array[Long](kk)
    val cos = new Array[Double](kk)
    val nul = new Array[Boolean](kk)
    var filled = 0
    var ci = 0
    while (ci < nc) {
      val st = cands.getStruct(ci, 2)
      val cv = st.getArray(1)
      val m = math.min(v.numElements(), cv.numElements())
      var dot = 0.0; var xx = 0.0; var yy = 0.0
      var i = 0
      while (i < m) {
        val x = v.getDouble(i); val y = cv.getDouble(i)
        dot += x * y; xx += x * x; yy += y * y
        i += 1
      }
      val c = dot / (math.sqrt(xx) * math.sqrt(yy))
      val rNul = c.isNaN || c.isInfinite
      val r = if (rNul) 0.0 else java.math.BigDecimal.valueOf(c)
        .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
      var idx = -1
      var j = 0
      while (idx < 0 && j < filled) {
        if (!rNul && (nul(j) || r > cos(j))) idx = j
        j += 1
      }
      if (idx < 0 && filled < kk) idx = filled
      if (idx >= 0) {
        var p = math.min(filled, kk - 1)
        while (p > idx) {
          cid(p) = cid(p - 1); cos(p) = cos(p - 1); nul(p) = nul(p - 1)
          p -= 1
        }
        cid(idx) = st.getLong(0); cos(idx) = r; nul(idx) = rNul
        if (filled < kk) filled += 1
      }
      ci += 1
    }
    val out = new Array[InternalRow](filled)
    var j = 0
    while (j < filled) {
      out(j) = new GenericInternalRow(Array[Any](cid(j),
        if (nul(j)) null else cos(j)))
      j += 1
    }
    new GenericArrayData(out.asInstanceOf[Array[Any]])
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): IvfTopCents =
    copy(left = newLeft, right = newRight)
}

object IvfTopCents {
  /** Top-k centroids of `v` against a cent_id-sorted candidate array,
    * ranked by (round-6 cosine desc, cent_id asc), null scores last. */
  def ivf_top_cents(v: Column, cands: Column, k: Int): Column =
    GraftShims.toColumn(IvfTopCents(
      GraftShims.toExpression(v),
      GraftShims.toExpression(cands), k))
}
