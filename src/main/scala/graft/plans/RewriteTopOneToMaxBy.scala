package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Complete, MaxBy}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._

/** Optimizer rule: rewrite the `row_number() = 1` dedup idiom into a
  * single `max_by(struct(row), ordering-struct)` aggregate.
  *
  * The pattern — rank rows per key, keep rank 1 — is the reference's W1/A1
  * dedup (fa-etl.py:99-105) and the most common "latest record per key"
  * shape in analytics code:
  *
  * {{{
  *   Filter(rn = 1, Window(row_number over (partition K order O) as rn, c))
  *     ⇒ Project(restore c.output + rn := 1,
  *         Aggregate(K, max_by(struct(c.output), orderingStruct), c))
  * }}}
  *
  * Why: both shapes shuffle ~|groups| rows (partial aggregation vs
  * `WindowGroupLimit(Partial)`), and under an honest sink they time EQUAL
  * at 6M rows on local[32] (round-2 measurement; the earlier "3.2×" was a
  * count()-sink artifact — Catalyst prunes an un-referenced max_by
  * wholesale, so count-based timings compared a gutted aggregate against
  * a live window). The rewrite's real effect is plan shape: it removes
  * two per-partition sorts and the rank pass — CPU/spill headroom for
  * wide rows at cluster scale — and is measured never worse than the
  * window form it replaces.
  *
  * `orderingStruct` encodes the SortOrder as a struct whose ASCENDING
  * lexicographic max is the window ordering's FIRST row: descending keys
  * pass through, ascending keys are negated, and a NULLS FIRST key over a
  * nullable column prepends a null-indicator field (struct comparison
  * ranks null smallest, so null can only WIN the max via an explicit
  * `isnull` flag ranked above the value). Per sort key:
  *
  *  - DESC NULLS LAST (the default desc): `[key]` — nulls lose the max
  *    naturally; NaN ranks greatest under both forms.
  *  - DESC NULLS FIRST: `[isnull(key), key]` — any orderable type.
  *  - ASC NULLS LAST: `[-key]` — exact numerics only (integral/decimal;
  *    float NaN does not negate order-consistently); nulls lose naturally.
  *  - ASC NULLS FIRST (the default asc): `[-key]` if non-nullable,
  *    `[isnull(key), -key]` otherwise — exact numerics only.
  *
  * Anything else (ascending strings/dates/floats) bails to the window
  * form.
  *
  * Ties beyond the full sort key are nondeterministic in BOTH forms (the
  * window form's winner depends on shuffle arrival order), so the rewrite
  * preserves the determinism contract exactly: total order in, same row
  * out; partial order in, some valid row out.
  *
  * Negation is overflow-safe by construction: integral keys are widened
  * before the `UnaryMinus` (Byte/Short/Int → Long, Long → Decimal(20,0))
  * so the two's-complement MinValue wraparound (`-Long.MinValue ==
  * Long.MinValue`) cannot occur, and Decimal's symmetric range negates
  * exactly. A MinValue-holding ascending key therefore ranks FIRST under
  * both forms (pinned by spec).
  *
  * Registered by [[graft.GraftExtensions]] both at session build
  * (`injectOptimizerRule`) and post-hoc (`experimental.extraOptimizations`
  * — that batch runs AFTER `InsertWindowGroupLimit`, so the matcher also
  * strips a `WindowGroupLimit` the built-in rule already inserted below
  * the Window).
  */
object RewriteTopOneToMaxBy extends Rule[LogicalPlan] with PredicateHelper {

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!conf.getConfString("spark.graft.rewriteTopOne", "true").toBoolean) {
      plan
    } else {
      plan.transform {
        case f @ Filter(cond, w: Window) =>
          rewrite(f, cond, w).getOrElse(f)
      }
    }
  }

  private def rewrite(f: Filter, cond: Expression, w: Window): Option[LogicalPlan] = {
    for {
      rnAlias <- topOneWindowExpr(w)
      rest <- rnEqualsOne(cond, rnAlias.toAttribute)
      child <- stripGroupLimit(w)
      ordFields <- orderingFields(w.orderSpec)
      // an empty partitionSpec (global top-1) must NOT rewrite: a global
      // Aggregate returns one all-null row on empty input where the
      // window form returns zero rows
      if w.partitionSpec.nonEmpty &&
        w.partitionSpec.forall(_.deterministic) && w.orderSpec.forall(_.deterministic)
    } yield {
      val rowValue = CreateStruct(child.output)
      val maxBy = Alias(
        AggregateExpression(
          MaxBy(rowValue, CreateStruct(ordFields)), Complete, isDistinct = false),
        "__top1")()
      val agg = Aggregate(w.partitionSpec, Seq(maxBy), child)
      val top1 = maxBy.toAttribute
      // restore the original attribute ids so parent operators resolve
      // unchanged (field nullability may loosen — the values are the same
      // rows, so parent decisions made against tighter nullability hold)
      val restored = child.output.zipWithIndex.map { case (a, i) =>
        Alias(GetStructField(top1, i, Some(a.name)), a.name)(
          exprId = a.exprId, qualifier = a.qualifier)
      }
      val rn = Alias(Literal(1, IntegerType), rnAlias.name)(
        exprId = rnAlias.exprId, qualifier = rnAlias.qualifier)
      val project = Project(restored :+ rn, agg)
      if (rest.isEmpty) project else Filter(rest.reduce(And), project)
    }
  }

  /** The Window must compute exactly one expression: row_number() (any
    * rank-like function with a different tie result — rank, dense_rank —
    * must keep ALL tied rows at 1 and cannot become a one-row aggregate). */
  private def topOneWindowExpr(w: Window): Option[Alias] = w.windowExpressions match {
    case Seq(a @ Alias(WindowExpression(_: RowNumber, _), _)) => Some(a)
    case _ => None
  }

  /** cond must pin the row_number attribute to 1 (`rn = 1`, `1 = rn`,
    * `rn <= 1`, `rn < 2`); other conjuncts survive above the rewrite as
    * long as they don't also reference rn. Returns the survivors. */
  private def rnEqualsOne(cond: Expression, rn: Attribute): Option[Seq[Expression]] = {
    val conjuncts = splitConjunctivePredicates(cond)
    val (onRn, rest) = conjuncts.partition(_.references.contains(rn))
    val pinned = onRn match {
      case Seq(EqualTo(a: Attribute, Literal(1, IntegerType))) => a.exprId == rn.exprId
      case Seq(EqualTo(Literal(1, IntegerType), a: Attribute)) => a.exprId == rn.exprId
      case Seq(LessThanOrEqual(a: Attribute, Literal(1, IntegerType))) => a.exprId == rn.exprId
      case Seq(LessThan(a: Attribute, Literal(2, IntegerType))) => a.exprId == rn.exprId
      case _ => false
    }
    if (pinned) Some(rest) else None
  }

  /** When `InsertWindowGroupLimit` already ran (our post-hoc registration
    * executes in a later batch), the Window's child is a top-1
    * WindowGroupLimit — semantically a no-op for this rewrite (it only
    * pre-prunes rows below rank 2), so match through it. */
  private def stripGroupLimit(w: Window): Option[LogicalPlan] = w.child match {
    case WindowGroupLimit(_, _, _: RowNumber, 1, grandchild) => Some(grandchild)
    case _: WindowGroupLimit => None
    case c => Some(c)
  }

  private def orderingFields(orderSpec: Seq[SortOrder]): Option[Seq[Expression]] = {
    if (orderSpec.isEmpty) None
    else {
      // nulls-first over a nullable key needs an explicit indicator ranked
      // above the value (struct comparison alone ranks null smallest)
      def nullFlag(so: SortOrder): Seq[Expression] =
        if (so.child.nullable && so.nullOrdering == NullsFirst) {
          Seq(If(IsNull(so.child), Literal(1), Literal(0)))
        } else Nil
      val fields: Seq[Option[Seq[Expression]]] = orderSpec.map { so =>
        so.direction match {
          case Descending => Some(nullFlag(so) :+ so.child)
          case Ascending =>
            so.child.dataType match {
              case ByteType | ShortType | IntegerType =>
                // widen before negating: two's-complement MinValue has no
                // positive counterpart in its own width (-Int.MinValue wraps
                // back to Int.MinValue), which would rank the window's FIRST
                // row LAST. Long holds -Int.MinValue exactly and the cast
                // preserves order.
                Some(nullFlag(so) :+ UnaryMinus(Cast(so.child, LongType), failOnError = false))
              case LongType =>
                // Decimal(20,0) holds -Long.MinValue = 9223372036854775808
                // exactly; decimal comparison over the widened values matches
                // long comparison over the originals.
                Some(nullFlag(so) :+ UnaryMinus(Cast(so.child, DecimalType(20, 0)), failOnError = false))
              case _: DecimalType =>
                // Decimal's representable range is symmetric (±(10^p - 1)
                // unscaled), so unlike two's-complement integrals its
                // negation can never overflow — no widening needed.
                Some(nullFlag(so) :+ UnaryMinus(so.child, failOnError = false))
              case _ => None
            }
        }
      }
      if (fields.forall(_.isDefined)) Some(fields.flatMap(_.get)) else None
    }
  }
}
