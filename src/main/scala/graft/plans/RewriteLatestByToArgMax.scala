package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{MaxBy, MinBy}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Rewrites the ReplacingMergeTree-FINAL pattern
  *
  *   Filter(rn = 1, [Project(attrs,)] Window(row_number() OVER
  *     (PARTITION BY k ORDER BY o DESC...) AS rn, child))
  *
  * into an argmax aggregation
  *
  *   Aggregate(k, max_by(col, struct(o...)) ...)
  *
  * Why: the window form shuffles ALL rows then sorts every partition;
  * the aggregate form partially aggregates map-side first, so only one
  * pre-aggregated row per (key × input partition) is shuffled and
  * nothing is sorted. On a 100 TB position log where each aircraft has
  * millions of reports, that is the difference between moving the
  * archive and moving ~one row per aircraft per task.
  *
  * Scope guards (bail out ⇒ plan unchanged):
  * - exactly one window expression, and it is `row_number()`;
  * - the filter is `rn = 1` / `1 = rn` / `rn <= 1`;
  * - exactly ONE sort key (DESC → max_by, ASC → min_by). With one
  *   primitive sort key the max_by buffer is mutable-primitive, so
  *   the planner picks HashAggregate: the final plan has ZERO sorts.
  *   (Multi-key orderings would need a struct ordering → SortAggregate,
  *   which is no better than Spark's own WindowGroupLimit — left alone.)
  * - Spark's InferWindowGroupLimit may already have inserted a
  *   WindowGroupLimit below the Window; it is stripped along with it.
  *
  * Opt-in: `GraftExtensions` injects it, or
  * `spark.experimental.extraOptimizations ++= Seq(RewriteLatestByToArgMax)`.
  */
object RewriteLatestByToArgMax extends Rule[LogicalPlan] {

  private object RnFilter {
    /** Extracts (rnAttribute) from `rn = 1`-shaped conditions. */
    def unapply(cond: Expression): Option[Attribute] = cond match {
      case EqualTo(a: Attribute, Literal(1, IntegerType)) => Some(a)
      case EqualTo(Literal(1, IntegerType), a: Attribute) => Some(a)
      case LessThanOrEqual(a: Attribute, Literal(1, IntegerType)) => Some(a)
      case _ => None
    }
  }

  private def rewrite(w: Window, rnAttr: Attribute): Option[Aggregate] = w match {
    case Window(Seq(alias @ Alias(WindowExpression(_: RowNumber,
        WindowSpecDefinition(partitionSpec, orderSpec, _)), _)), _, _, child, _)
        if alias.exprId == rnAttr.exprId && orderSpec.length == 1 &&
          partitionSpec.forall(_.isInstanceOf[Attribute]) =>
      val ordering = orderSpec.head.child
      val descending = orderSpec.head.direction == Descending
      val keys = partitionSpec.map(_.asInstanceOf[Attribute])
      // Spark's InferWindowGroupLimit inserts a (Sort+)WindowGroupLimit
      // below the Window — redundant once the window itself is gone.
      val aggChild = child match {
        case WindowGroupLimit(_, _, _, _, c) => c
        case c => c
      }
      val aggExprs: Seq[NamedExpression] = w.output.map {
        case a if keys.exists(_.exprId == a.exprId) => a
        case a if a.exprId == rnAttr.exprId =>
          Alias(Literal(1, IntegerType), a.name)(exprId = a.exprId)
        case a =>
          val fn = if (descending) MaxBy(a, ordering) else MinBy(a, ordering)
          Alias(fn.toAggregateExpression(), a.name)(exprId = a.exprId)
      }
      Some(Aggregate(keys, aggExprs, aggChild))
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case f @ Filter(RnFilter(rn), w: Window) =>
      rewrite(w, rn).getOrElse(f)
    case f @ Filter(RnFilter(rn), p @ Project(projList, w: Window))
        if projList.forall(_.isInstanceOf[Attribute]) =>
      rewrite(w, rn).map(agg => Project(projList, agg)).getOrElse(f)
  }
}
