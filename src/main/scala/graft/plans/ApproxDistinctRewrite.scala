package graft.plans

import org.apache.spark.sql.catalyst.expressions.aggregate.{
  AggregateExpression, Complete, Count, HyperLogLogPlusPlus}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule

/** Flag-gated COUNT(DISTINCT x) → HyperLogLogPlusPlus rewrite — the
  * SURVEY §4 optional optimizer rule, off by default.
  *
  * Why a session flag and not a query change: exact distinct counting is
  * the single most shuffle-hostile aggregate at 100 TB — the engine must
  * either expand + double-shuffle (grouped case) or shuffle every distinct
  * value per group (partial-distinct case). When a dashboard-grade answer
  * is acceptable, flipping `spark.graft.approxDistinct=true` turns every
  * COUNT(DISTINCT) in the session into a fixed-width HLL++ sketch
  * aggregate (default rsd 5%): one ordinary partial+final aggregation,
  * constant bytes per group, no second shuffle — without touching query
  * code.
  *
  * Scope guards: only single-argument COUNT(DISTINCT x) in Complete mode
  * rewrites; COUNT(DISTINCT a, b) and filtered variants keep their exact
  * semantics. The result keeps the original exprId and LongType, so
  * downstream references are untouched. The rewrite runs in the
  * user-provided optimizer batch, before physical distinct planning.
  */
object ApproxDistinctRewrite extends Rule[LogicalPlan] {
  val Flag = "spark.graft.approxDistinct"

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!conf.getConfString(Flag, "false").toBoolean) plan
    else plan.transformDown {
      case a: Aggregate => a.transformExpressions {
        case ae @ AggregateExpression(
            Count(Seq(child)), Complete, true, None, _) =>
          ae.copy(
            aggregateFunction = new HyperLogLogPlusPlus(child),
            isDistinct = false)
      }
    }
}
