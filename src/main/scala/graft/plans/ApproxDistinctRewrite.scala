package graft.plans

import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count, HyperLogLogPlusPlus}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

/** Approximate-query-processing rewrite (Catalyst optimizer `Rule`,
  * SURVEY.md §4 stretch item): when `spark.graft.approxDistinct.enabled`
  * is true, every exact single-column `COUNT(DISTINCT x)` in the plan is
  * rewritten to `HyperLogLogPlusPlus(x, rsd)` — the session-wide "approx
  * mode" switch a 100 TB deployment flips for dashboards and data
  * exploration, where the exact distinct's shuffle-heavy Expand plan
  * (RewriteDistinctAggregates) costs far more than the ≤ rsd error.
  *
  * Mechanics: injected via `extendedOperatorOptimizationRules`
  * ([[graft.GraftExtensions]]) or `spark.experimental.extraOptimizations`,
  * both of which run BEFORE `RewriteDistinctAggregates` — after this
  * rewrite clears `isDistinct`, the expensive distinct expansion never
  * fires. The replacement keeps the `AggregateExpression`'s result id, so
  * downstream attribute references stay valid; Count and HLL++ both
  * return LongType. `rsd` defaults to the reference sketch's 0.0081
  * (p=14 — BASELINE.md) via `spark.graft.approxDistinct.rsd`.
  *
  * Scope guards: only DISTINCT counts, only single-argument ones
  * (`COUNT(DISTINCT a, b)` has no HLL++ equivalent), never when a FILTER
  * clause is attached.
  */
object ApproxDistinctRewrite extends Rule[LogicalPlan] {

  val EnabledKey = "spark.graft.approxDistinct.enabled"
  val RsdKey = "spark.graft.approxDistinct.rsd"

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!conf.getConfString(EnabledKey, "false").toBoolean) plan
    else {
      val rsd = conf.getConfString(RsdKey, "0.0081").toDouble
      plan.transformAllExpressions {
        case ae @ AggregateExpression(Count(children), _, true, None, _)
            if children.length == 1 =>
          ae.copy(
            aggregateFunction = HyperLogLogPlusPlus(children.head, rsd),
            isDistinct = false)
      }
    }
}
