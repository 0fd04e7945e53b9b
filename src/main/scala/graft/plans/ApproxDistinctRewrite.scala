package graft.plans

import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count, HyperLogLogPlusPlus}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule

/** Opt-in optimizer rewrite (the `Rule[LogicalPlan]` tier of the
  * custom-Catalyst ladder, injected via
  * `SparkSessionExtensions.injectOptimizerRule`): replace exact
  * single-column `count(DISTINCT x)` with the HyperLogLog++ sketch when
  * `spark.graft.approxDistinct.enabled` is `true`.
  *
  * Why a planner-level switch rather than rewriting queries by hand: at
  * 100 TB an exact distinct count either Expands the input N× (one
  * replica per distinct aggregate) or adds a second full shuffle on the
  * distinct key, while HLL++ is one pass with constant-size mergeable
  * state per group — the standard accuracy-for-cost trade a platform
  * flips fleet-wide for dashboards/monitoring. The rewrite is OFF by
  * default (results become approximate within HLL++'s published error,
  * default rsd 5%); when on, every `count(DISTINCT x)` in the session —
  * including inside `spark.sql` text the caller does not control —
  * plans as `approx_count_distinct` with no query changes.
  *
  * Scope guards: only single-argument COUNT DISTINCTs without filters
  * are rewritten; `count(DISTINCT a, b)` and filtered aggregates keep
  * exact semantics.
  */
case class ApproxDistinctRewrite(dummy: Boolean = true) extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!conf.getConfString("spark.graft.approxDistinct.enabled", "false").toBoolean) plan
    else plan.transformUp {
      case agg: Aggregate =>
        agg.transformExpressions {
          case ae @ AggregateExpression(Count(Seq(child)), _, true, None, _) =>
            ae.copy(
              aggregateFunction = HyperLogLogPlusPlus(child),
              isDistinct = false)
        }
    }
}
