package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count, HyperLogLogPlusPlus}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule

/** Session-flagged sketch swap-in: rewrites exact `count(DISTINCT x)` to
  * the mergeable HLL++ estimate when
  * `spark.graft.approxDistinct.enabled` is true.
  *
  * This is the 100 TB knob the exact queries name in comments
  * (`distinct_count`, `profile_columns`): at scale an exact distinct
  * shuffles every distinct VALUE; the sketch shuffles a KB-sized buffer
  * per group. The rewrite makes the trade a plan-level decision — the
  * same query text runs exact at validation SF and approximate on the
  * cluster, the way warehouse engines expose "approx mode".
  *
  * Correctness contract: estimates are within the configured relative
  * standard deviation (`spark.graft.approxDistinct.rsd`, default 0.05) —
  * the same engine-side property `approx_distinct_hll` oracle-checks.
  * The rewrite drops the DISTINCT flag because HLL++ is insensitive to
  * duplicates by construction.
  *
  * Registered through BOTH extension paths: `injectOptimizerRule` in
  * [[GraftExtensions]] for sessions built with the extension, and
  * [[ApproxDistinctRewrite.install]] (`experimental.extraOptimizations`)
  * for sessions the harness already constructed. Multi-distinct
  * aggregates are only caught on the injectOptimizerRule path (the
  * experimental batch runs after Catalyst's distinct-expand rewrite);
  * single-distinct — the common shape — rewrites on either path. */
object ApproxDistinctRewrite extends Rule[LogicalPlan] {
  val ENABLED_KEY = "spark.graft.approxDistinct.enabled"
  val RSD_KEY = "spark.graft.approxDistinct.rsd"

  override def apply(plan: LogicalPlan): LogicalPlan = {
    // Parse defensively: a malformed setting must surface as "flag off",
    // not as an optimizer exception failing every query in the session.
    if (!conf.getConfString(ENABLED_KEY, "false").equalsIgnoreCase("true")) return plan
    val rsd = conf.getConfString(RSD_KEY, "0.05").toDoubleOption
      .filter(r => r > 0.0 && r < 1.0).getOrElse(0.05)
    plan.transformUp {
      case agg: Aggregate =>
        agg.transformExpressionsUp {
          case AggregateExpression(Count(Seq(child)), mode, true, filter, id) =>
            AggregateExpression(
              HyperLogLogPlusPlus(child, rsd), mode, isDistinct = false, filter, id)
        }
    }
  }

  /** Idempotent registration on an already-built session. */
  def install(spark: SparkSession): Unit =
    if (!spark.experimental.extraOptimizations.contains(ApproxDistinctRewrite)) {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ ApproxDistinctRewrite
    }
}
