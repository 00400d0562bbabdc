package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Cast, Conv, Expression, Literal, Md5, Substring}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Complete, Count}
import org.apache.spark.sql.catalyst.optimizer.NormalizeNaNAndZero
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{BinaryType, DoubleType, FloatType, LongType, StringType}

/** Opt-in Catalyst optimizer rule: rewrite exact `COUNT(DISTINCT x)`
  * into the mergeable [[KmvDistinct]] sketch estimate — the
  * query-rewrite layer of the engine-extension ladder (custom
  * expressions and aggregates are the other rungs).
  *
  * Why a rule and not a function: COUNT(DISTINCT) over a high-cardinality
  * key is the classic 100 TB cliff — the distinct expansion shuffles
  * every (group, value) pair before counting, while the KMV sketch
  * keeps k longs per group and merges map-side. Opting a whole workload
  * into sketched cardinalities then means flipping a config, not
  * editing every query.
  *
  * Scope and gates:
  *   - disabled unless `spark.graft.approxDistinct.enabled = true`;
  *   - `spark.graft.approxDistinct.k` (default 256) sets the sketch
  *     size (relative error ≈ 1/√(k−2); exact below k distinct values);
  *   - only plain single-argument, unfiltered COUNT(DISTINCT x) is
  *     rewritten — multi-arg counts and FILTER clauses keep their exact
  *     semantics.
  *
  * The rewrite hashes the argument with the same engine-portable 60-bit
  * md5 hash [[KmvSketch.hash64]] uses, so a rewritten query returns
  * bit-for-bit the value `KmvSketch.kmvDistinct` returns directly.
  * Attach at session build via `GraftExtensions` (injectOptimizerRule)
  * or at runtime via `spark.experimental.extraOptimizations`.
  */
object ApproxDistinctRewrite extends Rule[LogicalPlan] {

  private def enabled: Boolean =
    conf.getConfString("spark.graft.approxDistinct.enabled", "false").toBoolean
  private def k: Int =
    conf.getConfString("spark.graft.approxDistinct.k", "256").toInt

  // KmvSketch.hash64's exact tree as RESOLVED catalyst nodes. An
  // optimizer rule runs after analysis, so it must emit what the
  // analyzer would have produced itself: every implicit cast spelled
  // out (md5 takes BINARY) — the Column-API builders emit
  // UnresolvedFunction nodes and fail the optimizer's plan validation.
  private def hash60(child: Expression): Expression =
    Cast(
      Conv(
        Substring(
          Md5(Cast(Cast(normalized(child), StringType), BinaryType)),
          Literal(1), Literal(15)),
        Literal(16), Literal(10)),
      LongType)

  // String hashing would split -0.0 from 0.0 ("−0.0" vs "0.0") — one
  // distinct value to Spark's exact COUNT(DISTINCT) — so normalize
  // floating zeros (and NaN bit patterns) BEFORE the cast, with the
  // engine's own normalizer expression. Top-level float/double only:
  // the rewrite's sub-k exactness contract is per scalar column;
  // arrays/structs of floats keep the raw cast.
  private def normalized(child: Expression): Expression = child.dataType match {
    case FloatType | DoubleType => NormalizeNaNAndZero(child)
    case _ => child
  }

  // transformUpWithSubqueries: the rewrite must reach Aggregates inside
  // scalar/EXISTS subqueries too, not just the outer plan
  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!enabled) plan
    else plan.transformUpWithSubqueries {
      case agg: Aggregate =>
        agg.transformExpressions {
          case AggregateExpression(c: Count, _, true, None, _)
              if c.children.length == 1 =>
            AggregateExpression(
              KmvDistinct(hash60(c.children.head), k),
              Complete, isDistinct = false)
        }
    }
}
