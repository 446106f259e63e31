package graft.plans

import org.apache.spark.sql.catalyst.expressions.{
  Alias, Ascending, Attribute, AttributeReference, Descending, EqualTo,
  Expression, LessThan, LessThanOrEqual, Literal, RowNumber, WindowExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{
  AggregateExpression, Count, HyperLogLogPlusPlus}
import org.apache.spark.sql.catalyst.plans.logical.{
  Aggregate, Deduplicate, Filter, LogicalPlan, Project, Window}
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
/** Analysis-time rewrite of Flink's streaming Deduplication pattern —
  * `SELECT ... FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY keys
  * ORDER BY t ASC) AS rn FROM s) WHERE rn = 1` — onto Spark's
  * streaming [[Deduplicate]] (`dropDuplicates`). Spark rejects ranking
  * window functions on streams, but this exact shape is Flink's
  * documented append-safe dedup; as a `Deduplicate` it keeps the first
  * arrival per key with per-key state, exactly Flink's keep-first
  * processing-time behavior. With an EVENT-time order column the
  * mapping keeps the first-ARRIVING row (no retraction when an earlier
  * timestamp shows up late) — the same answer as Flink only when rows
  * arrive in timestamp order; Flink's keep-last (`ORDER BY ... DESC`)
  * needs retraction and is rejected with the contract.
  *
  * The `rn` column stays available above the rewrite (a literal 1 —
  * true by construction after dedup), so projections that select it
  * still resolve. Gated by `graft.streaming.dedup-rewrite` (default
  * true); batch plans are untouched (Catalyst's WindowGroupLimit
  * already optimizes the batch form).
  */
case class StreamingTopOneDedup() extends Rule[LogicalPlan] {
  /** The rn attribute when `cond` pins the row number to 1. */
  private def rnOf(cond: Expression): Option[AttributeReference] = cond match {
    case EqualTo(a: AttributeReference, Literal(1, _)) => Some(a)
    case EqualTo(Literal(1, _), a: AttributeReference) => Some(a)
    case LessThanOrEqual(a: AttributeReference, Literal(1, _)) => Some(a)
    case LessThan(a: AttributeReference, Literal(2, _)) => Some(a)
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!plan.isStreaming ||
        conf.getConfString("graft.streaming.dedup-rewrite", "true") != "true")
      return plan
    plan.resolveOperatorsUp {
      case f @ Filter(cond, _) if f.isStreaming =>
        rnOf(cond).map { rn =>
          var rewritten = false
          val out = f.transformUp {
            case w @ Window(Seq(a @ Alias(
                  WindowExpression(RowNumber(), spec), _)),
                partitionSpec, orderSpec, child, _)
                if a.exprId == rn.exprId && child.isStreaming &&
                  orderSpec.nonEmpty =>
              if (orderSpec.exists(_.direction == Descending))
                throw new IllegalArgumentException(
                  "streaming deduplication with ORDER BY ... DESC (keep " +
                    "last row) needs retraction and is not supported — " +
                    "order ascending to keep the first row per key")
              // Flink's dedup orders by a TIME ATTRIBUTE; ordering by a
              // regular column is its updating Top-N (min-by-value with
              // retraction), which keep-first-arrival would silently
              // get wrong — require a time-typed key
              orderSpec.foreach { so =>
                val t = so.child.dataType
                if (!t.isInstanceOf[org.apache.spark.sql.types.TimestampType] &&
                    !t.isInstanceOf[org.apache.spark.sql.types.TimestampNTZType])
                  throw new IllegalArgumentException(
                    "streaming deduplication must ORDER BY a time " +
                      s"attribute (got ${t.simpleString}) — a value-ordered " +
                      "Top-1 needs retraction and is not supported")
                // keep-first-ARRIVAL equals Flink's min-EVENT-time row
                // only for in-order input; say so when the order key is
                // a watermarked (event-time) column, where out-of-order
                // arrival is the expected case
                so.child match {
                  case a: Attribute if a.metadata.contains(
                      org.apache.spark.sql.catalyst.plans.logical
                        .EventTimeWatermark.delayKey) =>
                    System.err.println(
                      "streaming deduplication ORDER BY event-time " +
                        s"column '${a.name}': keeping the FIRST-ARRIVING " +
                        "row per key — a later-arriving row with an " +
                        "earlier timestamp is not retracted (Flink's " +
                        "min-rowtime dedup differs on out-of-order " +
                        "input); SET graft.streaming.dedup-rewrite = " +
                        "false to reject instead")
                  case _ =>
                }
              }
              val keys = partitionSpec.map {
                case attr: Attribute => attr
                case other => throw new IllegalArgumentException(
                  "streaming deduplication PARTITION BY must be plain " +
                    s"columns, got: ${other.sql}")
              }
              rewritten = true
              // rn reconstructs as literal 1 under the original exprId,
              // so the pinning Filter and any projection still resolve
              Project(child.output :+
                Alias(Literal(1), a.name)(exprId = a.exprId),
                Deduplicate(keys, child))
          }
          if (rewritten) out else f
        }.getOrElse(f)
    }
  }
}

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
