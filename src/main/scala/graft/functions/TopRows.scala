package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** One ranked candidate: the ORDER BY metric (double slot — exact for
  * integral values under 2^53, the house tracker contract) plus the
  * row's JSON payload. `nullMetric` marks a NULL ORDER BY value (the
  * double slot then carries 0.0 and is ignored for ranking) — batch
  * ROW_NUMBER ranks NULL rows rather than failing, so the collector
  * must too.
  */
case class RankedRow(metric: Double, payload: String, nullMetric: Boolean)

/** Product wrapper so the aggregate's output is a plain SQL
  * `struct<rows: array<struct<metric, payload, nullMetric>>>`.
  */
case class RankedRows(rows: Seq[RankedRow])

/** Generic bounded top-k row collector — the state engine of the
  * UNBOUNDED streaming top-N rewrite ([[graft.harness.UnboundedTopN]]).
  * The buffer is a rank-sorted vector trimmed to k on every insert and
  * merge, so per-key streaming state holds exactly the answer (k rows),
  * never the key's history — the same bound Flink's AppendOnlyTopNFunction
  * keeps. Ranking matches a batch `ORDER BY metric DESC|ASC` under
  * Spark's total order: NULL is the SMALLEST value (first under ASC,
  * last under DESC) and NaN the GREATEST (first under DESC, last under
  * ASC — nanSafeCompare), with ties broken by payload text ascending —
  * deterministic across partitionings and restarts. Partial
  * aggregation applies: each partition pre-trims to k before the
  * shuffle.
  */
final class TopRows(k: Int, asc: Boolean)
    extends Aggregator[RankedRow, Vector[RankedRow], RankedRows] {
  require(k > 0, s"top-k needs k > 0, got $k")

  override def zero: Vector[RankedRow] = Vector.empty
  override def reduce(b: Vector[RankedRow], a: RankedRow): Vector[RankedRow] =
    TopRows.insert(k, asc)(b, a)
  override def merge(x: Vector[RankedRow], y: Vector[RankedRow]): Vector[RankedRow] =
    y.foldLeft(x)(TopRows.insert(k, asc))
  override def finish(r: Vector[RankedRow]): RankedRows = RankedRows(r)
  override def bufferEncoder: Encoder[Vector[RankedRow]] =
    Encoders.kryo[Vector[RankedRow]]
  override def outputEncoder: Encoder[RankedRows] =
    Encoders.product[RankedRows]
}

/** The rank order and bounded insert, shared with the TTL'd
  * flatMapGroupsWithState form ([[graft.streaming.TtlTopNTracker]]) so
  * the two state engines can never rank differently. */
object TopRows {
  // value-order class: NULL < every real double < NaN (Spark's
  // nanSafeCompare order, the one batch ORDER BY ranks by)
  private def cls(r: RankedRow): Int =
    if (r.nullMetric) 0 else if (r.metric.isNaN) 2 else 1

  private[graft] def outranks(asc: Boolean)(
      a: RankedRow, b: RankedRow): Boolean = {
    val ca = cls(a)
    val cb = cls(b)
    if (ca != cb) (if (asc) ca < cb else ca > cb)
    else if (ca == 1 && a.metric != b.metric)
      (if (asc) a.metric < b.metric else a.metric > b.metric)
    else a.payload < b.payload
  }

  private[graft] def insert(k: Int, asc: Boolean)(
      b: Vector[RankedRow], a: RankedRow): Vector[RankedRow] =
    if (b.length == k && !outranks(asc)(a, b.last)) b
    else {
      val i = b.indexWhere(outranks(asc)(a, _)) match {
        case -1 => b.length
        case at => at
      }
      b.patch(i, Seq(a), 0).take(k)
    }
}
