package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** One ranked candidate: the ORDER BY metric (double slot — exact for
  * integral values under 2^53, the house tracker contract) plus the
  * row's JSON payload.
  */
case class RankedRow(metric: Double, payload: String)

/** Product wrapper so the aggregate's output is a plain SQL
  * `struct<rows: array<struct<metric, payload>>>`.
  */
case class RankedRows(rows: Seq[RankedRow])

/** Generic bounded top-k row collector — the state engine of the
  * UNBOUNDED streaming top-N rewrite ([[graft.harness.UnboundedTopN]]).
  * The buffer is a rank-sorted vector trimmed to k on every insert and
  * merge, so per-key streaming state holds exactly the answer (k rows),
  * never the key's history — the same bound Flink's AppendOnlyTopNFunction
  * keeps. Ranking: metric descending (or ascending under `asc`), NaN
  * LAST in either direction (matching batch ORDER BY), ties broken by
  * payload text ascending — deterministic across partitionings and
  * restarts. Partial aggregation applies: each partition pre-trims to
  * k before the shuffle.
  */
final class TopRows(k: Int, asc: Boolean)
    extends Aggregator[RankedRow, Vector[RankedRow], RankedRows] {
  require(k > 0, s"top-k needs k > 0, got $k")

  private def outranks(a: RankedRow, b: RankedRow): Boolean = {
    val an = a.metric.isNaN
    val bn = b.metric.isNaN
    if (an != bn) bn // a real metric outranks NaN in both directions
    else if (!an && a.metric != b.metric)
      (if (asc) a.metric < b.metric else a.metric > b.metric)
    else a.payload < b.payload
  }

  private def insert(b: Vector[RankedRow], a: RankedRow): Vector[RankedRow] =
    if (b.length == k && !outranks(a, b.last)) b
    else {
      val i = b.indexWhere(outranks(a, _)) match {
        case -1 => b.length
        case at => at
      }
      b.patch(i, Seq(a), 0).take(k)
    }

  override def zero: Vector[RankedRow] = Vector.empty
  override def reduce(b: Vector[RankedRow], a: RankedRow): Vector[RankedRow] =
    insert(b, a)
  override def merge(x: Vector[RankedRow], y: Vector[RankedRow]): Vector[RankedRow] =
    y.foldLeft(x)(insert)
  override def finish(r: Vector[RankedRow]): RankedRows = RankedRows(r)
  override def bufferEncoder: Encoder[Vector[RankedRow]] =
    Encoders.kryo[Vector[RankedRow]]
  override def outputEncoder: Encoder[RankedRows] =
    Encoders.product[RankedRows]
}
