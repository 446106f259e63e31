package graft.streaming

import graft.functions.{RankedRow, TopRows}
import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One ranked input row: the opaque group key (the harness packs the
  * PARTITION BY tuple as JSON), the ORDER BY metric in the double slot
  * (`nullMetric` marks a NULL metric riding a 0.0 placeholder), and
  * the non-key columns as a JSON payload.
  */
final case class RankedEvent(
    key: String, metric: Double, nullMetric: Boolean, payload: String)

/** Per-key state: the N best rows, rank-sorted — exactly the answer,
  * never the key's history (the [[graft.functions.TopRows]] bound). */
final case class TtlTopNState(rows: List[RankedRow])

/** One emitted rank row: `pos` is the 0-based rank. */
final case class RankedOut(
    key: String, pos: Int, metric: Double, nullMetric: Boolean,
    payload: String)

/** Flink's unbounded updating top-N / top-1 deduplication under
  * `table.exec.state.ttl` — the same bounded-state ranking the
  * [[graft.functions.TopRows]] UDAF runs on Spark's native streaming
  * aggregation, re-hosted on `flatMapGroupsWithState` so idle keys
  * EXPIRE: Spark's native aggregation state has no TTL, and at 100 TB
  * key cardinalities a keep-first dedup or updating top-N would
  * otherwise retain one state row per key forever. Mechanics:
  *
  *  - rows fold into the per-key rank vector with the exact
  *    [[TopRows]] order (NULL smallest, NaN greatest, payload-text
  *    ties) — the two engines can never disagree on a rank;
  *  - every batch that touches a key re-emits the key's full current
  *    top-N (update-mode semantics, same as the native path — a
  *    (keys, rn)-keyed updating sink renders the retraction stream);
  *  - each write re-arms a PROCESSING-TIME timeout of the configured
  *    TTL (Flink's default OnCreateAndWrite visibility); a key idle
  *    past the TTL drops its state entirely, so a returning row ranks
  *    fresh — exactly Flink's expired-state behavior.
  *
  * On a BOUNDED run (batch execution of the stateful operator) the
  * single invocation holds the whole input and timeouts never fire —
  * the emission is the batch top-N, Flink's bounded-mode answer.
  */
object TtlTopNTracker {

  def track(
      input: Dataset[RankedEvent],
      n: Int,
      asc: Boolean,
      ttlSec: Long): Dataset[RankedOut] = {
    require(n > 0, s"top-n needs n > 0, got $n")
    require(ttlSec > 0L, "TtlTopNTracker is the TTL'd form; without a " +
      "state TTL the native TopRows aggregation path applies")
    implicit val outEnc = Encoders.product[RankedOut]
    implicit val stateEnc = Encoders.product[TtlTopNState]
    implicit val keyEnc = Encoders.STRING
    input
      .groupByKey(_.key)
      .flatMapGroupsWithState(
        OutputMode.Update, GroupStateTimeout.ProcessingTimeTimeout)(
        (key: String, rows: Iterator[RankedEvent],
         state: GroupState[TtlTopNState]) =>
          update(key, rows, state, n, asc, ttlSec))
  }

  private def update(
      key: String,
      rows: Iterator[RankedEvent],
      state: GroupState[TtlTopNState],
      n: Int,
      asc: Boolean,
      ttlSec: Long): Iterator[RankedOut] = {
    // idle past the TTL: drop the key's rank state — a later row ranks
    // fresh (Flink's expired-state behavior); nothing is emitted (the
    // sink keeps the last rendering, exactly as Flink's expired top-N
    // emits no retraction)
    if (state.hasTimedOut) {
      state.remove()
      return Iterator.empty
    }
    val prev = state.getOption.map(_.rows.toVector).getOrElse(Vector.empty)
    val next = rows.foldLeft(prev)((b, e) =>
      TopRows.insert(n, asc)(b, RankedRow(e.metric, e.payload, e.nullMetric)))
    state.update(TtlTopNState(next.toList))
    // re-arm on every write (OnCreateAndWrite); bounded runs execute
    // the operator in batch where the timeout never fires
    state.setTimeoutDuration(ttlSec * 1000L)
    next.iterator.zipWithIndex.map { case (r, i) =>
      RankedOut(key, i, r.metric, r.nullMetric, r.payload)
    }
  }
}
