package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import scala.collection.mutable.ArrayBuffer

/** One tagged row of the unioned temporal-join input: `isVersion = true`
  * rows are versioned-table updates, `false` rows are probes to enrich.
  * Callers watermark-tag and union their two streams into this shape.
  */
final case class TemporalInput(
    key: Long, ts: Timestamp, isVersion: Boolean, value: Double)

/** Per-key temporal-join state: versions sorted by time ascending, and
  * probes still waiting for the watermark to pass their event time.
  * Both lists are (second, value) pairs.
  */
final case class TemporalJoinState(
    versions: List[(Long, Double)], pending: List[(Long, Double)])

/** One enriched probe: the version in effect at the probe's event time,
  * or `versionSec = -1` when no version existed yet (LEFT semantics —
  * filter `versionSec >= 0` for INNER).
  */
final case class TemporalMatch(
    key: Long, probeSec: Long, probeValue: Double,
    versionSec: Long, versionValue: Double)

/** Streaming event-time temporal join (`FOR SYSTEM_TIME AS OF` as a
  * stream-stream operator): each probe row is enriched with the latest
  * version at or before its event time, on the same key.
  *
  * The batch harness rewrite ([[graft.harness.TemporalJoin]]) interval-
  * izes a static version table; this is the streaming form, matching
  * Flink's event-time temporal join mechanics:
  *  - probes buffer in per-key state until the watermark passes their
  *    event time — only then can no earlier version still arrive, so
  *    the match is final (exactly-once, no retraction needed);
  *  - version state is pruned to the single latest version at or below
  *    the watermark plus everything newer — the same retention Flink's
  *    temporal-join state keeps;
  *  - maturation is driven by event-time timeouts, so probes emit even
  *    when their key receives no further input.
  *
  * State is per-key and partitioned; both buffers are bounded by the
  * watermark delay, so memory scales with in-flight time, not stream
  * length.
  */
object TemporalJoinTracker {

  def join(
      input: Dataset[TemporalInput],
      watermarkDelay: String = "10 seconds"): Dataset[TemporalMatch] = {
    implicit val matchEnc = Encoders.product[TemporalMatch]
    implicit val stateEnc = Encoders.product[TemporalJoinState]
    implicit val longEnc = Encoders.scalaLong
    input
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.key)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        (key: Long, rows: Iterator[TemporalInput],
         state: GroupState[TemporalJoinState]) => update(key, rows, state))
  }

  private def update(
      key: Long,
      rows: Iterator[TemporalInput],
      state: GroupState[TemporalJoinState]): Iterator[TemporalMatch] = {
    val prev = state.getOption.getOrElse(TemporalJoinState(Nil, Nil))
    // ingest this batch (absent on a pure timeout invocation)
    val newVersions = ArrayBuffer.empty[(Long, Double)]
    val newProbes = ArrayBuffer.empty[(Long, Double)]
    rows.foreach { r =>
      val sec = r.ts.getTime / 1000L
      if (r.isVersion) newVersions += ((sec, r.value))
      else newProbes += ((sec, r.value))
    }
    val versions = (prev.versions ++ newVersions).sortBy(v => (v._1, v._2))
    val pending = prev.pending ++ newProbes

    val wmSec = state.getCurrentWatermarkMs() / 1000L
    // a probe matures once the watermark passes it: every version at or
    // before its time has arrived, so the latest-at-or-before is final
    val (matured, waiting) = pending.partition(_._1 <= wmSec)
    val out = matured.sortBy(p => (p._1, p._2)).map { case (pSec, pVal) =>
      versions.takeWhile(_._1 <= pSec).lastOption match {
        case Some((vSec, vVal)) => TemporalMatch(key, pSec, pVal, vSec, vVal)
        case None => TemporalMatch(key, pSec, pVal, -1L, 0.0d)
      }
    }

    // retention: future probes have t > wm, so only the latest version
    // at or below the watermark (plus all newer) can still match
    val cutoff = versions.takeWhile(_._1 <= wmSec).lastOption
    val kept = cutoff.toList ::: versions.dropWhile(_._1 <= wmSec)

    if (waiting.isEmpty && kept.isEmpty) state.remove()
    else {
      state.update(TemporalJoinState(kept, waiting))
      // wake when the earliest waiting probe matures (must be > wm here,
      // otherwise it would have matured above)
      waiting.map(_._1).minOption.foreach(sec =>
        state.setTimeoutTimestamp(sec * 1000L + 1L))
    }
    out.iterator
  }
}
