package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import scala.collection.mutable.ArrayBuffer

/** Input event for custom stateful sessionization. */
final case class UserEvent(userId: Long, ts: Timestamp, value: Double)

/** Open-session state held per user between micro-batches. */
final case class OpenSession(
    startSec: Long, lastSec: Long, nEvents: Long, sumValue: Double)

/** A finished session, emitted once its inactivity gap elapses. */
final case class ClosedSession(
    userId: Long, startSec: Long, endSec: Long, nEvents: Long, sumValue: Double)

/** Custom per-key streaming state via `flatMapGroupsWithState`
  * (SURVEY.md §2 UDF/state surface): tracks one open session per user,
  * closes it when the event-time gap exceeds `gapSec` (in-batch or via
  * event-time timeout once the watermark passes).
  *
  * This is the `KeyValueGroupedDataset` custom-state escape hatch for
  * semantics `session_window` can't express (e.g. value-dependent gaps);
  * state is per-key and partitioned, so it scales horizontally.
  */
object SessionTracker {

  def trackSessions(
      events: Dataset[UserEvent],
      gapSec: Long,
      watermarkDelay: String = "10 seconds"): Dataset[ClosedSession] = {
    implicit val closedEnc = Encoders.product[ClosedSession]
    implicit val openEnc = Encoders.product[OpenSession]
    implicit val longEnc = Encoders.scalaLong
    Watermarks.ensure(events, "ts", watermarkDelay)
      .groupByKey(_.userId)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        (userId: Long, rows: Iterator[UserEvent], state: GroupState[OpenSession]) =>
          update(userId, rows, state, gapSec))
  }

  private def update(
      userId: Long,
      rows: Iterator[UserEvent],
      state: GroupState[OpenSession],
      gapSec: Long): Iterator[ClosedSession] = {
    if (state.hasTimedOut) {
      val s = state.get
      state.remove()
      Iterator(ClosedSession(userId, s.startSec, s.lastSec, s.nEvents, s.sumValue))
    } else {
      val closed = ArrayBuffer.empty[ClosedSession]
      var open = state.getOption
      rows.toSeq.sortBy(e => (e.ts.getTime, e.value)).foreach { e =>
        val sec = e.ts.getTime / 1000L
        open match {
          case Some(s) if sec - s.lastSec >= gapSec =>
            closed += ClosedSession(userId, s.startSec, s.lastSec, s.nEvents, s.sumValue)
            open = Some(OpenSession(sec, sec, 1L, e.value))
          case Some(s) =>
            // late-but-within-watermark events may precede the current
            // session start — extend backward, not just forward
            open = Some(OpenSession(math.min(s.startSec, sec),
              math.max(s.lastSec, sec), s.nEvents + 1L, s.sumValue + e.value))
          case None =>
            open = Some(OpenSession(sec, sec, 1L, e.value))
        }
      }
      open.foreach { s =>
        state.update(s)
        // close once the watermark passes last event + gap
        state.setTimeoutTimestamp((s.lastSec + gapSec) * 1000L)
      }
      closed.iterator
    }
  }
}
