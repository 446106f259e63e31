package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import scala.collection.mutable.ArrayBuffer

/** One open (not yet emittable) session: instant bounds of its EVENTS
  * (the emitted window end is `last + gap`) and one accumulator per
  * aggregate slot ([[CumAcc]] with the span/step fields unused — the
  * session IS the window). `ds` lists are deduplicated and sorted at
  * state-save time for deterministic replay.
  */
final case class OpenSess(start: Long, last: Long, accs: List[CumAcc])

final case class SessionAggState(sessions: List[OpenSess])

/** Streaming `SESSION(gap)` window aggregation with EXACT distinct
  * aggregates — the gap-merge counterpart of [[CumulateTracker]] /
  * [[GridAggTracker]], used when a session statement carries
  * COUNT/SUM/AVG(DISTINCT): Spark's native `session_window` path
  * compiles to a plain streaming Aggregate where exact distinct is
  * rejected (and the session-extension rule would silently run it as
  * an HLL approximation), while Flink's session aggregation keeps the
  * exact per-session value set. Statements without a distinct
  * aggregate stay on the native `session_window` path.
  *
  * Mechanics: per key, incoming rows become unit sessions and merge
  * with the held open sessions wherever they touch — Flink merges
  * events exactly `gap` apart (`diff <= gap`), so the merge condition
  * over start-sorted sessions is `next.start <= cur.last + gap`. A
  * session is final once no future row can extend it: future rows
  * carry `ts >= watermark`, and any row with `ts <= last + gap` would
  * merge, so emission waits for `watermark > last + gap` (strict — a
  * row AT `last + gap` still touches). The emitted window is
  * `[start, last + gap)`, Flink's session bounds. State is bounded by
  * open sessions per active key; event-time timeouts re-drive quiet
  * keys so pending sessions close without traffic.
  */
object SessionAggTracker {

  def track(
      input: Dataset[CumulateEvent],
      watermarkDelay: String,
      gapMs: Long,
      aggKinds: Seq[Int]): Dataset[CumulateWindow] = {
    require(gapMs > 0, "session gap must be positive")
    implicit val outEnc = Encoders.product[CumulateWindow]
    implicit val stateEnc = Encoders.product[SessionAggState]
    implicit val keyEnc = Encoders.STRING
    val kinds = aggKinds.toArray
    Watermarks.ensure(input, "ts", watermarkDelay)
      .groupByKey(_.key)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        (key: String, rows: Iterator[CumulateEvent],
         state: GroupState[SessionAggState]) =>
          update(key, rows, state, gapMs, kinds))
  }

  private def emptyAcc(i: Int): CumAcc =
    CumAcc(0L, 0, i, 0L, 0L, 0d, Long.MaxValue, Long.MinValue,
      Double.MaxValue, Double.MinValue)

  /** Merges two slot accumulators of kind `kind` — the same sentinel
    * discipline as [[CumulateTracker]]'s step merge (a cnt=0
    * accumulator's min/max sentinels never meet real data; doubles
    * merge NaN-safely; the exact decimal seat merges by the kind's
    * add/compare law). Distinct-value lists concatenate here and
    * deduplicate once per update (state save / emission), not per
    * merge.
    */
  private def mergeAcc(kind: Int, m: CumAcc, a: CumAcc): CumAcc = {
    val ds =
      if (a.ds.isEmpty) m.ds else if (m.ds.isEmpty) a.ds else m.ds ++ a.ds
    if (a.cnt == 0L) m.copy(ds = ds)
    else if (m.cnt == 0L) a.copy(span = m.span, step = m.step, agg = m.agg,
      ds = ds)
    else {
      val (nm1, nm2) = CumulateTracker.momentMerge(m.cnt, m.m1, m.m2,
        a.cnt, a.m1, a.m2)
      m.copy(cnt = m.cnt + a.cnt,
        sumL = m.sumL + a.sumL, sumD = m.sumD + a.sumD,
        mnL = math.min(m.mnL, a.mnL), mxL = math.max(m.mxL, a.mxL),
        mnD = CumulateTracker.nanMin(m.mnD, a.mnD),
        mxD = CumulateTracker.nanMax(m.mxD, a.mxD),
        ds = ds, m1 = nm1, m2 = nm2,
        dec = CumulateTracker.decFold(kind, m.dec, a.dec))
    }
  }

  private def update(
      key: String,
      rows: Iterator[CumulateEvent],
      state: GroupState[SessionAggState],
      gapMs: Long,
      kinds: Array[Int]): Iterator[CumulateWindow] = {
    val prev = state.getOption.getOrElse(SessionAggState(Nil))
    val units = rows.map { e =>
      val t = e.ts.getTime
      val accs = kinds.indices.map { i =>
        val base = emptyAcc(i)
        if (!e.nn(i)) base
        else if (CumulateTracker.isDistinctKind(kinds(i)))
          // distinct slots: count the non-null row, carry its encoded
          // value; min/max sentinels never meet data for these kinds
          base.copy(cnt = 1L, ds = List(e.sv(i)))
        else if (CumulateTracker.isDecimalKind(kinds(i)))
          base.copy(cnt = 1L, dec = e.sv(i))
        else base.copy(cnt = 1L, sumL = e.lv(i), sumD = e.dv(i),
          mnL = e.lv(i), mxL = e.lv(i), mnD = e.dv(i), mxD = e.dv(i),
          // single-value central moments (variance kinds read them;
          // harmless elsewhere): mean = the value, M2 = 0
          m1 = e.dv(i), m2 = 0d)
      }.toList
      OpenSess(t, t, accs)
    }.toList
    // start-sorted fold-merge: held sessions are disjoint and a unit
    // session is a point, so one left-to-right pass merges everything
    // that touches (a unit bridging two held sessions merges all three)
    val all = (prev.sessions ++ units).sortBy(s => (s.start, s.last))
    val merged = ArrayBuffer.empty[OpenSess]
    all.foreach { s =>
      merged.lastOption match {
        case Some(c) if s.start <= c.last + gapMs =>
          merged(merged.size - 1) = OpenSess(c.start,
            math.max(c.last, s.last),
            c.accs.lazyZip(s.accs).lazyZip(kinds.toSeq)
              .map((m, a, k) => mergeAcc(k, m, a)))
        case _ => merged += s
      }
    }
    val (wmMs, isFinal) =
      try (state.getCurrentWatermarkMs(), false)
      catch { case _: UnsupportedOperationException => (Long.MaxValue, true) }
    val out = ArrayBuffer.empty[CumulateWindow]
    val open = ArrayBuffer.empty[OpenSess]
    merged.foreach { s =>
      if (isFinal || wmMs > s.last + gapMs) {
        val fields = kinds.indices.flatMap { i =>
          val a = s.accs(i)
          val ds: scala.collection.Set[String] =
            if (a.ds.isEmpty) scala.collection.Set.empty[String]
            else a.ds.toSet
          CumulateTracker.fieldValue(kinds(i), a, ds)
            .map(v => s""""a$i": $v""")
        }
        out += CumulateWindow(key, s.start, s.last + gapMs,
          fields.mkString("{", ", ", "}"))
      } else open += s
    }
    if (!isFinal) {
      if (open.isEmpty) state.remove()
      else {
        state.update(SessionAggState(open.toList.map(s =>
          s.copy(accs = s.accs.map(a =>
            if (a.ds.isEmpty) a else a.copy(ds = a.ds.distinct.sorted))))))
        // wake once the earliest open session can close (strict bound:
        // the session is final only when wm EXCEEDS last + gap)
        val nextClose = open.iterator.map(_.last + gapMs + 1L).min
        state.setTimeoutTimestamp(math.max(nextClose, wmMs + 1L))
      }
    }
    out.iterator
  }
}
