package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import scala.collection.mutable.ArrayBuffer

/** One input row of a streaming CUMULATE aggregation: the opaque group
  * key (the harness packs GROUP BY columns as JSON), the event time,
  * and per-aggregate input values — `nn(i)` is the i-th aggregate
  * input's non-null flag, with its value cast to both long (`lv`) and
  * double (`dv`) so integral aggregates stay exact.
  */
final case class CumulateEvent(key: String, ts: Timestamp,
    nn: List[Boolean], lv: List[Long], dv: List[Double])

/** One per-(span, step, aggregate) accumulator: non-null count, exact
  * long sum, double sum, and typed min/max. */
final case class CumAcc(span: Long, step: Int, agg: Int, cnt: Long,
    sumL: Long, sumD: Double, mnL: Long, mxL: Long, mnD: Double, mxD: Double)

/** Per-key state: accumulators plus, per span, how many growing windows
  * have already been emitted. */
final case class CumulateState(accs: List[CumAcc],
    emitted: List[(Long, Int)])

/** One emitted window: group key, window bounds (epoch ms), and the
  * aggregate results as a JSON object `{"a0": ..., "a1": ...}` (null
  * results omitted), decoded by the harness with the result schema.
  */
final case class CumulateWindow(key: String, ws: Long, we: Long,
    vals: String)

/** Streaming `CUMULATE(step, size)` windows — Flink's growing windows
  * `[span, span + k*step)` for k = 1..size/step, which Spark has no
  * native streaming equivalent for. Mechanics mirror
  * [[PatternTracker]]: rows fold into per-(key, span, step) partial
  * accumulators; window k emits once the watermark passes its end
  * (later arrivals are dropped by the watermark upstream, so every
  * emission is final — append mode); event-time timeouts re-drive keys
  * whose watermark advanced without traffic; a span's state drops as
  * soon as its last window emits, so state is bounded by
  * size/step × aggregates per ACTIVE (key, span).
  *
  * Aggregate kinds: 0 = COUNT (rows with non-null input; COUNT(*)
  * feeds a literal), 1 = SUM exact over longs, 2 = SUM over doubles,
  * 3 = MIN long, 4 = MIN double, 5 = MAX long, 6 = MAX double,
  * 7 = AVG over doubles, 8 = AVG over longs (exact long sum divided
  * once). A window whose inputs were all null
  * (or an empty leading window) emits SQL NULL for SUM/MIN/MAX/AVG and
  * 0 for COUNT — matching batch aggregation semantics. Windows with
  * zero rows so far emit nothing at all (the batch rewrite only
  * produces windows that contain a row).
  */
object CumulateTracker {

  def track(
      input: Dataset[CumulateEvent],
      watermarkDelay: String,
      stepMs: Long,
      sizeMs: Long,
      aggKinds: Seq[Int]): Dataset[CumulateWindow] = {
    require(sizeMs % stepMs == 0 && stepMs > 0, "size must be k * step")
    implicit val outEnc = Encoders.product[CumulateWindow]
    implicit val stateEnc = Encoders.product[CumulateState]
    implicit val keyEnc = Encoders.STRING
    val kinds = aggKinds.toArray
    input
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.key)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        (key: String, rows: Iterator[CumulateEvent],
         state: GroupState[CumulateState]) =>
          update(key, rows, state, stepMs, sizeMs, kinds))
  }

  private def update(
      key: String,
      rows: Iterator[CumulateEvent],
      state: GroupState[CumulateState],
      stepMs: Long,
      sizeMs: Long,
      kinds: Array[Int]): Iterator[CumulateWindow] = {
    val nSteps = (sizeMs / stepMs).toInt
    val prev = state.getOption.getOrElse(CumulateState(Nil, Nil))
    // (span, step, agg) -> accumulator
    val accs = scala.collection.mutable.HashMap.empty[(Long, Int, Int), CumAcc]
    prev.accs.foreach(a => accs((a.span, a.step, a.agg)) = a)
    val emitted = scala.collection.mutable.HashMap.empty[Long, Int]
    prev.emitted.foreach { case (s, k) => emitted(s) = k }

    rows.foreach { e =>
      val t = e.ts.getTime
      val span = Math.floorDiv(t, sizeMs) * sizeMs
      val step = ((t - span) / stepMs).toInt
      var i = 0
      while (i < kinds.length) {
        val k = (span, step, i)
        val a = accs.getOrElse(k,
          CumAcc(span, step, i, 0L, 0L, 0d, Long.MaxValue, Long.MinValue,
            Double.MaxValue, Double.MinValue))
        if (e.nn(i)) {
          accs(k) = a.copy(cnt = a.cnt + 1L,
            sumL = a.sumL + e.lv(i), sumD = a.sumD + e.dv(i),
            mnL = math.min(a.mnL, e.lv(i)), mxL = math.max(a.mxL, e.lv(i)),
            mnD = math.min(a.mnD, e.dv(i)), mxD = math.max(a.mxD, e.dv(i)))
        } else if (!accs.contains(k)) accs(k) = a
        i += 1
      }
      emitted.getOrElseUpdate(span, 0): Unit
    }

    // batch execution (bounded source, no watermark): everything final
    val (wmMs, isFinal) =
      try (state.getCurrentWatermarkMs(), false)
      catch { case _: UnsupportedOperationException => (Long.MaxValue, true) }

    def fmtD(v: Double): String =
      if (v == Math.rint(v) && math.abs(v) < 1e15) v.toLong.toString + ".0"
      else java.lang.Double.toString(v)

    val out = ArrayBuffer.empty[CumulateWindow]
    val doneSpans = ArrayBuffer.empty[Long]
    emitted.keys.toSeq.sorted.foreach { span =>
      var k = emitted(span)
      // cumulative merge recomputes from the per-step accumulators —
      // cheap (nSteps × aggs entries at most)
      def cumOver(upToStep: Int): Array[CumAcc] = {
        val merged = Array.tabulate(kinds.length)(i =>
          CumAcc(span, 0, i, 0L, 0L, 0d, Long.MaxValue, Long.MinValue,
            Double.MaxValue, Double.MinValue))
        var s = 0
        while (s < upToStep) {
          var i = 0
          while (i < kinds.length) {
            accs.get((span, s, i)).foreach { a =>
              val m = merged(i)
              merged(i) = m.copy(cnt = m.cnt + a.cnt,
                sumL = m.sumL + a.sumL, sumD = m.sumD + a.sumD,
                mnL = math.min(m.mnL, a.mnL), mxL = math.max(m.mxL, a.mxL),
                mnD = math.min(m.mnD, a.mnD), mxD = math.max(m.mxD, a.mxD))
            }
            i += 1
          }
          s += 1
        }
        merged
      }
      // any-row count for window existence: COUNT semantics per agg
      // count only non-null inputs, so track raw row presence per step
      def rowsIn(upToStep: Int): Long = {
        var n = 0L
        var s = 0
        while (s < upToStep) {
          // a step with ANY accumulator entry had >= 1 row (null-input
          // rows still create entries with cnt unchanged — see ingest)
          if (kinds.indices.exists(i => accs.contains((span, s, i)))) {
            // exact row count isn't needed — existence is
            n += 1L
          }
          s += 1
        }
        n
      }
      var advanced = true
      while (advanced && k < nSteps) {
        val winEnd = span + (k + 1).toLong * stepMs
        if (isFinal || wmMs >= winEnd) {
          if (rowsIn(k + 1) > 0) {
            val merged = cumOver(k + 1)
            val fields = kinds.indices.flatMap { i =>
              val a = merged(i)
              val v = kinds(i) match {
                case 0 => Some(a.cnt.toString)
                case 1 => if (a.cnt == 0) None else Some(a.sumL.toString)
                case 2 => if (a.cnt == 0) None else Some(fmtD(a.sumD))
                case 3 => if (a.cnt == 0) None else Some(a.mnL.toString)
                case 4 => if (a.cnt == 0) None else Some(fmtD(a.mnD))
                case 5 => if (a.cnt == 0) None else Some(a.mxL.toString)
                case 6 => if (a.cnt == 0) None else Some(fmtD(a.mxD))
                case 7 => if (a.cnt == 0) None
                  else Some(fmtD(a.sumD / a.cnt))
                case _ => if (a.cnt == 0) None
                  else Some(fmtD(a.sumL.toDouble / a.cnt))
              }
              v.map(s => s""""a$i": $s""")
            }
            out += CumulateWindow(key, span, winEnd,
              fields.mkString("{", ", ", "}"))
          }
          k += 1
          emitted(span) = k
        } else advanced = false
      }
      if (k >= nSteps) doneSpans += span
    }
    doneSpans.foreach { span =>
      emitted.remove(span)
      (0 until nSteps).foreach(s =>
        kinds.indices.foreach(i => accs.remove((span, s, i))))
    }

    if (!isFinal) {
      if (accs.isEmpty && emitted.isEmpty) state.remove()
      else {
        state.update(CumulateState(accs.values.toList.sortBy(a =>
          (a.span, a.step, a.agg)),
          emitted.toList.sortBy(_._1)))
        // wake at the earliest unemitted window end
        val nextEnd = emitted.map { case (span, k) =>
          span + (k + 1).toLong * stepMs
        }.min
        state.setTimeoutTimestamp(math.max(nextEnd, wmMs + 1L))
      }
    }
    out.iterator
  }
}
