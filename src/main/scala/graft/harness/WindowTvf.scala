package graft.harness

/** Flink windowing table-valued function rewrites.
  *
  * Flink scripts window with TVFs — `FROM TABLE(TUMBLE(TABLE t,
  * DESCRIPTOR(ts), INTERVAL '1' HOUR))` — which Spark's parser
  * rejects. The reference router passes them through verbatim
  * (`SQLSubmitAction.java:76`), so the harness rewrites them into
  * derived tables carrying the TVF contract columns (`window_start`,
  * `window_end`, `window_time` = end − 1 ms):
  *
  *  - TUMBLE: row-local epoch arithmetic — a pure projection, no
  *    shuffle, pushdown transparent;
  *  - HOP(slide, size): each row fans into its size/slide covering
  *    windows via `LATERAL VIEW explode(sequence(...))` — the bounded
  *    per-row expansion a hopping window is;
  *  - CUMULATE(step, size): each row fans into every growing window of
  *    its span whose end lies after it, same lateral shape.
  *
  * Window starts floor like Flink's even before the epoch: the
  * arithmetic is `t - pmod(t, unit)` (pmod is non-negative), never a
  * truncating `div` or a double `FLOOR(x / unit)` that can misround at
  * a boundary. Rows with a NULL time attribute are dropped from window
  * assignment, as Flink drops them. The internal lateral column stays
  * out of `SELECT *` via the table-qualified star. SESSION TVFs merge
  * rows by gap (not expressible as a per-row expansion) and are
  * rejected toward the library operators (q29 / `StreamOps
  * .sessionAgg`); any TVF variant the rewrite does not understand
  * (e.g. the window-offset argument) is rejected explicitly rather
  * than leaked to Spark's parser.
  */
object WindowTvf {

  private val Ident = raw"(?:`[^`]+`|[A-Za-z_]\w*)"
  private val Dotted = s"$Ident(?:\\.$Ident)*"
  private val Interval =
    raw"(?:(SIZE|SLIDE|STEP)\s*=>\s*)?INTERVAL\s+'(\d+)'\s+(\w+)"

  /** `TABLE(TUMBLE([DATA =>] [TABLE] t, [TIMECOL =>] DESCRIPTOR(col), INTERVAL 'n' UNIT))` */
  private val TumbleRe = (
    raw"(?is)\bTABLE\s*\(\s*TUMBLE\s*\(\s*(?:DATA\s*=>\s*)?(?:TABLE\s+)?($Dotted)\s*,\s*" +
      raw"(?:TIMECOL\s*=>\s*)?DESCRIPTOR\s*\(\s*($Ident)\s*\)\s*,\s*$Interval\s*\)\s*\)").r

  /** `TABLE(HOP(t, DESCRIPTOR(col), slide, size))` — Flink's argument
    * order puts the slide before the window size.
    */
  private val HopRe = (
    raw"(?is)\bTABLE\s*\(\s*HOP\s*\(\s*(?:DATA\s*=>\s*)?(?:TABLE\s+)?($Dotted)\s*,\s*" +
      raw"(?:TIMECOL\s*=>\s*)?DESCRIPTOR\s*\(\s*($Ident)\s*\)\s*,\s*$Interval\s*,\s*$Interval\s*\)\s*\)").r

  /** `TABLE(CUMULATE(t, DESCRIPTOR(col), step, size))` */
  private val CumulateRe = (
    raw"(?is)\bTABLE\s*\(\s*CUMULATE\s*\(\s*(?:DATA\s*=>\s*)?(?:TABLE\s+)?($Dotted)\s*,\s*" +
      raw"(?:TIMECOL\s*=>\s*)?DESCRIPTOR\s*\(\s*($Ident)\s*\)\s*,\s*$Interval\s*,\s*$Interval\s*\)\s*\)").r

  /** Broad marker: any windowing TVF call, supported shape or not —
    * drives both the batch-only guard and the residual check below.
    */
  private val AnyTvfRe =
    raw"(?is)\bTABLE\s*\(\s*(TUMBLE|HOP|CUMULATE|SESSION)\s*\(".r

  def hasWindowTvf(sql: String): Boolean =
    AnyTvfRe.findFirstIn(sql).isDefined

  private def unitSeconds(unit: String): Long =
    unit.toUpperCase.stripSuffix("S") match {
      case "SECOND" => 1L
      case "MINUTE" => 60L
      case "HOUR" => 3600L
      case "DAY" => 86400L
      case other => throw new IllegalArgumentException(
        s"Unsupported window TVF interval unit '$other'")
    }

  /** One interval argument: value in seconds, bound by its `name =>`
    * tag when present (Flink's named arguments are order-free, so a
    * positional read of a named call would silently swap slide/size).
    */
  private def seconds(m: scala.util.matching.Regex.Match, base: Int,
      expected: String): Long = {
    Option(m.group(base)).map(_.toUpperCase).foreach(name =>
      if (name != expected) throw new IllegalArgumentException(
        s"Window TVF argument $name => where $expected was expected; " +
          "write named intervals in declaration order"))
    val s = m.group(base + 1).toLong * unitSeconds(m.group(base + 2))
    require(s > 0, "window TVF intervals must be positive")
    s
  }

  /** Flink-floor window arithmetic: `t - pmod(t, unit)` floors for
    * negative epochs too, exactly, in integer space.
    */
  private def floorTo(expr: String, unit: Long): String =
    s"($expr - pmod($expr, ${unit}L))"

  private def contract(startSec: String, endSec: String): String =
    s"timestamp_seconds($startSec) AS window_start, " +
      s"timestamp_seconds($endSec) AS window_end, " +
      s"timestamp_millis(($endSec) * 1000L - 1L) AS window_time"

  def rewrite(sql: String): String = {
    AnyTvfRe.findFirstMatchIn(sql)
      .filter(m => m.group(1).equalsIgnoreCase("SESSION"))
      .foreach(_ => throw new IllegalArgumentException(
        "SESSION window TVF is not supported by the rewrite (sessions " +
          "merge rows by gap); use the library operators " +
          "(graft.operators.Events q29 / StreamOps.sessionAgg)"))
    val afterTumble = TumbleRe.replaceAllIn(sql, m => {
      val (table, tcol) = (m.group(1), m.group(2))
      val dur = seconds(m, 3, "SIZE")
      val t = s"unix_seconds($tcol)"
      val ws = floorTo(t, dur)
      java.util.regex.Matcher.quoteReplacement(
        s"(SELECT $table.*, ${contract(ws, s"$ws + ${dur}L")} " +
          s"FROM $table WHERE $tcol IS NOT NULL)")
    })
    val afterHop = HopRe.replaceAllIn(afterTumble, m => {
      val (table, tcol) = (m.group(1), m.group(2))
      val slide = seconds(m, 3, "SLIDE")
      val size = seconds(m, 6, "SIZE")
      require(size % slide == 0,
        s"HOP size ($size s) must be a multiple of its slide ($slide s)")
      val t = s"unix_seconds($tcol)"
      // covering window starts: from the first start whose window still
      // contains the row, up to the row's own slide bucket
      val lo = s"${floorTo(s"($t - ${size}L)", slide)} + ${slide}L"
      val hi = floorTo(t, slide)
      java.util.regex.Matcher.quoteReplacement(
        s"(SELECT $table.*, ${contract("__ws", s"__ws + ${size}L")} " +
          s"FROM $table " +
          s"LATERAL VIEW explode(sequence($lo, $hi, ${slide}L)) __wt AS __ws " +
          s"WHERE $tcol IS NOT NULL)")
    })
    val out = CumulateRe.replaceAllIn(afterHop, m => {
      val (table, tcol) = (m.group(1), m.group(2))
      val step = seconds(m, 3, "STEP")
      val size = seconds(m, 6, "SIZE")
      require(size % step == 0,
        s"CUMULATE size ($size s) must be a multiple of its step ($step s)")
      val t = s"unix_seconds($tcol)"
      val span = floorTo(t, size)
      // window ends after the row, in step increments to the span end;
      // pmod keeps the offset non-negative for pre-epoch rows too
      val lo = s"((pmod($t, ${size}L) div ${step}L) + 1) * ${step}L"
      java.util.regex.Matcher.quoteReplacement(
        s"(SELECT $table.*, ${contract(span, s"$span + __eo")} " +
          s"FROM $table " +
          s"LATERAL VIEW explode(sequence($lo, ${size}L, ${step}L)) __et AS __eo " +
          s"WHERE $tcol IS NOT NULL)")
    })
    // a TVF shape none of the rewrites recognized (window offsets,
    // fractional intervals, qualified descriptors) must fail here with
    // the contract, not leak Flink syntax into Spark's parser
    AnyTvfRe.findFirstMatchIn(out).foreach(m =>
      throw new IllegalArgumentException(
        s"Unsupported ${m.group(1).toUpperCase} window TVF form " +
          "(offsets / fractional intervals / qualified descriptors " +
          "are not recognized)"))
    out
  }
}
