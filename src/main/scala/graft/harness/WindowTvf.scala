package graft.harness

/** Flink windowing table-valued function rewrites.
  *
  * Flink scripts window with TVFs — `FROM TABLE(TUMBLE(TABLE t,
  * DESCRIPTOR(ts), INTERVAL '1' HOUR))` — which Spark's parser
  * rejects. The reference router passes them through verbatim
  * (`SQLSubmitAction.java:76`), so the harness rewrites them into
  * derived tables that append the TVF's `window_start`/`window_end`
  * columns:
  *
  *  - TUMBLE: row-local epoch arithmetic — a pure projection, no
  *    shuffle, pushdown transparent;
  *  - HOP(slide, size): each row fans into its size/slide covering
  *    windows via `LATERAL VIEW explode(sequence(...))` — the bounded
  *    per-row expansion a hopping window is;
  *  - CUMULATE(step, size): each row fans into every growing window of
  *    its span whose end lies after it, same lateral shape.
  *
  * All window arithmetic is integer division on epoch seconds (`div`),
  * never double division — `FLOOR(x / 3600.0)` can misround exactly at
  * a window boundary. SESSION TVFs merge rows by gap (not expressible
  * as a per-row expansion) and are rejected toward the library
  * operators (q29 / `StreamOps.sessionAgg`).
  */
object WindowTvf {

  private val Ident = raw"(?:`[^`]+`|[A-Za-z_]\w*)"
  private val Dotted = s"$Ident(?:\\.$Ident)*"
  private val Interval = raw"(?:SIZE\s*=>\s*|SLIDE\s*=>\s*|STEP\s*=>\s*)?INTERVAL\s+'(\d+)'\s+(\w+)"

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

  private val SessionRe =
    raw"(?is)\bTABLE\s*\(\s*(SESSION)\s*\(".r

  def hasWindowTvf(sql: String): Boolean =
    TumbleRe.findFirstIn(sql).isDefined || HopRe.findFirstIn(sql).isDefined ||
      CumulateRe.findFirstIn(sql).isDefined || SessionRe.findFirstIn(sql).isDefined

  private def unitSeconds(unit: String): Long =
    unit.toUpperCase.stripSuffix("S") match {
      case "SECOND" => 1L
      case "MINUTE" => 60L
      case "HOUR" => 3600L
      case "DAY" => 86400L
      case other => throw new IllegalArgumentException(
        s"Unsupported window TVF interval unit '$other'")
    }

  private def seconds(n: String, unit: String): Long = {
    val s = n.toLong * unitSeconds(unit)
    require(s > 0, "window TVF intervals must be positive")
    s
  }

  def rewrite(sql: String): String = {
    SessionRe.findFirstMatchIn(sql).foreach(_ =>
      throw new IllegalArgumentException(
        "SESSION window TVF is not supported by the rewrite (sessions " +
          "merge rows by gap); use the library operators " +
          "(graft.operators.Events q29 / StreamOps.sessionAgg)"))
    val afterTumble = TumbleRe.replaceAllIn(sql, m => {
      val (table, tcol) = (m.group(1), m.group(2))
      val dur = seconds(m.group(3), m.group(4))
      val ws = s"(unix_seconds($tcol) div ${dur}L) * ${dur}L"
      java.util.regex.Matcher.quoteReplacement(
        s"(SELECT *, timestamp_seconds($ws) AS window_start, " +
          s"timestamp_seconds($ws + ${dur}L) AS window_end FROM $table)")
    })
    val afterHop = HopRe.replaceAllIn(afterTumble, m => {
      val (table, tcol) = (m.group(1), m.group(2))
      val slide = seconds(m.group(3), m.group(4))
      val size = seconds(m.group(5), m.group(6))
      require(size % slide == 0,
        s"HOP size ($size s) must be a multiple of its slide ($slide s)")
      // covering window starts: from the first start whose window still
      // contains the row, up to the row's own slide bucket
      val lo = s"(((unix_seconds($tcol) - ${size}L) div ${slide}L) + 1) * ${slide}L"
      val hi = s"(unix_seconds($tcol) div ${slide}L) * ${slide}L"
      java.util.regex.Matcher.quoteReplacement(
        s"(SELECT *, timestamp_seconds(__ws) AS window_start, " +
          s"timestamp_seconds(__ws + ${size}L) AS window_end FROM $table " +
          s"LATERAL VIEW explode(sequence($lo, $hi, ${slide}L)) __wt AS __ws)")
    })
    CumulateRe.replaceAllIn(afterHop, m => {
      val (table, tcol) = (m.group(1), m.group(2))
      val step = seconds(m.group(3), m.group(4))
      val size = seconds(m.group(5), m.group(6))
      require(size % step == 0,
        s"CUMULATE size ($size s) must be a multiple of its step ($step s)")
      val span = s"(unix_seconds($tcol) div ${size}L) * ${size}L"
      // window ends after the row, in step increments up to the span end
      val lo = s"(((unix_seconds($tcol) % ${size}L) div ${step}L) + 1) * ${step}L"
      java.util.regex.Matcher.quoteReplacement(
        s"(SELECT *, timestamp_seconds($span) AS window_start, " +
          s"timestamp_seconds($span + __eo) AS window_end FROM $table " +
          s"LATERAL VIEW explode(sequence($lo, ${size}L, ${step}L)) __et AS __eo)")
    })
  }
}
