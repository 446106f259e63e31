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
  *    its span whose end lies after it, same lateral shape;
  *  - SESSION([PARTITION BY keys], gap): gaps-and-islands — a LAG flag
  *    marks gap breaks, a running SUM numbers sessions, and MIN/MAX
  *    windows over (keys, session) derive each row's window bounds.
  *    The TVF call carries its own partition keys, so the rewrite
  *    needs no schema knowledge; session ids are stable under
  *    timestamp ties (tied rows see a zero gap either way).
  *
  * All window arithmetic runs in MILLISECONDS (`unix_millis`), the
  * precision of Flink's `TIMESTAMP(3)` time attributes: a session gap
  * comparison on second-floored values would merge events whose true
  * millisecond gap exceeds the declared gap by under a second, and
  * window bounds would lose their sub-second part. Window starts floor
  * like Flink's even before the epoch: the arithmetic is
  * `t - pmod(t, unit)` (pmod is non-negative), never a truncating
  * `div` or a double `FLOOR(x / unit)` that can misround at a
  * boundary. Rows with a NULL time attribute are dropped from window
  * assignment, as Flink drops them. Internal helper columns stay out
  * of `SELECT *` via the table-qualified star (lateral forms) or
  * `SELECT * EXCEPT` (session form). Any TVF variant the rewrite does
  * not understand (e.g. the window-offset argument) is rejected
  * explicitly rather than leaked to Spark's parser.
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

  /** `TABLE(SESSION(t [PARTITION BY k1, k2], DESCRIPTOR(col), [GAP =>] INTERVAL))` */
  private val SessionTvfRe = (
    raw"(?is)\bTABLE\s*\(\s*SESSION\s*\(\s*(?:DATA\s*=>\s*)?(?:TABLE\s+)?($Dotted)" +
      raw"(?:\s+PARTITION\s+BY\s+($Ident(?:\s*,\s*$Ident)*))?\s*,\s*" +
      raw"(?:TIMECOL\s*=>\s*)?DESCRIPTOR\s*\(\s*($Ident)\s*\)\s*,\s*" +
      raw"(?:(GAP)\s*=>\s*)?INTERVAL\s+'(\d+)'\s+(\w+)\s*\)\s*\)").r

  /** Broad marker: any windowing TVF call, supported shape or not —
    * drives both the batch-only guard and the residual check below.
    */
  private val AnyTvfRe =
    raw"(?is)\bTABLE\s*\(\s*(TUMBLE|HOP|CUMULATE|SESSION)\s*\(".r

  /** Flink 1.x legacy group-window functions (`GROUP BY TUMBLE(ts,
    * INTERVAL ...)` + `TUMBLE_START/...`), the pre-TVF syntax an older
    * script submits.
    */
  private val AnyLegacyRe =
    raw"(?is)\b(TUMBLE|HOP|SESSION)(_START|_END|_ROWTIME|_PROCTIME)?\s*\(".r

  private val LegacyIv = raw"INTERVAL\s+'(\d+)'\s+(\w+)"
  private def legacyTumble(suffix: String) =
    (raw"(?is)\bTUMBLE$suffix\s*\(\s*($Dotted)\s*,\s*$LegacyIv\s*\)").r
  private val LegacyTumbleStart = legacyTumble("_START")
  private val LegacyTumbleEnd = legacyTumble("_END")
  private val LegacyTumbleTime = legacyTumble("(?:_ROWTIME|_PROCTIME)")
  private val LegacyTumbleGroup = legacyTumble("")

  def hasWindowTvf(sql: String): Boolean =
    AnyTvfRe.findFirstIn(sql).isDefined ||
      AnyLegacyRe.findFirstIn(sql).isDefined

  private def unitMillis(unit: String): Long =
    unit.toUpperCase.stripSuffix("S") match {
      case "MILLISECOND" => 1L
      case "SECOND" => 1000L
      case "MINUTE" => 60000L
      case "HOUR" => 3600000L
      case "DAY" => 86400000L
      case other => throw new IllegalArgumentException(
        s"Unsupported window TVF interval unit '$other'")
    }

  /** One interval argument: value in milliseconds, bound by its
    * `name =>` tag when present (Flink's named arguments are
    * order-free, so a positional read of a named call would silently
    * swap slide/size).
    */
  private def millis(m: scala.util.matching.Regex.Match, base: Int,
      expected: String): Long = {
    Option(m.group(base)).map(_.toUpperCase).foreach(name =>
      if (name != expected) throw new IllegalArgumentException(
        s"Window TVF argument $name => where $expected was expected; " +
          "write named intervals in declaration order"))
    val s = m.group(base + 1).toLong * unitMillis(m.group(base + 2))
    require(s > 0, "window TVF intervals must be positive")
    s
  }

  /** Flink-floor window arithmetic: `t - pmod(t, unit)` floors for
    * negative epochs too, exactly, in integer space.
    */
  private def floorTo(expr: String, unit: Long): String =
    s"($expr - pmod($expr, ${unit}L))"

  /** Epoch milliseconds of the time attribute. The cast makes the
    * arithmetic accept TIMESTAMP_NTZ columns (what a parquet file
    * written without UTC adjustment scans as) alongside TIMESTAMP —
    * the harness pins the session timezone to UTC, so the cast is
    * value-preserving, matching Flink's naive TIMESTAMP(3) timeline.
    */
  private def epochMs(tcol: String): String =
    s"unix_millis(cast($tcol as timestamp))"

  private def contract(startMs: String, endMs: String): String =
    s"timestamp_millis($startMs) AS window_start, " +
      s"timestamp_millis($endMs) AS window_end, " +
      s"timestamp_millis(($endMs) - 1L) AS window_time"

  def rewrite(sql: String): String = {
    val afterTumble = TumbleRe.replaceAllIn(sql, m => {
      val (table, tcol) = (m.group(1), m.group(2))
      val dur = millis(m, 3, "SIZE")
      val t = epochMs(tcol)
      val ws = floorTo(t, dur)
      java.util.regex.Matcher.quoteReplacement(
        s"(SELECT $table.*, ${contract(ws, s"$ws + ${dur}L")} " +
          s"FROM $table WHERE $tcol IS NOT NULL)")
    })
    val afterHop = HopRe.replaceAllIn(afterTumble, m => {
      val (table, tcol) = (m.group(1), m.group(2))
      val slide = millis(m, 3, "SLIDE")
      val size = millis(m, 6, "SIZE")
      require(size % slide == 0,
        s"HOP size (${size} ms) must be a multiple of its slide (${slide} ms)")
      val t = epochMs(tcol)
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
    val afterCumulate = CumulateRe.replaceAllIn(afterHop, m => {
      val (table, tcol) = (m.group(1), m.group(2))
      val step = millis(m, 3, "STEP")
      val size = millis(m, 6, "SIZE")
      require(size % step == 0,
        s"CUMULATE size (${size} ms) must be a multiple of its step (${step} ms)")
      val t = epochMs(tcol)
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
    val out = SessionTvfRe.replaceAllIn(afterCumulate, m => {
      val (table, keys, tcol) = (m.group(1), Option(m.group(2)), m.group(3))
      val gap = {
        val g = m.group(5).toLong * unitMillis(m.group(6))
        require(g > 0, "session gap must be positive"); g
      }
      // gaps-and-islands, Flink merge semantics: per-event windows
      // [t, t+gap) merge when they touch, so events exactly `gap`
      // apart share a session — a break needs a STRICTLY larger gap.
      // The session-id running sum orders ties with the break flag
      // first (__new DESC), so tied boundary rows land in the same
      // session no matter which physical row carried the flag.
      val part = keys.map(k => s"PARTITION BY $k").getOrElse("")
      val sidPart = keys.map(k => s"PARTITION BY $k, __sid")
        .getOrElse("PARTITION BY __sid")
      val t = epochMs(tcol)
      val endMs = s"MAX(__tms) OVER ($sidPart) + ${gap}L"
      java.util.regex.Matcher.quoteReplacement(
        s"(SELECT * EXCEPT (__tms, __new, __sid), " +
          s"timestamp_millis(MIN(__tms) OVER ($sidPart)) AS window_start, " +
          s"timestamp_millis($endMs) AS window_end, " +
          s"timestamp_millis(($endMs) - 1L) AS window_time " +
          s"FROM (SELECT *, SUM(__new) OVER ($part ORDER BY __tms, __new DESC " +
          s"ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS __sid " +
          s"FROM (SELECT *, $t AS __tms, " +
          s"CASE WHEN $t - LAG($t) OVER ($part ORDER BY $t) > ${gap}L " +
          s"THEN 1 ELSE 0 END AS __new " +
          s"FROM $table WHERE $tcol IS NOT NULL) __s1) __s2)")
    })
    // Flink 1.x legacy group windows. TUMBLE is a clean scalar rewrite
    // (one window per row, so GROUP BY TUMBLE(..) ≡ GROUP BY the
    // window-start expression); every accessor is a function of that
    // same grouping expression, which Spark's analyzer accepts.
    val legacy = rewriteLegacyTumble(out)
    // anything still carrying a window-function marker was a shape no
    // rewrite recognized — fail with the contract, never leak Flink
    // syntax into Spark's parser
    AnyTvfRe.findFirstMatchIn(legacy).foreach(m =>
      throw new IllegalArgumentException(
        s"Unsupported ${m.group(1).toUpperCase} window TVF form " +
          "(offsets / fractional intervals / qualified descriptors " +
          "are not recognized)"))
    AnyLegacyRe.findFirstMatchIn(legacy).foreach { m =>
      val fn = m.group(1).toUpperCase + Option(m.group(2)).getOrElse("").toUpperCase
      throw new IllegalArgumentException(
        if (m.group(1).equalsIgnoreCase("TUMBLE"))
          s"Unsupported legacy $fn form (offsets / fractional intervals " +
            "are not recognized)"
        else
          s"Legacy $fn group window is not supported (one row belongs " +
            "to several windows); use the TVF form " +
            "(TABLE(HOP/CUMULATE(...))) or the library operators")
    }
    legacy
  }

  /** Legacy TUMBLE family → the same floor arithmetic as the TVF
    * rewrite; accessors first (their names contain the bare name).
    */
  private def rewriteLegacyTumble(sql: String): String = {
    def repl(re: scala.util.matching.Regex, s: String,
        f: (String, Long) => String): String =
      re.replaceAllIn(s, m => {
        val dur = {
          val d = m.group(2).toLong * unitMillis(m.group(3))
          require(d > 0, "window intervals must be positive"); d
        }
        java.util.regex.Matcher.quoteReplacement(f(m.group(1), dur))
      })
    def ws(col: String, dur: Long): String =
      floorTo(epochMs(col), dur)
    val s1 = repl(LegacyTumbleStart, sql,
      (c, d) => s"timestamp_millis(${ws(c, d)})")
    val s2 = repl(LegacyTumbleEnd, s1,
      (c, d) => s"timestamp_millis(${ws(c, d)} + ${d}L)")
    val s3 = repl(LegacyTumbleTime, s2,
      (c, d) => s"timestamp_millis(${ws(c, d)} + ${d}L - 1L)")
    repl(LegacyTumbleGroup, s3, (c, d) => ws(c, d))
  }
}
