package graft.harness

/** Flink windowing table-valued function rewrite.
  *
  * Flink scripts window with TVFs — `FROM TABLE(TUMBLE(TABLE t,
  * DESCRIPTOR(ts), INTERVAL '1' HOUR))` — which Spark's parser
  * rejects. The reference router passes them through verbatim
  * (`SQLSubmitAction.java:76`), so the harness rewrites the TUMBLE
  * form into a derived table that appends the TVF's `window_start` /
  * `window_end` columns with plain epoch arithmetic:
  *
  * {{{ (SELECT *, timestamp_seconds(floor(unix_seconds) over dur) ...) }}}
  *
  * The arithmetic is a row-local projection — no shuffle, pushdown
  * transparent — and downstream GROUP BY window_start behaves exactly
  * like Flink's window aggregate. HOP/SESSION/CUMULATE TVFs fan one
  * row into several windows (a lateral expansion, not a projection)
  * and already exist as library operators (q28/q29/q43); the harness
  * rejects them with a pointer rather than silently mis-rewriting.
  */
object WindowTvf {

  private val Ident = raw"(?:`[^`]+`|[A-Za-z_]\w*)"
  private val Dotted = s"$Ident(?:\\.$Ident)*"

  /** `TABLE(TUMBLE([TABLE|DATA =>] t, DESCRIPTOR(col), INTERVAL 'n' UNIT))` */
  private val TumbleRe = (
    raw"(?is)\bTABLE\s*\(\s*TUMBLE\s*\(\s*(?:DATA\s*=>\s*)?(?:TABLE\s+)?($Dotted)\s*,\s*" +
      raw"(?:TIMECOL\s*=>\s*)?DESCRIPTOR\s*\(\s*($Ident)\s*\)\s*,\s*" +
      raw"(?:SIZE\s*=>\s*)?INTERVAL\s+'(\d+)'\s+(\w+)S?\s*\)\s*\)").r

  private val OtherTvfRe =
    raw"(?is)\bTABLE\s*\(\s*(HOP|SESSION|CUMULATE)\s*\(".r

  def hasWindowTvf(sql: String): Boolean =
    TumbleRe.findFirstIn(sql).isDefined || OtherTvfRe.findFirstIn(sql).isDefined

  private def unitSeconds(unit: String): Long = unit.toUpperCase match {
    case "SECOND" => 1L
    case "MINUTE" => 60L
    case "HOUR" => 3600L
    case "DAY" => 86400L
    case other => throw new IllegalArgumentException(
      s"Unsupported window TVF interval unit '$other'")
  }

  def rewrite(sql: String): String = {
    OtherTvfRe.findFirstMatchIn(sql).foreach(m =>
      throw new IllegalArgumentException(
        s"${m.group(1).toUpperCase} window TVF is not supported by the " +
          "rewrite (one row fans into several windows); use the " +
          "library operators (graft.operators.Events / StreamOps)"))
    TumbleRe.replaceAllIn(sql, m => {
      val table = m.group(1)
      val tcol = m.group(2)
      val n = m.group(3).toLong
      val durSec = n * unitSeconds(m.group(4).toUpperCase.stripSuffix("S"))
      require(durSec > 0, "window size must be positive")
      val ws = s"(FLOOR(unix_seconds($tcol) / $durSec) * $durSec)"
      java.util.regex.Matcher.quoteReplacement(
        s"(SELECT *, timestamp_seconds(CAST($ws AS BIGINT)) AS window_start, " +
          s"timestamp_seconds(CAST($ws + $durSec AS BIGINT)) AS window_end " +
          s"FROM $table)")
    })
  }
}
