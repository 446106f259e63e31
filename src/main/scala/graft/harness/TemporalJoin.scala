package graft.harness

import graft.harness.ddl.DdlParser

/** Flink `FOR SYSTEM_TIME AS OF` temporal-join rewrite.
  *
  * The reference router passes a Flink temporal join through to the
  * engine verbatim (`SQLSubmitAction.java:76`); Spark's parser rejects
  * the syntax, so the harness rewrites
  *
  * {{{ [LEFT] JOIN versioned FOR SYSTEM_TIME AS OF l.t AS v ON <cond> }}}
  *
  * into a correlated LATERAL top-1 subquery over the versioned table:
  * for each left row, the latest version with `v.<time> <= l.t` that
  * satisfies the join condition — exactly Flink's event-time temporal
  * join semantics (INNER drops unmatched left rows, LEFT keeps them).
  * Catalyst decorrelates the LIMIT-1 lateral into a ranked join, so the
  * plan shuffles once on the correlated keys — no per-row re-scan.
  *
  * The versioned table's event-time attribute comes from its DDL
  * watermark (Flink requires the same declaration), resolved through
  * the `timeAttrOf` callback so the rewrite stays independent of the
  * harness catalog.
  */
object TemporalJoin {

  private val Ident = raw"(?:`[^`]+`|[A-Za-z_]\w*)"
  private val Dotted = s"$Ident(?:\\.$Ident)*"

  /** `[LEFT [OUTER]|INNER] JOIN <table> FOR SYSTEM_TIME AS OF <expr>
    * [AS] <alias> ON` — `<expr>` is a (possibly qualified) column
    * reference, the only form Flink's time-attribute rules admit.
    */
  private val JoinRe = (
    raw"(?is)\b(LEFT\s+(?:OUTER\s+)?JOIN|INNER\s+JOIN|JOIN)\s+($Dotted)" +
      raw"\s+FOR\s+SYSTEM_TIME\s+AS\s+OF\s+($Dotted)" +
      raw"\s+(?:AS\s+)?($Ident)\s+ON\b").r

  private val MarkerRe = raw"(?is)FOR\s+SYSTEM_TIME\s+AS\s+OF".r

  def hasTemporalJoin(sql: String): Boolean =
    MarkerRe.findFirstIn(sql).isDefined

  /** Rewrites every temporal join in `sql`; `timeAttrOf` maps an
    * (unquoted) table name to its event-time column. Throws if a
    * temporal join references a table without one — same contract as
    * Flink, which rejects temporal joins on non-versioned tables.
    */
  def rewrite(sql: String, timeAttrOf: String => Option[String]): String = {
    var out = sql
    var next = JoinRe.findFirstMatchIn(out)
    while (next.isDefined) {
      val m = next.get
      val joinKw = m.group(1).toUpperCase
      val table = m.group(2)
      val asOfExpr = m.group(3)
      val alias = m.group(4)
      val (cond, condEnd) = scanOnCondition(out, m.end)
      val tbl = DdlParser.unquoteName(table)
      val ts = timeAttrOf(tbl).getOrElse(throw new IllegalArgumentException(
        s"Temporal join over '$tbl' requires an event-time attribute " +
          "(declare WATERMARK FOR <col> in its DDL)"))
      val outerKw = if (joinKw.startsWith("LEFT")) "LEFT OUTER JOIN" else "JOIN"
      val replacement =
        s"$outerKw LATERAL (SELECT * FROM $table AS $alias " +
          s"WHERE ($cond) AND $alias.$ts <= $asOfExpr " +
          s"ORDER BY $alias.$ts DESC LIMIT 1) AS $alias ON TRUE"
      // trailing space: condEnd sits directly on the next clause keyword
      out = out.substring(0, m.start) + replacement + " " + out.substring(condEnd)
      next = JoinRe.findFirstMatchIn(out)
    }
    out
  }

  /** Clause keywords that terminate an ON condition at paren depth 0. */
  private val Stops = Set(
    "WHERE", "GROUP", "ORDER", "HAVING", "LIMIT", "QUALIFY", "WINDOW",
    "UNION", "INTERSECT", "EXCEPT",
    "JOIN", "LEFT", "RIGHT", "FULL", "INNER", "CROSS", "NATURAL")

  /** Consumes the ON condition starting at `from`: everything up to the
    * next top-level clause keyword or end of statement, skipping over
    * parenthesized groups and quoted literals/identifiers.
    */
  private def scanOnCondition(sql: String, from: Int): (String, Int) = {
    var i = from
    var depth = 0
    var end = sql.length
    while (i < sql.length) {
      sql.charAt(i) match {
        case '(' => depth += 1; i += 1
        case ')' => depth -= 1; i += 1
        case q @ ('\'' | '"' | '`') => i = skipQuoted(sql, i, q)
        case c if c.isLetter || c == '_' =>
          val s = i
          while (i < sql.length &&
            (sql.charAt(i).isLetterOrDigit || sql.charAt(i) == '_')) i += 1
          if (depth == 0 && Stops(sql.substring(s, i).toUpperCase)) {
            end = s
            i = sql.length
          }
        case _ => i += 1
      }
    }
    (sql.substring(from, end).trim, end)
  }

  /** Past a quoted region; doubled quotes escape within '...' and `...`. */
  private def skipQuoted(sql: String, start: Int, q: Char): Int = {
    var i = start + 1
    while (i < sql.length) {
      if (sql.charAt(i) == q) {
        if (i + 1 < sql.length && sql.charAt(i + 1) == q) i += 2
        else return i + 1
      } else i += 1
    }
    sql.length
  }
}
