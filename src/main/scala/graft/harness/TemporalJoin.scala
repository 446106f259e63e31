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
  * into a join against the INTERVAL-IZED version table: one window pass
  * (`LEAD(time) OVER (PARTITION BY pk ORDER BY time)`) turns each
  * version row into a validity interval `[__vstart, __vend)`, and the
  * temporal join becomes the original equi condition plus a range
  * predicate — for each left row exactly the latest version at or
  * before its time, which is Flink's event-time temporal-join
  * semantics (INNER drops unmatched left rows, LEFT keeps them).
  *
  * Scale shape: the window shuffles only the version table on its
  * primary key, and the join stays a key-partitioned equi join with a
  * residual range filter. The tempting alternative — a correlated
  * LATERAL `ORDER BY time DESC LIMIT 1` subquery — decorrelates into a
  * domain join (distinct left times × the whole version table, a
  * BroadcastNestedLoopJoin): quadratic, measured as a timeout at
  * sf0.1 where the interval form runs in under a second.
  *
  * The versioned table's event-time attribute and primary key come
  * from its DDL (WATERMARK + PRIMARY KEY — the same declarations Flink
  * requires of a versioned table), resolved through the `versionOf`
  * callback so the rewrite stays independent of the harness catalog.
  * The interval columns ride along as `__vstart`/`__vend` on the
  * version alias; explicit projections never see them, and a
  * `SELECT alias.*` is rewritten with a star EXCEPT so they stay
  * hidden there too. A bare `SELECT *` over the join does expose them
  * (a star may belong to any query block, so it cannot be rewritten
  * safely) — project explicitly or qualify the star.
  */
object TemporalJoin {

  /** A versioned table's temporal metadata: event-time column and the
    * key that versions are ordered within.
    */
  final case class VersionMeta(timeCol: String, primaryKey: Seq[String])

  private val Ident = raw"(?:`[^`]+`|[A-Za-z_]\w*)"
  private val Dotted = s"$Ident(?:\\.$Ident)*"

  /** `[LEFT [OUTER]|INNER] JOIN <table> FOR SYSTEM_TIME AS OF <expr>
    * [[AS] <alias>] ON` — `<expr>` is a (possibly qualified) column
    * reference, the only form Flink's time-attribute rules admit; with
    * no alias the table name itself addresses the versioned side.
    */
  private val JoinRe = (
    raw"(?is)\b((?:LEFT|RIGHT|FULL)\s+(?:OUTER\s+)?JOIN|INNER\s+JOIN|JOIN)\s+($Dotted)" +
      raw"\s+FOR\s+SYSTEM_TIME\s+AS\s+OF\s+($Dotted)" +
      raw"(?:\s+(?:AS\s+)?($Ident))?\s+ON\b").r

  private val MarkerRe = raw"(?is)FOR\s+SYSTEM_TIME\s+AS\s+OF".r

  def hasTemporalJoin(sql: String): Boolean =
    MarkerRe.findFirstIn(sql).isDefined

  /** Rewrites every temporal join in `sql`; `versionOf` maps an
    * (unquoted) table name to its temporal metadata. Throws if a
    * temporal join references a table without a time attribute or
    * primary key — same contract as Flink, which rejects temporal
    * joins on non-versioned tables.
    */
  def rewrite(sql: String, versionOf: String => Option[VersionMeta]): String = {
    var out = sql
    val rewrittenAliases = scala.collection.mutable.LinkedHashSet.empty[String]
    var next = JoinRe.findFirstMatchIn(out)
    while (next.isDefined) {
      val m = next.get
      val joinKw = m.group(1).toUpperCase
      // Flink rejects right/full temporal joins; match them explicitly
      // so they fail with the contract instead of half-rewriting
      if (joinKw.startsWith("RIGHT") || joinKw.startsWith("FULL"))
        throw new IllegalArgumentException(
          s"${joinKw.split("\\s+").head} JOIN is not supported with " +
            "FOR SYSTEM_TIME AS OF (only INNER and LEFT temporal joins)")
      val table = m.group(2)
      val asOf = m.group(3)
      // alias optional for a single-part table name: the name itself
      // (with its backticks, if any) addresses the versioned side. A
      // qualified name can't alias its own subquery, so require one.
      val alias = Option(m.group(4)).getOrElse {
        if (!table.matches(s"^$Ident$$"))
          throw new IllegalArgumentException(
            s"Temporal join over qualified table '$table' requires an alias")
        table
      }
      val (cond, condEnd) = scanOnCondition(out, m.end)
      val tbl = DdlParser.unquoteName(table)
      val meta = versionOf(tbl).getOrElse(throw new IllegalArgumentException(
        s"Temporal join over '$tbl' requires an event-time attribute " +
          "(declare WATERMARK FOR <col> in its DDL)"))
      if (meta.primaryKey.isEmpty) throw new IllegalArgumentException(
        s"Temporal join over '$tbl' requires a PRIMARY KEY " +
          "(versions are ordered within it)")
      val ts = meta.timeCol
      val pk = meta.primaryKey.mkString(", ")
      val outerKw = if (joinKw.startsWith("LEFT")) "LEFT OUTER JOIN" else "JOIN"
      val replacement =
        s"$outerKw (SELECT *, $ts AS __vstart, " +
          s"LEAD($ts) OVER (PARTITION BY $pk ORDER BY $ts) AS __vend " +
          s"FROM $table) AS $alias " +
          s"ON ($cond) AND $asOf >= $alias.__vstart " +
          s"AND ($alias.__vend IS NULL OR $asOf < $alias.__vend)"
      // trailing space: condEnd sits directly on the next clause keyword
      out = out.substring(0, m.start) + replacement + " " + out.substring(condEnd)
      rewrittenAliases += alias
      next = JoinRe.findFirstMatchIn(out)
    }
    // `SELECT v.*` over a temporal alias must not expose the interval
    // helpers — strip them with a qualified star EXCEPT. Applied only
    // to single-SELECT statements: in a multi-block statement (UNION,
    // subqueries) the same alias may bind a non-temporal table in
    // another block, where the EXCEPT would fail analysis. (A bare
    // `SELECT *` is never rewritten for the same reason: star EXCEPT
    // fails on scopes that don't carry the helpers.)
    // counted on the ORIGINAL statement — the rewrite itself injects
    // version subqueries (one SELECT each)
    val singleBlock =
      raw"(?is)\bSELECT\b".r.findAllMatchIn(sql).take(2).size == 1
    if (singleBlock) rewrittenAliases.foreach { a =>
      val starRe =
        ("(?is)(?<![\\w`.])" + java.util.regex.Pattern.quote(a) +
          raw"\s*\.\s*\*").r
      out = starRe.replaceAllIn(out, java.util.regex.Matcher.quoteReplacement(
        s"$a.* EXCEPT (__vstart, __vend)"))
    }
    // a FOR SYSTEM_TIME AS OF form JoinRe did not match (AS OF
    // PROCTIME(), a subquery join input, ...) must fail with the
    // contract here — leaked Flink syntax would surface as Spark
    // parser noise (same residual check as WindowTvf.rewrite)
    MarkerRe.findFirstMatchIn(out).foreach(_ =>
      throw new IllegalArgumentException(
        "Unsupported FOR SYSTEM_TIME AS OF form: only " +
          "[INNER|LEFT [OUTER]] JOIN <versioned table> FOR SYSTEM_TIME " +
          "AS OF <time column> [AS alias] ON ... is recognized"))
    out
  }

  /** Clause keywords that terminate an ON condition at paren depth 0. */
  private val Stops = Set(
    "WHERE", "GROUP", "ORDER", "HAVING", "LIMIT", "QUALIFY", "WINDOW",
    "UNION", "INTERSECT", "EXCEPT",
    "JOIN", "LEFT", "RIGHT", "FULL", "INNER", "CROSS", "NATURAL")

  /** Consumes the ON condition starting at `from`: everything up to the
    * next top-level clause keyword, an unmatched `)` (the join sits
    * inside a subquery or CTE), or end of statement — skipping over
    * parenthesized groups and quoted literals/identifiers. A stop
    * keyword preceded by `.` is a qualified column segment (`o.left`),
    * not a clause.
    */
  private def scanOnCondition(sql: String, from: Int): (String, Int) = {
    var i = from
    var depth = 0
    var end = sql.length
    while (i < sql.length) {
      sql.charAt(i) match {
        case '(' => depth += 1; i += 1
        case ')' if depth == 0 => end = i; i = sql.length
        case ')' => depth -= 1; i += 1
        case q @ ('\'' | '"' | '`') => i = skipQuoted(sql, i, q)
        case c if c.isLetter || c == '_' =>
          val s = i
          while (i < sql.length &&
            (sql.charAt(i).isLetterOrDigit || sql.charAt(i) == '_')) i += 1
          val qualified = s > 0 && sql.charAt(s - 1) == '.'
          if (depth == 0 && !qualified &&
            Stops(sql.substring(s, i).toUpperCase)) {
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
