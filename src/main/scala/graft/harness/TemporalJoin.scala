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

  /** Number of `FOR SYSTEM_TIME AS OF` joins in `sql` (each carries
    * exactly one JOIN keyword) — the view registry compares this
    * against the body's total JOIN-keyword count to detect a REGULAR
    * join alongside the temporal ones, which drops the rowtime
    * attribute in Flink. Callers pass masked text.
    */
  def temporalJoinCount(sql: String): Int =
    MarkerRe.findAllIn(sql).size

  /** A Flink VERSIONED VIEW: a deduplication view over a changelog —
    * the `FOR SYSTEM_TIME AS OF` version side Flink accepts without a
    * DDL-declared versioned table (reference pass-through surface,
    * `SQLSubmitAction.java:76`). The shape infers the temporal
    * metadata: PARTITION BY columns are the primary key, the
    * descending ORDER BY column is the version time (Flink requires
    * it to be the source's event-time attribute — the CALLER checks
    * that, plus that the projection keeps the key and time columns).
    * The view's rn = 1 output is only the LATEST version; a temporal
    * join needs the full history, so the join rewrites against
    * `SELECT <cols> FROM <srcTable>` instead of the view itself.
    */
  final case class VersionedView(srcTable: String, timeCol: String,
      primaryKey: Seq[String], items: Seq[(String, String)]) {
    /** View-output column names, in projection order. */
    def cols: Seq[String] = items.map(_._2)
    /** The OUTPUT name the source column `src` rides out under —
      * itself when the projection keeps the name (r20: in-body `AS`
      * renames are legal in Flink dedup views, so the join's ON/meta
      * references resolve against the RENAMED columns). */
    def outNameOf(src: String): String =
      items.find(_._1.equalsIgnoreCase(src)).map(_._2).getOrElse(src)
  }

  /** A select-list item of the dedup view's outer projection: a
    * simple (optionally qualified) column, optionally renamed under a
    * plain alias — `[q.]col`, `[q.]col AS out`, `[q.]col out`. Any
    * real expression around the column drops the versioned shape. */
  private val VvItemRe = (raw"(?is)^(?:[A-Za-z_]\w*\.)?([A-Za-z_]\w*)" +
    raw"(?:\s+(?:AS\s+)?([A-Za-z_]\w*))?$$").r

  /** Parses the versioned-view shape from an (unticked) CREATE VIEW
    * body: `SELECT <simple cols> FROM (SELECT *, ROW_NUMBER() OVER
    * (PARTITION BY <keys> ORDER BY <tcol> DESC) AS <rn> FROM <src>)
    * [alias] WHERE <rn> = 1`. ASC ordering is keep-FIRST
    * deduplication, not a version history — no match. Projecting the
    * rank column (under any name), a star, or expression items: no
    * match (the caller then raises the named non-versioned rejection
    * on a temporal join over the view). Items may carry a plain
    * alias (r20: `ts AS version_ts` is a Flink-legal rename — the
    * (source, output) pairs ride [[VersionedView.items]]).
    */
  def versionedViewOf(body: String): Option[VersionedView] = {
    val masked = MatchRecognize.maskQuoted(body)
    for {
      om <- raw"(?is)^\s*SELECT\s+(.*?)\s+FROM\s*\(".r
        .findFirstMatchIn(masked)
      open = om.end - 1
      end <- scala.util.Try(MatchRecognize.closeParen(masked, open)).toOption
      im <- (raw"(?is)^\s*SELECT\s+\*\s*,\s*ROW_NUMBER\s*\(\s*\)\s+" +
        raw"OVER\s*\(\s*PARTITION\s+BY\s+(.+?)\s+ORDER\s+BY\s+" +
        raw"([A-Za-z_]\w*)\s+DESC\s*\)\s+AS\s+([A-Za-z_]\w*)\s+" +
        raw"FROM\s+([A-Za-z_][\w.]*)\s*$$").r
        .findFirstMatchIn(masked.substring(open + 1, end - 1))
      wm <- (raw"(?is)^(?:(?:AS\s+)?[A-Za-z_]\w*\s+)?WHERE\s+" +
        raw"(?:[A-Za-z_]\w*\.)?([A-Za-z_]\w*)\s*=\s*1\s*;?\s*$$").r
        .findFirstMatchIn(masked.substring(end).trim)
      if wm.group(1).equalsIgnoreCase(im.group(3))
      keys = MatchRecognize.splitTopLevel(im.group(1)).map(_.trim)
      if keys.nonEmpty && keys.forall(_.matches(raw"^[A-Za-z_]\w*$$"))
      items <- MatchRecognize.splitTopLevel(om.group(1)).map(_.trim)
        .foldLeft(Option(Seq.empty[(String, String)])) { (acc, it) =>
          acc.flatMap(ps => it match {
            case VvItemRe(src, out) =>
              Some(ps :+ (src, Option(out).getOrElse(src)))
            case _ => None
          })
        }
      if items.nonEmpty
      // the rank column stays internal: projecting it under ANY name
      // would expose rank values as data on the version side
      if !items.exists(_._1.equalsIgnoreCase(im.group(3)))
    } yield VersionedView(im.group(4), im.group(2), keys, items)
  }

  /** `JOIN <versioned view> FOR SYSTEM_TIME AS OF` → the same join
    * over the view's HISTORY relation: the rn = 1 view output holds
    * only the latest version per key, so the rewrite reads
    * `SELECT <view cols> FROM <source>` — registered as a `graft_vv_`
    * temp view whose derived VersionMeta (ORDER BY time column,
    * PARTITION BY primary key) is handed to `metaOut` — the way
    * Flink's planner resolves a versioned view to the underlying
    * changelog. An alias-free form gets the view's own name as the
    * alias so the statement's qualified references keep resolving.
    * Names `viewOf` does not know pass through untouched and hit the
    * named rejection downstream.
    */
  /** The deterministic history-relation name a versioned view `name`
    * substitutes to. The sanitized name alone can collide (`my.latest`
    * vs `my_latest`) — a hash of the lowercased original is suffixed
    * so two distinct views never share one history view (r19 review).
    * Shared with the registry's eviction so a dropped/replaced view's
    * VersionMeta entry never outlives it (r20 advice).
    */
  def historyNameOf(name: String): String =
    "graft_vv_" + name.toLowerCase.replaceAll(raw"\W", "_") + "_" +
      (name.toLowerCase.hashCode & 0x7fffffff)

  def substituteVersionedViews(spark: org.apache.spark.sql.SparkSession,
      sql: String, viewOf: String => Option[VersionedView],
      metaOut: (String, VersionMeta) => Unit): String = {
    val JoinTargetRe = (raw"(?is)\b(JOIN\s+)([\w.`]+)" +
      raw"(\s+FOR\s+SYSTEM_TIME\s+AS\s+OF\s+[\w.`]+)" +
      raw"((?:\s+(?:AS\s+)?(?!ON\b)[A-Za-z_]\w*)?)").r
    val masked = MatchRecognize.maskQuoted(sql)
    val out = new StringBuilder
    var last = 0
    JoinTargetRe.findAllMatchIn(masked).foreach { m =>
      val name = DdlParser.unquoteName(sql.substring(m.start(2), m.end(2)))
      viewOf(name).foreach { vv =>
        val hist = historyNameOf(name)
        // re-created per statement: the source temp view may have been
        // re-registered (mode flip, re-run) since the last use. The
        // projection carries the view's renames, and the meta names
        // the OUTPUT columns — the statement's ON clause references
        // the view's surface, not the source's (r20)
        spark.sql(s"CREATE OR REPLACE TEMPORARY VIEW $hist AS " +
          s"SELECT ${vv.items.map { case (s, o) =>
            if (s == o) s else s"$s AS $o" }.mkString(", ")} " +
          s"FROM ${vv.srcTable}")
        metaOut(hist, VersionMeta(vv.outNameOf(vv.timeCol),
          vv.primaryKey.map(vv.outNameOf)))
        out.append(sql.substring(last, m.start(2))).append(hist)
          .append(sql.substring(m.end(2), m.end(3)))
        val aliasPart = sql.substring(m.start(4), m.end(4))
        if (aliasPart.trim.isEmpty)
          out.append(s" AS ${name.split('.').last}")
        else out.append(aliasPart)
        last = m.end
      }
    }
    out.append(sql.substring(last))
    out.toString
  }

  /** For the CLI's event-time view registry
    * (SqlSubmitAction.recordViewWatermark): the PROBE (left) table and
    * its alias of the first `FOR SYSTEM_TIME AS OF` join in `sql` —
    * Flink's law: a temporal join preserves the probe side's rowtime,
    * so a view over one can feed a downstream window/OVER/top-N. Runs
    * on masked text; None when the FROM region before the join is not
    * a single named table (the streaming rewrite would reject such a
    * shape anyway). */
  def probeOf(sql: String): Option[(String, String)] = {
    val masked = MatchRecognize.maskQuoted(sql)
    for {
      jm <- JoinRe.findFirstMatchIn(masked)
      fm <- (raw"(?is)\bFROM\s+($Dotted)" +
        raw"(?:\s+(?:AS\s+)?(?!JOIN\b|LEFT\b|RIGHT\b|FULL\b|INNER\b)" +
        raw"($Ident))?\s*$$").r
        .findFirstMatchIn(masked.substring(0, jm.start).trim)
      // group text re-read from the raw statement (masking blanks
      // backtick-quoted names but preserves offsets; trim drops the
      // same leading run in both)
      rawHead = sql.substring(0, jm.start).trim
      table = DdlParser.unquoteName(rawHead.substring(fm.start(1), fm.end(1)))
      alias = Option(fm.group(2))
        .map(_ => DdlParser.unquoteName(
          rawHead.substring(fm.start(2), fm.end(2))))
        .getOrElse(table.split('.').last)
    } yield (table, alias)
  }

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
      val (leftJoin, table, alias) = parseJoinHead(m)
      val asOf = m.group(3)
      val (cond, condEnd) = scanOnCondition(out, m.end)
      val tbl = DdlParser.unquoteName(table)
      val meta = versionOf(tbl).getOrElse(throw new IllegalArgumentException(
        s"Temporal join over '$tbl' requires an event-time attribute " +
          "(declare WATERMARK FOR <col> in its DDL), or a versioned " +
          "VIEW: SELECT <cols> FROM (SELECT *, ROW_NUMBER() OVER " +
          "(PARTITION BY <key> ORDER BY <watermarked time col> DESC) " +
          "AS rn FROM <watermarked table>) WHERE rn = 1"))
      if (meta.primaryKey.isEmpty) throw new IllegalArgumentException(
        s"Temporal join over '$tbl' requires a PRIMARY KEY " +
          "(versions are ordered within it)")
      val ts = meta.timeCol
      val pk = meta.primaryKey.mkString(", ")
      val outerKw = if (leftJoin) "LEFT OUTER JOIN" else "JOIN"
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

  private val viewCounter = new java.util.concurrent.atomic.AtomicLong

  private val QualStarRe = raw"(?is)^([A-Za-z_]\w*)\s*\.\s*\*$$".r

  /** Shared validation of a [[JoinRe]] match's head — join kind and
    * versioned-side naming — used by the batch AND streaming rewrites
    * so the contracts cannot diverge: Flink rejects RIGHT/FULL
    * temporal joins; an alias is optional for a single-part table
    * name (the name itself addresses the versioned side) and required
    * for a qualified one. Returns (leftJoin, table text, alias). */
  private def parseJoinHead(m: scala.util.matching.Regex.Match):
      (Boolean, String, String) =
    parseJoinHead(m.group(1), m.group(2), Option(m.group(4)))

  private def parseJoinHead(joinKw0: String, table: String,
      aliasOpt: Option[String]): (Boolean, String, String) = {
    val joinKw = joinKw0.toUpperCase
    if (joinKw.startsWith("RIGHT") || joinKw.startsWith("FULL"))
      throw new IllegalArgumentException(
        s"${joinKw.split("\\s+").head} JOIN is not supported with " +
          "FOR SYSTEM_TIME AS OF (only INNER and LEFT temporal joins)")
    val alias = aliasOpt.getOrElse {
      if (!table.matches(s"^$Ident$$"))
        throw new IllegalArgumentException(
          s"Temporal join over qualified table '$table' requires an alias")
      table
    }
    (joinKw.startsWith("LEFT"), table, alias)
  }

  /** Streaming `FOR SYSTEM_TIME AS OF` — Flink's event-time temporal
    * join as a stream-stream operator, compiled onto
    * [[graft.streaming.TemporalJoinTracker.joinRows]]. The accepted
    * shape is Flink's canonical one:
    *
    * {{{ SELECT ... FROM probe [AS] p
    *     [INNER|LEFT [OUTER]] JOIN versioned FOR SYSTEM_TIME AS OF
    *       p.row_time [AS] v
    *     ON p.k = v.k [AND ...] [WHERE ...] }}}
    *
    * Both sides must be stream relations (or both bounded — then the
    * tracker runs in batch with MAX_WATERMARK-at-end finality); the
    * probe needs a WATERMARK whose column IS the AS OF column, the
    * versioned side needs WATERMARK (version order) + PRIMARY KEY,
    * and the ON conjunction must equate exactly that primary key with
    * probe columns — Flink's own versioned-table requirements. Each
    * side's rows ride the shared exact state carrier as a JSON
    * payload keyed by the JSON equi-key tuple (version keys cast to
    * the probe key types so the textual keys agree); probes mature
    * when the watermark STRICTLY passes their event time, versions
    * retain latest-at-watermark plus newer — per-key state bounded by
    * the watermark delay plus one version. The outer select and a
    * residual WHERE splice over the decoded view: `p.c`/`v.c`
    * references (and unambiguous bare columns, and `p.*`/`v.*`/`*`
    * stars) rewrite to the decoded columns. INNER filters unmatched
    * probes; LEFT null-extends the version side.
    */
  def rewriteStreaming(
      spark: org.apache.spark.sql.SparkSession,
      sql: String,
      watermarkOf: String => Option[(String, String)],
      versionOf: String => Option[VersionMeta],
      // Flink `table.exec.state.ttl` → idle version-state retention:
      // a key's versions drop once it has gone this long past the
      // watermark with no pending probes (0 = retain the latest
      // version indefinitely, Flink's default)
      stateTtlSec: Long = 0L): String = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.{StructField, StructType}
    def fail(msg: String): Nothing = throw new IllegalArgumentException(msg)

    // tolerated statement heads: INSERT INTO, and CREATE VIEW (r18 —
    // a temporal-join view keeps the probe's rowtime, Flink's law, so
    // a view body may hold the join; the CLI registry records the
    // propagated attribute, see SqlSubmitAction.recordViewWatermark)
    // the column-alias list tolerates quoted parens in COMMENT
    // clauses — the SAME shared fragment CreateViewRe interpolates, so
    // a `COMMENT 'pct)'` cuts neither parse short
    val colListP = DdlParser.ColListFragment
    val insM = (raw"(?is)^(\s*INSERT\s+INTO\s+[\w.`]+\s*(?:$colListP)?\s+" +
      raw"|\s*CREATE\s+(?:OR\s+REPLACE\s+)?(?:TEMPORARY\s+)?VIEW\s+" +
      raw"(?:IF\s+NOT\s+EXISTS\s+)?[\w.`]+\s*(?:$colListP)?\s*AS\s+)?(.*)$$").r
      .findFirstMatchIn(sql).get
    val insertPrefix = Option(insM.group(1)).getOrElse("")
    val stmt = insM.group(2)
    val masked = MatchRecognize.maskQuoted(stmt)

    // --- collect every temporal join, left to right (r17: Flink
    // chains temporal joins — a fact enriched by several dimension
    // histories in one SELECT; each stage's enriched output feeds the
    // next stage's probe side) ---
    final case class Stage(leftJoin: Boolean, vTable: String,
        vAlias: String, asOfRaw: String, cond: String, start: Int,
        condEnd: Int)
    val jms = JoinRe.findAllMatchIn(masked).toList
    if (jms.isEmpty) fail(
      "unsupported streaming FOR SYSTEM_TIME AS OF form: expected " +
        "[INNER|LEFT [OUTER]] JOIN <versioned table> FOR SYSTEM_TIME " +
        "AS OF <probe time column> [AS alias] ON ...")
    val stages = scala.collection.mutable.ArrayBuffer.empty[Stage]
    var scanned = 0
    jms.foreach { m =>
      if (m.start < scanned) fail(
        "nested FOR SYSTEM_TIME AS OF forms are unsupported")
      // group text re-read from the RAW statement: the match ran on
      // the masked text, where backtick-quoted names are blanked
      def rawGroup(i: Int): String =
        if (m.group(i) == null) null
        else stmt.substring(m.start(i), m.end(i))
      val (leftJoin, vTableRaw, vAliasRaw) =
        parseJoinHead(rawGroup(1), rawGroup(2), Option(rawGroup(4)))
      val (cond, condEnd) = scanOnCondition(stmt, m.end)
      if (stages.nonEmpty &&
          stmt.substring(stages.last.condEnd, m.start).trim.nonEmpty)
        fail("only FOR SYSTEM_TIME AS OF joins may chain in one " +
          "statement; found '" +
          stmt.substring(stages.last.condEnd, m.start).trim.take(40) +
          "' between them")
      stages += Stage(leftJoin, DdlParser.unquoteName(vTableRaw),
        DdlParser.unquoteName(vAliasRaw), rawGroup(3), cond, m.start,
        condEnd)
      scanned = condEnd
    }

    val selM = raw"(?is)^\s*SELECT\s+".r.findFirstMatchIn(masked)
      .getOrElse(fail("expected SELECT ... FROM for the streaming " +
        "temporal-join rewrite"))
    val fromIdx = WindowTvf.findTopLevel(masked, selM.end, "FROM")
      .filter(_ < stages.head.start)
      .getOrElse(fail("expected FROM <probe table> before the temporal join"))
    val selectList = stmt.substring(selM.end, fromIdx).trim
    val probeRegion = stmt.substring(fromIdx, stages.head.start).trim
    // the probe table accepts the same Ident/Dotted form as the
    // versioned side (backtick-quoted names included, r17)
    val pm = (raw"(?is)^FROM\s+($Dotted)" +
      raw"(?:\s+(?:AS\s+)?($Ident))?\s*$$").r
      .findFirstMatchIn(probeRegion).getOrElse(fail(
        "streaming temporal join takes a single named probe table in " +
          s"FROM; got '$probeRegion'"))
    val pTable = DdlParser.unquoteName(pm.group(1))
    // a qualified probe name cannot qualify column references — the
    // same alias rule the versioned side gets
    val pAlias = Option(pm.group(2)).map(DdlParser.unquoteName).getOrElse {
      if (!pm.group(1).matches(s"^$Ident$$"))
        fail(s"Temporal join probe over qualified table " +
          s"'${pm.group(1)}' requires an alias")
      pTable
    }

    val tailRest =
      stmt.substring(stages.last.condEnd).trim.stripSuffix(";").trim
    val whereResidual =
      if (tailRest.isEmpty) None
      else Some(raw"(?is)^WHERE\b(.*)$$".r.findFirstMatchIn(tailRest)
        .getOrElse(fail("streaming temporal join supports a residual " +
          "WHERE only after the ON condition — aggregate, window, or " +
          s"order in a separate statement; got '${tailRest.take(40)}'"))
        .group(1).trim)
    if (MarkerRe.findFirstMatchIn(
          masked.substring(0, stages.head.start)).isDefined ||
        MarkerRe.findFirstMatchIn(
          masked.substring(stages.last.condEnd)).isDefined)
      fail("unsupported FOR SYSTEM_TIME AS OF placement: only a chain " +
        "of [INNER|LEFT] temporal joins after FROM <probe> is " +
        "recognized in streaming mode")

    val (pWmCol, pDelay) = watermarkOf(pTable).getOrElse(fail(
      s"streaming temporal join needs a WATERMARK declaration on $pTable"))

    val pSrc = spark.table(pTable)
    def fieldOf(df: org.apache.spark.sql.DataFrame, table: String,
        c: String): StructField =
      df.schema.fields.find(_.name.equalsIgnoreCase(c)).getOrElse(
        fail(s"column $c not found in $table"))
    def carrier(f: StructField) = graft.streaming.StateFormat.carrierOf(f)
    val pFields = pSrc.schema.fields.toSeq.filter(f => carrier(f).isDefined)

    // alias -> (output column name -> decoded field in the CURRENT
    // enriched relation), in declaration order — drives ON/select/
    // WHERE reference resolution and star expansion across stages
    val aliasCols = scala.collection.mutable.LinkedHashMap[String,
      scala.collection.mutable.LinkedHashMap[String, String]]()
    aliasCols(pAlias.toLowerCase) =
      scala.collection.mutable.LinkedHashMap.from(
        pFields.map(f => f.name -> f.name))
    def resolveQual(q: String, c: String): Option[String] =
      aliasCols.get(q.toLowerCase).map(m =>
        m.collectFirst { case (out, fld) if out.equalsIgnoreCase(c) => fld }
          .getOrElse(fail(s"column $c not found (or not exactly " +
            s"carrier-able) on relation '$q'")))

    var cur: org.apache.spark.sql.DataFrame = pSrc
    var curWmField: String = fieldOf(pSrc, pTable, pWmCol).name
    val droppedAll = scala.collection.mutable.ArrayBuffer.empty[String]
    droppedAll ++=
      (pSrc.schema.fields.toSeq.map(_.name) diff pFields.map(_.name))

    stages.zipWithIndex.foreach { case (st, stageIdx) =>
      val vTable = st.vTable
      val vAlias = st.vAlias
      if (aliasCols.contains(vAlias.toLowerCase))
        fail(s"duplicate relation alias '$vAlias' in the temporal-join " +
          "chain — give each versioned side a distinct alias")
      // AS OF must reference the PROBE's event-time column (every
      // stage of a Flink chain enriches as of the fact row's time)
      st.asOfRaw.split('.').map(DdlParser.unquoteName) match {
        case Array(c) =>
          if (!c.equalsIgnoreCase(pWmCol))
            fail(s"FOR SYSTEM_TIME AS OF must be $pTable's event-time " +
              s"column ($pWmCol); got $c")
        case Array(q, c) =>
          val resolved = resolveQual(q, c).getOrElse(
            fail("FOR SYSTEM_TIME AS OF must reference the probe " +
              s"table's event-time column; got ${st.asOfRaw}"))
          if (!resolved.equalsIgnoreCase(curWmField))
            fail(s"FOR SYSTEM_TIME AS OF must be $pTable's event-time " +
              s"column ($pWmCol); got ${st.asOfRaw}")
        case _ => fail("FOR SYSTEM_TIME AS OF must reference the probe " +
          s"table's event-time column; got ${st.asOfRaw}")
      }
      val meta = versionOf(vTable).getOrElse(fail(
        s"Temporal join over '$vTable' requires an event-time attribute " +
          "(declare WATERMARK FOR <col> in its DDL), or a versioned " +
          "VIEW: SELECT <cols> FROM (SELECT *, ROW_NUMBER() OVER " +
          "(PARTITION BY <key> ORDER BY <watermarked time col> DESC) " +
          "AS rn FROM <watermarked table>) WHERE rn = 1"))
      if (meta.primaryKey.isEmpty) fail(
        s"Temporal join over '$vTable' requires a PRIMARY KEY " +
          "(versions are ordered within it)")

      // ON: a conjunction of probe-column = version-column equalities
      // covering exactly the version table's primary key; the probe
      // side may qualify with ANY earlier alias of the chain
      val pairs = MatchRecognize.splitTopLevelAnd(st.cond).map { c =>
        val em = raw"(?is)^\s*([\w.]+)\s*=\s*([\w.]+)\s*$$".r
          .findFirstMatchIn(c).getOrElse(fail(
            "streaming temporal join ON takes a conjunction of column " +
              s"equalities; got '$c'"))
        def side(ref: String): (String, String) = ref.split('.') match {
          case Array(c0) => ("", c0)
          case Array(q, c0) => (q.toLowerCase, c0)
          case _ => fail(s"cannot resolve ON reference $ref")
        }
        val (q1, c1) = side(em.group(1))
        val (q2, c2) = side(em.group(2))
        val va = vAlias.toLowerCase
        if (aliasCols.contains(q1) && q2 == va)
          (resolveQual(q1, c1).get, c2)
        else if (q1 == va && aliasCols.contains(q2))
          (resolveQual(q2, c2).get, c1)
        else fail("streaming temporal join ON equalities must pair a " +
          "probe-side column with a version column (qualify both " +
          s"sides): got '$c'")
      }
      val vKeyCols = pairs.map(_._2)
      if (vKeyCols.size != meta.primaryKey.size ||
          !meta.primaryKey.map(_.toLowerCase).toSet
            .subsetOf(vKeyCols.map(_.toLowerCase).toSet))
        fail(s"streaming temporal join ON must equate exactly $vTable's " +
          s"PRIMARY KEY (${meta.primaryKey.mkString(", ")}); got " +
          s"(${vKeyCols.mkString(", ")})")

      val vSrc = spark.table(vTable)
      if (pSrc.isStreaming != vSrc.isStreaming)
        fail("streaming temporal join takes two stream (or two bounded) " +
          "sides; enrich against a STATIC table with a plain join " +
          "view instead (the lookup-join form)")
      val curFields = cur.schema.fields.toSeq.filter(f => carrier(f).isDefined)
      val vFields = vSrc.schema.fields.toSeq.filter(f => carrier(f).isDefined)
      droppedAll ++=
        (vSrc.schema.fields.toSeq.map(_.name) diff vFields.map(_.name))

      def curField(c: String): StructField =
        cur.schema.fields.find(_.name.equalsIgnoreCase(c)).get
      // version key columns cast to the probe key types so the textual
      // JSON keys agree
      val keyP = to_json(struct(pairs.zipWithIndex.map { case ((pf, _), i) =>
        col(s"`${curField(pf).name}`").as(s"k$i") }: _*))
      val keyV = to_json(struct(pairs.zipWithIndex.map { case ((pf, vc), i) =>
        col(s"`${fieldOf(vSrc, vTable, vc).name}`")
          .cast(curField(pf).dataType).as(s"k$i") }: _*))
      def payload(fields: Seq[StructField]) =
        to_json(struct(fields.map(f => carrier(f).get.enc.as(f.name)): _*))
      val vTime = fieldOf(vSrc, vTable, meta.timeCol).name
      // a CHAINED stage consumes the previous tracker's watermark-gated
      // emissions: mark the input never-late and define no second
      // watermark node (see Watermarks.neverLate / ensure). Stage 0
      // chains too when the PROBE itself is a windowed pre-agg view
      // (r17 two-stage pipelines). STREAMING only — on a bounded run
      // the tagged sentinel would make batch GroupState report a
      // watermark as present, suppressing the MAX_WATERMARK-at-end
      // finality path
      val chained = (stageIdx > 0 ||
        graft.streaming.Watermarks.isChained(cur)) && pSrc.isStreaming
      def sentinel(cols: Seq[org.apache.spark.sql.Column]) =
        if (chained) cols :+ graft.streaming.Watermarks.neverLate else cols
      val pRows = cur
        .filter(col(s"`${curField(curWmField).name}`").isNotNull)
        .select(sentinel(Seq(keyP.as("key"),
          graft.streaming.Watermarks.eventTimeCol(cur, curWmField, "ts"),
          lit(false).as("isVersion"), payload(curFields).as("payload"))): _*)
      // a NULL version key or time can never match (SQL equality) —
      // drop those rows so the JSON key of a null-keyed probe (which
      // omits the field) cannot collide with a null-keyed version. The
      // null test runs on the POST-CAST value: a version key whose cast
      // to the probe type nulls out would otherwise slip through and
      // key as the empty tuple
      val vRows = vSrc
        .filter(pairs.map { case (pf, vc) =>
          col(s"`${fieldOf(vSrc, vTable, vc).name}`")
            .cast(curField(pf).dataType).isNotNull }
          .reduce(_ && _) && col(s"`$vTime`").isNotNull)
        .select(sentinel(Seq(keyV.as("key"),
          graft.streaming.Watermarks.eventTimeCol(vSrc, meta.timeCol, "ts"),
          lit(true).as("isVersion"), payload(vFields).as("payload"))): _*)
      implicit val rowEnc =
        org.apache.spark.sql.Encoders.product[graft.streaming.TemporalRow]
      val input = pRows.unionAll(vRows).as[graft.streaming.TemporalRow]
      val tracked0 =
        graft.streaming.TemporalJoinTracker
          .joinRows(input, pDelay, stateTtlSec).toDF()
      val tracked =
        if (st.leftJoin) tracked0
        else tracked0.filter(col("versionPayload").isNotNull)

      val opts = Map("allowNonNumericNumbers" -> "true")
      def storage(fields: Seq[StructField]) = StructType(fields.map(f =>
        StructField(f.name, carrier(f).get.storage, nullable = true)).toArray)
      val decoded = tracked
        .withColumn("__p", from_json(col("probePayload"),
          storage(curFields), opts))
        .withColumn("__vp", from_json(col("versionPayload"),
          storage(vFields), opts))
        .select(
          curFields.map(f => carrier(f).get.dec(col(s"__p.`${f.name}`"))
            .as(s"__l_${f.name}")) ++
            vFields.map(f => carrier(f).get.dec(col(s"__vp.`${f.name}`"))
              .as(s"__r_${f.name}")): _*)
      // every earlier alias's columns now ride under the __l_ prefix;
      // the new version alias's under __r_
      aliasCols.foreach { case (_, m) =>
        m.mapValuesInPlace((_, fld) => s"__l_$fld"): Unit
      }
      aliasCols(vAlias.toLowerCase) =
        scala.collection.mutable.LinkedHashMap.from(
          vFields.map(f => f.name -> s"__r_${f.name}"))
      curWmField = s"__l_$curWmField"
      cur = decoded
    }
    WindowTopN.failOnStarOverDropped(selectList, droppedAll.toSeq, fail)

    val view = s"graft_tj_${viewCounter.incrementAndGet()}"
    cur.createOrReplaceTempView(view)

    val allOutNames = aliasCols.values.flatMap(_.keys).toSeq
    def starExpand(aliasLower: String): String =
      aliasCols(aliasLower).map { case (out, fld) => s"$fld AS $out" }
        .mkString(", ")
    // alias-qualified references, then unambiguous bare columns,
    // rewrite to the decoded view's columns; finds run on masked text
    def rewriteRefs(text0: String): String = {
      var text = text0
      // a subquery inside the rewritten region may introduce its OWN
      // alias equal to a chain alias — rewriting `r.rate` inside
      // `(SELECT avg(r.rate) FROM rates r)` would silently turn the
      // subquery's column into a correlated outer reference. Reject
      // the collision by name (the bare-identifier path already
      // rejects its ambiguity class the same way). A FROM/JOIN match
      // counts only when it sits inside a SELECT subquery — the FROM
      // of EXTRACT/TRIM/SUBSTRING never introduces a relation.
      val masked0 = MatchRecognize.maskQuoted(text0)
      def inSubquery(idx: Int): Boolean = {
        var depth = 0
        var i = idx - 1
        var open = -1
        while (i >= 0 && open < 0) {
          masked0.charAt(i) match {
            case ')' => depth += 1
            case '(' => if (depth == 0) open = i else depth -= 1
            case _ =>
          }
          i -= 1
        }
        open >= 0 && raw"(?is)\bSELECT\b".r
          .findFirstIn(masked0.substring(open + 1, idx)).isDefined
      }
      val RelIntro = (raw"(?is)\b(?:FROM|JOIN)\s+($Dotted)" +
        raw"(?:\s+(?:AS\s+)?(?!ON\b|WHERE\b|GROUP\b|ORDER\b|LIMIT\b|" +
        raw"JOIN\b|LEFT\b|RIGHT\b|FULL\b|INNER\b|CROSS\b)($Ident))?").r
      RelIntro.findAllMatchIn(masked0).filter(m => inSubquery(m.start))
        .foreach { m =>
          val introduced = Option(m.group(2)).map(DdlParser.unquoteName)
            .getOrElse(DdlParser.unquoteName(
              text0.substring(m.start(1), m.end(1))).split('.').last)
          if (aliasCols.contains(introduced.toLowerCase))
            fail(s"subquery alias '$introduced' collides with a " +
              "temporal-join chain alias (" +
              aliasCols.keys.mkString(", ") + ") — rename the " +
              "subquery's relation alias so qualified references stay " +
              "unambiguous")
        }
      val QualRef = raw"(?is)\b([A-Za-z_]\w*)\s*\.\s*([A-Za-z_]\w*)".r
      QualRef.findAllMatchIn(MatchRecognize.maskQuoted(text))
        .toSeq.reverseIterator.foreach { m =>
          val q = m.group(1)
          val rep =
            if (aliasCols.contains(q.toLowerCase))
              Some(resolveQual(q, m.group(2)).get)
            else None
          rep.foreach(r =>
            text = text.substring(0, m.start) + r + text.substring(m.end))
        }
      // bare identifiers naming a side column REJECT rather than
      // rewrite: a bare reference could equally be an implicit output
      // alias or a column of a residual-WHERE subquery's own table,
      // and a silent mis-rewrite there produces wrong rows — the
      // contract demands the alias (or explicit AS for output names)
      val maskedT = MatchRecognize.maskQuoted(text)
      val Bare = raw"(?is)\b([A-Za-z_]\w*)\b".r
      Bare.findAllMatchIn(maskedT).foreach { m =>
        val id = m.group(1)
        val prevCh = if (m.start > 0) maskedT.charAt(m.start - 1) else ' '
        val after = maskedT.drop(m.end).dropWhile(_.isWhitespace)
        val nextCh = after.headOption.getOrElse(' ')
        val isAliasPos = raw"(?is).*\bAS$$".r
          .matches(maskedT.substring(0, m.start).trim)
        if (prevCh != '.' && nextCh != '.' && nextCh != '(' &&
            !isAliasPos && allOutNames.exists(_.equalsIgnoreCase(id)))
          fail(s"unqualified column $id in the streaming temporal " +
            "join — qualify with one of the chain aliases (" +
            aliasCols.keys.mkString(", ") + "); a subquery's own " +
            "column qualifies with ITS alias; an output alias of " +
            "that name needs the AS keyword")
      }
      text
    }
    // a plain column item keeps its column name in SQL output
    // (`SELECT o.k` exposes `k`) — the decoded-view splice must alias
    // the prefixed column back, or sinks would see `__l_k`
    val PlainRef = raw"(?is)^\s*(?:[A-Za-z_]\w*\s*\.\s*)?([A-Za-z_]\w*)\s*$$".r
    val items2 = MatchRecognize.splitTopLevel(selectList).map {
      case "*" =>
        aliasCols.keys.map(starExpand).mkString(", ")
      case QualStarRe(q) if aliasCols.contains(q.toLowerCase) =>
        starExpand(q.toLowerCase)
      case it @ PlainRef(outName) =>
        val rewritten = rewriteRefs(it).trim
        if (rewritten == it.trim) rewritten else s"$rewritten AS $outName"
      case it => rewriteRefs(it)
    }.mkString(", ")
    val where2 =
      whereResidual.map(w => " WHERE " + rewriteRefs(w)).getOrElse("")
    s"${insertPrefix}SELECT $items2 FROM $view$where2"
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
        // a top-level comma ends the ON condition: the FROM list
        // continues with another (implicit-join) table reference —
        // `JOIN v FOR SYSTEM_TIME ... ON r.k = p.k, dim d` (r19)
        case ',' if depth == 0 => end = i; i = sql.length
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
