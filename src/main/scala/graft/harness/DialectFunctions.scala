package graft.harness

/** Flink-dialect scalar/table-function rewrites that Spark's parser
  * rejects: `UNNEST` collection joins and the SQL:2016 JSON API
  * (`JSON_VALUE` / `JSON_QUERY` / `JSON_EXISTS`). The reference router
  * passes both through verbatim (`SQLSubmitAction.java:76`), so the
  * harness rewrites them into the Spark-native equivalents before any
  * other dialect pass runs. Both rewrites are pure text→text (no
  * session), quote-aware (nothing fires inside a string literal), and
  * paren-balanced (the argument may contain nested calls).
  *
  * UNNEST — Flink's collection join (`FROM t CROSS JOIN UNNEST(t.arr)
  * AS a (x)`) becomes a generator:
  *
  *  - `CROSS JOIN | , UNNEST(e) AS a (c1[, c2...])` →
  *    ` LATERAL VIEW explode(e) a AS c1[, c2]` — one alias column
  *    unnests an array, two unnest a map (key, value — Flink's map
  *    UNNEST signature), three or more unnest an array of rows via
  *    `inline` (field order = alias order). A 2-column alias over an
  *    array-of-row source is read as a map unnest and fails loudly at
  *    analysis (alias-count mismatch) — spell those fields with
  *    explode + field access instead.
  *  - `LEFT [OUTER] JOIN UNNEST(e) AS a (cols) ON TRUE` →
  *    `LATERAL VIEW OUTER explode(e) a AS cols` — an empty/NULL
  *    collection keeps the left row with NULL outputs, Flink's
  *    left-unnest semantics.
  *  - `... UNNEST(e) WITH ORDINALITY AS a (c1[, c2], ord)` → a lateral
  *    correlated subquery over `posexplode(e)` projecting `pos + 1`
  *    (ordinality is 1-based): `, LATERAL (SELECT col AS c1, pos + 1
  *    AS ord FROM posexplode(e)) a`. Array (2 aliases) and map
  *    (3 aliases) forms; ordinality over array-of-rows and
  *    LEFT-JOIN-with-ordinality are out of the subset and throw.
  *
  * JSON — Spark has `get_json_object` (a codegen'd path extractor)
  * but not the SQL:2016 call forms, so:
  *
  *  - `JSON_VALUE(e, 'path' [RETURNING type])` →
  *    `get_json_object(e, 'path')`, wrapped in `TRY_CAST(... AS type)`
  *    when RETURNING is present (TRY_CAST: Flink routes an uncastable
  *    value to ON ERROR, whose default is NULL — CAST would throw
  *    under ANSI mode). `NULL ON EMPTY/ERROR` are Flink's defaults
  *    (no-ops); `DEFAULT e ON EMPTY` and `DEFAULT e ON ERROR` compile
  *    onto a CASE that discriminates malformed JSON (ERROR, via the
  *    native graft_json_valid), missing path (EMPTY) and — under
  *    RETURNING — present-but-uncastable (ERROR). `ERROR ON
  *    EMPTY/ERROR` (raise instead of substitute) stays a named
  *    rejection. Documented deviation: a path landing on an OBJECT or
  *    ARRAY returns its JSON text (get_json_object semantics) where
  *    Flink's JSON_VALUE default returns NULL — scalar paths, the
  *    function's purpose, agree.
  *  - `JSON_QUERY(e, 'path' [wrapper] [ON EMPTY] [ON ERROR])` →
  *    SQL:2016 semantics on Spark's variant functions (r14):
  *    `to_json(try_variant_get(try_parse_json(e), 'path'))` yields
  *    the result's canonical JSON text (strings stay quoted, where
  *    get_json_object strips them — the re-wrapping prerequisite),
  *    and a CASE discriminates NULL input → NULL, malformed JSON →
  *    ON ERROR, missing path → ON EMPTY, scalar result under
  *    `WITHOUT [ARRAY] WRAPPER` → ON ERROR (the standard's rule:
  *    JSON_QUERY returns JSON values; scalars must be wrapped).
  *    `WITH [UNCONDITIONAL] WRAPPER` always wraps `[...]`; `WITH
  *    CONDITIONAL WRAPPER` wraps everything but arrays. Behaviors:
  *    NULL (default) / EMPTY ARRAY / EMPTY OBJECT substitute,
  *    ERROR raises in the matching branch. One `[*]` wildcard —
  *    trailing, or followed by field steps (`$.a[*].c`, r15) —
  *    iterates under SQL:2016 lax semantics with full clause support;
  *    recursive descent (`$..name`) and multi-wildcard paths (r16)
  *    evaluate through the native `graft_json_items` item-sequence
  *    expression (jayway scan order, the engine's lax law per step)
  *    with the same wrapper/ON-clause rules; only paths outside that
  *    grammar keep the legacy `get_json_object` passthrough and
  *    reject clauses by name.
  *  - `JSON_EXISTS(e, 'path' [{TRUE|FALSE|UNKNOWN|ERROR} ON ERROR])`
  *    → a variant-based existence test (r14): a JSON `null` member
  *    renders as the text 'null' and reads PRESENT (TRUE — Flink's
  *    semantics, which get_json_object conflated with a missing
  *    path); NULL input → NULL; malformed JSON routes to the ON
  *    ERROR outcome (default FALSE). Recursive-descent and
  *    multi-wildcard paths test `graft_json_items`'s sequence for at
  *    least one item (r16); only paths outside its grammar keep the
  *    legacy extractor and reject the clause by name.
  */
object DialectFunctions {

  private def fail(msg: String): Nothing =
    throw new IllegalArgumentException(msg)

  private val UnnestOpenRe = raw"(?i)\bUNNEST\s*\(".r
  private val JsonOpenRe = raw"(?i)\bJSON_(VALUE|QUERY|EXISTS)\s*\(".r
  private val TsLtzOpenRe = raw"(?i)\bTO_TIMESTAMP_LTZ\s*\(".r
  private val ProctimeRe = raw"(?i)\bPROCTIME\s*\(\s*\)".r
  private val SplitIndexOpenRe = raw"(?i)\bSPLIT_INDEX\s*\(".r
  private val IsClassOpenRe = raw"(?i)\bIS_(DIGIT|ALPHA|DECIMAL)\s*\(".r
  private val JsonCtorOpenRe = raw"(?i)\bJSON_(OBJECT|ARRAY)\s*\(".r

  def hasDialectFunctions(sql: String): Boolean = {
    val masked = MatchRecognize.maskQuoted(sql)
    UnnestOpenRe.findFirstIn(masked).isDefined ||
      JsonOpenRe.findFirstIn(masked).isDefined ||
      TsLtzOpenRe.findFirstIn(masked).isDefined ||
      ProctimeRe.findFirstIn(masked).isDefined ||
      SplitIndexOpenRe.findFirstIn(masked).isDefined ||
      IsClassOpenRe.findFirstIn(masked).isDefined ||
      JsonCtorOpenRe.findFirstIn(masked).isDefined ||
      RejectRe.findFirstIn(masked).isDefined
  }

  /** Flink forms with no Spark analog get a NAMED rejection here —
    * better than the unresolved-function error Spark's parser would
    * produce. `CURRENT_WATERMARK(col)` introspects the running
    * operator's watermark (Spark exposes no SQL-level equivalent);
    * legacy `LATERAL TABLE (f(x))` temporal table functions are the
    * pre-`FOR SYSTEM_TIME AS OF` spelling, which the temporal-join
    * rewrite supports instead.
    */
  private val RejectRe =
    raw"(?i)\b(CURRENT_WATERMARK\s*\(|LATERAL\s+TABLE\s*\()".r

  def rewrite(sql: String): String = rewrite(sql, isStreaming = true)

  /** Batch mode resolves `CURRENT_WATERMARK(col)` to NULL: Flink's
    * contract returns NULL "if no common watermark ... is available",
    * and a batch pipeline never emits one — so the batch value IS
    * NULL, no introspection needed. Streaming keeps the named
    * rejection (Spark exposes no SQL-level watermark).
    */
  private val CurrentWatermarkRe =
    raw"(?i)\bCURRENT_WATERMARK\s*\(\s*(?:`[^`]+`|[A-Za-z_]\w*)(?:\.(?:`[^`]+`|[A-Za-z_]\w*))*\s*\)".r

  def rewrite(sql: String, isStreaming: Boolean): String = {
    val sql0 =
      if (isStreaming) sql
      else {
        // literal-blind like every pass: match against the masked text,
        // splice on the raw one (maskQuoted is length-preserving)
        val masked = MatchRecognize.maskQuoted(sql)
        CurrentWatermarkRe.findAllMatchIn(masked).toList.reverse
          .foldLeft(sql)((s, m) =>
            s.substring(0, m.start) + "CAST(NULL AS TIMESTAMP)" +
              s.substring(m.end))
      }
    RejectRe.findFirstMatchIn(MatchRecognize.maskQuoted(sql0)).foreach { m =>
      val what = m.group(1).split(raw"\s*\(")(0).toUpperCase.replaceAll(raw"\s+", " ")
      fail(what match {
        case "CURRENT_WATERMARK" =>
          "CURRENT_WATERMARK() is not supported in streaming mode: " +
            "Spark exposes no SQL-level watermark introspection — filter " +
            "on the event-time column directly, or rely on the " +
            "watermark's own late-row drop (batch resolves it to NULL, " +
            "Flink's no-watermark-available contract)"
        case _ =>
          "legacy LATERAL TABLE temporal table functions are not " +
            "supported — use the FOR SYSTEM_TIME AS OF join form"
      })
    }
    rewriteScalars(rewriteJson(rewriteUnnest(sql0)))
  }

  /** The scalar-only subset, safe for DDL computed-column expressions
    * (where UNNEST/JSON join forms cannot appear but Flink's epoch and
    * processing-time idioms do):
    *
    *  - `TO_TIMESTAMP_LTZ(e[, p])` → `timestamp_millis(e)` (p = 3, the
    *    default) or `timestamp_seconds(e)` (p = 0) — the epoch-column
    *    event-time idiom in WATERMARK DDL; other precisions throw.
    *  - `PROCTIME()` → `current_timestamp()`. Documented deviation:
    *    Flink's PROCTIME is per-record wall clock, Spark's
    *    current_timestamp is per-query (batch) / per-micro-batch
    *    (streaming) — constant within the evaluation unit. The uses the
    *    harness admits (a processing-time column, arrival-time windows)
    *    only need a monotone arrival stamp, which this is.
    */
  /** Right-to-left rewrite of every `FN(args)` call found by `openRe`
    * (whose match must end on the opening paren): later splices never
    * shift earlier match offsets. `mk(groups, args)` returns the
    * replacement given the open-regex groups and the top-level-split
    * argument list.
    */
  private def mapCalls(sql: String, openRe: scala.util.matching.Regex)(
      mk: (scala.util.matching.Regex.Match, Seq[String]) => String): String = {
    var out = sql
    val calls = openRe.findAllMatchIn(MatchRecognize.maskQuoted(out))
      .toSeq.reverseIterator
    for (m <- calls) {
      val open = m.end - 1
      val end = MatchRecognize.closeParen(out, open)
      val args = MatchRecognize.splitTopLevel(out.substring(open + 1, end - 1))
      out = out.substring(0, m.start) + mk(m, args) + out.substring(end)
    }
    out
  }


  def rewriteScalars(sql: String): String = {
    var out = mapCalls(sql, TsLtzOpenRe) { (m, args) =>
      val (e, p) = args match {
        case Seq(x) => (x, "3")
        case Seq(x, lit) if raw"^[03]$$".r.findFirstIn(lit.trim).isDefined =>
          (x, lit.trim)
        case Seq(_, lit) => fail(
          s"TO_TIMESTAMP_LTZ precision must be 0 or 3, got: $lit")
        case _ => fail(
          s"TO_TIMESTAMP_LTZ takes (epoch[, precision]): ${args.mkString(", ")}")
      }
      if (p == "0") s"timestamp_seconds($e)" else s"timestamp_millis($e)"
    }
    out = mapCalls(out, SplitIndexOpenRe) { (m, args) =>
      args match {
        case Seq(s, sep, idx) =>
          // Flink splits by the separator LITERALLY; Spark's split is
          // regex — quote the separator at runtime (Pattern.quote
          // shape: \Q...\E with any embedded \E broken out), so regex
          // metacharacters and non-literal separator expressions both
          // keep literal-split semantics
          val quoted =
            raw"concat('\\Q', replace($sep, '\\E', '\\E\\\\E\\Q'), '\\E')"
          // Flink: 0-based index, NULL when out of range AND when
          // negative (a bare +1 would hit Spark's index-0 error at
          // idx = -1 and end-relative indexing at idx <= -2)
          s"try_element_at(split($s, $quoted), " +
            s"IF(($idx) >= 0, ($idx) + 1, NULL))"
        case _ => fail("SPLIT_INDEX takes (string, separator, index)")
      }
    }
    out = mapCalls(out, IsClassOpenRe) { (m, args) =>
      // backslashes double: Spark's string-literal parser processes
      // escapes, so the SQL text must carry \\p to mean regex \p
      val re = m.group(1).toUpperCase match {
        case "DIGIT" => "^[0-9]+$"
        case "ALPHA" => raw"^\\p{L}+$$"
        // parsable-number approximation (optional sign, plain decimal)
        case _ => raw"^[+-]?([0-9]+(\\.[0-9]*)?|\\.[0-9]+)$$"
      }
      args match {
        // Flink's IS_* are total predicates: NULL input → FALSE
        case Seq(s) => s"(COALESCE($s RLIKE '$re', FALSE))"
        case _ => fail(s"IS_${m.group(1).toUpperCase} takes one string")
      }
    }
    out = rewriteJsonCtors(out)
    // literal-blind: PROCTIME() inside a string stays text
    val sb = new StringBuilder
    var last = 0
    ProctimeRe.findAllMatchIn(MatchRecognize.maskQuoted(out)).foreach { m =>
      sb.append(out.substring(last, m.start)).append("current_timestamp()")
      last = m.end
    }
    sb.append(out.substring(last))
    sb.toString
  }

  /** SQL:2016 JSON constructors (Flink 1.15+):
    *
    *  - `JSON_OBJECT([KEY] 'k' VALUE v[, ...] [NULL|ABSENT ON NULL])` →
    *    `to_json(named_struct('k', v, ...))`, with
    *    `map('ignoreNullFields', 'false')` under NULL ON NULL (Flink's
    *    default — a null value serializes as JSON null; ABSENT drops
    *    the member, Spark's to_json default). Keys must be string
    *    literals (named_struct field names are foldable).
    *  - `JSON_ARRAY(e1[, ...] [ABSENT|NULL ON NULL])` →
    *    `to_json(array(...))`, with nulls filtered out under ABSENT ON
    *    NULL (Flink's array default). Elements must be homogeneous
    *    enough for Spark's array() — heterogeneous lists throw at
    *    analysis.
    *
    * Empty constructors fold to the `'{}'` / `'[]'` literals.
    */
  private val OnNullRe = raw"(?is)\s*(NULL|ABSENT)\s+ON\s+NULL\s*$$".r
  private val KeyValueRe =
    raw"(?is)^(?:KEY\s+)?('(?:[^']|'')*')\s+VALUE\s+(.+)$$".r
  private val JsonCtorAnchoredRe = raw"(?i)^JSON_(OBJECT|ARRAY)\s*\(".r

  /** A constructor given DIRECTLY as a VALUE / element of another
    * constructor splices as raw JSON in Flink (nested object/array,
    * not a re-encoded string) — so direct nested calls become bare
    * `named_struct`/`array` sub-expressions under ONE outer `to_json`,
    * and only the outermost call serializes. A constructor nested
    * inside any other expression (`CONCAT(JSON_OBJECT(...))`) keeps
    * its own `to_json` (Flink hands that function a VARCHAR).
    *
    * Spark's `to_json` null-member handling (`ignoreNullFields`) is a
    * per-serialization switch, not per-level, so a tree whose OBJECT
    * constructors mix NULL ON NULL and ABSENT ON NULL cannot be
    * rendered faithfully — rejected by name. Array null-element
    * filtering IS per-level (a real `filter(...)`), so arrays may mix
    * modes freely.
    */
  private def rewriteJsonCtors(sql: String): String = {
    val all = JsonCtorOpenRe
      .findAllMatchIn(MatchRecognize.maskQuoted(sql)).toSeq
      .map(m => (m, MatchRecognize.closeParen(sql, m.end - 1)))
    // outermost calls only; nested ones are handled by recursion
    val top = all.filterNot { case (m, _) =>
      all.exists { case (o, oe) => o.start < m.start && m.end <= oe }
    }
    var out = sql
    for ((m, end) <- top.reverseIterator) {
      val modes = scala.collection.mutable.Set[Boolean]()
      val expr = ctorExpr(sql.substring(m.start, end), modes)
      val body = expr match {
        case "struct()" => "'{}'"
        case "array()"  => "'[]'"
        case e if modes.size > 1 => fail(
          "nested JSON_OBJECT constructors mix NULL ON NULL and " +
            "ABSENT ON NULL — Spark's to_json serializes null members " +
            "with one policy per call; use the same ON NULL mode for " +
            "every object in the tree")
        case e if modes.contains(true) =>
          s"to_json($e, map('ignoreNullFields', 'false'))"
        case e => s"to_json($e)"
      }
      out = out.substring(0, m.start) + body + out.substring(end)
    }
    out
  }

  /** The UN-serialized struct/array expression for the constructor
    * call that `callText` consists of (exactly — first char to last
    * closing paren). Records each JSON_OBJECT's ON NULL mode in
    * `modes` so the outermost serializer can pick (or reject) the
    * `ignoreNullFields` policy.
    */
  private def ctorExpr(
      callText: String,
      modes: scala.collection.mutable.Set[Boolean]): String = {
    val m = JsonCtorAnchoredRe.findPrefixMatchOf(callText).getOrElse(
      fail(s"internal: not a JSON constructor call: $callText"))
    val isObject = m.group(1).equalsIgnoreCase("OBJECT")
    val end = MatchRecognize.closeParen(callText, m.end - 1)
    val rawArgs =
      MatchRecognize.splitTopLevel(callText.substring(m.end, end - 1))
    // the ON NULL clause rides the LAST argument without a comma
    var nullOnNull = isObject // Flink defaults: object NULL, array ABSENT
    val args = rawArgs match {
      case init :+ lastArg =>
        val stripped = OnNullRe.findFirstMatchIn(
          MatchRecognize.maskQuoted(lastArg)).map { bm =>
          nullOnNull = bm.group(1).equalsIgnoreCase("NULL")
          lastArg.substring(0, bm.start).trim
        }.getOrElse(lastArg)
        if (stripped.isEmpty) init else init :+ stripped
      case empty => empty
    }
    // a direct nested constructor splices raw; anything else is a
    // scalar expression (whose own inner ctors, if any, re-encode)
    def valueExpr(arg: String): String = {
      val t = arg.trim
      JsonCtorAnchoredRe.findPrefixMatchOf(t) match {
        case Some(im)
            if MatchRecognize.closeParen(t, im.end - 1) == t.length =>
          ctorExpr(t, modes)
        case _ => rewriteJsonCtors(t)
      }
    }
    if (isObject) {
      if (args.isEmpty) "struct()"
      else {
        modes += nullOnNull
        val pairs = args.map {
          case KeyValueRe(k, v) => s"$k, ${valueExpr(v)}"
          case other => fail("JSON_OBJECT entries need " +
            s"[KEY] 'name' VALUE expr (literal keys): $other")
        }
        s"named_struct(${pairs.mkString(", ")})"
      }
    } else {
      if (args.isEmpty) "array()"
      else {
        val arr = s"array(${args.map(valueExpr).mkString(", ")})"
        if (nullOnNull) arr
        else s"filter($arr, __jx -> __jx IS NOT NULL)"
      }
    }
  }

  // -------------------------------------------------------------- UNNEST

  /** The join connective immediately before an UNNEST call: `CROSS
    * JOIN`, `LEFT [OUTER] JOIN`, or a comma join. Matched right-anchored
    * on the text before the call.
    */
  private val HeadRe =
    raw"(?is)(CROSS\s+JOIN|LEFT\s+(?:OUTER\s+)?JOIN|,)\s*$$".r

  /** Tail of an UNNEST region: `[WITH ORDINALITY] [AS] alias (c1, ...)`
    * and, for the LEFT JOIN form, the mandatory `ON TRUE`.
    */
  private val TailRe = (
    raw"(?is)^\s*(WITH\s+ORDINALITY\s+)?(?:AS\s+)?([A-Za-z_]\w*)\s*" +
      raw"\(\s*([A-Za-z_]\w*(?:\s*,\s*[A-Za-z_]\w*)*)\s*\)").r
  private val OnTrueRe = raw"(?is)^\s*ON\s+TRUE".r

  /** Clause keywords a parenthesized expression can follow — never an
    * UNNEST alias (`... UNNEST(arr) WHERE (flag)` must reject, not
    * read WHERE as the alias).
    */
  private val Keywords = Set("WHERE", "GROUP", "ORDER", "HAVING", "ON",
    "JOIN", "LEFT", "RIGHT", "FULL", "CROSS", "INNER", "UNION", "LIMIT",
    "WINDOW", "EXCEPT", "INTERSECT", "WITH", "SELECT", "FROM", "AND",
    "OR", "NOT", "MATCH_RECOGNIZE")

  private def rewriteUnnest(sql: String): String = {
    var out = sql
    // right-to-left: each splice leaves earlier match offsets valid
    val calls = UnnestOpenRe.findAllMatchIn(MatchRecognize.maskQuoted(out))
      .toSeq.reverseIterator
    for (m <- calls) {
      val open = m.end - 1
      val end = MatchRecognize.closeParen(out, open)
      val arg = out.substring(open + 1, end - 1).trim
      if (arg.isEmpty) fail("UNNEST needs a collection argument")
      val before = out.substring(0, m.start)
      val head = HeadRe.findFirstMatchIn(MatchRecognize.maskQuoted(before))
        .getOrElse(fail("UNNEST is supported as a join operand only: " +
          "FROM t CROSS JOIN / LEFT JOIN / , UNNEST(...) AS a (cols)"))
      val isLeft = head.group(1).toUpperCase.startsWith("LEFT")
      val tail = TailRe.findFirstMatchIn(out.substring(end))
        .filter(t => !Keywords.contains(t.group(2).toUpperCase))
        .getOrElse(fail("UNNEST needs an alias with a column list: " +
          "UNNEST(e) [WITH ORDINALITY] AS a (c1[, c2])"))
      val ordinality = tail.group(1) != null
      val alias = tail.group(2)
      val cols = MatchRecognize.splitTopLevel(tail.group(3))
      var tailEnd = end + tail.end
      if (isLeft) {
        val on = OnTrueRe.findFirstMatchIn(out.substring(tailEnd))
          .getOrElse(fail("LEFT JOIN UNNEST needs ON TRUE"))
        tailEnd += on.end
      }
      // Spark's FROM grammar puts lateral views AFTER every join
      // relation — an UNNEST followed by a further join would splice
      // into unparseable text, so reject it by name (a following
      // LATERAL is fine: that's a right-neighbor UNNEST this pass
      // already rewrote, and lateral views chain)
      val after = MatchRecognize.maskQuoted(out).substring(tailEnd)
      if (raw"(?is)^\s*(?:(?:CROSS|INNER|LEFT|RIGHT|FULL)\s+(?:OUTER\s+)?JOIN\b|JOIN\b|,\s*(?!LATERAL\b))".r
          .findFirstIn(after).isDefined)
        fail("UNNEST must be the last relation of its FROM clause " +
          "(Spark attaches generators after all joins) — move the " +
          "UNNEST after the remaining joins")
      // the join connective is consumed: LATERAL VIEW attaches bare,
      // the ordinality lateral subquery re-joins with a comma
      val prefix = before.substring(0, head.start(1)).replaceAll(raw"\s+$$", "")
      val spliced =
        if (!ordinality) {
          val gen =
            if (cols.size <= 2) "explode" // 1 = array elem, 2 = map k/v
            else "inline" // array of rows, field order = alias order
          val outer = if (isLeft) "OUTER " else ""
          s"$prefix LATERAL VIEW $outer$gen($arg) $alias AS ${cols.mkString(", ")}"
        } else {
          if (cols.size < 2)
            fail("UNNEST WITH ORDINALITY needs the ordinality column in " +
              "the alias list: AS a (elem, ord)")
          if (cols.size > 3)
            fail("UNNEST WITH ORDINALITY over an array of rows is not " +
              "supported — unnest without ordinality (inline) or explode " +
              "with field access instead")
          val ord = cols.last
          val proj =
            if (cols.size == 2) s"col AS ${cols.head}, pos + 1 AS $ord"
            else s"key AS ${cols(0)}, value AS ${cols(1)}, pos + 1 AS $ord"
          // LEFT: a lateral correlated subquery join keeps empty/NULL
          // collections as a left row with NULL outputs (Flink's
          // left-unnest), and the ordinality projection rides inside
          if (isLeft)
            s"$prefix LEFT OUTER JOIN LATERAL " +
              s"(SELECT $proj FROM posexplode($arg)) $alias ON TRUE"
          else s"$prefix, LATERAL (SELECT $proj FROM posexplode($arg)) $alias"
        }
      out = spliced + out.substring(tailEnd)
    }
    out
  }

  // ---------------------------------------------------------------- JSON

  private val PathReturningRe = (
    raw"(?is)^('(?:[^']|'')*')(?:\s+RETURNING\s+" +
      raw"([A-Za-z_]+(?:\s*\(\s*\d+(?:\s*,\s*\d+)?\s*\))?))?\s*$$").r
  private val BehaviorRe =
    raw"(?i)\b(ON\s+(EMPTY|ERROR)|WITH(OUT)?\s+(CONDITIONAL\s+|UNCONDITIONAL\s+)?ARRAY\s+WRAPPER)\b".r

  /** Trailing JSON_VALUE behavior clause: `NULL | ERROR | DEFAULT
    * <expr>` ON EMPTY/ERROR. The DEFAULT expression is tempered to not
    * cross a bare `ON` keyword, so stacked clauses strip right-to-left
    * without the non-greedy body swallowing an earlier clause.
    */
  private val ClauseTailRe = raw"(?is)\b(NULL|ERROR|DEFAULT\s+(?:(?!\bON\b).)+?)\s+ON\s+(EMPTY|ERROR)\s*$$".r

  /** JSON_QUERY's substitute behaviors: `NULL | ERROR | EMPTY ARRAY |
    * EMPTY OBJECT` ON EMPTY/ERROR, stripped right-to-left. */
  private val QueryClauseTailRe =
    raw"(?is)\b(NULL|ERROR|EMPTY\s+ARRAY|EMPTY\s+OBJECT)\s+ON\s+(EMPTY|ERROR)\s*$$".r

  /** JSON_QUERY's wrapper clause (strips after the ON clauses — it
    * precedes them in the grammar). Longest alternatives first so
    * `WITH CONDITIONAL` never half-matches as bare `WITH`. */
  private val QueryWrapperTailRe =
    raw"(?is)\b(WITHOUT|WITH\s+UNCONDITIONAL|WITH\s+CONDITIONAL|WITH)\s+(?:ARRAY\s+)?WRAPPER\s*$$".r

  /** JSON_EXISTS's single behavior clause: `{TRUE | FALSE | UNKNOWN |
    * ERROR} ON ERROR` (there is no ON EMPTY — a missing path IS the
    * FALSE result). */
  private val ExistsClauseTailRe =
    raw"(?is)\b(TRUE|FALSE|UNKNOWN|ERROR)\s+ON\s+ERROR\s*$$".r

  /** A multi-value marker — `*` or `..` — OUTSIDE bracket-quoted
    * member names, detected structurally: `$['a*b']` is a single-value
    * path whose member NAME contains a star, so a raw substring check
    * would wrongly force it onto the legacy multi-value passthrough
    * (and reject its behavior clauses by name).
    */
  private def hasMultiValueMarker(path: String): Boolean = {
    var i = 0
    while (i < path.length) {
      path.charAt(i) match {
        case q @ ('\'' | '"') =>
          i += 1
          while (i < path.length && path.charAt(i) != q) i += 1
          i += 1
        case '*' => return true
        case '.' if i + 1 < path.length && path.charAt(i + 1) == '.' =>
          return true
        case _ => i += 1
      }
    }
    false
  }

  /** A path of the shape `<single-value base>[*]<field steps>` — the
    * wildcard class the variant functions can evaluate faithfully: the
    * base resolves to one value, `[*]` iterates it under SQL:2016 lax
    * semantics (a non-array wraps to a singleton), and an optional
    * suffix of FIELD steps maps over the items (r15 — items lacking
    * the member are SKIPPED, the lax rule, while JSON-null members
    * stay present). Returns (base path text, suffix with its leading
    * dot, or "" for a trailing `[*]`).
    */
  private def starPath(inner: String): Option[(String, String)] =
    raw"(?s)^(.*?)\s*\[\s*\*\s*\]((?:\.\w+)*)\s*$$".r
      .findFirstMatchIn(inner)
      .map(m => (m.group(1), m.group(2)))
      .filter { case (b, _) => !hasMultiValueMarker(b) }

  /** The item list of a `base[*].fields` path, shared by the
    * JSON_QUERY and JSON_EXISTS arms: `vals` = the base's array
    * elements mapped through the field suffix (SQL NULLs — items
    * LACKING the member — filtered out, the lax skip; JSON-null
    * members survive as the text 'null'); `mv` = the suffix applied
    * to a NON-array base directly (the lax singleton wrap). An item
    * that is itself an ARRAY yields nothing for a member step —
    * member access does not auto-unwrap nested arrays, matching
    * Flink's jayway-style path evaluation (strict SQL:2016 lax mode
    * would unwrap one level; spec-pinned as the deliberate choice).
    */
  private def starFieldItems(bv: String, suffix: String): (String, String) =
    (s"filter(transform(try_variant_get(" +
      s"try_parse_json($bv), '$$', 'array<variant>'), " +
      s"x -> to_json(try_variant_get(x, '$$$suffix'))), " +
      s"t -> t IS NOT NULL)",
      s"to_json(try_variant_get(try_parse_json($bv), '$$$suffix'))")

  private def rewriteJson(sql: String): String =
    mapCalls(sql, JsonOpenRe) { (m, args) =>
      val fn = m.group(1).toUpperCase
      if (args.size != 2)
        fail(s"JSON_$fn takes (json, 'path'[ RETURNING type]): " +
          args.mkString(", "))
      val expr = args.head
      // JSON_VALUE behavior clauses: NULL ON EMPTY / NULL ON ERROR are
      // Flink's defaults; DEFAULT e ON EMPTY / DEFAULT e ON ERROR
      // compile onto a CASE that discriminates the three outcomes
      // get_json_object alone conflates — malformed JSON (ERROR, via
      // graft_json_valid), missing path (EMPTY), and — under RETURNING —
      // a present-but-uncastable value (ERROR, via TRY_CAST IS NULL).
      // ERROR ON EMPTY/ERROR map onto `raise_error` in the matching
      // CASE branch (Flink's raising behavior, r13b) — the branch only
      // evaluates when taken, so well-formed rows pass untouched; the
      // raising forms appear in no oracle query (a raising scalar
      // cannot be hash-compared), they are spec-covered instead.
      var tail = args(1)
      var onEmptyDefault: Option[String] = None
      var onErrorDefault: Option[String] = None
      var raiseOnEmpty = false
      var raiseOnError = false
      // QUERY wrapper mode: WITHOUT (default) | COND | UNCOND
      var wrapper = "WITHOUT"
      var queryClauses = false
      // EXISTS ON ERROR outcome: TRUE | FALSE (default) | UNKNOWN | ERROR
      var existsOnError = "FALSE"
      if (fn == "VALUE") {
        var go = true
        while (go) {
          ClauseTailRe.findFirstMatchIn(MatchRecognize.maskQuoted(tail)) match {
            case Some(cm) =>
              val clauseRaw = tail.substring(cm.start(1), cm.end(1)).trim
              val cu = clauseRaw.toUpperCase
              if (cm.group(2).equalsIgnoreCase("EMPTY")) {
                if (cu == "ERROR") raiseOnEmpty = true
                else if (cu != "NULL")
                  onEmptyDefault =
                    Some(clauseRaw.substring("DEFAULT".length).trim)
              } else {
                if (cu == "ERROR") raiseOnError = true
                else if (cu != "NULL")
                  onErrorDefault =
                    Some(clauseRaw.substring("DEFAULT".length).trim)
              }
              tail = tail.substring(0, cm.start)
            case None => go = false
          }
        }
      } else if (fn == "QUERY") {
        // ON EMPTY / ON ERROR substitutes (right-to-left, like VALUE's)
        var go = true
        while (go) {
          QueryClauseTailRe.findFirstMatchIn(
            MatchRecognize.maskQuoted(tail)) match {
            case Some(cm) =>
              queryClauses = true
              val cu = tail.substring(cm.start(1), cm.end(1)).trim
                .toUpperCase.replaceAll(raw"\s+", " ")
              val v = cu match {
                case "EMPTY ARRAY" => Some("'[]'")
                case "EMPTY OBJECT" => Some("'{}'")
                case _ => None // NULL | ERROR
              }
              if (cm.group(2).equalsIgnoreCase("EMPTY")) {
                if (cu == "ERROR") raiseOnEmpty = true else onEmptyDefault = v
              } else {
                if (cu == "ERROR") raiseOnError = true else onErrorDefault = v
              }
              tail = tail.substring(0, cm.start)
            case None => go = false
          }
        }
        // wrapper precedes the ON clauses in the grammar, so it strips
        // last; bare WITH means WITH UNCONDITIONAL (SQL:2016)
        QueryWrapperTailRe.findFirstMatchIn(
          MatchRecognize.maskQuoted(tail)).foreach { wm =>
          queryClauses = true
          wrapper = tail.substring(wm.start(1), wm.end(1)).toUpperCase
            .replaceAll(raw"\s+", " ") match {
            case "WITHOUT" => "WITHOUT"
            case "WITH CONDITIONAL" => "COND"
            case _ => "UNCOND"
          }
          tail = tail.substring(0, wm.start)
        }
      } else if (fn == "EXISTS") {
        ExistsClauseTailRe.findFirstMatchIn(
          MatchRecognize.maskQuoted(tail)).foreach { cm =>
          queryClauses = true
          existsOnError = tail.substring(cm.start(1), cm.end(1)).toUpperCase
          tail = tail.substring(0, cm.start)
        }
      }
      if (BehaviorRe.findFirstIn(MatchRecognize.maskQuoted(tail)).isDefined)
        fail(s"JSON_$fn behavior clauses (ON EMPTY / ON ERROR / ARRAY " +
          "WRAPPER) are not supported here — the default NULL behavior " +
          "needs no clause" +
          (if (fn == "VALUE") "; JSON_VALUE admits NULL ON EMPTY/ERROR " +
            "and DEFAULT <expr> ON EMPTY"
          else if (fn == "QUERY") "; JSON_QUERY admits " +
            "WITH/WITHOUT [CONDITIONAL|UNCONDITIONAL] [ARRAY] WRAPPER " +
            "and NULL/ERROR/EMPTY ARRAY/EMPTY OBJECT ON EMPTY/ERROR"
          else if (fn == "EXISTS") "; JSON_EXISTS admits " +
            "TRUE/FALSE/UNKNOWN/ERROR ON ERROR"
          else ""))
      val (path, returning) = tail.trim match {
        case PathReturningRe(p, r) => (p, Option(r))
        case other => fail(s"JSON_$fn needs a string-literal path" +
          (if (fn == "VALUE") " (optionally RETURNING type)" else "") +
          s": $other")
      }
      if (fn != "VALUE" && returning.isDefined)
        fail(s"JSON_$fn does not take RETURNING")
      val call = s"get_json_object($expr, $path)"
      fn match {
        case "VALUE" =>
          // TRY_CAST, not CAST: Flink routes an uncastable value to the
          // ON ERROR behavior (default NULL) — TRY_CAST keeps that NULL
          // under ANSI mode too, where CAST would throw.
          val typed = returning.fold(call)(t => s"TRY_CAST($call AS $t)")
          if (onEmptyDefault.isEmpty && onErrorDefault.isEmpty &&
              !raiseOnEmpty && !raiseOnError) typed
          else {
            // Flink's evaluation order: NULL input → NULL (no clause
            // fires); malformed JSON → ON ERROR; missing path → ON
            // EMPTY; present-but-uncastable (RETURNING) → ON ERROR.
            val errVal =
              if (raiseOnError)
                s"raise_error(CONCAT('JSON_VALUE ERROR ON ERROR: no " +
                  s"result for path ', $path, ' in: ', $expr))"
              else onErrorDefault.getOrElse("NULL")
            val emptyVal =
              if (raiseOnEmpty)
                s"raise_error(CONCAT('JSON_VALUE ERROR ON EMPTY: empty " +
                  s"result for path ', $path, ' in: ', $expr))"
              else onEmptyDefault.getOrElse("NULL")
            val castBranch = returning.fold("")(t =>
              s" WHEN TRY_CAST($call AS $t) IS NULL THEN $errVal")
            s"(CASE WHEN ($expr) IS NULL THEN NULL" +
              s" WHEN NOT graft_json_valid($expr) THEN $errVal" +
              s" WHEN $call IS NULL THEN $emptyVal" +
              castBranch +
              s" ELSE $typed END)"
          }
        case "QUERY" =>
          // the path literal's content, '' unescaped
          val inner = path.substring(1, path.length - 1).replace("''", "'")
          val star = starPath(inner)
          lazy val errVal =
            if (raiseOnError)
              s"raise_error(CONCAT('JSON_QUERY ERROR ON ERROR: no " +
                s"result for path ', $path, ' in: ', $expr))"
            else onErrorDefault.getOrElse("CAST(NULL AS STRING)")
          lazy val emptyVal =
            if (raiseOnEmpty)
              s"raise_error(CONCAT('JSON_QUERY ERROR ON EMPTY: empty " +
                s"result for path ', $path, ' in: ', $expr))"
            else onEmptyDefault.getOrElse("CAST(NULL AS STRING)")
          // malformed input routes to ON ERROR with its own message;
          // the try_parse_json disjunct catches inputs graft_json_valid
          // accepts but the variant parser rejects (strictness
          // divergence — depth/duplicate-key limits), which would
          // otherwise fall through to the missing-path ON EMPTY branch
          lazy val malformedVal =
            if (raiseOnError)
              s"raise_error(CONCAT('JSON_QUERY ERROR ON ERROR: " +
                s"malformed JSON input for path ', $path, ': ', $expr))"
            else onErrorDefault.getOrElse("CAST(NULL AS STRING)")
          def malformedPred =
            s"NOT graft_json_valid($expr) OR try_parse_json($expr) IS NULL"
          // the SQL:2016 single-item wrapper rules, shared by the [*]
          // class and the graft_json_items class: WITHOUT returns a
          // container bare and errors a scalar; UNCONDITIONAL always
          // wraps; CONDITIONAL wraps scalars only
          def single(t: String): String = wrapper match {
            case "WITHOUT" =>
              s"(CASE WHEN startswith($t, '[') OR startswith($t, '{') " +
                s"THEN $t ELSE $errVal END)"
            case "UNCOND" => s"concat('[', $t, ']')"
            case _ =>
              s"(CASE WHEN startswith($t, '[') OR startswith($t, '{') " +
                s"THEN $t ELSE concat('[', $t, ']') END)"
          }
          if (hasMultiValueMarker(inner) && star.isEmpty) {
            // recursive-descent / multi-wildcard paths (r16): the
            // native graft_json_items evaluator yields the SQL:2016
            // item sequence (jayway scan order for `..name`, the
            // engine's lax law per step), and the item count drives
            // the same EMPTY/wrapper/error rules as the [*] class.
            // Paths outside its grammar keep the legacy passthrough
            // and reject clauses by name.
            graft.functions.JsonPathItems.parsePath(inner) match {
              case Some(_) =>
                // the item sequence BINDS ONCE to a lambda variable
                // (transform over a one-element array): the 0/1/n
                // dispatch reads the bound array, never re-running the
                // document parse + path walk per reference
                val multi =
                  if (wrapper == "WITHOUT") errVal
                  else s"concat('[', array_join(gji_v, ','), ']')"
                val dispatch =
                  s"CASE WHEN size(gji_v) = 0 THEN $emptyVal" +
                    s" WHEN size(gji_v) = 1 THEN " +
                    single("element_at(gji_v, 1)") +
                    s" ELSE $multi END"
                s"(CASE WHEN ($expr) IS NULL THEN CAST(NULL AS STRING)" +
                  s" WHEN $malformedPred THEN $malformedVal" +
                  s" ELSE element_at(transform(" +
                  s"array(graft_json_items($expr, $path)), " +
                  s"gji_v -> $dispatch), 1) END)"
              case None =>
                if (queryClauses)
                  fail("JSON_QUERY wrapper/ON clauses are supported on " +
                    "single-value paths, one [*] wildcard (optionally " +
                    "followed by field steps), and the " +
                    "graft_json_items grammar (.name / ['name'] / [n] " +
                    s"/ [*] / .* / ..name steps) only (got $path) — " +
                    "other paths run as a plain multi-value extraction")
                call
            }
          } else if (!inner.trim.startsWith("$"))
            fail(s"JSON_QUERY path must start with $$: $path")
          else if (star.isDefined) {
            // `base[*][.fields]` (SQL:2016 lax): the base resolves to
            // ONE value; an array's elements are the items (a non-array
            // base wraps to a singleton), and a field suffix maps over
            // them — items lacking the member are SKIPPED (lax), while
            // JSON-null members stay (to_json of a variant null is the
            // text 'null', non-NULL). 0 items → ON EMPTY, 1 item → the
            // wrapper rules on it, >1 items → WITHOUT is an error and
            // any wrapping yields the item array
            val (base, suffix) = star.get
            val baseLit = "'" + base.replace("'", "''") + "'"
            val bv =
              s"to_json(try_variant_get(try_parse_json($expr), $baseLit))"
            val isArr = s"startswith($bv, '[')"
            if (suffix.isEmpty) {
              val ev =
                s"to_json(try_variant_get(try_parse_json($bv), '$$[0]'))"
              val multi = if (wrapper == "WITHOUT") errVal else bv
              s"(CASE WHEN ($expr) IS NULL THEN CAST(NULL AS STRING)" +
                s" WHEN $malformedPred THEN $malformedVal" +
                s" WHEN $bv IS NULL THEN $emptyVal" +
                s" WHEN $isArr AND json_array_length($bv) = 0 THEN $emptyVal" +
                s" WHEN $isArr AND json_array_length($bv) = 1 THEN ${single(ev)}" +
                s" WHEN $isArr THEN $multi" +
                s" ELSE ${single(bv)} END)"
            } else {
              // the item list after the field suffix, as JSON texts;
              // non-array base: the singleton item's member directly
              val (vals, mv) = starFieldItems(bv, suffix)
              val multi =
                if (wrapper == "WITHOUT") errVal
                else s"concat('[', array_join($vals, ','), ']')"
              s"(CASE WHEN ($expr) IS NULL THEN CAST(NULL AS STRING)" +
                s" WHEN $malformedPred THEN $malformedVal" +
                s" WHEN $bv IS NULL THEN $emptyVal" +
                s" WHEN $isArr THEN (CASE" +
                s" WHEN size($vals) = 0 THEN $emptyVal" +
                s" WHEN size($vals) = 1 THEN ${single(s"element_at($vals, 1)")}" +
                s" ELSE $multi END)" +
                s" WHEN $mv IS NULL THEN $emptyVal" +
                s" ELSE ${single(mv)} END)"
            }
          } else {
            val vget = s"to_json(try_variant_get(try_parse_json($expr), $path))"
            // canonical to_json text keys the shape: objects '{',
            // arrays '[', everything else a scalar
            val isArr = s"startswith($vget, '[')"
            val isContainer = s"($isArr OR startswith($vget, '{'))"
            val scalarBranch =
              if (wrapper == "WITHOUT")
                s" WHEN NOT $isContainer THEN $errVal"
              else ""
            val wrapped = wrapper match {
              case "WITHOUT" => vget
              case "UNCOND" => s"concat('[', $vget, ']')"
              case _ =>
                s"(CASE WHEN $isArr THEN $vget " +
                  s"ELSE concat('[', $vget, ']') END)"
            }
            s"(CASE WHEN ($expr) IS NULL THEN CAST(NULL AS STRING)" +
              s" WHEN $malformedPred THEN $malformedVal" +
              s" WHEN $vget IS NULL THEN $emptyVal" +
              scalarBranch +
              s" ELSE $wrapped END)"
          }
        case "EXISTS" =>
          val inner = path.substring(1, path.length - 1).replace("''", "'")
          val star = starPath(inner)
          lazy val errVal = existsOnError match {
            case "TRUE" => "TRUE"
            case "UNKNOWN" => "CAST(NULL AS BOOLEAN)"
            case "ERROR" =>
              s"raise_error(CONCAT('JSON_EXISTS ERROR ON ERROR: " +
                s"malformed JSON for path ', $path, ' in: ', $expr))"
            case _ => "FALSE"
          }
          // same parser-divergence routing as JSON_QUERY: inputs the
          // strict validator accepts but the variant parser rejects
          // take ON ERROR, not a silent FALSE
          def malformedPred =
            s"NOT graft_json_valid($expr) OR try_parse_json($expr) IS NULL"
          if (hasMultiValueMarker(inner) && star.isEmpty) {
            // recursive-descent / multi-wildcard paths (r16): exists =
            // at least one item in the native evaluator's sequence —
            // a JSON null match reads PRESENT, which the legacy
            // extractor conflated with absence. Paths outside the
            // grammar keep the legacy existence check and reject the
            // clause by name.
            graft.functions.JsonPathItems.parsePath(inner) match {
              case Some(_) =>
                val vals = s"graft_json_items($expr, $path)"
                s"(CASE WHEN ($expr) IS NULL THEN CAST(NULL AS BOOLEAN)" +
                  s" WHEN $malformedPred THEN $errVal" +
                  s" ELSE size($vals) > 0 END)"
              case None =>
                if (queryClauses)
                  fail("JSON_EXISTS ON ERROR is supported on " +
                    "single-value paths, one [*] wildcard (optionally " +
                    "followed by field steps), and the " +
                    "graft_json_items grammar (.name / ['name'] / [n] " +
                    s"/ [*] / .* / ..name steps) only (got $path) — " +
                    "other paths run as a plain multi-value existence " +
                    "check")
                s"($call IS NOT NULL)"
            }
          } else if (!inner.trim.startsWith("$"))
            fail(s"JSON_EXISTS path must start with $$: $path")
          else if (star.isDefined) {
            // `base[*][.fields]` (SQL:2016 lax): at least one item —
            // an array with >= 1 element (after the field suffix maps
            // over the elements, lax-skipping items without the
            // member), or a non-array base value (lax wraps it to a
            // singleton, a JSON null member included)
            val (base, suffix) = star.get
            val baseLit = "'" + base.replace("'", "''") + "'"
            val bv =
              s"to_json(try_variant_get(try_parse_json($expr), $baseLit))"
            if (suffix.isEmpty)
              s"(CASE WHEN ($expr) IS NULL THEN CAST(NULL AS BOOLEAN)" +
                s" WHEN $malformedPred THEN $errVal" +
                s" WHEN $bv IS NULL THEN FALSE" +
                s" WHEN startswith($bv, '[') THEN json_array_length($bv) > 0" +
                s" ELSE TRUE END)"
            else {
              val (vals, mv) = starFieldItems(bv, suffix)
              s"(CASE WHEN ($expr) IS NULL THEN CAST(NULL AS BOOLEAN)" +
                s" WHEN $malformedPred THEN $errVal" +
                s" WHEN $bv IS NULL THEN FALSE" +
                s" WHEN startswith($bv, '[') THEN size($vals) > 0" +
                s" ELSE $mv IS NOT NULL END)"
            }
          } else {
            // variant-based existence: a JSON null member renders as
            // the text 'null' (present → TRUE, Flink's semantics),
            // where get_json_object conflated it with a missing path
            val vget =
              s"to_json(try_variant_get(try_parse_json($expr), $path))"
            s"(CASE WHEN ($expr) IS NULL THEN CAST(NULL AS BOOLEAN)" +
              s" WHEN $malformedPred THEN $errVal" +
              s" ELSE $vget IS NOT NULL END)"
          }
      }
    }
}
