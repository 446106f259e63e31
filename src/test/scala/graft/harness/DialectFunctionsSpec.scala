package graft.harness

import graft.SparkFixture
import org.scalatest.funsuite.AnyFunSuite

/** Flink UNNEST and SQL:2016 JSON function rewrites: text-level unit
  * cases plus behavioral runs of every rewritten form on a live
  * session.
  */
class DialectFunctionsSpec extends AnyFunSuite {

  private lazy val spark = SparkFixture.spark

  private def run(flinkSql: String): Seq[org.apache.spark.sql.Row] =
    spark.sql(DialectFunctions.rewrite(flinkSql)).collect().toSeq

  test("CROSS JOIN UNNEST of an array rewrites to LATERAL VIEW explode") {
    val out = DialectFunctions.rewrite(
      "SELECT id, x FROM t CROSS JOIN UNNEST(t.arr) AS a (x)")
    assert(out == "SELECT id, x FROM t LATERAL VIEW explode(t.arr) a AS x")
  }

  test("comma-join UNNEST and bare alias (no AS) rewrite too") {
    val out = DialectFunctions.rewrite(
      "SELECT id, x FROM t, UNNEST(arr) a (x)")
    assert(out == "SELECT id, x FROM t LATERAL VIEW explode(arr) a AS x")
  }

  test("unnested array join runs end-to-end") {
    spark.sql("CREATE OR REPLACE TEMP VIEW un_t AS " +
      "SELECT * FROM VALUES (1, array('a','b')), (2, array('c')) AS t(id, arr)")
    val rows = run("SELECT id, x FROM un_t CROSS JOIN UNNEST(arr) AS a (x) ORDER BY id, x")
      .map(r => (r.getInt(0), r.getString(1)))
    assert(rows == Seq((1, "a"), (1, "b"), (2, "c")))
  }

  test("two alias columns unnest a map as key/value") {
    spark.sql("CREATE OR REPLACE TEMP VIEW un_m AS " +
      "SELECT 7 AS id, map('k1', 10, 'k2', 20) AS mp")
    val rows = run("SELECT id, k, v FROM un_m, UNNEST(mp) AS u (k, v) ORDER BY k")
      .map(r => (r.getInt(0), r.getString(1), r.getInt(2)))
    assert(rows == Seq((7, "k1", 10), (7, "k2", 20)))
  }

  test("three or more alias columns unnest an array of rows via inline") {
    spark.sql("CREATE OR REPLACE TEMP VIEW un_r AS SELECT 1 AS id, " +
      "array(named_struct('a', 1, 'b', 'x', 'c', true)) AS rows_col")
    val rows = run(
      "SELECT id, a, b, c FROM un_r CROSS JOIN UNNEST(rows_col) AS u (a, b, c)")
      .map(r => (r.getInt(1), r.getString(2), r.getBoolean(3)))
    assert(rows == Seq((1, "x", true)))
  }

  test("LEFT JOIN UNNEST ON TRUE keeps left rows with NULL outputs") {
    spark.sql("CREATE OR REPLACE TEMP VIEW un_l AS SELECT * FROM VALUES " +
      "(1, array('a')), (2, CAST(NULL AS ARRAY<STRING>)) AS t(id, arr)")
    val rows = run(
      "SELECT id, x FROM un_l LEFT JOIN UNNEST(arr) AS a (x) ON TRUE ORDER BY id")
      .map(r => (r.getInt(0), Option(r.getString(1))))
    assert(rows == Seq((1, Some("a")), (2, None)))
  }

  test("WITH ORDINALITY yields 1-based positions via posexplode") {
    spark.sql("CREATE OR REPLACE TEMP VIEW un_o AS " +
      "SELECT 1 AS id, array('a','b','c') AS arr")
    val rows = run("SELECT id, tok, ord FROM un_o CROSS JOIN " +
      "UNNEST(arr) WITH ORDINALITY AS u (tok, ord) ORDER BY ord")
      .map(r => (r.getString(1), r.getInt(2)))
    assert(rows == Seq(("a", 1), ("b", 2), ("c", 3)))
  }

  test("LEFT JOIN UNNEST WITH ORDINALITY keeps empty-collection rows") {
    spark.sql("CREATE OR REPLACE TEMP VIEW un_lo AS SELECT * FROM VALUES " +
      "(1, array('a', 'b')), (2, CAST(NULL AS ARRAY<STRING>)) AS t(id, arr)")
    val rows = run(
      "SELECT id, tok, ord FROM un_lo LEFT JOIN " +
        "UNNEST(arr) WITH ORDINALITY AS u (tok, ord) ON TRUE " +
        "ORDER BY id, ord")
      .map(r => (r.getInt(0), Option(r.getString(1)),
        if (r.isNullAt(2)) None else Some(r.getInt(2))))
    assert(rows == Seq((1, Some("a"), Some(1)), (1, Some("b"), Some(2)),
      (2, None, None)))
  }

  test("map WITH ORDINALITY takes key, value, ordinality aliases") {
    val rows = run("SELECT k, v, ord FROM un_m, " +
      "UNNEST(mp) WITH ORDINALITY AS u (k, v, ord) ORDER BY ord")
      .map(r => (r.getString(0), r.getInt(1), r.getInt(2)))
    assert(rows.map(_._3) == Seq(1, 2))
  }

  test("UNNEST contract rejections are named") {
    def rejects(sql: String, frag: String): Unit = {
      val e = intercept[IllegalArgumentException](DialectFunctions.rewrite(sql))
      assert(e.getMessage.contains(frag), e.getMessage)
    }
    rejects("SELECT UNNEST(arr) FROM t", "join operand")
    rejects("SELECT x FROM t CROSS JOIN UNNEST(arr)", "alias with a column list")
    rejects("SELECT x FROM t LEFT JOIN UNNEST(arr) AS a (x)", "ON TRUE")
    rejects("SELECT x FROM t, UNNEST(arr) WITH ORDINALITY AS a (x)",
      "ordinality column")
    rejects("SELECT x FROM t, UNNEST(arr) WITH ORDINALITY AS a (a, b, c, o)",
      "array of rows")
    // Spark attaches generators after all joins: a join FOLLOWING the
    // UNNEST would splice into unparseable text — named rejection
    rejects("SELECT x FROM t CROSS JOIN UNNEST(arr) AS a (x) JOIN u ON u.id = t.id",
      "last relation")
    rejects("SELECT x FROM t, UNNEST(arr) AS a (x), u", "last relation")
  }

  test("chained UNNESTs rewrite to chained lateral views") {
    val out = DialectFunctions.rewrite(
      "SELECT i, j FROM t, UNNEST(a) AS x (i), UNNEST(b) AS y (j)")
    assert(out ==
      "SELECT i, j FROM t LATERAL VIEW explode(a) x AS i LATERAL VIEW explode(b) y AS j")
  }

  test("UNNEST inside a string literal never fires") {
    val sql = "SELECT 'CROSS JOIN UNNEST(arr) AS a (x)' AS s FROM t"
    assert(DialectFunctions.rewrite(sql) == sql)
  }

  test("JSON_VALUE rewrites to get_json_object, RETURNING try-casts") {
    assert(DialectFunctions.rewrite("SELECT JSON_VALUE(props, '$.a') FROM t")
      == "SELECT get_json_object(props, '$.a') FROM t")
    // TRY_CAST: Flink routes an uncastable value to ON ERROR (default
    // NULL) — plain CAST would throw under ANSI mode
    assert(DialectFunctions.rewrite(
      "SELECT JSON_VALUE(props, '$.a' RETURNING INT) FROM t")
      == "SELECT TRY_CAST(get_json_object(props, '$.a') AS INT) FROM t")
  }

  test("JSON family runs end-to-end, including nesting") {
    spark.sql("""CREATE OR REPLACE TEMP VIEW js_t AS SELECT
      '{"a": {"b": 7}, "tags": [1, 2]}' AS props""")
    val r = run("""SELECT
      JSON_VALUE(props, '$.a.b' RETURNING INT) AS b,
      JSON_QUERY(props, '$.tags') AS tags,
      JSON_EXISTS(props, '$.a') AS has_a,
      JSON_EXISTS(props, '$.z') AS has_z,
      JSON_VALUE(JSON_QUERY(props, '$.a'), '$.b') AS nested
      FROM js_t""").head
    assert(r.getInt(0) == 7)
    assert(r.getString(1) == "[1,2]")
    assert(r.getBoolean(2) && !r.getBoolean(3))
    assert(r.getString(4) == "7")
  }

  test("JSON behavior clauses: the JSON_VALUE subset maps, the rest rejects") {
    def rejects(sql: String, frag: String): Unit = {
      val e = intercept[IllegalArgumentException](DialectFunctions.rewrite(sql))
      assert(e.getMessage.contains(frag), e.getMessage)
    }
    // Flink defaults spelled out are no-ops; DEFAULT ... ON EMPTY /
    // ON ERROR compile onto the graft_json_valid CASE, which
    // discriminates malformed JSON (ERROR) from missing path (EMPTY)
    // from present-but-uncastable (ERROR, under RETURNING)
    graft.functions.GraftFunctions.register(spark)
    val r = spark.sql(DialectFunctions.rewrite(
      """SELECT JSON_VALUE('{"a": 7}', '$.a' NULL ON EMPTY NULL ON ERROR) AS a,
        |  JSON_VALUE('{"a": 7}', '$.b' DEFAULT 'none' ON EMPTY) AS b,
        |  JSON_VALUE('{"a": 7}', '$.b' RETURNING INT DEFAULT 0 ON EMPTY NULL ON ERROR) AS c,
        |  JSON_VALUE('{"a": 7}', '$.a' RETURNING INT DEFAULT 0 ON EMPTY) AS d""".stripMargin)).head
    assert(r.getString(0) == "7")
    assert(r.getString(1) == "none")
    assert(r.getInt(2) == 0)
    assert(r.getInt(3) == 7)
    // the ERROR-vs-EMPTY discrimination, end to end: malformed JSON
    // and an uncastable value pick the ERROR default, a missing path
    // picks the EMPTY default, NULL input stays NULL (no clause fires)
    val r2 = spark.sql(DialectFunctions.rewrite(
      """SELECT
        |  JSON_VALUE('{oops', '$.a' DEFAULT 'bad' ON ERROR) AS a,
        |  JSON_VALUE('{oops', '$.a' DEFAULT 'none' ON EMPTY DEFAULT 'bad' ON ERROR) AS b,
        |  JSON_VALUE('{"z": 1}', '$.a' DEFAULT 'none' ON EMPTY DEFAULT 'bad' ON ERROR) AS c,
        |  JSON_VALUE('{"a": "xx"}', '$.a' RETURNING INT DEFAULT -1 ON EMPTY DEFAULT -99 ON ERROR) AS d,
        |  JSON_VALUE('{"a": 5}', '$.a' RETURNING INT DEFAULT -1 ON EMPTY DEFAULT -99 ON ERROR) AS e,
        |  JSON_VALUE(CAST(NULL AS STRING), '$.a' DEFAULT 'none' ON EMPTY DEFAULT 'bad' ON ERROR) AS f,
        |  JSON_VALUE('{} trailing', '$.a' DEFAULT 'bad' ON ERROR) AS g""".stripMargin)).head
    assert(r2.getString(0) == "bad")
    assert(r2.getString(1) == "bad") // ERROR, not EMPTY: malformed is an error
    assert(r2.getString(2) == "none")
    assert(r2.getInt(3) == -99) // present-but-uncastable is an ERROR
    assert(r2.getInt(4) == 5)
    assert(r2.isNullAt(5)) // NULL input: no clause fires
    assert(r2.getString(6) == "bad") // trailing content = not one document
    // raising forms (r13b): ERROR ON EMPTY/ERROR compile onto
    // raise_error in the matching CASE branch — well-formed rows pass
    // untouched, the offending row raises with the path in the message
    val r3 = spark.sql(DialectFunctions.rewrite(
      """SELECT
        |  JSON_VALUE('{"a": 7}', '$.a' ERROR ON EMPTY ERROR ON ERROR) AS a,
        |  JSON_VALUE('{"z": 1}', '$.a' DEFAULT 'none' ON EMPTY ERROR ON ERROR) AS b
        |""".stripMargin)).head
    assert(r3.getString(0) == "7" && r3.getString(1) == "none")
    def raises(sql: String, frag: String): Unit = {
      val e = intercept[Exception](
        spark.sql(DialectFunctions.rewrite(sql)).collect())
      val msgs = Iterator.iterate(e: Throwable)(_.getCause)
        .takeWhile(_ != null).take(6)
        .flatMap(t => Option(t.getMessage)).mkString("\n")
      assert(msgs.contains(frag), msgs)
    }
    raises("SELECT JSON_VALUE('{\"z\": 1}', '$.a' ERROR ON EMPTY) AS x",
      "ERROR ON EMPTY: empty result for path $.a")
    raises("SELECT JSON_VALUE('{oops', '$.a' ERROR ON ERROR) AS x",
      "ERROR ON ERROR")
    // uncastable under RETURNING routes to ON ERROR, which raises too
    raises("SELECT JSON_VALUE('{\"a\": \"xx\"}', " +
      "'$.a' RETURNING INT ERROR ON ERROR) AS x", "ERROR ON ERROR")
    // JSON_QUERY admits wrapper + substitute clauses since r14; raising
    // forms and the wildcard-path restriction stay named
    raises("SELECT JSON_QUERY('{\"z\": 1}', '$.a' ERROR ON EMPTY) AS x",
      "JSON_QUERY ERROR ON EMPTY")
    raises("SELECT JSON_QUERY('{oops', '$.a' ERROR ON ERROR) AS x",
      "JSON_QUERY ERROR ON ERROR")
    // r16: `$..c` clauses are SUPPORTED (graft_json_items); a
    // multi-value path outside the item grammar still rejects by name
    rejects("SELECT JSON_QUERY(p, '$..c[?(@.x)]' WITH ARRAY WRAPPER) " +
      "FROM t", "graft_json_items grammar")
    rejects("SELECT JSON_QUERY(p, 'a.b') FROM t", "must start with $")
    rejects("SELECT JSON_EXISTS(p, '$.a' NULL ON EMPTY) FROM t", "behavior")
    rejects("SELECT JSON_VALUE(p, path_col) FROM t", "string-literal path")
    rejects("SELECT JSON_EXISTS(p, '$.a' RETURNING INT) FROM t",
      "does not take RETURNING")
    rejects("SELECT JSON_VALUE(p) FROM t", "takes (json, 'path'")
  }

  test("JSON_QUERY wrapper and behavior clause matrix (SQL:2016)") {
    graft.functions.GraftFunctions.register(spark)
    // the seven input shapes: object, array, string scalar, number
    // scalar, JSON null, missing path, malformed JSON
    val inputs = Seq("""{"a": {"b": 1}}""", """{"a": [1, 2]}""",
      """{"a": "x"}""", """{"a": 7}""", """{"a": null}""", """{"z": 1}""",
      "not json")
    def run(clause: String): Seq[String] = inputs.map { js =>
      val lit = "'" + js.replace("'", "''") + "'"
      val r = spark.sql(DialectFunctions.rewrite(
        s"SELECT JSON_QUERY($lit, '$$.a'$clause) AS v")).head
      if (r.isNullAt(0)) null else r.getString(0)
    }
    // WITHOUT WRAPPER (default): containers pass, scalars are an ERROR
    // condition (default NULL), missing is EMPTY (default NULL)
    assert(run("") === Seq("""{"b":1}""", "[1,2]", null, null, null,
      null, null))
    // WITH [UNCONDITIONAL] WRAPPER: everything wraps, including the
    // already-array result and the JSON null scalar
    assert(run(" WITH WRAPPER") === Seq("""[{"b":1}]""", "[[1,2]]",
      """["x"]""", "[7]", "[null]", null, null))
    assert(run(" WITH UNCONDITIONAL ARRAY WRAPPER") ===
      run(" WITH WRAPPER"))
    // WITH CONDITIONAL WRAPPER: arrays stay, everything else wraps
    assert(run(" WITH CONDITIONAL ARRAY WRAPPER") === Seq("""[{"b":1}]""",
      "[1,2]", """["x"]""", "[7]", "[null]", null, null))
    // substitute behaviors fill their own branch only
    assert(run(" EMPTY ARRAY ON EMPTY") === Seq("""{"b":1}""", "[1,2]",
      null, null, null, "[]", null))
    assert(run(" EMPTY OBJECT ON ERROR") === Seq("""{"b":1}""", "[1,2]",
      "{}", "{}", "{}", null, "{}"))
    assert(run(" WITH CONDITIONAL WRAPPER EMPTY ARRAY ON EMPTY " +
      "EMPTY OBJECT ON ERROR") === Seq("""[{"b":1}]""", "[1,2]",
      """["x"]""", "[7]", "[null]", "[]", "{}"))
    // NULL input stays NULL through every clause
    val rNull = spark.sql(DialectFunctions.rewrite(
      "SELECT JSON_QUERY(CAST(NULL AS STRING), '$.a' " +
        "EMPTY OBJECT ON ERROR) AS v")).head
    assert(rNull.isNullAt(0))
    // `[*].field` paths run SQL:2016 lax semantics since r15: two
    // scalar items under the default WITHOUT wrapper is an error →
    // NULL (the old get_json_object passthrough returned "[1,2]",
    // a documented deviation from Flink); wrapping yields the items
    val rWild = spark.sql(DialectFunctions.rewrite(
      """SELECT JSON_QUERY('{"a":[{"c":1},{"c":2}]}', '$.a[*].c') AS v,
        |JSON_QUERY('{"a":[{"c":1},{"c":2}]}', '$.a[*].c'
        |  WITH WRAPPER) AS w""".stripMargin)).head
    assert(rWild.isNullAt(0))
    assert(rWild.getString(1) === "[1,2]")
  }

  test("JSON_EXISTS reads JSON null members as present; ON ERROR routes") {
    graft.functions.GraftFunctions.register(spark)
    def run(js: String, clause: String): Any = {
      val lit =
        if (js == null) "CAST(NULL AS STRING)"
        else "'" + js.replace("'", "''") + "'"
      val r = spark.sql(DialectFunctions.rewrite(
        s"SELECT JSON_EXISTS($lit, '$$.a'$clause) AS v")).head
      if (r.isNullAt(0)) null else r.getBoolean(0)
    }
    // presence: object member TRUE, JSON null member TRUE (the old
    // get_json_object form read it as absent), missing FALSE
    assert(run("""{"a": {"b": 1}}""", "") === true)
    assert(run("""{"a": null}""", "") === true)
    assert(run("""{"z": 1}""", "") === false)
    // NULL input stays NULL; malformed routes to ON ERROR
    assert(run(null, "") === null)
    assert(run("not json", "") === false)
    assert(run("not json", " TRUE ON ERROR") === true)
    assert(run("not json", " FALSE ON ERROR") === false)
    assert(run("not json", " UNKNOWN ON ERROR") === null)
    val e = intercept[Exception](run("not json", " ERROR ON ERROR"))
    val msgs = Iterator.iterate(e: Throwable)(_.getCause)
      .takeWhile(_ != null).take(6)
      .flatMap(t => Option(t.getMessage)).mkString("\n")
    assert(msgs.contains("JSON_EXISTS ERROR ON ERROR"), msgs)
    // r16: multi-wildcard clauses are supported (graft_json_items);
    // paths outside the item grammar still reject the clause by name
    val w = intercept[IllegalArgumentException](DialectFunctions.rewrite(
      "SELECT JSON_EXISTS(p, '$..c[?(@.x)]' TRUE ON ERROR) FROM t"))
    assert(w.getMessage.contains("graft_json_items grammar"), w.getMessage)
  }

  test("JSON_QUERY/JSON_EXISTS clauses on a trailing [*] wildcard (lax)") {
    graft.functions.GraftFunctions.register(spark)
    // SQL:2016 lax [*]: array elements are the items (0 → EMPTY, 1 →
    // wrapper rules on it, >1 → WITHOUT errors, wrapping re-yields the
    // array); a non-array base — JSON null included — wraps to a
    // singleton item. r15: previously any wildcard rejected clauses.
    val inputs = Seq("""{"a": [1, 2]}""", """{"a": [7]}""",
      """{"a": [{"b": 1}]}""", """{"a": []}""", """{"a": 5}""",
      """{"a": null}""", """{"z": 1}""", "not json")
    def runQ(clause: String): Seq[String] = inputs.map { js =>
      val lit = "'" + js.replace("'", "''") + "'"
      val r = spark.sql(DialectFunctions.rewrite(
        s"SELECT JSON_QUERY($lit, '$$.a[*]'$clause) AS v")).head
      if (r.isNullAt(0)) null else r.getString(0)
    }
    assert(runQ("") === Seq(null, null, """{"b":1}""", null, null, null,
      null, null))
    assert(runQ(" WITH WRAPPER EMPTY ARRAY ON EMPTY") === Seq("[1,2]",
      "[7]", """[{"b":1}]""", "[]", "[5]", "[null]", "[]", null))
    assert(runQ(" WITH CONDITIONAL ARRAY WRAPPER") === Seq("[1,2]",
      "[7]", """{"b":1}""", null, "[5]", "[null]", null, null))
    def runE(clause: String): Seq[Any] = inputs.map { js =>
      val lit = "'" + js.replace("'", "''") + "'"
      val r = spark.sql(DialectFunctions.rewrite(
        s"SELECT JSON_EXISTS($lit, '$$.a[*]'$clause) AS v")).head
      if (r.isNullAt(0)) null else r.getBoolean(0)
    }
    assert(runE("") === Seq(true, true, true, false, true, true, false,
      false))
    assert(runE(" TRUE ON ERROR") === Seq(true, true, true, false, true,
      true, false, true))
    // paths outside the graft_json_items grammar still reject clauses
    val e = intercept[IllegalArgumentException](DialectFunctions.rewrite(
      "SELECT JSON_QUERY(p, '$..c[?(@.x)]' WITH WRAPPER) FROM t"))
    assert(e.getMessage.contains("graft_json_items grammar"), e.getMessage)
  }

  test("JSON_QUERY/JSON_EXISTS clauses on recursive-descent and " +
      "multi-wildcard paths (r16)") {
    graft.functions.GraftFunctions.register(spark)
    def q(call: String): Any = {
      val r = spark.sql(DialectFunctions.rewrite(s"SELECT $call AS v")).head
      if (r.isNullAt(0)) null else r.get(0)
    }
    // deep scan $..b: jayway order — a node's own matching member
    // collects before the recursion into children; collected subtrees
    // re-scan (the nested b inside b)
    val j = "'" + """{"x":{"b":1},"b":{"b":2},"z":[{"b":3}]}""" + "'"
    assert(q(s"JSON_QUERY($j, '$$..b' WITH WRAPPER)") ===
      """[{"b":2},1,2,3]""")
    // multi > 1 items under WITHOUT wrapper → ON ERROR (default NULL)
    assert(q(s"JSON_QUERY($j, '$$..b')") === null)
    assert(q(s"JSON_QUERY($j, '$$..b' EMPTY ARRAY ON ERROR)") === "[]")
    // single deep match: WITHOUT returns a container item bare,
    // CONDITIONAL wraps scalars only
    val one = "'" + """{"x":{"b":[7]}}""" + "'"
    assert(q(s"JSON_QUERY($one, '$$..b')") === "[7]")
    val oneScalar = "'" + """{"x":{"b":9}}""" + "'"
    assert(q(s"JSON_QUERY($oneScalar, '$$..b')") === null)
    assert(q(s"JSON_QUERY($oneScalar, '$$..b' WITH CONDITIONAL WRAPPER)")
      === "[9]")
    // no match → ON EMPTY
    assert(q(s"JSON_QUERY($one, '$$..zz' EMPTY ARRAY ON EMPTY)") === "[]")
    assert(q(s"JSON_QUERY($one, '$$..zz')") === null)
    // multi-wildcard: items cross the two iterations in order; member
    // steps lax-skip items lacking the member
    val mw = "'" +
      """{"a":[{"b":[1,2]},{"z":0},{"b":[3]}]}""" + "'"
    assert(q(s"JSON_QUERY($mw, '$$.a[*].b[*]' WITH WRAPPER)") === "[1,2,3]")
    assert(q(s"JSON_EXISTS($mw, '$$.a[*].b[*]')") === true)
    assert(q(s"JSON_EXISTS($mw, '$$.a[*].zz[*]')") === false)
    // .* member wildcard: object field values in document order
    val st = "'" + """{"m":{"p":1,"q":2}}""" + "'"
    assert(q(s"JSON_QUERY($st, '$$.m.*' WITH WRAPPER)") === "[1,2]")
    // deep-scan existence: a JSON null match reads PRESENT (the
    // legacy extractor conflated it with absence)
    val nn = "'" + """{"x":{"b":null}}""" + "'"
    assert(q(s"JSON_EXISTS($nn, '$$..b')") === true)
    assert(q(s"JSON_EXISTS($nn, '$$..zz')") === false)
    // malformed input routes to ON ERROR in both functions
    assert(q("JSON_EXISTS('{oops', '$..b' TRUE ON ERROR)") === true)
    assert(q("JSON_EXISTS('{oops', '$..b')") === false)
    assert(q("JSON_QUERY('{oops', '$..b' EMPTY OBJECT ON ERROR)") === "{}")
    // clause-free forms take the same item semantics now (previously
    // the legacy passthrough, where `..` never matched at all)
    assert(q(s"JSON_QUERY($mw, '$$.a[*].b[*]')") === null)
  }

  test("JSON_QUERY/JSON_EXISTS clauses on [*] followed by field steps") {
    graft.functions.GraftFunctions.register(spark)
    // `$.a[*].c` (r15): the base's items map through the field step —
    // items LACKING the member are skipped (lax), JSON-null members
    // stay present; a non-array base wraps to a singleton first
    val inputs = Seq(
      """{"a":[{"c":1},{"c":2}]}""", // two items
      """{"a":[{"c":1},{"z":9}]}""", // one item (lax skip)
      """{"a":[{"c":null},{"z":9}]}""", // one JSON-null item (present)
      """{"a":[{"z":9}]}""", // zero items -> EMPTY
      """{"a":{"c":5}}""", // non-array base, member present
      """{"a":{"z":9}}""", // non-array base, member missing -> EMPTY
      """{"a":[{"c":{"d":1}}]}""", // one CONTAINER item
      """{"z":1}""", // base missing -> EMPTY
      "not json") // -> ERROR
    def runQ(clause: String): Seq[String] = inputs.map { js =>
      val lit = "'" + js.replace("'", "''") + "'"
      val r = spark.sql(DialectFunctions.rewrite(
        s"SELECT JSON_QUERY($lit, '$$.a[*].c'$clause) AS v")).head
      if (r.isNullAt(0)) null else r.getString(0)
    }
    // WITHOUT wrapper: only a single container item passes
    assert(runQ("") === Seq(null, null, null, null, null, null,
      """{"d":1}""", null, null))
    assert(runQ(" WITH WRAPPER EMPTY ARRAY ON EMPTY") === Seq("[1,2]",
      "[1]", "[null]", "[]", "[5]", "[]", """[{"d":1}]""", "[]", null))
    assert(runQ(" WITH CONDITIONAL ARRAY WRAPPER") === Seq("[1,2]",
      "[1]", "[null]", null, "[5]", null, """{"d":1}""", null, null))
    def runE(clause: String): Seq[Any] = inputs.map { js =>
      val lit = "'" + js.replace("'", "''") + "'"
      val r = spark.sql(DialectFunctions.rewrite(
        s"SELECT JSON_EXISTS($lit, '$$.a[*].c'$clause) AS v")).head
      if (r.isNullAt(0)) null else r.getBoolean(0)
    }
    assert(runE("") === Seq(true, true, true, false, true, false, true,
      false, false))
    assert(runE(" TRUE ON ERROR") === Seq(true, true, true, false, true,
      false, true, false, true))
    // a multi-step field suffix composes
    val deep = spark.sql(DialectFunctions.rewrite(
      """SELECT JSON_QUERY('{"a":[{"c":{"d":1}},{"c":{"d":2}}]}',
        |'$.a[*].c.d' WITH WRAPPER) AS v""".stripMargin)).head
    assert(deep.getString(0) === "[1,2]")
    // an item that is itself an ARRAY yields nothing for a member
    // step — member access does not auto-unwrap nested arrays
    // (jayway-style path evaluation, the deliberate choice over
    // strict SQL:2016 lax one-level unwrapping)
    val nested = spark.sql(DialectFunctions.rewrite(
      """SELECT JSON_QUERY('{"a":[[{"c":1}]]}',
        |'$.a[*].c' WITH WRAPPER EMPTY ARRAY ON EMPTY) AS v,
        |JSON_EXISTS('{"a":[[{"c":1}]]}', '$.a[*].c') AS e""".stripMargin))
      .head
    assert(nested.getString(0) === "[]")
    assert(nested.getBoolean(1) === false)
  }

  test("a quoted member name containing * or .. is a single-value path") {
    graft.functions.GraftFunctions.register(spark)
    // structural wildcard detection: $['a*b'] names a member whose NAME
    // contains a star — it must take the variant branch (clauses
    // admitted), not the legacy multi-value passthrough
    val r = spark.sql(DialectFunctions.rewrite(
      """SELECT JSON_QUERY('{"a*b": 7}', '$[''a*b'']' WITH WRAPPER) AS v,
        |  JSON_EXISTS('{"a..b": 1}', '$[''a..b'']' TRUE ON ERROR) AS e
        |""".stripMargin)).head
    assert(r.getString(0) === "[7]")
    assert(r.getBoolean(1) === true)
  }

  test("a literal containing JSON_VALUE( is untouched") {
    val sql = "SELECT 'JSON_VALUE(x, ''$.a'')' AS s FROM t"
    assert(DialectFunctions.rewrite(sql) == sql)
  }

  test("TO_TIMESTAMP_LTZ maps to epoch constructors by precision") {
    assert(DialectFunctions.rewriteScalars("SELECT TO_TIMESTAMP_LTZ(ms, 3) FROM t")
      == "SELECT timestamp_millis(ms) FROM t")
    assert(DialectFunctions.rewriteScalars("SELECT TO_TIMESTAMP_LTZ(s, 0) FROM t")
      == "SELECT timestamp_seconds(s) FROM t")
    assert(DialectFunctions.rewriteScalars("SELECT TO_TIMESTAMP_LTZ(ms) FROM t")
      == "SELECT timestamp_millis(ms) FROM t")
    val r = spark.sql(DialectFunctions.rewrite(
      "SELECT TO_TIMESTAMP_LTZ(1704153600000, 3) AS ts")).head
    assert(r.getTimestamp(0).toInstant.toEpochMilli == 1704153600000L)
    val e = intercept[IllegalArgumentException](
      DialectFunctions.rewriteScalars("SELECT TO_TIMESTAMP_LTZ(ms, 6) FROM t"))
    assert(e.getMessage.contains("precision must be 0 or 3"))
  }

  test("PROCTIME() maps to current_timestamp, literals untouched") {
    assert(DialectFunctions.rewriteScalars("SELECT PROCTIME() AS pt FROM t")
      == "SELECT current_timestamp() AS pt FROM t")
    val sql = "SELECT 'PROCTIME()' AS s FROM t"
    assert(DialectFunctions.rewriteScalars(sql) == sql)
    assert(!spark.sql(DialectFunctions.rewrite("SELECT PROCTIME() AS pt"))
      .head.isNullAt(0))
  }

  test("SPLIT_INDEX is 0-based, NULL out of range, separators split literally") {
    val r = spark.sql(DialectFunctions.rewrite(
      "SELECT SPLIT_INDEX('a-b-c', '-', 0) AS t0, " +
        "SPLIT_INDEX('a-b-c', '-', 2) AS t2, SPLIT_INDEX('a-b-c', '-', 9) AS t9")).head
    assert(r.getString(0) == "a" && r.getString(1) == "c" && r.isNullAt(2))
    // Flink returns NULL for negative indices — a bare +1 would hit
    // Spark's index-0 error at -1 and END-relative indexing at <= -2
    val rn = spark.sql(DialectFunctions.rewrite(
      "SELECT SPLIT_INDEX('a-b-c', '-', -1) AS m1, " +
        "SPLIT_INDEX('a-b-c', '-', -2) AS m2")).head
    assert(rn.isNullAt(0) && rn.isNullAt(1))
    // Flink splits by the separator LITERALLY — a regex metachar
    // separator must not be read as a pattern, whether it arrives as a
    // literal or as a runtime expression (column value)
    val rl = spark.sql(DialectFunctions.rewrite(
      "SELECT SPLIT_INDEX('a.b.c', '.', 1) AS dot, " +
        "SPLIT_INDEX('a|b|c', '|', 2) AS pipe, " +
        // separator arrives as a runtime EXPRESSION whose value is the
        // two chars \E — the Pattern.quote break-out must keep it literal
        "SPLIT_INDEX('a\\\\Eb', SUBSTRING('x\\\\E', 2, 2), 1) AS esc")).head
    assert(rl.getString(0) == "b")
    assert(rl.getString(1) == "c")
    assert(rl.getString(2) == "b")
    assert(spark.sql(DialectFunctions.rewrite(
      "SELECT SPLIT_INDEX('a-b', CAST(NULL AS STRING), 0) AS n"))
      .head.isNullAt(0))
  }

  test("property: SPLIT_INDEX equals a reference literal split for random separators") {
    // ground truth: indexOf-based whole-separator split preserving all
    // tokens (Flink's split_index semantics)
    def litSplit(s: String, sep: String): Vector[String] = {
      val out = Vector.newBuilder[String]
      var last = 0
      var j = s.indexOf(sep, last)
      while (j >= 0) {
        out += s.substring(last, j)
        last = j + sep.length
        j = s.indexOf(sep, last)
      }
      out += s.substring(last)
      out.result()
    }
    def q(s: String): String =
      "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"
    val rnd = new scala.util.Random(3)
    val sepAlphabet = raw"ab.\|E$$Q*+[()"
    val cases = (1 to 40).map { _ =>
      val sep = (0 to rnd.nextInt(2))
        .map(_ => sepAlphabet(rnd.nextInt(sepAlphabet.length))).mkString
      val parts = (0 to rnd.nextInt(3))
        .map(_ => (0 until rnd.nextInt(3)).map(_ => "xy"(rnd.nextInt(2))).mkString)
      val s = parts.mkString(sep)
      val idx = rnd.nextInt(4) - 1
      (s, sep, idx)
    }
    val exprs = cases.zipWithIndex.map { case ((s, sep, idx), i) =>
      s"SPLIT_INDEX(${q(s)}, ${q(sep)}, $idx) AS c$i"
    }
    val row = spark.sql(DialectFunctions.rewrite(
      "SELECT " + exprs.mkString(", "))).head
    cases.zipWithIndex.foreach { case ((s, sep, idx), i) =>
      val ref = litSplit(s, sep)
      val expected = if (idx < 0 || idx >= ref.length) None else Some(ref(idx))
      val got = if (row.isNullAt(i)) None else Some(row.getString(i))
      assert(got == expected, s"case $i: s=${s} sep=${sep} idx=$idx " +
        s"ref=$ref got=$got")
    }
  }

  test("IS_DIGIT / IS_ALPHA / IS_DECIMAL are total predicates") {
    val r = spark.sql(DialectFunctions.rewrite(
      "SELECT IS_DIGIT('123') AS a, IS_DIGIT('12a') AS b, " +
        "IS_DIGIT(CAST(NULL AS STRING)) AS c, " +
        "IS_ALPHA('abc') AS d, IS_ALPHA('ab1') AS e, " +
        "IS_DECIMAL('-12.5') AS f, IS_DECIMAL('1e5') AS g")).head
    assert(r.getBoolean(0) && !r.getBoolean(1) && !r.getBoolean(2))
    assert(r.getBoolean(3) && !r.getBoolean(4))
    assert(r.getBoolean(5) && !r.getBoolean(6))
  }

  test("JSON_OBJECT / JSON_ARRAY constructors honor ON NULL behaviors") {
    val r = spark.sql(DialectFunctions.rewrite(
      "SELECT JSON_OBJECT('a' VALUE 1, 'b' VALUE 'x') AS o, " +
        "JSON_OBJECT('a' VALUE CAST(NULL AS INT)) AS onull, " +
        "JSON_OBJECT('a' VALUE CAST(NULL AS INT) ABSENT ON NULL) AS oabs, " +
        "JSON_OBJECT() AS oempty, " +
        "JSON_ARRAY(1, 2, CAST(NULL AS INT)) AS aabs, " +
        "JSON_ARRAY(1, 2, CAST(NULL AS INT) NULL ON NULL) AS anull, " +
        "JSON_ARRAY() AS aempty")).head
    assert(r.getString(0) == """{"a":1,"b":"x"}""")
    assert(r.getString(1) == """{"a":null}""") // Flink object default
    assert(r.getString(2) == "{}")
    assert(r.getString(3) == "{}")
    assert(r.getString(4) == "[1,2]") // Flink array default: ABSENT
    assert(r.getString(5) == "[1,2,null]")
    assert(r.getString(6) == "[]")
    val e = intercept[IllegalArgumentException](DialectFunctions.rewriteScalars(
      "SELECT JSON_OBJECT(k VALUE 1) FROM t"))
    assert(e.getMessage.contains("literal keys"))
  }

  test("nested JSON constructors splice raw JSON, not re-encoded strings") {
    // Flink: a constructor given DIRECTLY as a VALUE / element inserts
    // its result as raw JSON — [{"k":1}], never ["{\"k\":1}"]
    val r = spark.sql(DialectFunctions.rewrite(
      "SELECT JSON_ARRAY(JSON_OBJECT('k' VALUE 1)) AS arr_of_obj, " +
        "JSON_OBJECT('a' VALUE JSON_ARRAY(1, 2)) AS obj_of_arr, " +
        "JSON_OBJECT('o' VALUE JSON_OBJECT('i' VALUE 'x')) AS obj_of_obj, " +
        "JSON_ARRAY(JSON_ARRAY(1), JSON_ARRAY(2, 3)) AS arr_of_arr")).head
    assert(r.getString(0) == """[{"k":1}]""")
    assert(r.getString(1) == """{"a":[1,2]}""")
    assert(r.getString(2) == """{"o":{"i":"x"}}""")
    assert(r.getString(3) == "[[1],[2,3]]")
    // inner ABSENT filtering is per-level (a real filter), outer NULL
    // member policy still honored
    val rn = spark.sql(DialectFunctions.rewrite(
      "SELECT JSON_OBJECT('a' VALUE JSON_ARRAY(1, CAST(NULL AS INT)), " +
        "'b' VALUE CAST(NULL AS STRING)) AS m")).head
    assert(rn.getString(0) == """{"a":[1],"b":null}""")
    // a constructor nested inside ANY OTHER expression is a VARCHAR in
    // Flink — it keeps its own serialization
    val rs = spark.sql(DialectFunctions.rewrite(
      "SELECT JSON_OBJECT('len' VALUE LENGTH(JSON_ARRAY(1, 2))) AS m")).head
    assert(rs.getString(0) == """{"len":5}""")
    // mixed object ON NULL modes in one tree cannot be rendered with
    // to_json's single null policy — named rejection
    val e = intercept[IllegalArgumentException](DialectFunctions.rewriteScalars(
      "SELECT JSON_OBJECT('a' VALUE JSON_OBJECT('b' VALUE x ABSENT ON NULL))"))
    assert(e.getMessage.contains("ON NULL"))
  }

  test("property: random nested JSON constructors render Flink's raw-splice JSON") {
    val rnd = new scala.util.Random(13)
    // one object ON NULL mode per tree (mixed modes reject by contract)
    def genValue(depth: Int, objNull: Boolean): (String, Option[String]) =
      rnd.nextInt(if (depth >= 3) 3 else 5) match {
        case 0 => val i = rnd.nextInt(100); (i.toString, Some(i.toString))
        case 1 => val s = s"s${rnd.nextInt(10)}"; (s"'$s'", Some("\"" + s + "\""))
        case 2 => ("CAST(NULL AS INT)", None)
        case 3 => genObject(depth, objNull)
        case _ => genArray(depth, objNull)
      }
    def genObject(depth: Int, objNull: Boolean): (String, Option[String]) = {
      val n = 1 + rnd.nextInt(3)
      val members = (0 until n).map { i =>
        val (sql, js) = genValue(depth + 1, objNull)
        (s"k$i", sql, js)
      }
      val mode = if (objNull) {
        if (rnd.nextBoolean()) " NULL ON NULL" else "" // NULL is the default
      } else " ABSENT ON NULL"
      val sql = members.map { case (k, v, _) => s"'$k' VALUE $v" }
        .mkString("JSON_OBJECT(", ", ", mode + ")")
      val body = members.flatMap { case (k, _, js) =>
        js match {
          case Some(j) => Some("\"" + k + "\":" + j)
          case None => if (objNull) Some("\"" + k + "\":null") else None
        }
      }
      (sql, Some(body.mkString("{", ",", "}")))
    }
    def genArray(depth: Int, objNull: Boolean): (String, Option[String]) = {
      // one scalar kind per array: Spark's array() COERCES mixed
      // int/string elements (the documented heterogeneous-list
      // deviation), and arrays of differently-shaped structs fail at
      // analysis — both out of the faithful subset
      val n = 1 + rnd.nextInt(3)
      val intKind = rnd.nextBoolean()
      val nullLit =
        if (intKind) "CAST(NULL AS INT)" else "CAST(NULL AS STRING)"
      val elems = (0 until n).map { _ =>
        rnd.nextInt(4) match {
          case 0 => (nullLit, Option.empty[String])
          case _ =>
            if (intKind) { val i = rnd.nextInt(100); (i.toString, Some(i.toString)) }
            else { val s = s"s${rnd.nextInt(10)}"; (s"'$s'", Some("\"" + s + "\"")) }
        }
      }
      val keepNulls = rnd.nextBoolean()
      val mode =
        if (keepNulls) " NULL ON NULL"
        else if (rnd.nextBoolean()) " ABSENT ON NULL" else "" // the default
      val sql = elems.map(_._1).mkString("JSON_ARRAY(", ", ", mode + ")")
      val body = elems.flatMap {
        case (_, Some(j)) => Some(j)
        case (_, None) => if (keepNulls) Some("null") else None
      }
      (sql, Some(body.mkString("[", ",", "]")))
    }
    val cases = (1 to 25).map { _ =>
      val objNull = rnd.nextBoolean()
      if (rnd.nextBoolean()) genObject(0, objNull) else genArray(0, objNull)
    }
    val exprs = cases.zipWithIndex.map { case ((sql, _), i) => s"$sql AS c$i" }
    val row = spark.sql(DialectFunctions.rewrite(
      "SELECT " + exprs.mkString(", "))).head
    cases.zipWithIndex.foreach { case ((sql, expected), i) =>
      assert(row.getString(i) == expected.get, s"case $i: $sql")
    }
  }

  test("CURRENT_WATERMARK and legacy LATERAL TABLE reject by name") {
    val e1 = intercept[IllegalArgumentException](DialectFunctions.rewrite(
      "SELECT * FROM t WHERE ts > CURRENT_WATERMARK(ts)"))
    assert(e1.getMessage.contains("watermark introspection"))
    val e2 = intercept[IllegalArgumentException](DialectFunctions.rewrite(
      "SELECT * FROM o, LATERAL TABLE (rates(o.ts)) WHERE cur = ccy"))
    assert(e2.getMessage.contains("FOR SYSTEM_TIME AS OF"))
    assert(DialectFunctions.hasDialectFunctions(
      "SELECT CURRENT_WATERMARK(ts) FROM t"))
    // literal-blind like every other pass
    val s = "SELECT 'CURRENT_WATERMARK(x)' AS t"
    assert(DialectFunctions.rewrite(s) == s)
    // batch mode resolves it to NULL (Flink's no-watermark-available
    // contract: a batch pipeline never emits one) and runs
    val b = DialectFunctions.rewrite(
      "SELECT CURRENT_WATERMARK(ts) AS wm, CURRENT_WATERMARK(t.ts) AS wm2",
      isStreaming = false)
    assert(b == "SELECT CAST(NULL AS TIMESTAMP) AS wm, " +
      "CAST(NULL AS TIMESTAMP) AS wm2", b)
    // the batch replacement is literal-blind too
    val bl = "SELECT 'CURRENT_WATERMARK(ts)' AS note, " +
      "CURRENT_WATERMARK(ts) AS wm"
    assert(DialectFunctions.rewrite(bl, isStreaming = false) ==
      "SELECT 'CURRENT_WATERMARK(ts)' AS note, " +
        "CAST(NULL AS TIMESTAMP) AS wm")
    val row = SparkFixture.spark
      .sql("SELECT CAST(NULL AS TIMESTAMP) AS wm").head
    assert(row.isNullAt(0))
  }

  test("e2e: streaming UNNEST + JSON constructor through sql-submit") {
    // UNNEST rewrites to a stateless generator, so it streams in append
    // mode; the JSON constructor is a plain projection
    val spark = SparkFixture.spark
    val out = java.nio.file.Files.createTempDirectory("dlf_stream").toString
    val script = java.nio.file.Files.createTempFile("dlf_stream", ".sql")
    java.nio.file.Files.writeString(script,
      s"""SET execution.runtime-mode = streaming;
         |SET execution.checkpointing.enabled = true;
         |SET state.checkpoints.dir = file://$out/cp;
         |create table src (
         |  id bigint,
         |  w as 'a b'
         |) with (
         |  'connector' = 'datagen',
         |  'rows-per-second' = '50'
         |);
         |create table snk (id bigint, tok string, meta string) with (
         |  'connector' = 'filesystem',
         |  'path' = 'file://$out/sink',
         |  'format' = 'parquet'
         |);
         |insert into snk
         |SELECT id, u.tok, JSON_OBJECT('tok' VALUE u.tok) AS meta
         |FROM src CROSS JOIN UNNEST(SPLIT(w, ' ')) AS u (tok);
         |""".stripMargin)
    new SqlSubmitAction(script.toString, Map.empty,
      Some(spark), durationSec = 12L).run()
    val got = spark.read.parquet(s"$out/sink")
    assert(got.count() > 0)
    val toks = got.select("tok").distinct().collect().map(_.getString(0)).toSet
    assert(toks == Set("a", "b"))
    assert(got.filter("meta = '{\"tok\":\"a\"}'").count() > 0)
  }

  test("e2e: a computed column using TO_TIMESTAMP_LTZ drives a watermark") {
    val spark = SparkFixture.spark
    val script = s"""
      |SET execution.runtime-mode = batch;
      |CREATE TABLE ltz_src (ems BIGINT, ts AS TO_TIMESTAMP_LTZ(ems, 3),
      |  WATERMARK FOR ts AS ts - INTERVAL '5' SECOND)
      |WITH ('connector'='datagen', 'number-of-rows'='4',
      |  'fields.ems.kind'='sequence', 'fields.ems.start'='1704153600000',
      |  'fields.ems.end'='1704153600003');
      |SELECT CAST(ts AS STRING) AS t FROM ltz_src;
      |""".stripMargin
    val f = java.nio.file.Files.createTempFile("ltz", ".sql")
    java.nio.file.Files.writeString(f, script)
    new SqlSubmitAction(f.toString, Map.empty,
      existingSession = Some(spark)).run()
    // the computed column resolves through the scalar rewrite: the
    // timestamp round-trips the epoch millis
    val ok = spark.sql(
      "SELECT COUNT(*) FROM ltz_src WHERE unix_millis(ts) = ems").head.getLong(0)
    assert(ok == 4L)
  }
}
