package graft.operators

import org.apache.spark.sql.functions._

import graft.harness.DialectFunctions

/** Flink-dialect function surface executed through the harness
  * rewrites ([[graft.harness.DialectFunctions]]): `UNNEST` collection
  * joins and the SQL:2016 JSON call forms, each oracle-checked against
  * DuckDB's native spelling of the same computation. Reference router:
  * `SQLSubmitAction.java:76` (pass-through SELECT).
  */
object Dialect {

  /** Flink `CROSS JOIN UNNEST(...) WITH ORDINALITY` over tokenized
    * documents: per-token corpus stats including the earliest in-doc
    * position, through the LATERAL-subquery posexplode rewrite. The
    * rewrite keeps the fan-out row-local (a generator over each row's
    * own array — no shuffle until the aggregation), so the plan scales
    * with input rows, not corpus vocabulary.
    */
  val q95Unnest: Q = Q(
    "q95_unnest",
    """WITH t AS (
      |  SELECT doc_id, string_split(text, ' ') AS toks
      |  FROM documents WHERE doc_id < 2000)
      |SELECT t.toks[u.i] AS tok, COUNT(*) AS n,
      |  CAST(MIN(u.i) AS BIGINT) AS min_ord,
      |  COUNT(DISTINCT doc_id) AS n_docs
      |FROM t, UNNEST(generate_series(1, len(t.toks))) AS u(i)
      |GROUP BY t.toks[u.i]""".stripMargin) { (s, dir) =>
    Tables.load(s, dir, "documents").createOrReplaceTempView("dlq_documents")
    val flinkSql =
      """SELECT tok, COUNT(*) AS n, CAST(MIN(ord) AS BIGINT) AS min_ord,
        |  COUNT(DISTINCT doc_id) AS n_docs
        |FROM (SELECT doc_id, split(text, ' ') AS toks
        |      FROM dlq_documents WHERE doc_id < 2000) t
        |CROSS JOIN UNNEST(toks) WITH ORDINALITY AS u (tok, ord)
        |GROUP BY tok""".stripMargin
    s.sql(DialectFunctions.rewrite(flinkSql))
  }

  /** SQL:2016 JSON calls (`JSON_VALUE ... RETURNING`, `JSON_EXISTS`)
    * through the get_json_object rewrite: per-event-type JSON field
    * accounting, with a present path and an absent one.
    */
  val q96JsonValue: Q = Q(
    "q96_json_value",
    """SELECT event_type,
      |  CAST(SUM(CASE WHEN json_extract_string(props, '$.k') IS NOT NULL
      |      THEN 1 ELSE 0 END) AS BIGINT) AS n_has_k,
      |  CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
      |  CAST(SUM(CASE WHEN json_extract_string(props, '$.missing') IS NOT NULL
      |      THEN 1 ELSE 0 END) AS BIGINT) AS n_missing
      |FROM events GROUP BY event_type""".stripMargin) { (s, dir) =>
    Tables.load(s, dir, "events").createOrReplaceTempView("dlq_events")
    graft.functions.GraftFunctions.register(s)
    val flinkSql =
      """SELECT event_type,
        |  SUM(CASE WHEN JSON_EXISTS(props, '$.k') THEN 1 ELSE 0 END) AS n_has_k,
        |  SUM(JSON_VALUE(props, '$.k' RETURNING BIGINT)) AS sum_k,
        |  SUM(CASE WHEN JSON_EXISTS(props, '$.missing') THEN 1 ELSE 0 END) AS n_missing
        |FROM dlq_events GROUP BY event_type""".stripMargin
    s.sql(DialectFunctions.rewrite(flinkSql))
  }

  /** Flink's window-offset argument: whole-day TUMBLE windows shifted
    * by -8 h (the align-days-to-a-non-UTC-timezone use), through the
    * TVF rewrite's offset-space floor. Oracle mirrors the same grid
    * arithmetic in epoch milliseconds.
    */
  val q97TumbleOffset: Q = Q(
    "q97_tumble_offset",
    """WITH w AS (
      |  SELECT event_type,
      |    ((epoch_ms(ts) - 57600000) -
      |     (((epoch_ms(ts) - 57600000) % 86400000) + 86400000) % 86400000)
      |      + 57600000 AS ws
      |  FROM events WHERE ts IS NOT NULL)
      |SELECT ws // 1000 AS window_start_sec, event_type, COUNT(*) AS n
      |FROM w GROUP BY ws, event_type""".stripMargin) { (s, dir) =>
    Tables.load(s, dir, "events").createOrReplaceTempView("dlq_events_off")
    val flinkSql =
      """SELECT window_start, event_type, COUNT(*) AS n
        |FROM TABLE(TUMBLE(TABLE dlq_events_off, DESCRIPTOR(ts),
        |  INTERVAL '1' DAY, INTERVAL '-8' HOUR))
        |GROUP BY window_start, event_type""".stripMargin
    s.sql(graft.harness.WindowTvf.rewrite(flinkSql))
      .select(unix_timestamp(col("window_start")).as("window_start_sec"),
        col("event_type"), col("n"))
  }

  /** Flink scalar-function tier Spark lacks, through the scalar
    * rewrites: `SPLIT_INDEX` (0-based, NULL out of range), the `IS_*`
    * total predicates, and the SQL:2016 `JSON_OBJECT` constructor
    * (literal keys → `to_json(named_struct(...))`, byte-identical
    * minified output in both engines).
    */
  val q100DialectFns: Q = Q(
    "q100_dialect_fns",
    """SELECT doc_id,
      |  string_split(text, ' ')[3] AS tok2,
      |  CASE WHEN COALESCE(regexp_matches(string_split(text, ' ')[1], '^[0-9]+$'), FALSE)
      |       THEN 1 ELSE 0 END AS first_is_digit,
      |  CAST(json_object('lang', lang, 'n', n_chars) AS VARCHAR) AS meta
      |FROM documents WHERE doc_id < 1000""".stripMargin) { (s, dir) =>
    Tables.load(s, dir, "documents").createOrReplaceTempView("dlq_docs_fns")
    val flinkSql =
      """SELECT doc_id,
        |  SPLIT_INDEX(text, ' ', 2) AS tok2,
        |  CASE WHEN IS_DIGIT(SPLIT_INDEX(text, ' ', 0)) THEN 1 ELSE 0 END
        |    AS first_is_digit,
        |  JSON_OBJECT('lang' VALUE lang, 'n' VALUE n_chars) AS meta
        |FROM dlq_docs_fns WHERE doc_id < 1000""".stripMargin
    s.sql(DialectFunctions.rewrite(flinkSql))
  }

  /** HOP with the offset argument: 30-minute slides over 1-hour
    * windows on a :10/:40 grid. The oracle mirrors the rewrite's
    * covering-window enumeration — every window start in the shifted
    * slide grid whose window contains the row.
    */
  val q101HopOffset: Q = Q(
    "q101_hop_offset",
    """WITH e AS (
      |  SELECT event_type, epoch_ms(ts) AS t FROM events WHERE ts IS NOT NULL),
      |w AS (
      |  SELECT event_type, ws
      |  FROM e, UNNEST(generate_series(
      |    ((t - 600000) - 3600000) -
      |      ((((t - 600000) - 3600000) % 1800000) + 1800000) % 1800000
      |      + 1800000 + 600000,
      |    (t - 600000) - (((t - 600000) % 1800000) + 1800000) % 1800000
      |      + 600000,
      |    1800000)) AS u(ws))
      |SELECT ws // 1000 AS window_start_sec, event_type, COUNT(*) AS n
      |FROM w GROUP BY ws, event_type""".stripMargin) { (s, dir) =>
    Tables.load(s, dir, "events").createOrReplaceTempView("dlq_events_hop")
    val flinkSql =
      """SELECT window_start, event_type, COUNT(*) AS n
        |FROM TABLE(HOP(TABLE dlq_events_hop, DESCRIPTOR(ts),
        |  INTERVAL '30' MINUTE, INTERVAL '1' HOUR, INTERVAL '10' MINUTE))
        |GROUP BY window_start, event_type""".stripMargin
    s.sql(graft.harness.WindowTvf.rewrite(flinkSql))
      .select(unix_timestamp(col("window_start")).as("window_start_sec"),
        col("event_type"), col("n"))
  }

  /** JSON_VALUE behavior-clause subset: spelled-out Flink defaults
    * (NULL ON EMPTY / NULL ON ERROR) are no-ops; `DEFAULT ... ON
    * EMPTY` applies only to the EMPTY case (path missing in valid
    * JSON) — since round 12 the rewrite is a `graft_json_valid` CASE
    * that routes malformed JSON and uncastable values to the ON ERROR
    * clause instead (q108 covers `DEFAULT ... ON ERROR`; see
    * `DialectFunctions.jsonValue` and COVERAGE.md). With RETURNING,
    * the TRY_CAST applies before the default, so the default's type
    * is the declared one and cast failures fall to ON ERROR.
    */
  val q104JsonDefault: Q = Q(
    "q104_json_default",
    """SELECT event_type,
      |  CAST(SUM(COALESCE(CAST(json_extract_string(props, '$.k') AS BIGINT), -1)) AS BIGINT) AS sum_k_def,
      |  CAST(SUM(CASE WHEN COALESCE(json_extract_string(props, '$.missing'), 'absent') = 'absent'
      |      THEN 1 ELSE 0 END) AS BIGINT) AS n_defaulted
      |FROM events GROUP BY event_type""".stripMargin) { (s, dir) =>
    Tables.load(s, dir, "events").createOrReplaceTempView("dlq_events_def")
    val flinkSql =
      """SELECT event_type,
        |  SUM(JSON_VALUE(props, '$.k' RETURNING BIGINT DEFAULT -1 ON EMPTY NULL ON ERROR)) AS sum_k_def,
        |  SUM(CASE WHEN JSON_VALUE(props, '$.missing' DEFAULT 'absent' ON EMPTY) = 'absent'
        |      THEN 1 ELSE 0 END) AS n_defaulted
        |FROM dlq_events_def GROUP BY event_type""".stripMargin
    graft.functions.GraftFunctions.register(s)
    s.sql(DialectFunctions.rewrite(flinkSql))
  }

  /** LEFT JOIN UNNEST WITH ORDINALITY: empty/NULL collections keep
    * their left row with NULL element and ordinality (Flink's
    * left-unnest), via a correlated LEFT OUTER JOIN LATERAL over
    * posexplode. Row-local generation — no shuffle beyond the scan.
    */
  val q105LeftUnnestOrd: Q = Q(
    "q105_left_unnest_ord",
    """WITH t AS (
      |  SELECT doc_id,
      |    CASE WHEN doc_id % 10 = 0 THEN NULL
      |         ELSE string_split(text, ' ') END AS toks
      |  FROM documents WHERE doc_id < 300),
      |x AS (
      |  SELECT doc_id, CAST(i AS BIGINT) AS ord, toks[i] AS tok
      |  FROM t, UNNEST(generate_series(1, len(toks))) AS u(i)
      |  UNION ALL
      |  SELECT doc_id, NULL, NULL FROM t WHERE toks IS NULL)
      |SELECT doc_id, ord, tok FROM x""".stripMargin) { (s, dir) =>
    Tables.load(s, dir, "documents").createOrReplaceTempView("dlq_docs_lo")
    val flinkSql =
      """SELECT doc_id, CAST(ord AS BIGINT) AS ord, tok
        |FROM (SELECT doc_id,
        |        CASE WHEN doc_id % 10 = 0 THEN CAST(NULL AS ARRAY<STRING>)
        |             ELSE split(text, ' ') END AS toks
        |      FROM dlq_docs_lo WHERE doc_id < 300) t
        |LEFT JOIN UNNEST(toks) WITH ORDINALITY AS u (tok, ord) ON TRUE""".stripMargin
    s.sql(DialectFunctions.rewrite(flinkSql))
      .select(col("doc_id"), col("ord"), col("tok"))
  }

  /** CUMULATE with the window-offset argument: 1-hour growing steps
    * over a 4-hour span whose grid is shifted by +10 minutes. The
    * oracle mirrors the rewrite's offset-space floor: spans start at
    * offset + k·size, step ends count from the offset-relative
    * position.
    */
  val q106CumulateOffset: Q = Q(
    "q106_cumulate_offset",
    """WITH e AS (
      |  SELECT CAST(FLOOR(EPOCH(date_trunc('second', ts))) AS BIGINT) AS tsec
      |  FROM events),
      |x AS (
      |  SELECT ((tsec - 600) // 14400) * 14400 + 600 AS span,
      |    UNNEST(generate_series(
      |      (((tsec - 600) % 14400) // 3600 + 1) * 3600, 14400, 3600)) AS eo
      |  FROM e)
      |SELECT CAST(span AS BIGINT) AS window_start_sec,
      |  CAST(span + eo AS BIGINT) AS window_end_sec, COUNT(*) AS n_events
      |FROM x GROUP BY 1, 2""".stripMargin) { (s, dir) =>
    Tables.load(s, dir, "events").createOrReplaceTempView("dlq_events_co")
    val flinkSql =
      """SELECT window_start, window_end, COUNT(*) AS n_events
        |FROM TABLE(CUMULATE(TABLE dlq_events_co, DESCRIPTOR(ts),
        |  INTERVAL '1' HOUR, INTERVAL '4' HOURS, INTERVAL '10' MINUTE))
        |GROUP BY window_start, window_end""".stripMargin
    s.sql(graft.harness.WindowTvf.rewrite(flinkSql))
      .select(unix_timestamp(col("window_start")).as("window_start_sec"),
        unix_timestamp(col("window_end")).as("window_end_sec"),
        col("n_events"))
  }

  /** Window aggregation with GROUPING SETS (Flink 1.15+): the TVF
    * expansion leaves GROUP BY untouched, so Catalyst's native
    * grouping-sets machinery applies directly — per-window per-type
    * counts plus per-window rollup rows in one aggregation pass.
    */
  val q107WindowGroupingSets: Q = Q(
    "q107_window_grouping_sets",
    """WITH w AS (
      |  SELECT event_type,
      |    ((CAST(FLOOR(EPOCH(date_trunc('second', ts))) AS BIGINT)) // 3600) * 3600 AS ws
      |  FROM events WHERE ts IS NOT NULL)
      |SELECT CAST(ws AS BIGINT) AS window_start_sec,
      |  CASE WHEN GROUPING(event_type) = 1 THEN '<all>'
      |       ELSE event_type END AS etype, COUNT(*) AS n
      |FROM w
      |GROUP BY GROUPING SETS ((ws, event_type), (ws))""".stripMargin) { (s, dir) =>
    Tables.load(s, dir, "events").createOrReplaceTempView("dlq_events_gs")
    // GROUPING(event_type), not COALESCE: a NULL-valued event_type group
    // must stay distinguishable from the rollup row (the classic
    // GROUPING SETS trap — events has no NULL event_type today, but the
    // template must not conflate them).
    val flinkSql =
      """SELECT window_start,
        |  CASE WHEN GROUPING(event_type) = 1 THEN '<all>'
        |       ELSE event_type END AS etype,
        |  COUNT(*) AS n
        |FROM TABLE(TUMBLE(TABLE dlq_events_gs, DESCRIPTOR(ts), INTERVAL '1' HOUR))
        |GROUP BY GROUPING SETS ((window_start, event_type), (window_start))""".stripMargin
    s.sql(graft.harness.WindowTvf.rewrite(flinkSql))
      .select(unix_timestamp(col("window_start")).as("window_start_sec"),
        col("etype"), col("n"))
  }

  /** JSON_VALUE DEFAULT ... ON ERROR: the ERROR outcomes — malformed
    * JSON and (under RETURNING) a present-but-uncastable value — are
    * discriminated from a merely missing path (EMPTY) via the native
    * graft_json_valid parse + TRY_CAST, closing the last JSON_VALUE
    * behavior-clause gap. The five input shapes are synthesized per
    * doc_id so every branch is exercised: castable value, missing
    * path, uncastable value, malformed JSON, NULL input.
    */
  val q108JsonOnError: Q = Q(
    "q108_json_on_error",
    """WITH j AS (
      |  SELECT doc_id,
      |    CASE WHEN doc_id % 5 = 0 THEN '{"a": ' || CAST(doc_id AS VARCHAR) || '}'
      |         WHEN doc_id % 5 = 1 THEN '{"b": 1}'
      |         WHEN doc_id % 5 = 2 THEN '{"a": "x"}'
      |         WHEN doc_id % 5 = 3 THEN '{oops'
      |         ELSE NULL END AS js
      |  FROM documents)
      |SELECT doc_id,
      |  CASE WHEN js IS NULL THEN NULL
      |       WHEN NOT json_valid(js) THEN -99
      |       WHEN json_extract_string(js, '$.a') IS NULL THEN -1
      |       WHEN TRY_CAST(json_extract_string(js, '$.a') AS BIGINT) IS NULL THEN -99
      |       ELSE TRY_CAST(json_extract_string(js, '$.a') AS BIGINT) END AS v_num,
      |  CASE WHEN js IS NULL THEN NULL
      |       WHEN NOT json_valid(js) THEN 'err'
      |       ELSE json_extract_string(js, '$.a') END AS v_str
      |FROM j""".stripMargin) { (s, dir) =>
    Tables.load(s, dir, "documents").createOrReplaceTempView("dlq_docs_joe")
    val flinkSql =
      """SELECT doc_id,
        |  JSON_VALUE(js, '$.a' RETURNING BIGINT DEFAULT -1 ON EMPTY DEFAULT -99 ON ERROR) AS v_num,
        |  JSON_VALUE(js, '$.a' DEFAULT 'err' ON ERROR) AS v_str
        |FROM (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 5 = 0 THEN '{"a": ' || CAST(doc_id AS STRING) || '}'
        |         WHEN doc_id % 5 = 1 THEN '{"b": 1}'
        |         WHEN doc_id % 5 = 2 THEN '{"a": "x"}'
        |         WHEN doc_id % 5 = 3 THEN '{oops'
        |         ELSE NULL END AS js
        |  FROM dlq_docs_joe)""".stripMargin
    graft.functions.GraftFunctions.register(s)
    s.sql(DialectFunctions.rewrite(flinkSql))
  }

  /** JSON_QUERY wrapper + behavior clauses (SQL:2016, r14): the
    * variant-based rewrite preserves JSON text quoting (a string
    * result stays `"x"`), so WITHOUT/CONDITIONAL/UNCONDITIONAL
    * wrapping and the EMPTY ARRAY / EMPTY OBJECT substitutes are
    * byte-faithful against DuckDB's json_extract. The seven input
    * shapes — object, array, string scalar, number scalar, JSON null
    * member, missing path, malformed JSON — are synthesized per
    * doc_id so every CASE branch of every clause is oracle-exercised
    * (DuckDB discriminates the JSON-null member from a missing path
    * via json_keys; json_extract conflates them).
    */
  val q109JsonQuery: Q = Q(
    "q109_json_query",
    """WITH j AS (
      |  SELECT doc_id,
      |    CASE CAST(doc_id % 7 AS INT)
      |      WHEN 0 THEN '{"a": {"b": 1}}'
      |      WHEN 1 THEN '{"a": [1, 2]}'
      |      WHEN 2 THEN '{"a": "x"}'
      |      WHEN 3 THEN '{"a": 7}'
      |      WHEN 4 THEN '{"a": null}'
      |      WHEN 5 THEN '{"z": 1}'
      |      ELSE 'not json' END AS js
      |  FROM documents),
      |d AS (
      |  SELECT doc_id, js,
      |    json_valid(js) AS ok,
      |    json_extract(TRY_CAST(js AS JSON), '$.a') AS jv,
      |    COALESCE(list_contains(json_keys(TRY_CAST(js AS JSON)), 'a'),
      |      FALSE) AS haskey
      |  FROM j)
      |SELECT doc_id,
      |  CASE WHEN NOT ok THEN NULL
      |       WHEN NOT haskey THEN NULL
      |       WHEN jv IS NULL THEN NULL
      |       WHEN json_type(jv) IN ('OBJECT', 'ARRAY')
      |         THEN CAST(jv AS VARCHAR)
      |       ELSE NULL END AS q_plain,
      |  CASE WHEN NOT ok THEN NULL
      |       WHEN NOT haskey THEN NULL
      |       WHEN jv IS NULL THEN '[null]'
      |       WHEN json_type(jv) = 'ARRAY' THEN CAST(jv AS VARCHAR)
      |       ELSE '[' || CAST(jv AS VARCHAR) || ']' END AS q_cond,
      |  CASE WHEN NOT ok THEN NULL
      |       WHEN NOT haskey THEN NULL
      |       WHEN jv IS NULL THEN '[null]'
      |       ELSE '[' || CAST(jv AS VARCHAR) || ']' END AS q_uncond,
      |  CASE WHEN NOT ok THEN NULL
      |       WHEN NOT haskey THEN '[]'
      |       WHEN jv IS NULL THEN NULL
      |       WHEN json_type(jv) IN ('OBJECT', 'ARRAY')
      |         THEN CAST(jv AS VARCHAR)
      |       ELSE NULL END AS q_empty,
      |  CASE WHEN NOT ok THEN '{}'
      |       WHEN NOT haskey THEN NULL
      |       WHEN jv IS NULL THEN '{}'
      |       WHEN json_type(jv) IN ('OBJECT', 'ARRAY')
      |         THEN CAST(jv AS VARCHAR)
      |       ELSE '{}' END AS q_err
      |FROM d""".stripMargin) { (s, dir) =>
    Tables.load(s, dir, "documents").createOrReplaceTempView("dlq_docs_jq")
    val flinkSql =
      """SELECT doc_id,
        |  JSON_QUERY(js, '$.a') AS q_plain,
        |  JSON_QUERY(js, '$.a' WITH CONDITIONAL ARRAY WRAPPER) AS q_cond,
        |  JSON_QUERY(js, '$.a' WITH UNCONDITIONAL ARRAY WRAPPER) AS q_uncond,
        |  JSON_QUERY(js, '$.a' EMPTY ARRAY ON EMPTY) AS q_empty,
        |  JSON_QUERY(js, '$.a' WITHOUT ARRAY WRAPPER EMPTY OBJECT ON ERROR) AS q_err
        |FROM (
        |  SELECT doc_id,
        |    CASE CAST(doc_id % 7 AS INT)
        |      WHEN 0 THEN '{"a": {"b": 1}}'
        |      WHEN 1 THEN '{"a": [1, 2]}'
        |      WHEN 2 THEN '{"a": "x"}'
        |      WHEN 3 THEN '{"a": 7}'
        |      WHEN 4 THEN '{"a": null}'
        |      WHEN 5 THEN '{"z": 1}'
        |      ELSE 'not json' END AS js
        |  FROM dlq_docs_jq)""".stripMargin
    graft.functions.GraftFunctions.register(s)
    s.sql(DialectFunctions.rewrite(flinkSql))
  }

  /** JSON_EXISTS semantics + ON ERROR clause (r14): the variant-based
    * existence test reads a JSON `null` member as PRESENT (TRUE —
    * Flink parity; the old get_json_object form conflated it with a
    * missing path), NULL input as NULL, and routes malformed JSON to
    * the TRUE/FALSE/UNKNOWN ON ERROR outcome. DuckDB discriminates
    * presence via json_keys.
    */
  val q110JsonExists: Q = Q(
    "q110_json_exists",
    """WITH j AS (
      |  SELECT doc_id,
      |    CASE CAST(doc_id % 5 AS INT)
      |      WHEN 0 THEN '{"a": {"b": 1}}'
      |      WHEN 1 THEN '{"a": null}'
      |      WHEN 2 THEN '{"z": 1}'
      |      WHEN 3 THEN 'not json'
      |      ELSE NULL END AS js
      |  FROM documents),
      |d AS (
      |  SELECT doc_id, js, json_valid(js) AS ok,
      |    COALESCE(list_contains(json_keys(TRY_CAST(js AS JSON)), 'a'),
      |      FALSE) AS haskey
      |  FROM j)
      |SELECT doc_id,
      |  CASE WHEN js IS NULL THEN NULL
      |       WHEN NOT ok THEN FALSE ELSE haskey END AS e_plain,
      |  CASE WHEN js IS NULL THEN NULL
      |       WHEN NOT ok THEN TRUE ELSE haskey END AS e_true,
      |  CASE WHEN js IS NULL THEN NULL
      |       WHEN NOT ok THEN NULL ELSE haskey END AS e_unknown
      |FROM d""".stripMargin) { (s, dir) =>
    Tables.load(s, dir, "documents").createOrReplaceTempView("dlq_docs_je")
    graft.functions.GraftFunctions.register(s)
    val flinkSql =
      """SELECT doc_id,
        |  JSON_EXISTS(js, '$.a') AS e_plain,
        |  JSON_EXISTS(js, '$.a' TRUE ON ERROR) AS e_true,
        |  JSON_EXISTS(js, '$.a' UNKNOWN ON ERROR) AS e_unknown
        |FROM (
        |  SELECT doc_id,
        |    CASE CAST(doc_id % 5 AS INT)
        |      WHEN 0 THEN '{"a": {"b": 1}}'
        |      WHEN 1 THEN '{"a": null}'
        |      WHEN 2 THEN '{"z": 1}'
        |      WHEN 3 THEN 'not json'
        |      ELSE NULL END AS js
        |  FROM dlq_docs_je)""".stripMargin
    s.sql(DialectFunctions.rewrite(flinkSql))
  }

  /** JSON_QUERY/JSON_EXISTS behavior clauses on a trailing-`[*]`
    * wildcard (r15): `$.a[*]` iterates the base value under SQL:2016
    * lax semantics — array elements are the items (0 → ON EMPTY, 1 →
    * the wrapper rules on it, >1 → WITHOUT is an error and wrapping
    * re-yields the array), a non-array base (JSON null included) wraps
    * to a singleton item. Previously any wildcard path rejected every
    * clause by name. Eight input shapes exercise every branch; DuckDB
    * discriminates the JSON-null member from a missing path via
    * json_keys, exactly the q109 technique.
    */
  val q111JsonWildcard: Q = Q(
    "q111_json_wildcard",
    """WITH j AS (
      |  SELECT doc_id,
      |    CASE CAST(doc_id % 8 AS INT)
      |      WHEN 0 THEN '{"a": [1, 2]}'
      |      WHEN 1 THEN '{"a": [7]}'
      |      WHEN 2 THEN '{"a": [{"b": 1}]}'
      |      WHEN 3 THEN '{"a": []}'
      |      WHEN 4 THEN '{"a": 5}'
      |      WHEN 5 THEN '{"a": null}'
      |      WHEN 6 THEN '{"z": 1}'
      |      ELSE 'not json' END AS js
      |  FROM documents),
      |d AS (
      |  SELECT doc_id, js, json_valid(js) AS ok,
      |    json_extract(TRY_CAST(js AS JSON), '$.a') AS jv,
      |    COALESCE(list_contains(json_keys(TRY_CAST(js AS JSON)), 'a'),
      |      FALSE) AS haskey
      |  FROM j)
      |SELECT doc_id,
      |  CASE WHEN NOT ok THEN NULL
      |       WHEN NOT haskey THEN NULL
      |       WHEN jv IS NULL THEN NULL
      |       WHEN json_type(jv) = 'ARRAY' THEN
      |         CASE WHEN json_array_length(jv) = 1
      |                AND json_type(jv, '$[0]') IN ('OBJECT', 'ARRAY')
      |              THEN CAST(json_extract(jv, '$[0]') AS VARCHAR)
      |              ELSE NULL END
      |       WHEN json_type(jv) = 'OBJECT' THEN CAST(jv AS VARCHAR)
      |       ELSE NULL END AS w_plain,
      |  CASE WHEN NOT ok THEN NULL
      |       WHEN NOT haskey THEN '[]'
      |       WHEN jv IS NULL THEN '[null]'
      |       WHEN json_type(jv) = 'ARRAY' THEN
      |         CASE WHEN json_array_length(jv) = 0 THEN '[]'
      |              WHEN json_array_length(jv) = 1
      |              THEN '[' || CAST(json_extract(jv, '$[0]') AS VARCHAR)
      |                || ']'
      |              ELSE CAST(jv AS VARCHAR) END
      |       ELSE '[' || CAST(jv AS VARCHAR) || ']' END AS w_wrap,
      |  CASE WHEN NOT ok THEN NULL
      |       WHEN NOT haskey THEN NULL
      |       WHEN jv IS NULL THEN '[null]'
      |       WHEN json_type(jv) = 'ARRAY' THEN
      |         CASE WHEN json_array_length(jv) = 0 THEN NULL
      |              WHEN json_array_length(jv) = 1 THEN
      |                CASE WHEN json_type(jv, '$[0]') IN ('OBJECT', 'ARRAY')
      |                     THEN CAST(json_extract(jv, '$[0]') AS VARCHAR)
      |                     ELSE '['
      |                       || CAST(json_extract(jv, '$[0]') AS VARCHAR)
      |                       || ']' END
      |              ELSE CAST(jv AS VARCHAR) END
      |       WHEN json_type(jv) = 'OBJECT' THEN CAST(jv AS VARCHAR)
      |       ELSE '[' || CAST(jv AS VARCHAR) || ']' END AS w_cond,
      |  CASE WHEN js IS NULL THEN NULL
      |       WHEN NOT ok THEN FALSE
      |       WHEN NOT haskey THEN FALSE
      |       WHEN jv IS NULL THEN TRUE
      |       WHEN json_type(jv) = 'ARRAY' THEN json_array_length(jv) > 0
      |       ELSE TRUE END AS w_exists,
      |  CASE WHEN js IS NULL THEN NULL
      |       WHEN NOT ok THEN TRUE
      |       WHEN NOT haskey THEN FALSE
      |       WHEN jv IS NULL THEN TRUE
      |       WHEN json_type(jv) = 'ARRAY' THEN json_array_length(jv) > 0
      |       ELSE TRUE END AS w_etrue
      |FROM d""".stripMargin) { (s, dir) =>
    Tables.load(s, dir, "documents").createOrReplaceTempView("dlq_docs_jw")
    graft.functions.GraftFunctions.register(s)
    val flinkSql =
      """SELECT doc_id,
        |  JSON_QUERY(js, '$.a[*]') AS w_plain,
        |  JSON_QUERY(js, '$.a[*]' WITH WRAPPER EMPTY ARRAY ON EMPTY) AS w_wrap,
        |  JSON_QUERY(js, '$.a[*]' WITH CONDITIONAL ARRAY WRAPPER) AS w_cond,
        |  JSON_EXISTS(js, '$.a[*]') AS w_exists,
        |  JSON_EXISTS(js, '$.a[*]' TRUE ON ERROR) AS w_etrue
        |FROM (
        |  SELECT doc_id,
        |    CASE CAST(doc_id % 8 AS INT)
        |      WHEN 0 THEN '{"a": [1, 2]}'
        |      WHEN 1 THEN '{"a": [7]}'
        |      WHEN 2 THEN '{"a": [{"b": 1}]}'
        |      WHEN 3 THEN '{"a": []}'
        |      WHEN 4 THEN '{"a": 5}'
        |      WHEN 5 THEN '{"a": null}'
        |      WHEN 6 THEN '{"z": 1}'
        |      ELSE 'not json' END AS js
        |  FROM dlq_docs_jw)""".stripMargin
    s.sql(DialectFunctions.rewrite(flinkSql))
  }

  /** TUMBLE under a DST region `table.local-time-zone` (r15): the grid
    * floors on America/New_York wall-clock, so the 2024-03-10
    * spring-forward day is a 23-hour window whose instant bounds jump
    * from EST midnight (UTC-5) to EDT midnight (UTC-4). The January
    * events shift +60 days into March so the range crosses the
    * transition; DuckDB twins the wall-clock arithmetic with AT TIME
    * ZONE conversions (daily bounds land at midnight, never inside the
    * 02:00 gap, so java.time's and ICU's gap resolution cannot
    * diverge). This is the batch twin of the streaming zone grids in
    * `ZoneAlignSpec` — zones are session config in the CLI, so the
    * oracle pins the shared grid arithmetic end-to-end.
    */
  val q112ZoneGrid: Q = Q(
    "q112_zone_grid",
    """WITH e AS (
      |  SELECT ts + INTERVAL 60 DAY AS ts2 FROM events
      |  WHERE ts IS NOT NULL),
      |w AS (
      |  SELECT date_trunc('day',
      |    (ts2 AT TIME ZONE 'UTC') AT TIME ZONE 'America/New_York') AS wsl
      |  FROM e)
      |SELECT
      |  CAST(FLOOR(EPOCH(wsl AT TIME ZONE 'America/New_York')) AS BIGINT)
      |    AS window_start_sec,
      |  CAST(FLOOR(EPOCH(
      |    (wsl + INTERVAL 1 DAY) AT TIME ZONE 'America/New_York')) AS BIGINT)
      |    AS window_end_sec,
      |  COUNT(*) AS n_events
      |FROM w GROUP BY 1, 2""".stripMargin) { (s, dir) =>
    Tables.load(s, dir, "events").createOrReplaceTempView("dlq_events_zg0")
    s.sql("""CREATE OR REPLACE TEMPORARY VIEW dlq_events_zg AS
      |SELECT ts + INTERVAL '60' DAY AS ts FROM dlq_events_zg0""".stripMargin)
    val flinkSql =
      """SELECT window_start, window_end, COUNT(*) AS n_events
        |FROM TABLE(TUMBLE(TABLE dlq_events_zg, DESCRIPTOR(ts),
        |  INTERVAL '1' DAY))
        |GROUP BY window_start, window_end""".stripMargin
    s.sql(graft.harness.WindowTvf.rewrite(flinkSql, Some("America/New_York")))
      .select(unix_timestamp(col("window_start")).as("window_start_sec"),
        unix_timestamp(col("window_end")).as("window_end_sec"),
        col("n_events"))
  }

  /** JSON_QUERY/JSON_EXISTS clauses on `[*]` followed by a field step
    * (r15): `$.a[*].c` maps the base's items through the member under
    * SQL:2016 lax semantics — items lacking the member are SKIPPED,
    * JSON-null members stay present, a non-array base wraps to a
    * singleton first — then the item count drives the same
    * EMPTY/wrapper/error rules as the trailing `[*]` (q111). DuckDB
    * twins the iteration with a list comprehension over the base cast
    * to JSON[] (NULL for a non-array → singleton fallback), membership
    * via json_keys, and JSON-null items rendered explicitly (DuckDB's
    * json_extract returns SQL NULL for them and string aggregation
    * would silently drop the element).
    */
  val q114JsonStarField: Q = Q(
    "q114_json_star_field",
    """WITH j AS (
      |  SELECT doc_id,
      |    CASE CAST(doc_id % 9 AS INT)
      |      WHEN 0 THEN '{"a":[{"c":1},{"c":2}]}'
      |      WHEN 1 THEN '{"a":[{"c":1},{"z":9}]}'
      |      WHEN 2 THEN '{"a":[{"c":null},{"z":9}]}'
      |      WHEN 3 THEN '{"a":[{"z":9}]}'
      |      WHEN 4 THEN '{"a":{"c":5}}'
      |      WHEN 5 THEN '{"a":{"z":9}}'
      |      WHEN 6 THEN '{"a":[{"c":{"d":1}}]}'
      |      WHEN 7 THEN '{"z":1}'
      |      ELSE 'not json' END AS js
      |  FROM documents),
      |d AS (
      |  SELECT doc_id, js, json_valid(js) AS ok,
      |    COALESCE(list_contains(json_keys(TRY_CAST(js AS JSON)), 'a'),
      |      FALSE) AS haskey,
      |    [json_extract(x, '$.c')
      |     for x in COALESCE(
      |       TRY_CAST(json_extract(TRY_CAST(js AS JSON), '$.a') AS JSON[]),
      |       [json_extract(TRY_CAST(js AS JSON), '$.a')])
      |     if COALESCE(list_contains(json_keys(x), 'c'), FALSE)] AS items
      |  FROM j),
      |e AS (
      |  SELECT doc_id, js, ok, haskey, items, len(items) AS n,
      |    array_to_string(
      |      [COALESCE(CAST(i AS VARCHAR), 'null') for i in items],
      |      ',') AS joined,
      |    CASE WHEN len(items) = 1 THEN
      |      COALESCE(json_type(items[1]) IN ('OBJECT', 'ARRAY'), FALSE)
      |    ELSE FALSE END AS one_container,
      |    CASE WHEN len(items) = 1 THEN
      |      COALESCE(CAST(items[1] AS VARCHAR), 'null')
      |    ELSE NULL END AS one_text
      |  FROM d)
      |SELECT doc_id,
      |  CASE WHEN NOT ok THEN NULL
      |       WHEN NOT haskey THEN NULL
      |       WHEN one_container THEN one_text
      |       ELSE NULL END AS w_plain,
      |  CASE WHEN NOT ok THEN NULL
      |       WHEN NOT haskey THEN '[]'
      |       WHEN n = 0 THEN '[]'
      |       ELSE '[' || joined || ']' END AS w_wrap,
      |  CASE WHEN NOT ok THEN NULL
      |       WHEN NOT haskey THEN NULL
      |       WHEN n = 0 THEN NULL
      |       WHEN n = 1 AND one_container THEN one_text
      |       WHEN n = 1 THEN '[' || one_text || ']'
      |       ELSE '[' || joined || ']' END AS w_cond,
      |  CASE WHEN js IS NULL THEN NULL
      |       WHEN NOT ok THEN FALSE
      |       WHEN NOT haskey THEN FALSE
      |       ELSE n > 0 END AS w_exists,
      |  CASE WHEN js IS NULL THEN NULL
      |       WHEN NOT ok THEN TRUE
      |       WHEN NOT haskey THEN FALSE
      |       ELSE n > 0 END AS w_etrue
      |FROM e""".stripMargin) { (s, dir) =>
    Tables.load(s, dir, "documents").createOrReplaceTempView("dlq_docs_sf")
    graft.functions.GraftFunctions.register(s)
    val flinkSql =
      """SELECT doc_id,
        |  JSON_QUERY(js, '$.a[*].c') AS w_plain,
        |  JSON_QUERY(js, '$.a[*].c' WITH WRAPPER EMPTY ARRAY ON EMPTY)
        |    AS w_wrap,
        |  JSON_QUERY(js, '$.a[*].c' WITH CONDITIONAL ARRAY WRAPPER)
        |    AS w_cond,
        |  JSON_EXISTS(js, '$.a[*].c') AS w_exists,
        |  JSON_EXISTS(js, '$.a[*].c' TRUE ON ERROR) AS w_etrue
        |FROM (
        |  SELECT doc_id,
        |    CASE CAST(doc_id % 9 AS INT)
        |      WHEN 0 THEN '{"a":[{"c":1},{"c":2}]}'
        |      WHEN 1 THEN '{"a":[{"c":1},{"z":9}]}'
        |      WHEN 2 THEN '{"a":[{"c":null},{"z":9}]}'
        |      WHEN 3 THEN '{"a":[{"z":9}]}'
        |      WHEN 4 THEN '{"a":{"c":5}}'
        |      WHEN 5 THEN '{"a":{"z":9}}'
        |      WHEN 6 THEN '{"a":[{"c":{"d":1}}]}'
        |      WHEN 7 THEN '{"z":1}'
        |      ELSE 'not json' END AS js
        |  FROM dlq_docs_sf)""".stripMargin
    s.sql(DialectFunctions.rewrite(flinkSql))
  }

  /** JSON_QUERY/JSON_EXISTS clauses on recursive-descent (`$..b`) and
    * multi-wildcard (`$.a[*].c[*]`) paths (r16): the native
    * `graft_json_items` expression yields the item sequence (jayway
    * scan order — a node's own matching member collects before the
    * recursion, collected subtrees re-scan), and the item count
    * drives the same EMPTY/wrapper/error rules as the `[*]` class
    * (q111/q114). DuckDB twins the deep scan by extracting the
    * bounded shapes' match locations explicitly in jayway order and
    * list-filtering the misses, and the double wildcard by flattening
    * a nested list comprehension — independent spellings of the same
    * sequence law.
    */
  val q116JsonDeep: Q = Q(
    "q116_json_deep",
    """WITH j AS (
      |  SELECT doc_id,
      |    CASE CAST(doc_id % 8 AS INT)
      |      WHEN 0 THEN '{"x":{"b":1},"b":2}'
      |      WHEN 1 THEN '{"x":{"b":[5]}}'
      |      WHEN 2 THEN '{"x":{"b":9}}'
      |      WHEN 3 THEN '{"z":[{"b":3},{"b":4}]}'
      |      WHEN 4 THEN '{"b":{"b":7}}'
      |      WHEN 5 THEN '{"z":1}'
      |      WHEN 6 THEN 'not json'
      |      ELSE '{"a":[{"c":[1,2]},{"z":0},{"c":[3]}]}' END AS js
      |  FROM documents),
      |d AS (
      |  SELECT doc_id, js, json_valid(js) AS ok,
      |    [CAST(x AS VARCHAR)
      |     for x in [json_extract(TRY_CAST(js AS JSON), '$.b'),
      |               json_extract(TRY_CAST(js AS JSON), '$.b.b'),
      |               json_extract(TRY_CAST(js AS JSON), '$.x.b'),
      |               json_extract(TRY_CAST(js AS JSON), '$.z[0].b'),
      |               json_extract(TRY_CAST(js AS JSON), '$.z[1].b')]
      |     if x IS NOT NULL] AS di,
      |    flatten(
      |      [[CAST(y AS VARCHAR)
      |        for y in COALESCE(
      |          TRY_CAST(json_extract(x, '$.c') AS JSON[]), [])]
      |       for x in COALESCE(
      |         TRY_CAST(json_extract(TRY_CAST(js AS JSON), '$.a')
      |           AS JSON[]), [])]) AS mi
      |  FROM j),
      |e AS (
      |  SELECT doc_id, js, ok, di, mi, len(di) AS dn, len(mi) AS mn,
      |    CASE WHEN len(di) = 1 THEN
      |      COALESCE(json_type(TRY_CAST(di[1] AS JSON))
      |        IN ('OBJECT', 'ARRAY'), FALSE)
      |    ELSE FALSE END AS one_container
      |  FROM d)
      |SELECT doc_id,
      |  CASE WHEN NOT ok THEN NULL
      |       WHEN dn = 1 AND one_container THEN di[1]
      |       ELSE NULL END AS d_plain,
      |  CASE WHEN NOT ok THEN NULL
      |       WHEN dn = 0 THEN '[]'
      |       ELSE '[' || array_to_string(di, ',') || ']' END AS d_wrap,
      |  CASE WHEN NOT ok THEN NULL
      |       WHEN dn = 0 THEN NULL
      |       WHEN dn = 1 AND one_container THEN di[1]
      |       WHEN dn = 1 THEN '[' || di[1] || ']'
      |       ELSE '[' || array_to_string(di, ',') || ']' END AS d_cond,
      |  CASE WHEN NOT ok THEN FALSE ELSE dn > 0 END AS d_ex,
      |  CASE WHEN NOT ok THEN NULL
      |       WHEN mn = 0 THEN '[]'
      |       ELSE '[' || array_to_string(mi, ',') || ']' END AS m_wrap,
      |  CASE WHEN NOT ok THEN TRUE ELSE mn > 0 END AS m_ex
      |FROM e""".stripMargin) { (s, dir) =>
    Tables.load(s, dir, "documents").createOrReplaceTempView("djq_docs_sf")
    graft.functions.GraftFunctions.register(s)
    val flinkSql =
      """SELECT doc_id,
        |  JSON_QUERY(js, '$..b') AS d_plain,
        |  JSON_QUERY(js, '$..b' WITH WRAPPER EMPTY ARRAY ON EMPTY)
        |    AS d_wrap,
        |  JSON_QUERY(js, '$..b' WITH CONDITIONAL ARRAY WRAPPER) AS d_cond,
        |  JSON_EXISTS(js, '$..b') AS d_ex,
        |  JSON_QUERY(js, '$.a[*].c[*]' WITH WRAPPER EMPTY ARRAY ON EMPTY)
        |    AS m_wrap,
        |  JSON_EXISTS(js, '$.a[*].c[*]' TRUE ON ERROR) AS m_ex
        |FROM (
        |  SELECT doc_id,
        |    CASE CAST(doc_id % 8 AS INT)
        |      WHEN 0 THEN '{"x":{"b":1},"b":2}'
        |      WHEN 1 THEN '{"x":{"b":[5]}}'
        |      WHEN 2 THEN '{"x":{"b":9}}'
        |      WHEN 3 THEN '{"z":[{"b":3},{"b":4}]}'
        |      WHEN 4 THEN '{"b":{"b":7}}'
        |      WHEN 5 THEN '{"z":1}'
        |      WHEN 6 THEN 'not json'
        |      ELSE '{"a":[{"c":[1,2]},{"z":0},{"c":[3]}]}' END AS js
        |  FROM djq_docs_sf)""".stripMargin
    s.sql(graft.harness.DialectFunctions.rewrite(flinkSql))
  }

  def all: Seq[Q] = Seq(q95Unnest, q96JsonValue, q97TumbleOffset,
    q100DialectFns, q101HopOffset, q104JsonDefault, q105LeftUnnestOrd,
    q106CumulateOffset, q107WindowGroupingSets, q108JsonOnError,
    q109JsonQuery, q110JsonExists, q111JsonWildcard, q112ZoneGrid,
    q114JsonStarField, q116JsonDeep)
}
