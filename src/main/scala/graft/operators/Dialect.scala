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
    val flinkSql =
      """SELECT event_type,
        |  SUM(CASE WHEN JSON_EXISTS(props, '$.k') THEN 1 ELSE 0 END) AS n_has_k,
        |  SUM(JSON_VALUE(props, '$.k' RETURNING BIGINT)) AS sum_k,
        |  SUM(CASE WHEN JSON_EXISTS(props, '$.missing') THEN 1 ELSE 0 END) AS n_missing
        |FROM dlq_events GROUP BY event_type""".stripMargin
    s.sql(DialectFunctions.rewrite(flinkSql))
  }

  def all: Seq[Q] = Seq(q95Unnest, q96JsonValue)
}
