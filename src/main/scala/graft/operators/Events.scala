package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import Det._

/** Event-time operators over the `events` table: tumbling / hopping
  * windows, sessionization, as-of and interval joins, JSON extraction
  * (SURVEY.md §2.C "Window functions / time windows" + "Joins" interval/
  * temporal rows; batch analogs of the streaming semantics in
  * graft.streaming).
  *
  * Precision note: `events.ts` is nanosecond-precision parquet; Spark
  * truncates to µs on read while DuckDB keeps ns. Every oracle-compared
  * expression therefore works on `date_trunc('second', ts)` epochs so
  * both engines see identical values (truncation toward past is the same
  * from ns and µs).
  */
object Events {

  /** Tumbling 1-hour window aggregate, keyed by event_type.
    * Spark side uses the native `window()` TVF; `window.start` at hour
    * boundaries equals floor(epoch/3600)*3600, which is the DuckDB
    * spelling.
    */
  val q27Tumble: Q = Q(
    "q27_tumble",
    """SELECT event_type,
      |  CAST(FLOOR(FLOOR(EPOCH(ts)) / 3600) * 3600 AS BIGINT) AS window_start_sec,
      |  COUNT(*) AS n_events,
      |  SUM(CAST(FLOOR((value) * 100 + 0.5) AS BIGINT)) / 100.0 AS sum_value
      |FROM events
      |GROUP BY 1, 2""".stripMargin) { (s, dir) =>
    Tables.load(s, dir, "events")
      .groupBy(col("event_type"), window(col("ts"), "1 hour"))
      .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("sum_value"))
      .select(col("event_type"),
        unix_timestamp(col("window.start")).as("window_start_sec"),
        col("n_events"), col("sum_value"))
  }

  /** Hopping window: 2-hour length sliding every hour (each event lands
    * in 2 windows). Spark `window(ts, "2 hours", "1 hour")`; DuckDB
    * enumerates the 2 slide offsets.
    */
  val q28Hop: Q = Q(
    "q28_hop",
    """SELECT CAST((FLOOR(FLOOR(EPOCH(ts)) / 3600) - off) * 3600 AS BIGINT) AS window_start_sec,
      |  COUNT(*) AS n_events
      |FROM events, (SELECT UNNEST([0, 1]) AS off)
      |GROUP BY 1""".stripMargin) { (s, dir) =>
    Tables.load(s, dir, "events")
      .groupBy(window(col("ts"), "2 hours", "1 hour"))
      .agg(count(lit(1)).as("n_events"))
      .select(unix_timestamp(col("window.start")).as("window_start_sec"),
        col("n_events"))
  }

  /** Sessionization (30-minute inactivity gap) via gaps-and-islands:
    * lag + cumulative sum of session-start markers, then per-session
    * aggregation. One shuffle on user_id; identical logic to the
    * streaming session_window operator in graft.streaming.
    */
  val q29Sessionize: Q = Q(
    "q29_sessionize",
    """WITH e AS (
      |  SELECT user_id, event_id,
      |    CAST(FLOOR(EPOCH(date_trunc('second', ts))) AS BIGINT) AS ts_sec
      |  FROM events),
      |marked AS (
      |  SELECT user_id, event_id, ts_sec,
      |    CASE WHEN ts_sec - LAG(ts_sec, 1, ts_sec - 1801)
      |        OVER (PARTITION BY user_id ORDER BY ts_sec, event_id) >= 1800
      |      THEN 1 ELSE 0 END AS is_new
      |  FROM e),
      |sess AS (
      |  SELECT user_id, event_id, ts_sec,
      |    CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts_sec, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
      |  FROM marked)
      |SELECT user_id, session_id,
      |  MIN(ts_sec) AS session_start_sec,
      |  MAX(ts_sec) AS session_end_sec,
      |  COUNT(*) AS n_events
      |FROM sess GROUP BY user_id, session_id""".stripMargin) { (s, dir) =>
    val byTime = Window.partitionBy(col("user_id")).orderBy(col("ts_sec"), col("event_id"))
    Tables.load(s, dir, "events")
      .select(col("user_id"), col("event_id"),
        unix_timestamp(date_trunc("second", col("ts"))).as("ts_sec"))
      .withColumn("is_new",
        when(col("ts_sec") - lag(col("ts_sec"), 1, null).over(byTime) >= 1800, 1)
          .when(lag(col("ts_sec"), 1, null).over(byTime).isNull, 1)
          .otherwise(0))
      .withColumn("session_id",
        sum(col("is_new")).over(byTime.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_id"))
      .agg(
        min(col("ts_sec")).as("session_start_sec"),
        max(col("ts_sec")).as("session_end_sec"),
        count(lit(1)).as("n_events"))
  }

  /** As-of join: for each purchase, the most recent click (any time
    * before or at the purchase) by the same user.
    *
    * Spark has no ASOF syntax; the scalable implementation is the
    * union-and-carry trick — tag both streams, sort per user by time,
    * carry the last click forward with `last(ignoreNulls)` — one shuffle
    * on user_id, no range-join blowup (SURVEY §2.C temporal/as-of row).
    * The oracle uses a lateral top-1 subquery rather than DuckDB's
    * native ASOF JOIN because ASOF picks an arbitrary row among
    * timestamp ties, while this formulation pins the max event_id —
    * matching the Spark ordering.
    */
  val q30AsofJoin: Q = Q(
    "q30_asof_join",
    """WITH p AS (
      |  SELECT user_id, event_id,
      |    CAST(FLOOR(EPOCH(date_trunc('second', ts))) AS BIGINT) AS ts_sec
      |  FROM events WHERE event_type = 'purchase'),
      |c AS (
      |  SELECT user_id, event_id,
      |    CAST(FLOOR(EPOCH(date_trunc('second', ts))) AS BIGINT) AS ts_sec
      |  FROM events WHERE event_type = 'click')
      |SELECT p.event_id AS purchase_id,
      |  COALESCE(last_click.event_id, -1) AS click_id,
      |  COALESCE(p.ts_sec - last_click.ts_sec, -1) AS gap_sec
      |FROM p LEFT JOIN LATERAL (
      |  SELECT c.event_id, c.ts_sec FROM c
      |  WHERE c.user_id = p.user_id AND c.ts_sec <= p.ts_sec
      |  ORDER BY c.ts_sec DESC, c.event_id DESC LIMIT 1
      |) AS last_click ON TRUE""".stripMargin) { (s, dir) =>
    val ev = Tables.load(s, dir, "events")
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_timestamp(date_trunc("second", col("ts"))).as("ts_sec"))
      .filter(col("event_type").isin("purchase", "click"))
      .withColumn("is_purchase", (col("event_type") === "purchase").cast("int"))
    // clicks sort before purchases at equal ts_sec so same-second clicks match
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_sec"), col("is_purchase"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ev
      .withColumn("last_click_id",
        last(when(col("is_purchase") === 0, col("event_id")), ignoreNulls = true).over(w))
      .withColumn("last_click_sec",
        last(when(col("is_purchase") === 0, col("ts_sec")), ignoreNulls = true).over(w))
      .filter(col("is_purchase") === 1)
      .select(
        col("event_id").as("purchase_id"),
        coalesce(col("last_click_id"), lit(-1L)).as("click_id"),
        coalesce(col("ts_sec") - col("last_click_sec"), lit(-1L)).as("gap_sec"))
  }

  /** Temporal join through the harness's Flink-syntax rewrite: the
    * query is written with `FOR SYSTEM_TIME AS OF` (the form a Flink
    * script submits verbatim, `SQLSubmitAction.java:76`), rewritten by
    * [[graft.harness.TemporalJoin]] into an interval-ized version-table
    * join, and executed by Spark — proving the harness surface
    * end-to-end under the oracle. The versioned side is one row per
    * (user_id, second) (primary key + time attribute, as Flink
    * requires), so the latest version at or before each purchase is
    * unique and deterministic.
    */
  val q56Temporal: Q = Q(
    "q56_temporal",
    """WITH p AS (
      |  SELECT user_id, event_id,
      |    CAST(FLOOR(EPOCH(date_trunc('second', ts))) AS BIGINT) AS ts_sec
      |  FROM events WHERE event_type = 'purchase'),
      |r AS (
      |  SELECT user_id,
      |    CAST(FLOOR(EPOCH(date_trunc('second', ts))) AS BIGINT) AS ts_sec,
      |    MAX(event_id) AS click_id
      |  FROM events WHERE event_type = 'click' GROUP BY 1, 2)
      |SELECT p.event_id AS purchase_id, v.click_id AS click_id,
      |  v.ts_sec AS version_sec
      |FROM p JOIN LATERAL (
      |  SELECT r.click_id, r.ts_sec FROM r
      |  WHERE r.user_id = p.user_id AND r.ts_sec <= p.ts_sec
      |  ORDER BY r.ts_sec DESC LIMIT 1
      |) AS v ON TRUE""".stripMargin) { (s, dir) =>
    val ev = Tables.load(s, dir, "events")
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_timestamp(date_trunc("second", col("ts"))).as("ts_sec"))
    ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"), col("ts_sec"))
      .createOrReplaceTempView("tj_purchases")
    ev.filter(col("event_type") === "click")
      .groupBy(col("user_id"), col("ts_sec"))
      .agg(max(col("event_id")).as("click_id"))
      .createOrReplaceTempView("tj_versions")
    val flinkSql =
      """SELECT p.event_id AS purchase_id, v.click_id AS click_id,
        |  v.ts_sec AS version_sec
        |FROM tj_purchases p
        |JOIN tj_versions FOR SYSTEM_TIME AS OF p.ts_sec AS v
        |ON v.user_id = p.user_id""".stripMargin
    s.sql(graft.harness.TemporalJoin.rewrite(flinkSql,
      Map("tj_versions" ->
        graft.harness.TemporalJoin.VersionMeta("ts_sec", Seq("user_id"))).get))
  }

  /** Temporal join whose version side is a VERSIONED VIEW (r19): the
    * `ROW_NUMBER ... rn = 1` deduplication view Flink accepts as a
    * `FOR SYSTEM_TIME AS OF` target without a versioned-table DDL
    * (pass-through surface, `SQLSubmitAction.java:76`). The harness
    * resolves the view to its underlying HISTORY
    * ([[graft.harness.TemporalJoin.substituteVersionedViews]]) — the
    * rn = 1 output holds only the latest version per key — then the
    * interval-ized rewrite runs as for a DDL versioned table. Same
    * oracle restatement as q56: the per-(user, second) history makes
    * the latest-at-or-before lookup unique and deterministic.
    */
  val q119VersionedView: Q = Q(
    "q119_versioned_view",
    """WITH p AS (
      |  SELECT user_id, event_id,
      |    CAST(FLOOR(EPOCH(date_trunc('second', ts))) AS BIGINT) AS ts_sec
      |  FROM events WHERE event_type = 'purchase'),
      |r AS (
      |  SELECT user_id,
      |    CAST(FLOOR(EPOCH(date_trunc('second', ts))) AS BIGINT) AS ts_sec,
      |    MAX(event_id) AS click_id
      |  FROM events WHERE event_type = 'click' GROUP BY 1, 2)
      |SELECT p.event_id AS purchase_id, v.click_id AS click_id,
      |  v.ts_sec AS version_sec
      |FROM p JOIN LATERAL (
      |  SELECT r.click_id, r.ts_sec FROM r
      |  WHERE r.user_id = p.user_id AND r.ts_sec <= p.ts_sec
      |  ORDER BY r.ts_sec DESC LIMIT 1
      |) AS v ON TRUE""".stripMargin) { (s, dir) =>
    val ev = Tables.load(s, dir, "events")
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_timestamp(date_trunc("second", col("ts"))).as("ts_sec"))
    ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"), col("ts_sec"))
      .createOrReplaceTempView("vv_purchases")
    ev.filter(col("event_type") === "click")
      .groupBy(col("user_id"), col("ts_sec"))
      .agg(max(col("event_id")).as("click_id"))
      .createOrReplaceTempView("vv_history")
    val vv = graft.harness.TemporalJoin.versionedViewOf(
      """SELECT user_id, ts_sec, click_id FROM (
        |  SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
        |    ORDER BY ts_sec DESC) AS rn
        |  FROM vv_history) WHERE rn = 1""".stripMargin).get
    val metas = scala.collection.mutable.Map
      .empty[String, graft.harness.TemporalJoin.VersionMeta]
    val subbed = graft.harness.TemporalJoin.substituteVersionedViews(s,
      """SELECT p.event_id AS purchase_id, v.click_id AS click_id,
        |  v.ts_sec AS version_sec
        |FROM vv_purchases p
        |JOIN latest_clicks FOR SYSTEM_TIME AS OF p.ts_sec AS v
        |ON v.user_id = p.user_id""".stripMargin,
      n => if (n.equalsIgnoreCase("latest_clicks")) Some(vv) else None,
      metas.update)
    s.sql(graft.harness.TemporalJoin.rewrite(subbed,
      n => metas.keys.find(_.equalsIgnoreCase(n)).map(metas)))
  }

  /** Interval join: clicks within the hour before each purchase, by the
    * same user — equi-join on user_id plus a time-range predicate, the
    * batch analog of a stream-stream interval join. Shuffles once on
    * user_id.
    */
  val q31IntervalJoin: Q = Q(
    "q31_interval_join",
    """WITH p AS (
      |  SELECT user_id, event_id,
      |    CAST(FLOOR(EPOCH(date_trunc('second', ts))) AS BIGINT) AS ts_sec
      |  FROM events WHERE event_type = 'purchase'),
      |c AS (
      |  SELECT user_id,
      |    CAST(FLOOR(EPOCH(date_trunc('second', ts))) AS BIGINT) AS ts_sec
      |  FROM events WHERE event_type = 'click')
      |SELECT p.event_id AS purchase_id,
      |  COUNT(c.ts_sec) AS clicks_before
      |FROM p LEFT JOIN c
      |  ON p.user_id = c.user_id
      |  AND c.ts_sec >= p.ts_sec - 3600 AND c.ts_sec < p.ts_sec
      |GROUP BY p.event_id""".stripMargin) { (s, dir) =>
    val ev = Tables.load(s, dir, "events")
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_timestamp(date_trunc("second", col("ts"))).as("ts_sec"))
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("event_id").as("purchase_id"),
        col("ts_sec").as("p_sec"))
    val c = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts_sec").as("c_sec"))
    p.join(c,
        col("p_user") === col("c_user") &&
          col("c_sec") >= col("p_sec") - 3600 && col("c_sec") < col("p_sec"),
        "left")
      .groupBy(col("purchase_id"))
      .agg(count(col("c_sec")).as("clicks_before"))
  }

  /** JSON field extraction from the `props` column. */
  val q32Json: Q = Q(
    "q32_json",
    """WITH j AS (
      |  SELECT event_id, json_extract_string(props, '$.k') AS ks FROM events)
      |SELECT event_id, CAST(ks AS BIGINT) AS k_value
      |FROM j
      |WHERE regexp_matches(ks, '^-?[0-9]+$') AND CAST(ks AS BIGINT) >= 50""".stripMargin) { (s, dir) =>
    // integral-only guard keeps cast semantics identical across engines
    // (DuckDB CAST('12.5' AS BIGINT) rounds; Spark truncates/nulls)
    Tables.load(s, dir, "events")
      .select(col("event_id"),
        get_json_object(col("props"), "$.k").as("ks"))
      .filter(col("ks").rlike("^-?[0-9]+$"))
      .select(col("event_id"), col("ks").cast("long").as("k_value"))
      .filter(col("k_value") >= 50)
  }

  /** Schema'd JSON extraction: one `from_json` with a declared schema
    * parses `props` once into a struct, then aggregates on the typed
    * field — the vectorizable 100 TB path (q32 keeps the per-path
    * `get_json_object` form the reference scripts use; a plan-audit
    * spec pins this one to a single JsonToStructs in the plan).
    */
  val q57JsonSchema: Q = Q(
    "q57_json_schema",
    """SELECT k_value, COUNT(*) AS n_events
      |FROM (
      |  SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_value
      |  FROM events)
      |GROUP BY k_value""".stripMargin) { (s, dir) =>
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField(
        "k", org.apache.spark.sql.types.LongType)))
    Tables.load(s, dir, "events")
      .select(from_json(col("props"), schema).getField("k").as("k_value"))
      .groupBy(col("k_value"))
      .agg(count(lit(1)).as("n_events"))
  }

  /** Flink TUMBLE window TVF through the harness rewrite: the query is
    * written with `TABLE(TUMBLE(TABLE t, DESCRIPTOR(ts), INTERVAL ...))`
    * — the form a Flink script submits verbatim — rewritten by
    * [[graft.harness.WindowTvf]] into a window-column projection
    * (row-local epoch arithmetic, no shuffle added), and aggregated by
    * Spark under the oracle.
    */
  val q58TumbleTvf: Q = Q(
    "q58_tumble_tvf",
    """WITH w AS (
      |  SELECT event_type,
      |    (CAST(FLOOR(EPOCH(date_trunc('second', ts))) AS BIGINT) // 3600) * 3600 AS ws
      |  FROM events)
      |SELECT CAST(ws AS BIGINT) AS window_start_sec, event_type,
      |  COUNT(*) AS n_events
      |FROM w GROUP BY ws, event_type""".stripMargin) { (s, dir) =>
    Tables.load(s, dir, "events").createOrReplaceTempView("tvf_events")
    val flinkSql =
      """SELECT window_start, event_type, COUNT(*) AS n_events
        |FROM TABLE(TUMBLE(TABLE tvf_events, DESCRIPTOR(ts), INTERVAL '1' HOUR))
        |GROUP BY window_start, event_type""".stripMargin
    s.sql(graft.harness.WindowTvf.rewrite(flinkSql))
      .select(unix_timestamp(col("window_start")).as("window_start_sec"),
        col("event_type"), col("n_events"))
  }

  /** Flink HOP window TVF through the harness rewrite (slide 1h inside
    * a 2h window): each event fans into its two covering windows via
    * the rewrite's bounded lateral expansion.
    */
  val q59HopTvf: Q = Q(
    "q59_hop_tvf",
    """WITH e AS (
      |  SELECT event_type,
      |    CAST(FLOOR(EPOCH(date_trunc('second', ts))) AS BIGINT) AS tsec
      |  FROM events),
      |x AS (
      |  SELECT event_type, UNNEST(generate_series(
      |    ((tsec - 7200) // 3600 + 1) * 3600,
      |    (tsec // 3600) * 3600, 3600)) AS ws
      |  FROM e)
      |SELECT CAST(ws AS BIGINT) AS window_start_sec, event_type,
      |  COUNT(*) AS n_events
      |FROM x GROUP BY 1, 2""".stripMargin) { (s, dir) =>
    Tables.load(s, dir, "events").createOrReplaceTempView("tvf_events")
    val flinkSql =
      """SELECT window_start, event_type, COUNT(*) AS n_events
        |FROM TABLE(HOP(TABLE tvf_events, DESCRIPTOR(ts),
        |  INTERVAL '1' HOUR, INTERVAL '2' HOURS))
        |GROUP BY window_start, event_type""".stripMargin
    s.sql(graft.harness.WindowTvf.rewrite(flinkSql))
      .select(unix_timestamp(col("window_start")).as("window_start_sec"),
        col("event_type"), col("n_events"))
  }

  /** Flink 1.x legacy `GROUP BY HOP(ts, slide, size)` + `HOP_START`
    * through the harness escalation: the legacy group window rewrites
    * to the TVF form first (per-group windows; one row in several
    * windows), then expands laterally like q59 — same oracle.
    */
  val q63LegacyHop: Q = Q(
    "q63_legacy_hop",
    """WITH e AS (
      |  SELECT event_type,
      |    CAST(FLOOR(EPOCH(date_trunc('second', ts))) AS BIGINT) AS tsec
      |  FROM events),
      |x AS (
      |  SELECT event_type, UNNEST(generate_series(
      |    ((tsec - 7200) // 3600 + 1) * 3600,
      |    (tsec // 3600) * 3600, 3600)) AS ws
      |  FROM e)
      |SELECT CAST(ws AS BIGINT) AS window_start_sec, event_type,
      |  COUNT(*) AS n_events
      |FROM x GROUP BY 1, 2""".stripMargin) { (s, dir) =>
    Tables.load(s, dir, "events").createOrReplaceTempView("tvf_events")
    val flinkSql =
      """SELECT HOP_START(ts, INTERVAL '1' HOUR, INTERVAL '2' HOURS) AS wstart,
        |  event_type, COUNT(*) AS n_events
        |FROM tvf_events
        |GROUP BY event_type, HOP(ts, INTERVAL '1' HOUR, INTERVAL '2' HOURS)""".stripMargin
    s.sql(graft.harness.WindowTvf.rewrite(flinkSql))
      .select(unix_timestamp(col("wstart")).as("window_start_sec"),
        col("event_type"), col("n_events"))
  }

  /** Flink CUMULATE window TVF through the harness rewrite (1h steps
    * over a 4h span) — the TVF-syntax twin of q43's library operator.
    */
  val q60CumulateTvf: Q = Q(
    "q60_cumulate_tvf",
    """WITH e AS (
      |  SELECT CAST(FLOOR(EPOCH(date_trunc('second', ts))) AS BIGINT) AS tsec
      |  FROM events),
      |x AS (
      |  SELECT (tsec // 14400) * 14400 AS span, UNNEST(generate_series(
      |    ((tsec % 14400) // 3600 + 1) * 3600, 14400, 3600)) AS eo
      |  FROM e)
      |SELECT CAST(span AS BIGINT) AS window_start_sec,
      |  CAST(span + eo AS BIGINT) AS window_end_sec, COUNT(*) AS n_events
      |FROM x GROUP BY 1, 2""".stripMargin) { (s, dir) =>
    Tables.load(s, dir, "events").createOrReplaceTempView("tvf_events")
    val flinkSql =
      """SELECT window_start, window_end, COUNT(*) AS n_events
        |FROM TABLE(CUMULATE(TABLE tvf_events, DESCRIPTOR(ts),
        |  INTERVAL '1' HOUR, INTERVAL '4' HOURS))
        |GROUP BY window_start, window_end""".stripMargin
    s.sql(graft.harness.WindowTvf.rewrite(flinkSql))
      .select(unix_timestamp(col("window_start")).as("window_start_sec"),
        unix_timestamp(col("window_end")).as("window_end_sec"),
        col("n_events"))
  }

  /** Flink 1.x legacy group-window syntax (`GROUP BY TUMBLE(ts, ...)` +
    * `TUMBLE_START`) through the harness rewrite — the pre-TVF form an
    * older Flink script submits verbatim; same oracle as the TVF twin.
    */
  val q61LegacyTumble: Q = Q(
    "q61_legacy_tumble",
    """WITH w AS (
      |  SELECT event_type,
      |    (CAST(FLOOR(EPOCH(date_trunc('second', ts))) AS BIGINT) // 3600) * 3600 AS ws
      |  FROM events)
      |SELECT CAST(ws AS BIGINT) AS window_start_sec, event_type,
      |  COUNT(*) AS n_events
      |FROM w GROUP BY ws, event_type""".stripMargin) { (s, dir) =>
    Tables.load(s, dir, "events").createOrReplaceTempView("tvf_events")
    val flinkSql =
      """SELECT TUMBLE_START(ts, INTERVAL '1' HOUR) AS wstart, event_type,
        |  COUNT(*) AS n_events
        |FROM tvf_events
        |GROUP BY TUMBLE(ts, INTERVAL '1' HOUR), event_type""".stripMargin
    s.sql(graft.harness.WindowTvf.rewrite(flinkSql))
      .select(unix_timestamp(col("wstart")).as("window_start_sec"),
        col("event_type"), col("n_events"))
  }

  /** Flink SESSION window TVF through the harness rewrite (30-minute
    * gap per user): the gaps-and-islands expansion must agree with the
    * oracle's session derivation row for row. Break semantics follow
    * Flink's window merging — per-event windows [t, t+gap) merge when
    * they touch, so a break needs a strictly larger gap — and the gap
    * comparison runs in MILLISECONDS (TIMESTAMP(3) precision) on both
    * sides; the output labels truncate to seconds only at the end.
    */
  val q62SessionTvf: Q = Q(
    "q62_session_tvf",
    """WITH e AS (
      |  SELECT user_id, epoch_ms(ts) AS tms
      |  FROM events),
      |f AS (
      |  SELECT user_id, tms,
      |    CASE WHEN tms - LAG(tms) OVER (PARTITION BY user_id ORDER BY tms)
      |      > 1800000 THEN 1 ELSE 0 END AS nf
      |  FROM e),
      |s AS (
      |  SELECT user_id, tms, SUM(nf) OVER (PARTITION BY user_id
      |    ORDER BY tms, nf DESC
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      |  FROM f)
      |SELECT user_id, CAST(MIN(tms) // 1000 AS BIGINT) AS window_start_sec,
      |  CAST((MAX(tms) + 1800000) // 1000 AS BIGINT) AS window_end_sec,
      |  COUNT(*) AS n_events
      |FROM s GROUP BY user_id, sid""".stripMargin) { (s, dir) =>
    Tables.load(s, dir, "events").createOrReplaceTempView("tvf_events")
    val flinkSql =
      """SELECT user_id, window_start, window_end, COUNT(*) AS n_events
        |FROM TABLE(SESSION(TABLE tvf_events PARTITION BY user_id,
        |  DESCRIPTOR(ts), INTERVAL '30' MINUTE))
        |GROUP BY user_id, window_start, window_end""".stripMargin
    s.sql(graft.harness.WindowTvf.rewrite(flinkSql))
      .select(col("user_id"),
        unix_timestamp(col("window_start")).as("window_start_sec"),
        unix_timestamp(col("window_end")).as("window_end_sec"),
        col("n_events"))
  }

  /** Pivot-style conditional aggregation: event-type counts per user. */
  val q33Pivot: Q = Q(
    "q33_pivot",
    """SELECT user_id,
      |  CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS clicks,
      |  CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS views,
      |  CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchases,
      |  CAST(SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS signups,
      |  CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS errors
      |FROM events GROUP BY user_id""".stripMargin) { (s, dir) =>
    def cnt(t: String) = sum(when(col("event_type") === t, 1).otherwise(0))
    Tables.load(s, dir, "events")
      .groupBy(col("user_id"))
      .agg(cnt("click").as("clicks"), cnt("view").as("views"),
        cnt("purchase").as("purchases"), cnt("signup").as("signups"),
        cnt("error").as("errors"))
  }

  /** CUMULATE window TVF (Flink's growing-window aggregate, SURVEY §2.C
    * TVF row): 4-hour span with 1-hour steps — an event belongs to every
    * cumulate window of its span whose end lies after the event. Spark
    * has no native cumulate; the expansion is an explode over the ≤4
    * step ends plus a filter — a pure projection before one hash agg.
    */
  val q43Cumulate: Q = Q(
    "q43_cumulate",
    """WITH e AS (
      |  SELECT CAST(FLOOR(EPOCH(date_trunc('second', ts))) AS BIGINT) AS ts_sec
      |  FROM events),
      |x AS (
      |  SELECT CAST(FLOOR(ts_sec / 14400) * 14400 AS BIGINT) AS span_start,
      |    ts_sec, UNNEST([1, 2, 3, 4]) AS k
      |  FROM e)
      |SELECT span_start,
      |  CAST(span_start + k * 3600 AS BIGINT) AS window_end_sec,
      |  COUNT(*) AS n_events
      |FROM x
      |WHERE span_start + k * 3600 > ts_sec
      |GROUP BY 1, 2""".stripMargin) { (s, dir) =>
    Tables.load(s, dir, "events")
      .select(unix_timestamp(date_trunc("second", col("ts"))).as("ts_sec"))
      .select(
        (floor(col("ts_sec") / 14400d) * 14400).cast("long").as("span_start"),
        col("ts_sec"),
        explode(sequence(lit(1), lit(4))).as("k"))
      .filter(col("span_start") + col("k") * 3600 > col("ts_sec"))
      .groupBy(col("span_start"),
        (col("span_start") + col("k") * 3600).cast("long").as("window_end_sec"))
      .agg(count(lit(1)).as("n_events"))
  }

  /** Cohort retention: users grouped by first-seen day-bucket (5-day
    * cohorts), counted per later activity bucket — two hash aggs plus
    * one equi-join on user_id, the standard retention-matrix shape.
    * Buckets come from integer epoch-day arithmetic, not calendar-week
    * truncation, so both engines agree without week-start conventions.
    */
  val q52Retention: Q = Q(
    "q52_retention",
    """WITH e AS (
      |  SELECT user_id,
      |    CAST(FLOOR(EPOCH(date_trunc('second', ts))) AS BIGINT) // 86400 // 5 AS bucket
      |  FROM events),
      |f AS (SELECT user_id, MIN(bucket) AS cohort FROM e GROUP BY user_id),
      |a AS (SELECT DISTINCT user_id, bucket FROM e)
      |SELECT f.cohort, a.bucket, COUNT(*) AS active_users
      |FROM f JOIN a ON f.user_id = a.user_id
      |GROUP BY f.cohort, a.bucket""".stripMargin) { (s, dir) =>
    val e = Tables.load(s, dir, "events")
      .select(col("user_id"),
        expr("unix_timestamp(date_trunc('second', ts)) div 86400 div 5")
          .as("bucket"))
    val f = e.groupBy(col("user_id")).agg(min(col("bucket")).as("cohort"))
    val a = e.distinct()
    f.join(a, "user_id")
      .groupBy(col("cohort"), col("bucket"))
      .agg(count(lit(1)).as("active_users"))
  }

  /** Ordered funnel (view → click → purchase, strictly increasing
    * times): per user, the earliest event of each stage that follows
    * the previous stage — the SQL-expressible core of a CEP /
    * MATCH_RECOGNIZE pattern, here as three stage aggregations chained
    * by equi-joins on user_id (each stage is one shuffle on the same
    * key, so co-partitioning carries through the chain).
    */
  val q53Funnel: Q = Q(
    "q53_funnel",
    """WITH e AS (
      |  SELECT user_id, event_type,
      |    CAST(FLOOR(EPOCH(date_trunc('second', ts))) AS BIGINT) AS sec
      |  FROM events),
      |v AS (SELECT user_id, MIN(sec) AS t1 FROM e
      |      WHERE event_type = 'view' GROUP BY user_id),
      |c AS (SELECT e.user_id, MIN(sec) AS t2
      |      FROM e JOIN v ON e.user_id = v.user_id
      |      WHERE e.event_type = 'click' AND e.sec > v.t1 GROUP BY e.user_id),
      |p AS (SELECT e.user_id, MIN(sec) AS t3
      |      FROM e JOIN c ON e.user_id = c.user_id
      |      WHERE e.event_type = 'purchase' AND e.sec > c.t2 GROUP BY e.user_id)
      |SELECT
      |  (SELECT COUNT(*) FROM v) AS n_view,
      |  (SELECT COUNT(*) FROM c) AS n_click_after,
      |  (SELECT COUNT(*) FROM p) AS n_purchase_after""".stripMargin) { (s, dir) =>
    val e = Tables.load(s, dir, "events")
      .select(col("user_id"), col("event_type"),
        unix_timestamp(date_trunc("second", col("ts"))).as("sec"))
    val v = e.filter(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("sec")).as("t1"))
    val c = e.filter(col("event_type") === "click")
      .join(v, "user_id").filter(col("sec") > col("t1"))
      .groupBy(col("user_id")).agg(min(col("sec")).as("t2"))
    val p = e.filter(col("event_type") === "purchase")
      .join(c, "user_id").filter(col("sec") > col("t2"))
      .groupBy(col("user_id")).agg(min(col("sec")).as("t3"))
    v.agg(count(lit(1)).as("n_view"))
      .crossJoin(c.agg(count(lit(1)).as("n_click_after")))
      .crossJoin(p.agg(count(lit(1)).as("n_purchase_after")))
  }

  /** Window join (Flink 1.14+ window TVF join): click and error rows
    * of the SAME user in the SAME 1-day tumbling window pair up. Both
    * sides carry their window column from the `window()` TVF and the
    * join key is (user_id, window_start) — an equi-join, so at scale
    * it shuffles both sides once on the composite key (never a
    * time-range nested loop), and the window column prunes pairs to
    * co-windowed rows by construction.
    */
  val q92WindowJoin: Q = Q(
    "q92_window_join",
    """WITH e AS (
      |  SELECT user_id, event_type, event_id,
      |    (CAST(FLOOR(EPOCH(date_trunc('second', ts))) AS BIGINT) // 86400) * 86400 AS ws
      |  FROM events)
      |SELECT c.user_id, CAST(c.ws AS BIGINT) AS window_start_sec,
      |  c.event_id AS click_id, x.event_id AS error_id
      |FROM e c JOIN e x ON c.user_id = x.user_id AND c.ws = x.ws
      |WHERE c.event_type = 'click' AND x.event_type = 'error'""".stripMargin) { (s, dir) =>
    val e = Tables.load(s, dir, "events")
      .select(col("user_id"), col("event_type"), col("event_id"),
        window(col("ts"), "1 day").as("w"))
    val c = e.filter(col("event_type") === "click")
      .select(col("user_id"), col("w"), col("event_id").as("click_id"))
    val x = e.filter(col("event_type") === "error")
      .select(col("user_id").as("x_user_id"), col("w").as("x_w"),
        col("event_id").as("error_id"))
    c.join(x, col("user_id") === col("x_user_id") && col("w") === col("x_w"))
      .select(col("user_id"),
        unix_timestamp(col("w.start")).as("window_start_sec"),
        col("click_id"), col("error_id"))
  }

  /** Window top-N (Flink window TVF + ROW_NUMBER pattern): the top-3
    * users by deterministic spend inside each 1-day tumbling window.
    * The rank partitions on the window column, so Catalyst's
    * WindowGroupLimit pushes the N=3 cutoff below the sort — per
    * window only 3 rows survive the shuffle's downstream, the shape
    * that keeps per-window top-N linear at scale.
    */
  val q93WindowTopn: Q = Q(
    "q93_window_topn",
    """WITH w AS (
      |  SELECT user_id,
      |    (CAST(FLOOR(EPOCH(date_trunc('second', ts))) AS BIGINT) // 86400) * 86400 AS ws,
      |    CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS cents
      |  FROM events),
      |agg AS (
      |  SELECT ws, user_id, CAST(SUM(cents) AS BIGINT) AS spend_cents
      |  FROM w GROUP BY ws, user_id),
      |ranked AS (
      |  SELECT ws, user_id, spend_cents,
      |    CAST(ROW_NUMBER() OVER (PARTITION BY ws ORDER BY spend_cents DESC, user_id) AS BIGINT) AS rn
      |  FROM agg)
      |SELECT CAST(ws AS BIGINT) AS window_start_sec, user_id, spend_cents, rn
      |FROM ranked WHERE rn <= 3""".stripMargin) { (s, dir) =>
    val agg = Tables.load(s, dir, "events")
      .groupBy(window(col("ts"), "1 day").as("w"), col("user_id"))
      .agg(sum(cents(col("value"))).as("spend_cents"))
    val rankW = Window.partitionBy(col("w"))
      .orderBy(col("spend_cents").desc, col("user_id"))
    agg.withColumn("rn", row_number().over(rankW).cast("long"))
      .filter(col("rn") <= 3)
      .select(unix_timestamp(col("w.start")).as("window_start_sec"),
        col("user_id"), col("spend_cents"), col("rn"))
  }

  /** Flink 1.x legacy `GROUP BY HOP(...)` with a JOIN in the FROM —
    * the escalation's multi-table path: the covering window starts
    * explode as a `LATERAL VIEW` appended to the join, so qualified
    * references (`c.c_mktsegment`) survive untouched. At scale this is
    * one equi-join shuffle plus a bounded per-row fan-out (size/slide
    * rows) — no re-shuffle for the window, since the window start is a
    * scalar of the row's own timestamp.
    */
  val q102LegacyHopJoin: Q = Q(
    "q102_legacy_hop_join",
    """WITH e AS (
      |  SELECT c.c_mktsegment AS seg,
      |    CAST(FLOOR(EPOCH(date_trunc('second', ts))) AS BIGINT) AS tsec
      |  FROM events ev JOIN customer c ON ev.user_id = c.c_custkey),
      |x AS (
      |  SELECT seg, UNNEST(generate_series(
      |    ((tsec - 7200) // 3600 + 1) * 3600,
      |    (tsec // 3600) * 3600, 3600)) AS ws
      |  FROM e)
      |SELECT CAST(ws AS BIGINT) AS window_start_sec, seg, COUNT(*) AS n_events
      |FROM x GROUP BY 1, 2""".stripMargin) { (s, dir) =>
    Tables.load(s, dir, "events").createOrReplaceTempView("tvf_events")
    Tables.load(s, dir, "customer").createOrReplaceTempView("tvf_customer")
    val flinkSql =
      """SELECT HOP_START(ts, INTERVAL '1' HOUR, INTERVAL '2' HOURS) AS wstart,
        |  c.c_mktsegment AS seg, COUNT(*) AS n_events
        |FROM tvf_events ev JOIN tvf_customer c ON ev.user_id = c.c_custkey
        |GROUP BY c.c_mktsegment, HOP(ts, INTERVAL '1' HOUR, INTERVAL '2' HOURS)""".stripMargin
    s.sql(graft.harness.WindowTvf.rewrite(flinkSql))
      .select(unix_timestamp(col("wstart")).as("window_start_sec"),
        col("seg"), col("n_events"))
  }

  /** Flink 1.x legacy `GROUP BY SESSION(...)` with a JOIN in the FROM:
    * the escalation wraps the join in a `__lgw_src` CTE and windows
    * the SESSION TVF over it — sibling GROUP BY keys become the
    * session PARTITION BY (sessions per market segment here). The
    * islands computation partitions on the session keys, so the only
    * shuffles are the equi-join and one window partitioning.
    */
  val q103LegacySessionJoin: Q = Q(
    "q103_legacy_session_join",
    """WITH e AS (
      |  SELECT c.c_mktsegment AS seg, epoch_ms(ts) AS tms
      |  FROM events ev JOIN customer c ON ev.user_id = c.c_custkey),
      |f AS (
      |  SELECT seg, tms,
      |    CASE WHEN tms - LAG(tms) OVER (PARTITION BY seg ORDER BY tms)
      |      > 1800000 THEN 1 ELSE 0 END AS nf
      |  FROM e),
      |s AS (
      |  SELECT seg, tms, SUM(nf) OVER (PARTITION BY seg
      |    ORDER BY tms, nf DESC
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      |  FROM f)
      |SELECT seg, CAST(MIN(tms) // 1000 AS BIGINT) AS window_start_sec,
      |  CAST((MAX(tms) + 1800000) // 1000 AS BIGINT) AS window_end_sec,
      |  COUNT(*) AS n_events
      |FROM s GROUP BY seg, sid""".stripMargin) { (s, dir) =>
    Tables.load(s, dir, "events").createOrReplaceTempView("tvf_events")
    Tables.load(s, dir, "customer").createOrReplaceTempView("tvf_customer")
    val flinkSql =
      """SELECT c_mktsegment AS seg,
        |  SESSION_START(ts, INTERVAL '30' MINUTE) AS wstart,
        |  SESSION_END(ts, INTERVAL '30' MINUTE) AS wend,
        |  COUNT(*) AS n_events
        |FROM tvf_events ev JOIN tvf_customer c ON ev.user_id = c.c_custkey
        |GROUP BY c_mktsegment, SESSION(ts, INTERVAL '30' MINUTE)""".stripMargin
    s.sql(graft.harness.WindowTvf.rewrite(flinkSql))
      .select(col("seg"),
        unix_timestamp(col("wstart")).as("window_start_sec"),
        unix_timestamp(col("wend")).as("window_end_sec"),
        col("n_events"))
  }

  def all: Seq[Q] = Seq(
    q27Tumble, q28Hop, q29Sessionize, q30AsofJoin, q31IntervalJoin,
    q32Json, q33Pivot, q43Cumulate, q52Retention, q53Funnel, q56Temporal,
    q119VersionedView,
    q57JsonSchema, q58TumbleTvf, q59HopTvf, q60CumulateTvf, q61LegacyTumble,
    q62SessionTvf, q63LegacyHop, q92WindowJoin, q93WindowTopn,
    q102LegacyHopJoin, q103LegacySessionJoin)
}
