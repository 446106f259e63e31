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

  /** SQL:2016 row-pattern recognition (`MATCH_RECOGNIZE`, the CEP SQL
    * Flink's pass-through router admits — `SQLSubmitAction.java:76`),
    * via the harness subset in [[graft.harness.MatchRecognize]]: per
    * user, greedy `view click+ purchase` runs with SKIP PAST LAST ROW,
    * measuring the bracketing times, the click count, and the match
    * number.
    *
    * The oracle restates the pattern relationally — a match is exactly
    * a `view` row whose FIRST following non-click row (per-user rank
    * order) is a `purchase` at rank ≥ start+2; matches cannot overlap
    * because every interior row of a match is a click or the closing
    * purchase, so the greedy NFA and the relational form agree.
    */
  val q64MatchRecognize: Q = Q(
    "q64_match_recognize",
    """WITH e AS (
      |  SELECT user_id, event_id, event_type,
      |    CAST(FLOOR(EPOCH(date_trunc('second', ts))) AS BIGINT) AS ts_sec,
      |    ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY
      |      CAST(FLOOR(EPOCH(date_trunc('second', ts))) AS BIGINT), event_id) AS rn
      |  FROM events),
      |v AS (SELECT user_id, rn AS vrn, ts_sec AS start_sec FROM e
      |      WHERE event_type = 'view'),
      |nc AS (
      |  SELECT v.user_id, v.vrn, v.start_sec, MIN(e2.rn) AS endrn
      |  FROM v JOIN e e2 ON e2.user_id = v.user_id AND e2.rn > v.vrn
      |    AND e2.event_type <> 'click'
      |  GROUP BY 1, 2, 3),
      |m AS (
      |  SELECT n.user_id, n.vrn, n.start_sec, e3.ts_sec AS end_sec,
      |    n.endrn - n.vrn - 1 AS n_clicks
      |  FROM nc n JOIN e e3 ON e3.user_id = n.user_id AND e3.rn = n.endrn
      |  WHERE e3.event_type = 'purchase' AND n.endrn > n.vrn + 1)
      |SELECT user_id, start_sec, end_sec, CAST(n_clicks AS BIGINT) AS n_clicks,
      |  ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY vrn) AS mn
      |FROM m""".stripMargin) { (s, dir) =>
    Tables.load(s, dir, "events")
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_timestamp(date_trunc("second", col("ts"))).as("ts_sec"))
      .createOrReplaceTempView("graft_mr_events")
    graft.harness.MatchRecognize.sql(s,
      """SELECT user_id, start_sec, end_sec, n_clicks, mn
        |FROM graft_mr_events
        |MATCH_RECOGNIZE (
        |  PARTITION BY user_id
        |  ORDER BY ts_sec, event_id
        |  MEASURES
        |    V.ts_sec AS start_sec,
        |    LAST(P.ts_sec) AS end_sec,
        |    COUNT(C.*) AS n_clicks,
        |    MATCH_NUMBER() AS mn
        |  ONE ROW PER MATCH
        |  AFTER MATCH SKIP PAST LAST ROW
        |  PATTERN (V C+ P)
        |  DEFINE
        |    V AS event_type = 'view',
        |    C AS event_type = 'click',
        |    P AS event_type = 'purchase'
        |)""".stripMargin)
  }

  /** MATCH_RECOGNIZE with PREV() navigation: maximal ascending-value
    * runs per user — `PATTERN (S R+)` where R is `value rose vs the
    * PHYSICAL previous row` (SQL:2016 PREV semantics, precomputed as a
    * lag in [[graft.harness.MatchRecognize]]). The oracle replays the
    * same semantics as gaps-and-islands: a maximal block of "rose" rows
    * is exactly one greedy S R+ match (S = the row before the block,
    * which SKIP PAST LAST ROW always leaves unconsumed).
    */
  val q65PrevPattern: Q = Q(
    "q65_prev_pattern",
    """WITH e AS (
      |  SELECT user_id, event_id,
      |    CAST(FLOOR(EPOCH(date_trunc('second', ts))) AS BIGINT) AS ts_sec,
      |    CAST(FLOOR(value * 1000 + 0.5) AS BIGINT) AS vm,
      |    ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY
      |      CAST(FLOOR(EPOCH(date_trunc('second', ts))) AS BIGINT), event_id) AS rn
      |  FROM events),
      |f AS (
      |  SELECT *, CASE WHEN vm > LAG(vm) OVER (
      |      PARTITION BY user_id ORDER BY rn) THEN 1 ELSE 0 END AS is_up
      |  FROM e),
      |isl AS (
      |  SELECT *, rn - ROW_NUMBER() OVER (
      |      PARTITION BY user_id ORDER BY rn) AS grp
      |  FROM f WHERE is_up = 1),
      |runs AS (
      |  SELECT user_id, MIN(rn) AS first_rn, MAX(rn) AS last_rn,
      |    COUNT(*) AS run_len
      |  FROM isl GROUP BY user_id, grp)
      |SELECT r.user_id, hs.vm AS start_vm, he.vm AS end_vm,
      |  CAST(r.run_len AS BIGINT) AS run_len,
      |  ROW_NUMBER() OVER (PARTITION BY r.user_id ORDER BY r.first_rn) AS mn
      |FROM runs r
      |JOIN e hs ON hs.user_id = r.user_id AND hs.rn = r.first_rn - 1
      |JOIN e he ON he.user_id = r.user_id AND he.rn = r.last_rn""".stripMargin) { (s, dir) =>
    Tables.load(s, dir, "events")
      .select(col("user_id"), col("event_id"),
        unix_timestamp(date_trunc("second", col("ts"))).as("ts_sec"),
        floor(col("value") * 1000d + 0.5d).cast("long").as("vm"))
      .createOrReplaceTempView("graft_mr_events_prev")
    graft.harness.MatchRecognize.sql(s,
      """SELECT user_id, start_vm, end_vm, run_len, mn
        |FROM graft_mr_events_prev
        |MATCH_RECOGNIZE (
        |  PARTITION BY user_id
        |  ORDER BY ts_sec, event_id
        |  MEASURES
        |    S.vm AS start_vm,
        |    LAST(R.vm) AS end_vm,
        |    COUNT(R.*) AS run_len,
        |    MATCH_NUMBER() AS mn
        |  ONE ROW PER MATCH
        |  AFTER MATCH SKIP PAST LAST ROW
        |  PATTERN (S R+)
        |  DEFINE R AS vm > PREV(vm)
        |)""".stripMargin)
  }

  /** `ALL ROWS PER MATCH` over the same ascending-run pattern as q65:
    * every matched row comes back with its RUNNING measures (count of R
    * rows so far, match number). The oracle expands each island to its
    * row range and derives the running count from row-number arithmetic.
    */
  val q66AllRows: Q = Q(
    "q66_all_rows",
    """WITH e AS (
      |  SELECT user_id, event_id,
      |    CAST(FLOOR(EPOCH(date_trunc('second', ts))) AS BIGINT) AS ts_sec,
      |    CAST(FLOOR(value * 1000 + 0.5) AS BIGINT) AS vm,
      |    ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY
      |      CAST(FLOOR(EPOCH(date_trunc('second', ts))) AS BIGINT), event_id) AS rn
      |  FROM events),
      |f AS (
      |  SELECT *, CASE WHEN vm > LAG(vm) OVER (
      |      PARTITION BY user_id ORDER BY rn) THEN 1 ELSE 0 END AS is_up
      |  FROM e),
      |isl AS (
      |  SELECT *, rn - ROW_NUMBER() OVER (
      |      PARTITION BY user_id ORDER BY rn) AS grp
      |  FROM f WHERE is_up = 1),
      |runs AS (
      |  SELECT user_id, MIN(rn) AS first_rn, MAX(rn) AS last_rn
      |  FROM isl GROUP BY user_id, grp),
      |rm AS (
      |  SELECT *, ROW_NUMBER() OVER (
      |      PARTITION BY user_id ORDER BY first_rn) AS mn
      |  FROM runs)
      |SELECT r.user_id, e.event_id, e.vm,
      |  CAST(GREATEST(e.rn - r.first_rn + 1, 0) AS BIGINT) AS r_so_far,
      |  r.mn
      |FROM rm r JOIN e
      |  ON e.user_id = r.user_id
      |  AND e.rn BETWEEN r.first_rn - 1 AND r.last_rn""".stripMargin) { (s, dir) =>
    Tables.load(s, dir, "events")
      .select(col("user_id"), col("event_id"),
        unix_timestamp(date_trunc("second", col("ts"))).as("ts_sec"),
        floor(col("value") * 1000d + 0.5d).cast("long").as("vm"))
      .createOrReplaceTempView("graft_mr_events_all")
    graft.harness.MatchRecognize.sql(s,
      """SELECT user_id, event_id, vm, r_so_far, mn
        |FROM graft_mr_events_all
        |MATCH_RECOGNIZE (
        |  PARTITION BY user_id
        |  ORDER BY ts_sec, event_id
        |  MEASURES COUNT(R.*) AS r_so_far, MATCH_NUMBER() AS mn
        |  ALL ROWS PER MATCH
        |  PATTERN (S R+)
        |  DEFINE R AS vm > PREV(vm)
        |)""".stripMargin)
  }

  /** MATCH_RECOGNIZE alternation: `(V C+ P | V P)` — view-clicks-
    * purchase, or a later-branch direct view-purchase. The two branches
    * together recognize exactly `V C* P`, so the oracle is q64's
    * next-non-click construction with the click floor dropped to zero
    * (`endrn > vrn` instead of `endrn > vrn + 1`) — while the Spark side
    * exercises real branch preference and fallback in the matcher.
    */
  val q67Alternation: Q = Q(
    "q67_alternation",
    """WITH e AS (
      |  SELECT user_id, event_id, event_type,
      |    CAST(FLOOR(EPOCH(date_trunc('second', ts))) AS BIGINT) AS ts_sec,
      |    ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY
      |      CAST(FLOOR(EPOCH(date_trunc('second', ts))) AS BIGINT), event_id) AS rn
      |  FROM events),
      |v AS (SELECT user_id, rn AS vrn, ts_sec AS start_sec FROM e
      |      WHERE event_type = 'view'),
      |nc AS (
      |  SELECT v.user_id, v.vrn, v.start_sec, MIN(e2.rn) AS endrn
      |  FROM v JOIN e e2 ON e2.user_id = v.user_id AND e2.rn > v.vrn
      |    AND e2.event_type <> 'click'
      |  GROUP BY 1, 2, 3),
      |m AS (
      |  SELECT n.user_id, n.vrn, n.start_sec, e3.ts_sec AS end_sec,
      |    n.endrn - n.vrn - 1 AS n_clicks
      |  FROM nc n JOIN e e3 ON e3.user_id = n.user_id AND e3.rn = n.endrn
      |  WHERE e3.event_type = 'purchase')
      |SELECT user_id, start_sec, end_sec, CAST(n_clicks AS BIGINT) AS n_clicks,
      |  ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY vrn) AS mn
      |FROM m""".stripMargin) { (s, dir) =>
    Tables.load(s, dir, "events")
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_timestamp(date_trunc("second", col("ts"))).as("ts_sec"))
      .createOrReplaceTempView("graft_mr_events_alt")
    graft.harness.MatchRecognize.sql(s,
      """SELECT user_id, start_sec, end_sec, n_clicks, mn
        |FROM graft_mr_events_alt
        |MATCH_RECOGNIZE (
        |  PARTITION BY user_id
        |  ORDER BY ts_sec, event_id
        |  MEASURES
        |    V.ts_sec AS start_sec,
        |    LAST(P.ts_sec) AS end_sec,
        |    COUNT(C.*) AS n_clicks,
        |    MATCH_NUMBER() AS mn
        |  ONE ROW PER MATCH
        |  AFTER MATCH SKIP PAST LAST ROW
        |  PATTERN (V C+ P | V P)
        |  DEFINE
        |    V AS event_type = 'view',
        |    C AS event_type = 'click',
        |    P AS event_type = 'purchase'
        |)""".stripMargin)
  }

  /** MATCH_RECOGNIZE with Flink's `WITHIN` duration bound: view → any
    * clicks → purchase, all inside two hours of the view. The bound
    * prunes DURING matching (rows past the window are ineligible), but
    * for `V C* P` that is equivalent to requiring the closing purchase
    * within the window (the oracle's form), since any out-of-window
    * click forces the first non-click past the window too.
    */
  val q68Within: Q = Q(
    "q68_within",
    """WITH e AS (
      |  SELECT user_id, event_id, event_type, epoch_ms(ts) AS ts_m,
      |    ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY
      |      epoch_ms(ts), event_id) AS rn
      |  FROM events),
      |v AS (SELECT user_id, rn AS vrn, ts_m AS start_ms FROM e
      |      WHERE event_type = 'view'),
      |nc AS (
      |  SELECT v.user_id, v.vrn, v.start_ms, MIN(e2.rn) AS endrn
      |  FROM v JOIN e e2 ON e2.user_id = v.user_id AND e2.rn > v.vrn
      |    AND e2.event_type <> 'click'
      |  GROUP BY 1, 2, 3),
      |m AS (
      |  SELECT n.user_id, n.vrn, n.start_ms, e3.ts_m AS end_ms,
      |    n.endrn - n.vrn - 1 AS n_clicks
      |  FROM nc n JOIN e e3 ON e3.user_id = n.user_id AND e3.rn = n.endrn
      |  WHERE e3.event_type = 'purchase' AND e3.ts_m - n.start_ms < 7200000)
      |SELECT user_id, start_ms, end_ms, CAST(n_clicks AS BIGINT) AS n_clicks,
      |  ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY vrn) AS mn
      |FROM m""".stripMargin) { (s, dir) =>
    Tables.load(s, dir, "events")
      .select(col("user_id"), col("event_id"), col("event_type"),
        expr("timestamp_millis(unix_millis(ts))").as("ts_m"))
      .createOrReplaceTempView("graft_mr_events_win")
    graft.harness.MatchRecognize.sql(s,
      """SELECT user_id, unix_millis(start_t) AS start_ms,
        |  unix_millis(end_t) AS end_ms, n_clicks, mn
        |FROM graft_mr_events_win
        |MATCH_RECOGNIZE (
        |  PARTITION BY user_id
        |  ORDER BY ts_m, event_id
        |  MEASURES
        |    V.ts_m AS start_t,
        |    LAST(P.ts_m) AS end_t,
        |    COUNT(C.*) AS n_clicks,
        |    MATCH_NUMBER() AS mn
        |  ONE ROW PER MATCH
        |  AFTER MATCH SKIP PAST LAST ROW
        |  PATTERN (V C* P) WITHIN INTERVAL '2' HOUR
        |  DEFINE
        |    V AS event_type = 'view',
        |    C AS event_type = 'click',
        |    P AS event_type = 'purchase'
        |)""".stripMargin)
  }

  /** `AFTER MATCH SKIP TO LAST B` chaining under the oracle: pattern
    * `(A B)` where A is any row and B rose vs the previous row, with the
    * match resuming AT each B row — so B starts the next match as its A.
    * The chained semantics make the result exactly "every adjacent
    * ascending pair", which the oracle states directly with one LAG.
    */
  val q69SkipChain: Q = Q(
    "q69_skip_chain",
    """WITH e AS (
      |  SELECT user_id, event_id,
      |    CAST(FLOOR(EPOCH(date_trunc('second', ts))) AS BIGINT) AS ts_sec,
      |    CAST(FLOOR(value * 1000 + 0.5) AS BIGINT) AS vm
      |  FROM events),
      |f AS (
      |  SELECT user_id, vm,
      |    LAG(vm) OVER (PARTITION BY user_id
      |      ORDER BY ts_sec, event_id) AS prev_vm
      |  FROM e)
      |SELECT user_id, prev_vm AS a_vm, vm AS b_vm
      |FROM f WHERE prev_vm IS NOT NULL AND vm > prev_vm""".stripMargin) { (s, dir) =>
    Tables.load(s, dir, "events")
      .select(col("user_id"), col("event_id"),
        unix_timestamp(date_trunc("second", col("ts"))).as("ts_sec"),
        floor(col("value") * 1000d + 0.5d).cast("long").as("vm"))
      .createOrReplaceTempView("graft_mr_events_chain")
    graft.harness.MatchRecognize.sql(s,
      """SELECT user_id, a_vm, b_vm
        |FROM graft_mr_events_chain
        |MATCH_RECOGNIZE (
        |  PARTITION BY user_id
        |  ORDER BY ts_sec, event_id
        |  MEASURES LAST(A.vm) AS a_vm, LAST(B.vm) AS b_vm
        |  ONE ROW PER MATCH
        |  AFTER MATCH SKIP TO LAST B
        |  PATTERN (A B)
        |  DEFINE B AS vm > PREV(vm)
        |)""".stripMargin)
  }

  /** MATCH_RECOGNIZE `CLASSIFIER()` under alternation — reports which
    * branch actually matched: `(V C+ | V P)` ends in a click run
    * (classifier C) or a view-purchase pair (classifier P). SQL:2016
    * semantics: under ONE ROW PER MATCH, CLASSIFIER() names the
    * variable of the match's LAST row. Consumed spans (view + clicks,
    * or view + purchase) contain no views, so every view row is an
    * independent candidate start — which is what makes the join-based
    * oracle exact.
    * Reference: Flink's MATCH_RECOGNIZE measure surface admitted by the
    * pass-through router (`SQLSubmitAction.java:76`).
    */
  val q72Classifier: Q = Q(
    "q72_classifier",
    """WITH e AS (
      |  SELECT user_id, event_id, event_type,
      |    CAST(FLOOR(EPOCH(date_trunc('second', ts))) AS BIGINT) AS ts_sec,
      |    ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY
      |      CAST(FLOOR(EPOCH(date_trunc('second', ts))) AS BIGINT), event_id) AS rn
      |  FROM events),
      |mx AS (SELECT user_id, MAX(rn) AS maxrn FROM e GROUP BY 1),
      |v AS (SELECT user_id, rn AS vrn, ts_sec AS start_sec FROM e
      |      WHERE event_type = 'view'),
      |nxt AS (
      |  SELECT v.user_id, v.vrn, v.start_sec, e2.event_type AS nt
      |  FROM v JOIN e e2 ON e2.user_id = v.user_id AND e2.rn = v.vrn + 1
      |  WHERE e2.event_type IN ('click', 'purchase')),
      |nc AS (
      |  SELECT n.user_id, n.vrn, n.start_sec, n.nt, MIN(e3.rn) AS endrn
      |  FROM nxt n LEFT JOIN e e3 ON e3.user_id = n.user_id
      |    AND e3.rn > n.vrn AND e3.event_type <> 'click'
      |  GROUP BY 1, 2, 3, 4),
      |m AS (
      |  SELECT nc.user_id, nc.vrn, nc.start_sec,
      |    CASE WHEN nc.nt = 'click' THEN 'C' ELSE 'P' END AS branch_var,
      |    CASE WHEN nc.nt = 'click'
      |      THEN COALESCE(nc.endrn, mx.maxrn + 1) - nc.vrn
      |      ELSE 2 END AS n_rows
      |  FROM nc JOIN mx ON mx.user_id = nc.user_id)
      |SELECT user_id, start_sec, branch_var,
      |  CAST(n_rows AS BIGINT) AS n_rows,
      |  ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY vrn) AS mn
      |FROM m""".stripMargin) { (s, dir) =>
    Tables.load(s, dir, "events")
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_timestamp(date_trunc("second", col("ts"))).as("ts_sec"))
      .createOrReplaceTempView("graft_mr_events_cls")
    graft.harness.MatchRecognize.sql(s,
      """SELECT user_id, start_sec, branch_var, n_rows, mn
        |FROM graft_mr_events_cls
        |MATCH_RECOGNIZE (
        |  PARTITION BY user_id
        |  ORDER BY ts_sec, event_id
        |  MEASURES
        |    V.ts_sec AS start_sec,
        |    CLASSIFIER() AS branch_var,
        |    COUNT(*) AS n_rows,
        |    MATCH_NUMBER() AS mn
        |  ONE ROW PER MATCH
        |  AFTER MATCH SKIP PAST LAST ROW
        |  PATTERN (V C+ | V P)
        |  DEFINE
        |    V AS event_type = 'view',
        |    C AS event_type = 'click',
        |    P AS event_type = 'purchase'
        |)""".stripMargin)
  }

  /** MATCH_RECOGNIZE cross-variable DEFINE (Flink CEP's canonical
    * shape, admitted via the pass-through router
    * `SQLSubmitAction.java:76`): a view followed by clicks whose value
    * stays BELOW the view's — `D AS event_type = 'click' AND
    * vm < FIRST(V.vm)` compares each candidate row against the match's
    * start row. Consumed spans (view + below-threshold clicks) contain
    * no views, so every view is an independent candidate start and the
    * join-based oracle is exact.
    */
  val q73CrossDefine: Q = Q(
    "q73_cross_define",
    """WITH e AS (
      |  SELECT user_id, event_id, event_type,
      |    CAST(FLOOR(value * 1000 + 0.5) AS BIGINT) AS vm,
      |    ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY
      |      CAST(FLOOR(EPOCH(date_trunc('second', ts))) AS BIGINT), event_id) AS rn
      |  FROM events),
      |mx AS (SELECT user_id, MAX(rn) AS maxrn FROM e GROUP BY 1),
      |v AS (SELECT user_id, rn AS vrn, vm AS v_vm FROM e
      |      WHERE event_type = 'view'),
      |nc AS (
      |  SELECT v.user_id, v.vrn, v.v_vm, MIN(e2.rn) AS endrn
      |  FROM v LEFT JOIN e e2 ON e2.user_id = v.user_id
      |    AND e2.rn > v.vrn
      |    AND NOT (e2.event_type = 'click' AND e2.vm < v.v_vm)
      |  GROUP BY 1, 2, 3),
      |m AS (
      |  SELECT nc.user_id, nc.vrn, nc.v_vm,
      |    COALESCE(nc.endrn, mx.maxrn + 1) - nc.vrn - 1 AS n_d
      |  FROM nc JOIN mx ON mx.user_id = nc.user_id)
      |SELECT user_id, v_vm AS start_vm, CAST(n_d AS BIGINT) AS n_d,
      |  ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY vrn) AS mn
      |FROM m WHERE n_d >= 1""".stripMargin) { (s, dir) =>
    Tables.load(s, dir, "events")
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_timestamp(date_trunc("second", col("ts"))).as("ts_sec"),
        floor(col("value") * 1000d + 0.5d).cast("long").as("vm"))
      .createOrReplaceTempView("graft_mr_events_cross")
    graft.harness.MatchRecognize.sql(s,
      """SELECT user_id, start_vm, n_d, mn
        |FROM graft_mr_events_cross
        |MATCH_RECOGNIZE (
        |  PARTITION BY user_id
        |  ORDER BY ts_sec, event_id
        |  MEASURES
        |    FIRST(V.vm) AS start_vm,
        |    COUNT(D.*) AS n_d,
        |    MATCH_NUMBER() AS mn
        |  ONE ROW PER MATCH
        |  AFTER MATCH SKIP PAST LAST ROW
        |  PATTERN (V D+)
        |  DEFINE
        |    V AS event_type = 'view',
        |    D AS event_type = 'click' AND vm < FIRST(V.vm)
        |)""".stripMargin)
  }

  /** MATCH_RECOGNIZE aggregate measures (Flink CEP's running-aggregate
    * surface, admitted via the pass-through router
    * `SQLSubmitAction.java:76`): `SUM/AVG/MIN/MAX(V.col)` over the rows
    * a match assigns to V — here over a quantified click run under
    * alternation, where the losing branch's variables aggregate to
    * NULL (SQL aggregate-over-empty discipline). AVG is stated in the
    * oracle as `CAST(SUM AS DOUBLE) / COUNT` — the exact long-sum-
    * then-one-division arithmetic the matcher uses, so the doubles are
    * bit-identical across engines (division is IEEE-exact; incremental
    * averaging is not).
    *
    * Same independence argument as q72: consumed spans (view + clicks,
    * or view + purchase) contain no views, so every view row is an
    * independent candidate start and the join-based oracle is exact.
    */
  val q74AggMeasures: Q = Q(
    "q74_agg_measures",
    """WITH e AS (
      |  SELECT user_id, event_id, event_type,
      |    CAST(FLOOR(value * 1000 + 0.5) AS BIGINT) AS vm,
      |    ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY
      |      CAST(FLOOR(EPOCH(date_trunc('second', ts))) AS BIGINT), event_id) AS rn
      |  FROM events),
      |mx AS (SELECT user_id, MAX(rn) AS maxrn FROM e GROUP BY 1),
      |v AS (SELECT user_id, rn AS vrn FROM e WHERE event_type = 'view'),
      |nxt AS (
      |  SELECT v.user_id, v.vrn, e2.event_type AS nt, e2.vm AS nvm
      |  FROM v JOIN e e2 ON e2.user_id = v.user_id AND e2.rn = v.vrn + 1
      |  WHERE e2.event_type IN ('click', 'purchase')),
      |nc AS (
      |  SELECT n.user_id, n.vrn, n.nt, n.nvm, MIN(e3.rn) AS endrn
      |  FROM nxt n LEFT JOIN e e3 ON e3.user_id = n.user_id
      |    AND e3.rn > n.vrn AND e3.event_type <> 'click'
      |  GROUP BY 1, 2, 3, 4),
      |m AS (
      |  SELECT nc.user_id, nc.vrn, nc.nt, nc.nvm,
      |    COALESCE(nc.endrn, mx.maxrn + 1) AS endx
      |  FROM nc JOIN mx ON mx.user_id = nc.user_id),
      |agg AS (
      |  SELECT m.user_id, m.vrn, m.nt, m.nvm, m.endx,
      |    SUM(c.vm) AS sum_c, MIN(c.vm) AS min_c,
      |    CAST(SUM(c.vm) AS DOUBLE) / COUNT(c.vm) AS avg_c
      |  FROM m LEFT JOIN e c ON c.user_id = m.user_id
      |    AND c.rn BETWEEN m.vrn + 1 AND m.endx - 1 AND m.nt = 'click'
      |  GROUP BY 1, 2, 3, 4, 5)
      |SELECT user_id,
      |  CASE WHEN nt = 'click' THEN CAST(sum_c AS BIGINT) END AS sum_c,
      |  CASE WHEN nt = 'click' THEN min_c END AS min_c,
      |  CASE WHEN nt = 'click' THEN avg_c END AS avg_c,
      |  CASE WHEN nt = 'purchase' THEN nvm END AS max_p,
      |  CAST(CASE WHEN nt = 'click' THEN endx - vrn ELSE 2 END
      |    AS BIGINT) AS n_rows,
      |  ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY vrn) AS mn
      |FROM agg""".stripMargin) { (s, dir) =>
    Tables.load(s, dir, "events")
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_timestamp(date_trunc("second", col("ts"))).as("ts_sec"),
        floor(col("value") * 1000d + 0.5d).cast("long").as("vm"))
      .createOrReplaceTempView("graft_mr_events_agg")
    graft.harness.MatchRecognize.sql(s,
      """SELECT user_id, sum_c, min_c, avg_c, max_p, n_rows, mn
        |FROM graft_mr_events_agg
        |MATCH_RECOGNIZE (
        |  PARTITION BY user_id
        |  ORDER BY ts_sec, event_id
        |  MEASURES
        |    SUM(C.vm) AS sum_c,
        |    MIN(C.vm) AS min_c,
        |    AVG(C.vm) AS avg_c,
        |    MAX(P.vm) AS max_p,
        |    COUNT(*) AS n_rows,
        |    MATCH_NUMBER() AS mn
        |  ONE ROW PER MATCH
        |  AFTER MATCH SKIP PAST LAST ROW
        |  PATTERN (V C+ | V P)
        |  DEFINE
        |    V AS event_type = 'view',
        |    C AS event_type = 'click',
        |    P AS event_type = 'purchase'
        |)""".stripMargin)
  }

  /** MATCH_RECOGNIZE `PREV` over an EXPRESSION (SQL:2016 / Flink admit
    * any scalar expression under PREV): maximal more-than-doubled runs
    * — `R AS vm > PREV(vm * 2)` navigates the physical previous row's
    * `vm * 2`. The oracle replays it as gaps-and-islands over
    * `vm > 2 * LAG(vm)` (LAG of an expression equals the expression of
    * LAG for a deterministic row-local expression), exactly the q65
    * island argument: one maximal block of rising rows is one greedy
    * `S R+` match.
    */
  val q75PrevExpr: Q = Q(
    "q75_prev_expr",
    """WITH e AS (
      |  SELECT user_id, event_id,
      |    CAST(FLOOR(EPOCH(date_trunc('second', ts))) AS BIGINT) AS ts_sec,
      |    CAST(FLOOR(value * 1000 + 0.5) AS BIGINT) AS vm,
      |    ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY
      |      CAST(FLOOR(EPOCH(date_trunc('second', ts))) AS BIGINT), event_id) AS rn
      |  FROM events),
      |f AS (
      |  SELECT *, CASE WHEN vm > 2 * LAG(vm) OVER (
      |      PARTITION BY user_id ORDER BY rn) THEN 1 ELSE 0 END AS is_up
      |  FROM e),
      |isl AS (
      |  SELECT *, rn - ROW_NUMBER() OVER (
      |      PARTITION BY user_id ORDER BY rn) AS grp
      |  FROM f WHERE is_up = 1),
      |runs AS (
      |  SELECT user_id, MIN(rn) AS first_rn, MAX(rn) AS last_rn,
      |    COUNT(*) AS run_len
      |  FROM isl GROUP BY user_id, grp)
      |SELECT r.user_id, hs.vm AS start_vm, he.vm AS end_vm,
      |  CAST(r.run_len AS BIGINT) AS run_len,
      |  ROW_NUMBER() OVER (PARTITION BY r.user_id ORDER BY r.first_rn) AS mn
      |FROM runs r
      |JOIN e hs ON hs.user_id = r.user_id AND hs.rn = r.first_rn - 1
      |JOIN e he ON he.user_id = r.user_id AND he.rn = r.last_rn""".stripMargin) { (s, dir) =>
    Tables.load(s, dir, "events")
      .select(col("user_id"), col("event_id"),
        unix_timestamp(date_trunc("second", col("ts"))).as("ts_sec"),
        floor(col("value") * 1000d + 0.5d).cast("long").as("vm"))
      .createOrReplaceTempView("graft_mr_events_pexpr")
    graft.harness.MatchRecognize.sql(s,
      """SELECT user_id, start_vm, end_vm, run_len, mn
        |FROM graft_mr_events_pexpr
        |MATCH_RECOGNIZE (
        |  PARTITION BY user_id
        |  ORDER BY ts_sec, event_id
        |  MEASURES
        |    S.vm AS start_vm,
        |    LAST(R.vm) AS end_vm,
        |    COUNT(R.*) AS run_len,
        |    MATCH_NUMBER() AS mn
        |  ONE ROW PER MATCH
        |  AFTER MATCH SKIP PAST LAST ROW
        |  PATTERN (S R+)
        |  DEFINE R AS vm > PREV(vm * 2)
        |)""".stripMargin)
  }

  /** MATCH_RECOGNIZE running aggregate in DEFINE (Flink CEP's budget /
    * stop-condition shape): after each view, C* greedily takes the
    * consecutive click rows while the RUNNING `SUM(C.vm)` — including
    * the candidate row, SQL:2016 running semantics — stays within the
    * budget. Anchoring at views keeps every match start independent
    * (consumed spans are view + clicks, never another view), so the
    * oracle replays it as a per-view prefix scan: the consecutive
    * click block after the view, cut at the first non-click, with a
    * window running sum; vm > 0 makes the running sum monotone, so
    * `cum <= budget` is exactly the greedy prefix the matcher takes.
    */
  val q76AggDefine: Q = Q(
    "q76_agg_define",
    """WITH e AS (
      |  SELECT user_id, event_id, event_type,
      |    CAST(FLOOR(value * 1000 + 0.5) AS BIGINT) AS vm,
      |    ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY
      |      CAST(FLOOR(EPOCH(date_trunc('second', ts))) AS BIGINT), event_id) AS rn
      |  FROM events),
      |v AS (SELECT user_id, rn AS vrn FROM e WHERE event_type = 'view'),
      |b AS (
      |  SELECT v.user_id, v.vrn, MIN(e2.rn) AS stoprn
      |  FROM v LEFT JOIN e e2 ON e2.user_id = v.user_id
      |    AND e2.rn > v.vrn AND e2.event_type <> 'click'
      |  GROUP BY 1, 2),
      |c AS (
      |  SELECT b.user_id, b.vrn, e3.vm,
      |    SUM(e3.vm) OVER (PARTITION BY b.user_id, b.vrn
      |      ORDER BY e3.rn) AS cum
      |  FROM b JOIN e e3 ON e3.user_id = b.user_id AND e3.rn > b.vrn
      |    AND (b.stoprn IS NULL OR e3.rn < b.stoprn)),
      |taken AS (
      |  SELECT user_id, vrn, COUNT(*) AS n_clicks, SUM(vm) AS spent
      |  FROM c WHERE cum <= 300000 GROUP BY 1, 2)
      |SELECT v.user_id,
      |  CAST(COALESCE(t.n_clicks, 0) AS BIGINT) AS n_clicks,
      |  CAST(t.spent AS BIGINT) AS spent,
      |  ROW_NUMBER() OVER (PARTITION BY v.user_id ORDER BY v.vrn) AS mn
      |FROM v LEFT JOIN taken t
      |  ON t.user_id = v.user_id AND t.vrn = v.vrn""".stripMargin) { (s, dir) =>
    Tables.load(s, dir, "events")
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_timestamp(date_trunc("second", col("ts"))).as("ts_sec"),
        floor(col("value") * 1000d + 0.5d).cast("long").as("vm"))
      .createOrReplaceTempView("graft_mr_events_budget")
    graft.harness.MatchRecognize.sql(s,
      """SELECT user_id, n_clicks, spent, mn
        |FROM graft_mr_events_budget
        |MATCH_RECOGNIZE (
        |  PARTITION BY user_id
        |  ORDER BY ts_sec, event_id
        |  MEASURES
        |    COUNT(C.*) AS n_clicks,
        |    SUM(C.vm) AS spent,
        |    MATCH_NUMBER() AS mn
        |  ONE ROW PER MATCH
        |  AFTER MATCH SKIP PAST LAST ROW
        |  PATTERN (V C*)
        |  DEFINE
        |    V AS event_type = 'view',
        |    C AS event_type = 'click' AND SUM(C.vm) <= 300000
        |)""".stripMargin)
  }

  /** MATCH_RECOGNIZE grouped sub-pattern (Flink CEP's retry-cycle
    * shape, admitted via the pass-through router
    * `SQLSubmitAction.java:76`): `(V C)+ P` — one or more view→click
    * pairs repeating as a unit, closed by a purchase. The variables'
    * predicates are disjoint (distinct event_type values), so the
    * greedy match from a start is deterministic: the maximal chain of
    * consecutive (view, click) pairs, which matches iff the row after
    * the chain is a purchase. A failed chain contains no viable
    * alternative start (any mid-chain start hits the same non-purchase
    * terminator), and a successful match consumes exactly chain + P,
    * so the oracle can enumerate pair-chains as gaps-and-islands over
    * pair-start row numbers (consecutive pair starts differ by 2) and
    * keep the chains a purchase row terminates — no sequential scan
    * needed.
    */
  val q77GroupPattern: Q = Q(
    "q77_group_pattern",
    """WITH e AS (
      |  SELECT user_id, event_id, event_type,
      |    CAST(FLOOR(value * 1000 + 0.5) AS BIGINT) AS vm,
      |    ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY
      |      CAST(FLOOR(EPOCH(date_trunc('second', ts))) AS BIGINT), event_id) AS rn
      |  FROM events),
      |p AS (
      |  SELECT a.user_id, a.rn
      |  FROM e a JOIN e b ON b.user_id = a.user_id AND b.rn = a.rn + 1
      |  WHERE a.event_type = 'view' AND b.event_type = 'click'),
      |isl AS (
      |  SELECT user_id, rn,
      |    rn - 2 * ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY rn) AS grp
      |  FROM p),
      |chains AS (
      |  SELECT user_id, grp, MIN(rn) AS first_rn, MAX(rn) + 1 AS last_rn,
      |    COUNT(*) AS n_pairs
      |  FROM isl GROUP BY 1, 2),
      |m AS (
      |  SELECT c.user_id, c.first_rn, c.last_rn, c.n_pairs, pe.vm AS p_vm
      |  FROM chains c JOIN e pe ON pe.user_id = c.user_id
      |    AND pe.rn = c.last_rn + 1 AND pe.event_type = 'purchase'),
      |sums AS (
      |  SELECT m.user_id, m.first_rn, m.n_pairs, m.p_vm,
      |    SUM(cc.vm) AS sum_c
      |  FROM m JOIN e cc ON cc.user_id = m.user_id
      |    AND cc.rn BETWEEN m.first_rn AND m.last_rn
      |    AND cc.event_type = 'click'
      |  GROUP BY 1, 2, 3, 4)
      |SELECT user_id, CAST(n_pairs AS BIGINT) AS n_pairs,
      |  CAST(sum_c AS BIGINT) AS sum_c, p_vm,
      |  ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY first_rn) AS mn
      |FROM sums""".stripMargin) { (s, dir) =>
    Tables.load(s, dir, "events")
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_timestamp(date_trunc("second", col("ts"))).as("ts_sec"),
        floor(col("value") * 1000d + 0.5d).cast("long").as("vm"))
      .createOrReplaceTempView("graft_mr_events_grp")
    graft.harness.MatchRecognize.sql(s,
      """SELECT user_id, n_pairs, sum_c, p_vm, mn
        |FROM graft_mr_events_grp
        |MATCH_RECOGNIZE (
        |  PARTITION BY user_id
        |  ORDER BY ts_sec, event_id
        |  MEASURES
        |    COUNT(V.*) AS n_pairs,
        |    SUM(C.vm) AS sum_c,
        |    P.vm AS p_vm,
        |    MATCH_NUMBER() AS mn
        |  ONE ROW PER MATCH
        |  AFTER MATCH SKIP PAST LAST ROW
        |  PATTERN ((V C)+ P)
        |  DEFINE
        |    V AS event_type = 'view',
        |    C AS event_type = 'click',
        |    P AS event_type = 'purchase'
        |)""".stripMargin)
  }

  /** MATCH_RECOGNIZE logical-offset navigation and RUNNING/FINAL
    * measure keywords (SQL:2016 / Flink's full measure surface,
    * admitted via the pass-through router `SQLSubmitAction.java:76`):
    * `FIRST(C.vm, 1)` is the match's SECOND click and `LAST(C.vm, 1)`
    * its second-to-last (NULL when the run has fewer than two clicks
    * — offset past the assignment list, Flink's behavior); `FINAL
    * COUNT(C.*)` exercises the keyword path (≡ RUNNING under ONE ROW
    * PER MATCH). Same greedy view→clicks→purchase replay as q64: the
    * click run is the rows strictly between the view and the first
    * non-click, positioned by row number in the oracle.
    */
  val q78OffsetMeasures: Q = Q(
    "q78_offset_measures",
    """WITH e AS (
      |  SELECT user_id, event_id, event_type,
      |    CAST(FLOOR(value * 1000 + 0.5) AS BIGINT) AS vm,
      |    ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY
      |      CAST(FLOOR(EPOCH(date_trunc('second', ts))) AS BIGINT), event_id) AS rn
      |  FROM events),
      |v AS (SELECT user_id, rn AS vrn FROM e WHERE event_type = 'view'),
      |nc AS (
      |  SELECT v.user_id, v.vrn, MIN(e2.rn) AS endrn
      |  FROM v JOIN e e2 ON e2.user_id = v.user_id AND e2.rn > v.vrn
      |    AND e2.event_type <> 'click'
      |  GROUP BY 1, 2),
      |m AS (
      |  SELECT n.user_id, n.vrn, n.endrn, n.endrn - n.vrn - 1 AS n_clicks
      |  FROM nc n JOIN e e3 ON e3.user_id = n.user_id AND e3.rn = n.endrn
      |  WHERE e3.event_type = 'purchase' AND n.endrn > n.vrn + 1)
      |SELECT m.user_id,
      |  c2.vm AS second_vm, cp.vm AS penult_vm,
      |  CAST(m.n_clicks AS BIGINT) AS n_clicks,
      |  ROW_NUMBER() OVER (PARTITION BY m.user_id ORDER BY m.vrn) AS mn
      |FROM m
      |LEFT JOIN e c2 ON c2.user_id = m.user_id AND c2.rn = m.vrn + 2
      |  AND m.n_clicks >= 2
      |LEFT JOIN e cp ON cp.user_id = m.user_id AND cp.rn = m.endrn - 2
      |  AND m.n_clicks >= 2""".stripMargin) { (s, dir) =>
    Tables.load(s, dir, "events")
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_timestamp(date_trunc("second", col("ts"))).as("ts_sec"),
        floor(col("value") * 1000d + 0.5d).cast("long").as("vm"))
      .createOrReplaceTempView("graft_mr_events_off")
    graft.harness.MatchRecognize.sql(s,
      """SELECT user_id, second_vm, penult_vm, n_clicks, mn
        |FROM graft_mr_events_off
        |MATCH_RECOGNIZE (
        |  PARTITION BY user_id
        |  ORDER BY ts_sec, event_id
        |  MEASURES
        |    FIRST(C.vm, 1) AS second_vm,
        |    LAST(C.vm, 1) AS penult_vm,
        |    FINAL COUNT(C.*) AS n_clicks,
        |    MATCH_NUMBER() AS mn
        |  ONE ROW PER MATCH
        |  AFTER MATCH SKIP PAST LAST ROW
        |  PATTERN (V C+ P)
        |  DEFINE
        |    V AS event_type = 'view',
        |    C AS event_type = 'click',
        |    P AS event_type = 'purchase'
        |)""".stripMargin)
  }

  def all: Seq[Q] = Seq(
    q27Tumble, q28Hop, q29Sessionize, q30AsofJoin, q31IntervalJoin,
    q32Json, q33Pivot, q43Cumulate, q52Retention, q53Funnel, q56Temporal,
    q57JsonSchema, q58TumbleTvf, q59HopTvf, q60CumulateTvf, q61LegacyTumble,
    q62SessionTvf, q63LegacyHop, q64MatchRecognize, q65PrevPattern,
    q66AllRows, q67Alternation, q68Within, q69SkipChain, q72Classifier,
    q73CrossDefine, q74AggMeasures, q75PrevExpr, q76AggDefine,
    q77GroupPattern, q78OffsetMeasures)
}
