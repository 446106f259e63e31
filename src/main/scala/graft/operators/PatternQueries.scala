package graft.operators

import org.apache.spark.sql.functions._

/** The MATCH_RECOGNIZE oracle-query surface (SQL:2016 row-pattern
  * recognition, the CEP SQL Flink's pass-through router admits —
  * `SQLSubmitAction.java:76`), split from [[Events]] so the event-window
  * and pattern surfaces stay individually reviewable. All queries run
  * through the harness subset in [[graft.harness.MatchRecognize]].
  */
object PatternQueries {
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
    * window running sum. The prefix argument needs the running sum
    * MONOTONE, so vm derives from ABS(value) on BOTH sides — a
    * testdata change emitting negative values then cannot make oracle
    * and matcher legitimately diverge (a negative addend would let
    * `cum <= budget` re-enter after the greedy matcher stopped).
    */
  val q76AggDefine: Q = Q(
    "q76_agg_define",
    """WITH e AS (
      |  SELECT user_id, event_id, event_type,
      |    CAST(FLOOR(ABS(value) * 1000 + 0.5) AS BIGINT) AS vm,
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
        floor(abs(col("value")) * 1000d + 0.5d).cast("long").as("vm"))
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

  /** MATCH_RECOGNIZE `NEXT` forward navigation (SQL:2016 / Flink admit
    * PREV and NEXT symmetrically): local value peaks per user — a row
    * strictly above BOTH physical neighbors. NEXT precomputes as
    * `lead` exactly as PREV precomputes as `lag`, so the oracle is the
    * direct LAG/LEAD restatement; partition-edge rows have a NULL
    * neighbor, the predicate is unknown, and they never match (both
    * engines). Single-row matches cannot interfere under SKIP PAST
    * LAST ROW: neighbors of a peak are strictly below it and so are
    * never peaks themselves.
    */
  val q79NextNav: Q = Q(
    "q79_next_nav",
    """WITH e AS (
      |  SELECT user_id, event_id,
      |    CAST(FLOOR(value * 1000 + 0.5) AS BIGINT) AS vm,
      |    ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY
      |      CAST(FLOOR(EPOCH(date_trunc('second', ts))) AS BIGINT), event_id) AS rn
      |  FROM events),
      |n AS (
      |  SELECT user_id, event_id, vm, rn,
      |    LAG(vm) OVER (PARTITION BY user_id ORDER BY rn) AS prev_vm,
      |    LEAD(vm) OVER (PARTITION BY user_id ORDER BY rn) AS next_vm
      |  FROM e)
      |SELECT user_id, event_id, vm AS peak_vm,
      |  ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY rn) AS mn
      |FROM n WHERE vm > prev_vm AND vm > next_vm""".stripMargin) { (s, dir) =>
    Tables.load(s, dir, "events")
      .select(col("user_id"), col("event_id"),
        unix_timestamp(date_trunc("second", col("ts"))).as("ts_sec"),
        floor(col("value") * 1000d + 0.5d).cast("long").as("vm"))
      .createOrReplaceTempView("graft_mr_events_next")
    graft.harness.MatchRecognize.sql(s,
      """SELECT user_id, event_id, peak_vm, mn
        |FROM graft_mr_events_next
        |MATCH_RECOGNIZE (
        |  PARTITION BY user_id
        |  ORDER BY ts_sec, event_id
        |  MEASURES
        |    P.event_id AS event_id,
        |    P.vm AS peak_vm,
        |    MATCH_NUMBER() AS mn
        |  ONE ROW PER MATCH
        |  AFTER MATCH SKIP PAST LAST ROW
        |  PATTERN (P)
        |  DEFINE P AS vm > PREV(vm) AND vm > NEXT(vm)
        |)""".stripMargin)
  }

  /** MATCH_RECOGNIZE alternation INSIDE a grouped sub-pattern (Flink
    * CEP's "repeat either step" retry shape, admitted via the
    * pass-through router `SQLSubmitAction.java:76`): `V (C | P)+` — a
    * view followed by one or more rows, each a click or a purchase,
    * taken greedily until the first row that is neither. The branch
    * variables' predicates are disjoint, so the greedy run is
    * deterministic: exactly the consecutive click-or-purchase block
    * after the view (branch-preference order is exercised separately
    * by the randomized regex-oracle property spec). Consumed spans
    * contain no views, so every view is an independent candidate start
    * and the oracle can state the block directly: the rows strictly
    * between the view and its first following non-click-non-purchase
    * row, kept when non-empty.
    */
  val q80AltGroup: Q = Q(
    "q80_alt_group",
    """WITH e AS (
      |  SELECT user_id, event_id, event_type,
      |    ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY
      |      CAST(FLOOR(EPOCH(date_trunc('second', ts))) AS BIGINT), event_id) AS rn
      |  FROM events),
      |v AS (SELECT user_id, rn AS vrn FROM e WHERE event_type = 'view'),
      |stop AS (
      |  SELECT v.user_id, v.vrn, MIN(e2.rn) AS stoprn
      |  FROM v LEFT JOIN e e2 ON e2.user_id = v.user_id AND e2.rn > v.vrn
      |    AND e2.event_type NOT IN ('click', 'purchase')
      |  GROUP BY 1, 2),
      |mx AS (SELECT user_id, MAX(rn) AS maxrn FROM e GROUP BY 1),
      |m AS (
      |  SELECT s.user_id, s.vrn, COALESCE(s.stoprn, mx.maxrn + 1) AS endx
      |  FROM stop s JOIN mx ON mx.user_id = s.user_id),
      |agg AS (
      |  SELECT m.user_id, m.vrn, m.endx,
      |    SUM(CASE WHEN c.event_type = 'click' THEN 1 ELSE 0 END) AS n_clicks,
      |    SUM(CASE WHEN c.event_type = 'purchase' THEN 1 ELSE 0 END) AS n_purch
      |  FROM m JOIN e c ON c.user_id = m.user_id
      |    AND c.rn BETWEEN m.vrn + 1 AND m.endx - 1
      |  GROUP BY 1, 2, 3)
      |SELECT user_id, CAST(n_clicks AS BIGINT) AS n_clicks,
      |  CAST(n_purch AS BIGINT) AS n_purch,
      |  CAST(endx - vrn AS BIGINT) AS n_rows,
      |  ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY vrn) AS mn
      |FROM agg""".stripMargin) { (s, dir) =>
    Tables.load(s, dir, "events")
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_timestamp(date_trunc("second", col("ts"))).as("ts_sec"))
      .createOrReplaceTempView("graft_mr_events_altgrp")
    graft.harness.MatchRecognize.sql(s,
      """SELECT user_id, n_clicks, n_purch, n_rows, mn
        |FROM graft_mr_events_altgrp
        |MATCH_RECOGNIZE (
        |  PARTITION BY user_id
        |  ORDER BY ts_sec, event_id
        |  MEASURES
        |    COUNT(C.*) AS n_clicks,
        |    COUNT(P.*) AS n_purch,
        |    COUNT(*) AS n_rows,
        |    MATCH_NUMBER() AS mn
        |  ONE ROW PER MATCH
        |  AFTER MATCH SKIP PAST LAST ROW
        |  PATTERN (V (C | P)+)
        |  DEFINE
        |    V AS event_type = 'view',
        |    C AS event_type = 'click',
        |    P AS event_type = 'purchase'
        |)""".stripMargin)
  }

  /** SQL:2016 `SUBSET` union variables: `U = (C, P)` names the rows
    * assigned to ANY member, readable wherever a pattern variable is —
    * here in MEASURES (`FIRST/SUM/MIN/COUNT` over U = the clicks plus
    * the closing purchase) and in DEFINE (`P AS ... vm > FIRST(W.vm)`
    * with `W = (V, C)`: the first row of W's running assignment is the
    * opening view row, so the purchase must beat the view's value).
    * The matcher resolves union variables as OR-bitmasks over the
    * primary assignment — one code path for both (see
    * `MatchRecognize.maskOf`).
    *
    * Oracle: the q64 relational form with the extra qualifying
    * condition. A match is a view row whose FIRST following non-click
    * (rank order) is a purchase with `vm > view's vm` at rank ≥
    * start+2; interior rows are clicks, so candidates never overlap
    * and the greedy NFA agrees with the relational form. U's rows are
    * then exactly ranks (vrn, endrn], and W's first row is the view
    * itself.
    */
  val q81Subset: Q = Q(
    "q81_subset",
    """WITH e AS (
      |  SELECT user_id, event_id, event_type,
      |    CAST(FLOOR(value * 1000 + 0.5) AS BIGINT) AS vm,
      |    ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY
      |      CAST(FLOOR(EPOCH(date_trunc('second', ts))) AS BIGINT), event_id) AS rn
      |  FROM events),
      |v AS (SELECT user_id, rn AS vrn, vm AS vvm FROM e
      |      WHERE event_type = 'view'),
      |nc AS (
      |  SELECT v.user_id, v.vrn, v.vvm, MIN(e2.rn) AS endrn
      |  FROM v JOIN e e2 ON e2.user_id = v.user_id AND e2.rn > v.vrn
      |    AND e2.event_type <> 'click'
      |  GROUP BY 1, 2, 3),
      |m AS (
      |  SELECT n.user_id, n.vrn, n.endrn
      |  FROM nc n JOIN e e3 ON e3.user_id = n.user_id AND e3.rn = n.endrn
      |  WHERE e3.event_type = 'purchase' AND n.endrn > n.vrn + 1
      |    AND e3.vm > n.vvm),
      |agg AS (
      |  SELECT m.user_id, m.vrn,
      |    CAST(SUM(u.vm) AS BIGINT) AS u_sum, MIN(u.vm) AS u_min,
      |    CAST(COUNT(*) AS BIGINT) AS u_cnt
      |  FROM m JOIN e u ON u.user_id = m.user_id
      |    AND u.rn > m.vrn AND u.rn <= m.endrn
      |  GROUP BY 1, 2)
      |SELECT a.user_id, f.vm AS u_first, a.u_sum, a.u_min, a.u_cnt,
      |  ROW_NUMBER() OVER (PARTITION BY a.user_id ORDER BY a.vrn) AS mn
      |FROM agg a JOIN e f ON f.user_id = a.user_id
      |  AND f.rn = a.vrn + 1""".stripMargin) { (s, dir) =>
    Tables.load(s, dir, "events")
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_timestamp(date_trunc("second", col("ts"))).as("ts_sec"),
        floor(col("value") * 1000d + 0.5d).cast("long").as("vm"))
      .createOrReplaceTempView("graft_mr_events_subset")
    graft.harness.MatchRecognize.sql(s,
      """SELECT user_id, u_first, u_sum, u_min, u_cnt, mn
        |FROM graft_mr_events_subset
        |MATCH_RECOGNIZE (
        |  PARTITION BY user_id
        |  ORDER BY ts_sec, event_id
        |  MEASURES
        |    FIRST(U.vm) AS u_first,
        |    SUM(U.vm) AS u_sum,
        |    MIN(U.vm) AS u_min,
        |    COUNT(U.*) AS u_cnt,
        |    MATCH_NUMBER() AS mn
        |  ONE ROW PER MATCH
        |  AFTER MATCH SKIP PAST LAST ROW
        |  PATTERN (V C+ P)
        |  SUBSET U = (C, P), W = (V, C)
        |  DEFINE
        |    V AS event_type = 'view',
        |    C AS event_type = 'click',
        |    P AS event_type = 'purchase' AND vm > FIRST(W.vm)
        |)""".stripMargin)
  }

  /** MATCH_RECOGNIZE logical-offset navigation in DEFINE (SQL:2016 /
    * Flink admit `FIRST/LAST(V.col, k)` in DEFINE as well as MEASURES):
    * two consecutive clicks followed by purchases, each required to
    * exceed the SECOND click's value — `P AS event_type = 'purchase'
    * AND vm > FIRST(C.vm, 1)` navigates C's running assignment with
    * offset 1. C's assignment is complete before P's run starts, so the
    * threshold is fixed per match and the oracle can enumerate
    * candidates directly: positions a with clicks at (a, a+1) and a
    * qualifying purchase at a+2, taking the maximal qualifying-purchase
    * run. A three-click prefix shifts the match to the LAST two clicks
    * (the earlier pair fails P+ on the third click), and consumed spans
    * contain no other click pairs, so candidates are independent.
    */
  val q82DefineOffset: Q = Q(
    "q82_define_offset",
    """WITH e AS (
      |  SELECT user_id, event_id, event_type,
      |    CAST(FLOOR(value * 1000 + 0.5) AS BIGINT) AS vm,
      |    ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY
      |      CAST(FLOOR(EPOCH(date_trunc('second', ts))) AS BIGINT), event_id) AS rn
      |  FROM events),
      |mx AS (SELECT user_id, MAX(rn) AS maxrn FROM e GROUP BY 1),
      |cand AS (
      |  SELECT a.user_id, a.rn AS arn, b.vm AS c2vm
      |  FROM e a
      |  JOIN e b ON b.user_id = a.user_id AND b.rn = a.rn + 1
      |  JOIN e p ON p.user_id = a.user_id AND p.rn = a.rn + 2
      |  WHERE a.event_type = 'click' AND b.event_type = 'click'
      |    AND p.event_type = 'purchase' AND p.vm > b.vm),
      |stop AS (
      |  SELECT c.user_id, c.arn, c.c2vm, MIN(s.rn) AS stoprn
      |  FROM cand c LEFT JOIN e s ON s.user_id = c.user_id
      |    AND s.rn > c.arn + 1
      |    AND NOT (s.event_type = 'purchase' AND s.vm > c.c2vm)
      |  GROUP BY 1, 2, 3),
      |m AS (
      |  SELECT st.user_id, st.arn, st.c2vm,
      |    COALESCE(st.stoprn, mx.maxrn + 1) AS endx
      |  FROM stop st JOIN mx ON mx.user_id = st.user_id),
      |lastp AS (
      |  SELECT m.user_id, m.arn, m.c2vm, m.endx - m.arn - 2 AS n_p,
      |    lp.vm AS last_p
      |  FROM m JOIN e lp ON lp.user_id = m.user_id AND lp.rn = m.endx - 1)
      |SELECT user_id, c2vm AS c2_vm, CAST(n_p AS BIGINT) AS n_p, last_p,
      |  ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY arn) AS mn
      |FROM lastp""".stripMargin) { (s, dir) =>
    Tables.load(s, dir, "events")
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_timestamp(date_trunc("second", col("ts"))).as("ts_sec"),
        floor(col("value") * 1000d + 0.5d).cast("long").as("vm"))
      .createOrReplaceTempView("graft_mr_events_defoff")
    graft.harness.MatchRecognize.sql(s,
      """SELECT user_id, c2_vm, n_p, last_p, mn
        |FROM graft_mr_events_defoff
        |MATCH_RECOGNIZE (
        |  PARTITION BY user_id
        |  ORDER BY ts_sec, event_id
        |  MEASURES
        |    FIRST(C.vm, 1) AS c2_vm,
        |    COUNT(P.*) AS n_p,
        |    LAST(P.vm) AS last_p,
        |    MATCH_NUMBER() AS mn
        |  ONE ROW PER MATCH
        |  AFTER MATCH SKIP PAST LAST ROW
        |  PATTERN (C{2} P+)
        |  DEFINE
        |    C AS event_type = 'click',
        |    P AS event_type = 'purchase' AND vm > FIRST(C.vm, 1)
        |)""".stripMargin)
  }

  /** Nested PREV/NEXT navigation in DEFINE (Flink CEP admits composed
    * navigation like `PREV(price + PREV(price))` — a smoothing
    * predicate): rows whose value exceeds the sum of the two previous
    * rows' values. The batch rewrite stages the inner `PREV(vm)` as
    * its own lag column and composes the outer call over it (see
    * `MatchRecognize.translateNav`).
    *
    * Oracle: the predicate is physical-row navigation only —
    * `vm > LAG(vm, 1) + LAG(vm, 2)` per user in rank order — and the
    * single-variable pattern emits one row per matching row (SKIP PAST
    * LAST ROW over one-row matches never overlaps), so the relational
    * form is a direct filter + ROW_NUMBER.
    */
  val q83NestedNav: Q = Q(
    "q83_nested_nav",
    """WITH e AS (
      |  SELECT user_id, event_id,
      |    CAST(FLOOR(value * 1000 + 0.5) AS BIGINT) AS vm,
      |    ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY
      |      CAST(FLOOR(EPOCH(date_trunc('second', ts))) AS BIGINT), event_id) AS rn
      |  FROM events),
      |f AS (
      |  SELECT user_id, vm, rn,
      |    LAG(vm, 1) OVER (PARTITION BY user_id ORDER BY rn) AS p1,
      |    LAG(vm, 2) OVER (PARTITION BY user_id ORDER BY rn) AS p2
      |  FROM e)
      |SELECT user_id, vm AS rvm,
      |  ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY rn) AS mn
      |FROM f
      |WHERE p1 IS NOT NULL AND p2 IS NOT NULL AND vm > p1 + p2""".stripMargin) { (s, dir) =>
    Tables.load(s, dir, "events")
      .select(col("user_id"), col("event_id"),
        unix_timestamp(date_trunc("second", col("ts"))).as("ts_sec"),
        floor(col("value") * 1000d + 0.5d).cast("long").as("vm"))
      .createOrReplaceTempView("graft_mr_events_nestednav")
    graft.harness.MatchRecognize.sql(s,
      """SELECT user_id, rvm, mn
        |FROM graft_mr_events_nestednav
        |MATCH_RECOGNIZE (
        |  PARTITION BY user_id
        |  ORDER BY ts_sec, event_id
        |  MEASURES
        |    LAST(R.vm) AS rvm,
        |    MATCH_NUMBER() AS mn
        |  ONE ROW PER MATCH
        |  AFTER MATCH SKIP PAST LAST ROW
        |  PATTERN (R)
        |  DEFINE R AS vm > PREV(vm + PREV(vm))
        |)""".stripMargin)
  }

  /** Expression MEASURES (SQL:2016 admits any scalar expression over
    * navigation atoms; Flink passes them through): the q64 match shape
    * measuring a value delta (`LAST(P.vm) - FIRST(C.vm)`), a CASE
    * label over `COUNT(C.*)`, and an arithmetic mix of a running
    * aggregate with a bare variable reference. Atoms compute in the
    * matcher exactly like bare measures; the expressions project after
    * (see `MatchRecognize.ExprMeasure`).
    *
    * Oracle: the q64 relational form extended with the same scalar
    * arithmetic over the per-match aggregates.
    */
  val q84ExprMeasures: Q = Q(
    "q84_expr_measures",
    """WITH e AS (
      |  SELECT user_id, event_id, event_type,
      |    CAST(FLOOR(value * 1000 + 0.5) AS BIGINT) AS vm,
      |    ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY
      |      CAST(FLOOR(EPOCH(date_trunc('second', ts))) AS BIGINT), event_id) AS rn
      |  FROM events),
      |v AS (SELECT user_id, rn AS vrn, vm AS vvm FROM e
      |      WHERE event_type = 'view'),
      |nc AS (
      |  SELECT v.user_id, v.vrn, v.vvm, MIN(e2.rn) AS endrn
      |  FROM v JOIN e e2 ON e2.user_id = v.user_id AND e2.rn > v.vrn
      |    AND e2.event_type <> 'click'
      |  GROUP BY 1, 2, 3),
      |m AS (
      |  SELECT n.user_id, n.vrn, n.vvm, n.endrn, e3.vm AS pvm
      |  FROM nc n JOIN e e3 ON e3.user_id = n.user_id AND e3.rn = n.endrn
      |  WHERE e3.event_type = 'purchase' AND n.endrn > n.vrn + 1),
      |agg AS (
      |  SELECT m.user_id, m.vrn, m.vvm, m.pvm,
      |    CAST(SUM(c.vm) AS BIGINT) AS csum, COUNT(*) AS ncl,
      |    MIN(CASE WHEN c.rn = m.vrn + 1 THEN c.vm END) AS firstc
      |  FROM m JOIN e c ON c.user_id = m.user_id
      |    AND c.rn > m.vrn AND c.rn < m.endrn
      |  GROUP BY 1, 2, 3, 4)
      |SELECT user_id, pvm - firstc AS delta,
      |  CASE WHEN ncl > 2 THEN 'long' ELSE 'short' END AS label,
      |  csum + vvm AS wsum,
      |  ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY vrn) AS mn
      |FROM agg""".stripMargin) { (s, dir) =>
    Tables.load(s, dir, "events")
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_timestamp(date_trunc("second", col("ts"))).as("ts_sec"),
        floor(col("value") * 1000d + 0.5d).cast("long").as("vm"))
      .createOrReplaceTempView("graft_mr_events_exprm")
    graft.harness.MatchRecognize.sql(s,
      """SELECT user_id, delta, label, wsum, mn
        |FROM graft_mr_events_exprm
        |MATCH_RECOGNIZE (
        |  PARTITION BY user_id
        |  ORDER BY ts_sec, event_id
        |  MEASURES
        |    LAST(P.vm) - FIRST(C.vm) AS delta,
        |    CASE WHEN COUNT(C.*) > 2 THEN 'long' ELSE 'short' END AS label,
        |    SUM(C.vm) + V.vm AS wsum,
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

  /** `MATCH_ROWTIME()` (r18): Flink's event-time measure — the rowtime
    * of the match's last row, which in the `V C+ P` funnel is the
    * purchase's second. The oracle is q64's relational restatement
    * with the match end projected as the measure (epoch seconds, the
    * house timestamp-compare convention); the Spark side takes the
    * TIMESTAMP measure and converts in the outer select, exercising
    * the ascending-TIMESTAMP-head contract the measure requires.
    */
  val q118MatchRowtime: Q = Q(
    "q118_match_rowtime",
    """WITH e AS (
      |  SELECT user_id, event_id, event_type,
      |    CAST(FLOOR(EPOCH(date_trunc('second', ts))) AS BIGINT) AS ts_sec,
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
      |  SELECT n.user_id, e3.ts_sec AS mrt_sec,
      |    n.endrn - n.vrn - 1 AS n_clicks
      |  FROM nc n JOIN e e3 ON e3.user_id = n.user_id AND e3.rn = n.endrn
      |  WHERE e3.event_type = 'purchase' AND n.endrn > n.vrn + 1)
      |SELECT user_id, mrt_sec, CAST(n_clicks AS BIGINT) AS n_clicks
      |FROM m""".stripMargin) { (s, dir) =>
    Tables.load(s, dir, "events")
      .select(col("user_id"), col("event_id"), col("event_type"),
        date_trunc("second", col("ts")).as("tst"))
      .createOrReplaceTempView("graft_mr_events_rt")
    graft.harness.MatchRecognize.sql(s,
      """SELECT user_id, CAST(unix_timestamp(mrt) AS BIGINT) AS mrt_sec,
        |  n_clicks
        |FROM graft_mr_events_rt
        |MATCH_RECOGNIZE (
        |  PARTITION BY user_id
        |  ORDER BY tst, event_id
        |  MEASURES
        |    MATCH_ROWTIME() AS mrt,
        |    COUNT(C.*) AS n_clicks
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
    q64MatchRecognize, q65PrevPattern, q66AllRows, q67Alternation,
    q68Within, q69SkipChain, q72Classifier, q73CrossDefine,
    q74AggMeasures, q75PrevExpr, q76AggDefine, q77GroupPattern,
    q78OffsetMeasures, q79NextNav, q80AltGroup, q81Subset,
    q82DefineOffset, q83NestedNav, q84ExprMeasures, q118MatchRowtime)
}
