package graft.operators

import org.apache.spark.sql.functions._

/** Additional relational-surface coverage: CUBE, correlated subqueries
  * (decorrelation), array functions, date formatting, multi-CTE reuse
  * (SURVEY.md §2.C pass-through rows).
  */
object Coverage {

  /** CUBE over two keys (all 4 grouping combinations). */
  val q34Cube: Q = Q(
    "q34_cube",
    """SELECT COALESCE(o_orderstatus, '<all>') AS status,
      |  COALESCE(o_orderpriority, '<all>') AS priority,
      |  COUNT(*) AS cnt
      |FROM orders
      |GROUP BY CUBE(o_orderstatus, o_orderpriority)""".stripMargin) { (s, dir) =>
    Tables.load(s, dir, "orders")
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("cnt"))
      .select(
        coalesce(col("o_orderstatus"), lit("<all>")).as("status"),
        coalesce(col("o_orderpriority"), lit("<all>")).as("priority"),
        col("cnt"))
  }

  /** Correlated scalar subquery (Catalyst decorrelates to an agg+join):
    * customers above twice their nation's deterministic average balance.
    */
  val q35Correlated: Q = Q(
    "q35_correlated",
    """SELECT c_custkey, c_nationkey
      |FROM customer c
      |WHERE c_acctbal > 2 * (
      |  SELECT SUM(CAST(FLOOR((c2.c_acctbal) * 100 + 0.5) AS BIGINT)) / 100.0 / COUNT(*)
      |  FROM customer c2 WHERE c2.c_nationkey = c.c_nationkey)""".stripMargin) { (s, dir) =>
    Tables.registerAll(s, dir)
    s.sql(
      """SELECT c_custkey, c_nationkey
        |FROM customer c
        |WHERE c_acctbal > 2 * (
        |  SELECT SUM(CAST(FLOOR((c2.c_acctbal) * 100 + 0.5D) AS BIGINT)) / 100.0D / COUNT(*)
        |  FROM customer c2 WHERE c2.c_nationkey = c.c_nationkey)""".stripMargin)
  }

  /** Array function surface over the embedding column: size, element
    * access, quantized element values.
    */
  val q36ArrayFns: Q = Q(
    "q36_array_fns",
    """SELECT vec_id,
      |  LEN(embedding) AS dim,
      |  CAST(FLOOR((CAST(embedding[1] AS DOUBLE)) * 1000000 + 0.5) AS BIGINT) AS first_micros,
      |  CAST(FLOOR((CAST(embedding[64] AS DOUBLE)) * 1000000 + 0.5) AS BIGINT) AS last_micros
      |FROM embeddings
      |WHERE vec_id < 100""".stripMargin) { (s, dir) =>
    Tables.load(s, dir, "embeddings")
      .filter(col("vec_id") < 100)
      .select(col("vec_id"),
        size(col("embedding")).cast("long").as("dim"),
        floor(element_at(col("embedding"), 1).cast("double") * 1e6d + 0.5d)
          .cast("long").as("first_micros"),
        floor(element_at(col("embedding"), 64).cast("double") * 1e6d + 0.5d)
          .cast("long").as("last_micros"))
  }

  /** Date formatting: month buckets as strings (dialect-specific format
    * patterns, identical output).
    */
  val q37DateFormat: Q = Q(
    "q37_date_format",
    """SELECT strftime(o_orderdate, '%Y-%m') AS order_month,
      |  COUNT(*) AS n_orders
      |FROM orders GROUP BY 1""".stripMargin) { (s, dir) =>
    Tables.load(s, dir, "orders")
      .groupBy(date_format(col("o_orderdate"), "yyyy-MM").as("order_month"))
      .agg(count(lit(1)).as("n_orders"))
  }

  /** Multi-CTE reuse: segment revenue sharing a filtered orders CTE. */
  val q38Cte: Q = Q(
    "q38_cte",
    """WITH big_orders AS (
      |  SELECT o_custkey, CAST(FLOOR((o_totalprice) * 100 + 0.5) AS BIGINT) AS cents
      |  FROM orders WHERE o_totalprice > 100),
      |seg AS (SELECT c_custkey, c_mktsegment FROM customer)
      |SELECT seg.c_mktsegment AS segment,
      |  COUNT(*) AS n_orders,
      |  SUM(big_orders.cents) / 100.0 AS revenue
      |FROM big_orders JOIN seg ON big_orders.o_custkey = seg.c_custkey
      |GROUP BY seg.c_mktsegment""".stripMargin) { (s, dir) =>
    Tables.registerAll(s, dir)
    s.sql(
      """WITH big_orders AS (
        |  SELECT o_custkey, CAST(FLOOR((o_totalprice) * 100 + 0.5) AS BIGINT) AS cents
        |  FROM orders WHERE o_totalprice > 100),
        |seg AS (SELECT c_custkey, c_mktsegment FROM customer)
        |SELECT seg.c_mktsegment AS segment,
        |  COUNT(*) AS n_orders,
        |  SUM(big_orders.cents) / 100.0D AS revenue
        |FROM big_orders JOIN seg ON big_orders.o_custkey = seg.c_custkey
        |GROUP BY seg.c_mktsegment""".stripMargin)
  }

  /** Skew-safe two-stage (salted) aggregation: the grouping key set here
    * is tiny (3 return flags over 600k rows — maximal skew), so a naive
    * groupBy concentrates each key on one reducer. Stage 1 aggregates on
    * (key, salt) with a deterministic 16-way salt, stage 2 merges the
    * partials — same result as the direct aggregation (the oracle IS the
    * direct aggregation), but the heavy shuffle fans out 16×. Spark's
    * partial aggregation does this implicitly for algebraic aggregates;
    * the explicit form is the pattern for non-algebraic state (e.g.
    * distinct sets) at 100 TB.
    */
  val q39SaltedAgg: Q = Q(
    "q39_salted_agg",
    """SELECT l_returnflag,
      |  COUNT(*) AS cnt,
      |  SUM(CAST(FLOOR((l_quantity) * 100 + 0.5) AS BIGINT)) / 100.0 AS sum_qty
      |FROM lineitem
      |GROUP BY l_returnflag""".stripMargin) { (s, dir) =>
    val salted = Tables.load(s, dir, "lineitem")
      .select(col("l_returnflag"), Det.cents(col("l_quantity")).as("qty_cents"),
        (col("l_orderkey") % 16).as("salt"))
      .groupBy(col("l_returnflag"), col("salt"))
      .agg(count(lit(1)).as("pcnt"), sum(col("qty_cents")).as("pqty"))
    salted
      .groupBy(col("l_returnflag"))
      .agg(sum(col("pcnt")).as("cnt"),
        (sum(col("pqty")) / 100.0d).as("sum_qty"))
  }

  /** Typed Aggregator UDAF (exact distinct via mergeable set state),
    * registered with functions.udaf and oracle-checked against plain
    * COUNT(DISTINCT) — see [[graft.functions.ExactDistinct]].
    */
  val q40UdafDistinct: Q = Q(
    "q40_udaf_distinct",
    """SELECT o_orderstatus,
      |  COUNT(DISTINCT o_custkey) AS uniq_cust
      |FROM orders GROUP BY o_orderstatus""".stripMargin) { (s, dir) =>
    val exactDistinct =
      udaf(graft.functions.ExactDistinct,
        org.apache.spark.sql.Encoders.LONG)
    Tables.load(s, dir, "orders")
      .groupBy(col("o_orderstatus"))
      .agg(exactDistinct(col("o_custkey")).as("uniq_cust"))
  }

  /** Exact median without interpolation hazards: operate on quantized
    * cents, pick the middle row(s) by ROW_NUMBER, average the (at most
    * two) middle values — pure integer logic until one final division,
    * so both engines agree bit-for-bit. The window partitions by the
    * group key: one shuffle, no global sort.
    */
  val q41Median: Q = Q(
    "q41_median",
    """WITH c AS (
      |  SELECT l_returnflag,
      |    CAST(FLOOR((l_quantity) * 100 + 0.5) AS BIGINT) AS qc,
      |    ROW_NUMBER() OVER (PARTITION BY l_returnflag
      |      ORDER BY CAST(FLOOR((l_quantity) * 100 + 0.5) AS BIGINT), l_orderkey, l_linenumber) AS rn,
      |    COUNT(*) OVER (PARTITION BY l_returnflag) AS n
      |  FROM lineitem)
      |SELECT l_returnflag,
      |  SUM(qc) / COUNT(*) / 100.0 AS median_qty
      |FROM c
      |WHERE rn = CAST(FLOOR((n + 1) / 2.0) AS BIGINT)
      |   OR rn = CAST(FLOOR((n + 2) / 2.0) AS BIGINT)
      |GROUP BY l_returnflag""".stripMargin) { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    // exact median via value-domain compression: the quantity domain is
    // tiny (integral cents), so aggregate to (flag, qc, cnt) with one
    // hash agg — partial aggregation collapses rows map-side — then rank
    // over the ~50-row-per-flag compressed table instead of sorting every
    // input row. Each compressed row covers ranks (cum-cnt, cum]; the two
    // middle ranks land in specific rows, counted with multiplicity so an
    // odd n (both ranks in one row) averages to the row's own value —
    // exactly the oracle's ROW_NUMBER formulation, at any scale.
    val counts = Tables.load(s, dir, "lineitem")
      .select(col("l_returnflag"), Det.cents(col("l_quantity")).as("qc"))
      .groupBy(col("l_returnflag"), col("qc"))
      .agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy(col("l_returnflag")).orderBy(col("qc"))
    val wAll = Window.partitionBy(col("l_returnflag"))
    val lo = col("cum") - col("cnt")
    def hit(r: org.apache.spark.sql.Column) =
      when(r > lo && r <= col("cum"), 1L).otherwise(0L)
    counts
      .withColumn("cum", sum(col("cnt")).over(w))
      .withColumn("n", sum(col("cnt")).over(wAll))
      .withColumn("hits",
        hit(floor((col("n") + 1) / 2.0d).cast("long")) +
          hit(floor((col("n") + 2) / 2.0d).cast("long")))
      .filter(col("hits") > 0)
      .groupBy(col("l_returnflag"))
      .agg((sum(col("qc") * col("hits")) / sum(col("hits")) / 100.0d)
        .as("median_qty"))
  }

  /** Value histogram: fixed-width buckets as a single hash aggregation. */
  val q42Histogram: Q = Q(
    "q42_histogram",
    """SELECT CAST(FLOOR(o_totalprice / 50000) AS BIGINT) AS bucket,
      |  COUNT(*) AS n
      |FROM orders GROUP BY 1""".stripMargin) { (s, dir) =>
    Tables.load(s, dir, "orders")
      .groupBy(floor(col("o_totalprice") / 50000d).cast("long").as("bucket"))
      .agg(count(lit(1)).as("n"))
  }

  /** Explicit GROUPING SETS syntax (beyond ROLLUP/CUBE shorthands). */
  val q44GroupingSets: Q = Q(
    "q44_grouping_sets",
    """SELECT COALESCE(o_orderstatus, '<all>') AS status,
      |  COALESCE(o_orderpriority, '<all>') AS priority,
      |  COUNT(*) AS cnt
      |FROM orders
      |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())""".stripMargin) { (s, dir) =>
    Tables.registerAll(s, dir)
    s.sql(
      """SELECT COALESCE(o_orderstatus, '<all>') AS status,
        |  COALESCE(o_orderpriority, '<all>') AS priority,
        |  COUNT(*) AS cnt
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())""".stripMargin)
  }

  /** Map-type function surface: construct, extract, cardinality.
    * DuckDB map extraction yields a one-element list, so the oracle
    * unwraps with [1]; output columns are scalars in both engines.
    */
  val q45MapFns: Q = Q(
    "q45_map_fns",
    """SELECT o_orderkey,
      |  map(['status', 'priority'], [o_orderstatus, o_orderpriority])['status'][1] AS status_val,
      |  CAST(cardinality(map(['status', 'priority'], [o_orderstatus, o_orderpriority])) AS BIGINT) AS n_keys
      |FROM orders WHERE o_orderkey < 100""".stripMargin) { (s, dir) =>
    Tables.load(s, dir, "orders")
      .filter(col("o_orderkey") < 100)
      .select(col("o_orderkey"),
        expr("map('status', o_orderstatus, 'priority', o_orderpriority)['status']")
          .as("status_val"),
        expr("size(map('status', o_orderstatus, 'priority', o_orderpriority))")
          .cast("long").as("n_keys"))
  }

  /** Lateral position-indexed explode (posexplode / UNNEST WITH
    * ordinality-by-subscript): token stream with positions — the
    * row-to-token fan-out every tokenization pipeline starts with.
    */
  val q48Posexplode: Q = Q(
    "q48_posexplode",
    """WITH t AS (
      |  SELECT doc_id, string_split(text, ' ') AS toks
      |  FROM documents WHERE doc_id < 20),
      |p AS (
      |  SELECT doc_id, toks,
      |    UNNEST(generate_series(0, LEN(toks) - 1)) AS pos
      |  FROM t)
      |SELECT doc_id, pos, toks[pos + 1] AS token FROM p""".stripMargin) { (s, dir) =>
    Tables.load(s, dir, "documents")
      .filter(col("doc_id") < 20)
      .select(col("doc_id"), posexplode(split(col("text"), " ")))
      .select(col("doc_id"), col("pos").cast("long").as("pos"), col("col").as("token"))
  }

  /** Several DISTINCT aggregates with different keys in one GROUP BY —
    * Catalyst plans this via Expand (one pass, no self-join); includes
    * a conditional distinct (distinct customers among 'F' orders only).
    */
  val q50MultiDistinct: Q = Q(
    "q50_multi_distinct",
    """SELECT o_orderpriority,
      |  COUNT(DISTINCT o_custkey) AS n_cust,
      |  COUNT(DISTINCT CASE WHEN o_orderstatus = 'F' THEN o_custkey END) AS n_cust_f,
      |  COUNT(DISTINCT o_orderdate) AS n_dates
      |FROM orders GROUP BY o_orderpriority""".stripMargin) { (s, dir) =>
    Tables.load(s, dir, "orders")
      .groupBy(col("o_orderpriority"))
      .agg(
        countDistinct(col("o_custkey")).as("n_cust"),
        countDistinct(when(col("o_orderstatus") === "F", col("o_custkey")))
          .as("n_cust_f"),
        countDistinct(col("o_orderdate")).as("n_dates"))
  }

  /** Correlated LATERAL subquery with per-row ORDER BY + LIMIT (each
    * customer's single most expensive order). Catalyst decorrelates
    * the lateral into a ranked join — same plan family as the
    * ROW_NUMBER top-k idiom, written in the join-shaped dialect.
    */
  val q51Lateral: Q = Q(
    "q51_lateral",
    """SELECT c.c_custkey, t.o_orderkey, t.price_cents
      |FROM customer c, LATERAL (
      |  SELECT o_orderkey,
      |    CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS price_cents
      |  FROM orders o WHERE o.o_custkey = c.c_custkey
      |  ORDER BY price_cents DESC, o_orderkey LIMIT 1) t
      |WHERE c.c_custkey < 100""".stripMargin) { (s, dir) =>
    Tables.registerAll(s, dir)
    s.sql(
      """SELECT c.c_custkey, t.o_orderkey, t.price_cents
        |FROM customer c, LATERAL (
        |  SELECT o_orderkey,
        |    CAST(FLOOR(o_totalprice * 100 + 0.5D) AS BIGINT) AS price_cents
        |  FROM orders o WHERE o.o_custkey = c.c_custkey
        |  ORDER BY price_cents DESC, o_orderkey LIMIT 1) t
        |WHERE c.c_custkey < 100""".stripMargin)
  }

  /** Per-aggregate FILTER clauses (SQL:2003, admitted by Flink and
    * Spark alike): one scan computes the unconditional count next to
    * two filtered aggregates. Catalyst folds each FILTER into the
    * aggregate's own accumulate step — no per-predicate re-scan, so
    * the shape stays a single partial+final HashAggregate at any
    * scale.
    */
  val q85FilterAgg: Q = Q(
    "q85_filter_agg",
    """SELECT o_orderpriority,
      |  COUNT(*) AS n_all,
      |  COUNT(*) FILTER (WHERE o_totalprice > 250000) AS n_big,
      |  CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) FILTER (WHERE o_orderstatus = 'F') AS BIGINT) AS sum_f_cents
      |FROM orders GROUP BY o_orderpriority""".stripMargin) { (s, dir) =>
    Tables.registerAll(s, dir)
    s.sql(
      """SELECT o_orderpriority,
        |  COUNT(*) AS n_all,
        |  COUNT(*) FILTER (WHERE o_totalprice > 250000) AS n_big,
        |  SUM(CAST(FLOOR(o_totalprice * 100 + 0.5D) AS BIGINT)) FILTER (WHERE o_orderstatus = 'F') AS sum_f_cents
        |FROM orders GROUP BY o_orderpriority""".stripMargin)
  }

  /** LISTAGG with WITHIN GROUP ordering (Flink's LISTAGG / SQL:2016):
    * nation names per region, comma-joined in a deterministic order.
    * DuckDB spells it string_agg(... ORDER BY ...). The ordered
    * aggregate sorts within each group partition — no extra shuffle
    * beyond the groupBy exchange.
    */
  val q86Listagg: Q = Q(
    "q86_listagg",
    """SELECT n_regionkey, string_agg(n_name, ',' ORDER BY n_name) AS names
      |FROM nation GROUP BY n_regionkey""".stripMargin) { (s, dir) =>
    Tables.registerAll(s, dir)
    s.sql(
      """SELECT n_regionkey, listagg(n_name, ',') WITHIN GROUP (ORDER BY n_name) AS names
        |FROM nation GROUP BY n_regionkey""".stripMargin)
  }

  /** ARRAY_AGG into a sorted array (Flink's ARRAY_AGG): the distinct
    * market segments seen per nation. collect-style aggregation is
    * order-nondeterministic under parallel merge, so both engines
    * sort the array — and because the oracle checker can only hash
    * atomic columns, the array is rendered to a joined string for
    * comparison (the array itself is still built first, so the
    * ARRAY_AGG path is exercised end-to-end).
    */
  val q87ArrayAgg: Q = Q(
    "q87_array_agg",
    """SELECT c_nationkey,
      |  array_to_string(array_agg(DISTINCT c_mktsegment ORDER BY c_mktsegment), ',') AS segments
      |FROM customer GROUP BY c_nationkey""".stripMargin) { (s, dir) =>
    Tables.load(s, dir, "customer")
      .groupBy(col("c_nationkey"))
      .agg(array_join(array_sort(collect_set(col("c_mktsegment"))), ",").as("segments"))
  }

  /** GROUPING_ID over a CUBE: the bit-vector distinguishing which
    * grouping-set a row came from (first listed key = most significant
    * bit, per the SQL standard — Spark's grouping_id and DuckDB's
    * GROUPING agree). This is how CUBE consumers tell a real NULL key
    * from a rolled-up one.
    */
  val q90GroupingId: Q = Q(
    "q90_grouping_id",
    """SELECT COALESCE(o_orderstatus, '<all>') AS status,
      |  COALESCE(o_orderpriority, '<all>') AS priority,
      |  GROUPING(o_orderstatus, o_orderpriority) AS gid,
      |  COUNT(*) AS cnt
      |FROM orders
      |GROUP BY CUBE(o_orderstatus, o_orderpriority)""".stripMargin) { (s, dir) =>
    Tables.load(s, dir, "orders")
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(grouping_id().cast("long").as("gid"), count(lit(1)).as("cnt"))
      .select(
        coalesce(col("o_orderstatus"), lit("<all>")).as("status"),
        coalesce(col("o_orderpriority"), lit("<all>")).as("priority"),
        col("gid"), col("cnt"))
  }

  /** Null-safe comparison surface: IS [NOT] DISTINCT FROM over columns
    * made genuinely NULL by NULLIF, where ordinary <> would return
    * NULL and silently drop rows. Same SQL text runs on both engines.
    */
  val q91NullSafe: Q = Q(
    "q91_null_safe",
    """SELECT event_id,
      |  CASE WHEN NULLIF(event_type, 'error') IS DISTINCT FROM NULLIF(event_type, 'view')
      |       THEN 1 ELSE 0 END AS is_diff,
      |  CASE WHEN NULLIF(event_type, 'error') IS NOT DISTINCT FROM 'click'
      |       THEN 1 ELSE 0 END AS is_click
      |FROM events WHERE event_id < 2000""".stripMargin) { (s, dir) =>
    Tables.registerAll(s, dir)
    s.sql(
      """SELECT event_id,
        |  CASE WHEN NULLIF(event_type, 'error') IS DISTINCT FROM NULLIF(event_type, 'view')
        |       THEN 1 ELSE 0 END AS is_diff,
        |  CASE WHEN NULLIF(event_type, 'error') IS NOT DISTINCT FROM 'click'
        |       THEN 1 ELSE 0 END AS is_click
        |FROM events WHERE event_id < 2000""".stripMargin)
  }

  /** `TRY_CAST` (Flink and Spark both ship it natively): NULL instead
    * of error on a failed cast. The probe set sticks to alpha-or-
    * integral strings — DuckDB's TRY_CAST of a decimal string to
    * BIGINT rounds where Spark nulls, the q32 cast pitfall.
    */
  val q98TryCast: Q = Q(
    "q98_try_cast",
    """SELECT source,
      |  CAST(SUM(TRY_CAST(CAST(n_chars AS VARCHAR) AS BIGINT)) AS BIGINT)
      |    AS sum_roundtrip,
      |  CAST(SUM(CASE WHEN TRY_CAST(lang AS BIGINT) IS NULL
      |      THEN 1 ELSE 0 END) AS BIGINT) AS n_bad,
      |  CAST(SUM(CASE WHEN TRY_CAST('99999999999999999999' AS BIGINT) IS NULL
      |      THEN 1 ELSE 0 END) AS BIGINT) AS n_overflow
      |FROM documents GROUP BY source""".stripMargin) { (s, dir) =>
    Tables.registerAll(s, dir)
    s.sql(
      """SELECT source,
        |  SUM(TRY_CAST(CAST(n_chars AS STRING) AS BIGINT)) AS sum_roundtrip,
        |  SUM(CASE WHEN TRY_CAST(lang AS BIGINT) IS NULL
        |      THEN 1 ELSE 0 END) AS n_bad,
        |  SUM(CASE WHEN TRY_CAST('99999999999999999999' AS BIGINT) IS NULL
        |      THEN 1 ELSE 0 END) AS n_overflow
        |FROM documents GROUP BY source""".stripMargin)
  }

  /** `NOT IN` with a subquery (null-aware anti-join plan) plus the
    * three-valued NOT IN literal-list semantics: a NULL in the list
    * makes the predicate UNKNOWN, never TRUE — both engines must take
    * the ELSE branch for every row.
    */
  val q99NotIn: Q = Q(
    "q99_not_in",
    """SELECT c_mktsegment,
      |  CASE WHEN c_nationkey NOT IN (1, 2) THEN 'out' ELSE 'in' END AS two_val,
      |  CASE WHEN c_nationkey NOT IN (1, 2, NULL) THEN 'out' ELSE 'not_true' END AS three_val,
      |  COUNT(*) AS n
      |FROM customer
      |WHERE c_custkey NOT IN
      |  (SELECT o_custkey FROM orders WHERE o_totalprice > 400000)
      |GROUP BY c_mktsegment, two_val, three_val""".stripMargin) { (s, dir) =>
    Tables.registerAll(s, dir)
    s.sql(
      """SELECT c_mktsegment,
        |  CASE WHEN c_nationkey NOT IN (1, 2) THEN 'out' ELSE 'in' END AS two_val,
        |  CASE WHEN c_nationkey NOT IN (1, 2, NULL) THEN 'out' ELSE 'not_true' END AS three_val,
        |  COUNT(*) AS n
        |FROM customer
        |WHERE c_custkey NOT IN
        |  (SELECT o_custkey FROM orders WHERE o_totalprice > 400000)
        |GROUP BY c_mktsegment, two_val, three_val""".stripMargin)
  }

  def all: Seq[Q] = Seq(
    q34Cube, q35Correlated, q36ArrayFns, q37DateFormat, q38Cte, q39SaltedAgg,
    q40UdafDistinct, q41Median, q42Histogram, q44GroupingSets, q45MapFns,
    q48Posexplode, q50MultiDistinct, q51Lateral,
    q85FilterAgg, q86Listagg, q87ArrayAgg, q90GroupingId, q91NullSafe,
    q98TryCast, q99NotIn)
}
