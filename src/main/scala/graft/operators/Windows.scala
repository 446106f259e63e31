package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import Det._

/** Analytic over-window surface (SURVEY.md §2.C "window functions"):
  * ranking, top-k-per-group, lag/lead, running aggregates.
  *
  * Scale design: every window partitions by a high-cardinality key
  * (custkey / user_id / brand) — one shuffle on the partition key, then
  * a per-partition sort; no global sort, no driver collection. The
  * rn<=k pattern is the streaming-dedup/top-k idiom from the reference's
  * admitted surface (SURVEY §2.C "top-k / deduplication pattern").
  */
object Windows {

  /** ROW_NUMBER top-k per group: top 3 orders per customer by price.
    * Ties are impossible on (price_cents, o_orderkey) so the result is
    * deterministic.
    */
  val q18TopkPerGroup: Q = Q(
    "q18_topk_per_group",
    """SELECT o_custkey, o_orderkey, price_cents, rn FROM (
      |  SELECT o_custkey, o_orderkey,
      |    CAST(FLOOR((o_totalprice) * 100 + 0.5) AS BIGINT) AS price_cents,
      |    ROW_NUMBER() OVER (PARTITION BY o_custkey
      |      ORDER BY CAST(FLOOR((o_totalprice) * 100 + 0.5) AS BIGINT) DESC, o_orderkey) AS rn
      |  FROM orders) t
      |WHERE rn <= 3""".stripMargin) { (s, dir) =>
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("price_cents").desc, col("o_orderkey"))
    Tables.load(s, dir, "orders")
      .select(col("o_custkey"), col("o_orderkey"),
        cents(col("o_totalprice")).as("price_cents"))
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= 3)
  }

  /** RANK + DENSE_RANK within brand by size (ties exist → rank gaps). */
  val q19Rank: Q = Q(
    "q19_rank",
    """SELECT p_brand, p_partkey, p_size,
      |  RANK() OVER (PARTITION BY p_brand ORDER BY p_size DESC, p_partkey) AS rk,
      |  DENSE_RANK() OVER (PARTITION BY p_brand ORDER BY p_size DESC) AS drk
      |FROM part""".stripMargin) { (s, dir) =>
    val byBoth = Window.partitionBy(col("p_brand"))
      .orderBy(col("p_size").desc, col("p_partkey"))
    val bySize = Window.partitionBy(col("p_brand")).orderBy(col("p_size").desc)
    Tables.load(s, dir, "part")
      .select(col("p_brand"), col("p_partkey"), col("p_size"),
        rank().over(byBoth).cast("long").as("rk"),
        dense_rank().over(bySize).cast("long").as("drk"))
  }

  /** LAG/LEAD: per-user event deltas (seconds between events, value diff).
    * Epoch seconds are used instead of raw ns timestamps so Spark's µs
    * truncation vs DuckDB's ns precision cannot skew the compare.
    */
  val q20LagLead: Q = Q(
    "q20_lag_lead",
    """SELECT user_id, event_id,
      |  CAST(FLOOR(EPOCH(ts)) AS BIGINT) AS ts_sec,
      |  CAST(FLOOR(EPOCH(ts)) AS BIGINT)
      |    - LAG(CAST(FLOOR(EPOCH(ts)) AS BIGINT), 1, CAST(FLOOR(EPOCH(ts)) AS BIGINT))
      |      OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap_sec,
      |  LEAD(event_type, 1, 'none') OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_type
      |FROM events""".stripMargin) { (s, dir) =>
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    Tables.load(s, dir, "events")
      .select(col("user_id"), col("event_id"), col("ts"), col("event_type"))
      .withColumn("ts_sec", unix_timestamp(col("ts")))
      .withColumn("gap_sec",
        col("ts_sec") - lag(col("ts_sec"), 1).over(w))
      .withColumn("gap_sec", coalesce(col("gap_sec"), lit(0L)))
      .withColumn("next_type", lead(col("event_type"), 1, "none").over(w))
      .drop("ts", "event_type")
  }

  /** Running (cumulative) revenue per customer over order date. */
  val q21RunningSum: Q = Q(
    "q21_running_sum",
    """SELECT o_custkey, o_orderkey,
      |  SUM(CAST(FLOOR((o_totalprice) * 100 + 0.5) AS BIGINT))
      |    OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) / 100.0 AS running_rev
      |FROM orders""".stripMargin) { (s, dir) =>
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.load(s, dir, "orders")
      .select(col("o_custkey"), col("o_orderkey"),
        (sum(cents(col("o_totalprice"))).over(w) / 100.0d).as("running_rev"))
  }

  /** NTILE + percent-style bucketing of customers by balance. */
  val q22Ntile: Q = Q(
    "q22_ntile",
    """SELECT c_custkey,
      |  NTILE(10) OVER (ORDER BY CAST(FLOOR((c_acctbal) * 100 + 0.5) AS BIGINT) DESC, c_custkey) AS decile
      |FROM customer""".stripMargin) { (s, dir) =>
    val w = Window.orderBy(cents(col("c_acctbal")).desc, col("c_custkey"))
    Tables.load(s, dir, "customer")
      .select(col("c_custkey"), ntile(10).over(w).cast("long").as("decile"))
  }

  /** PERCENT_RANK + CUME_DIST per customer (rank-based, so ties are
    * deterministic; single-row partitions define percent_rank = 0 in
    * both engines). Quantized to mils — both sides compute the same
    * (rank-1)/(n-1) IEEE division.
    */
  val q46PercentRank: Q = Q(
    "q46_percent_rank",
    """SELECT o_custkey, o_orderkey,
      |  CAST(FLOOR(PERCENT_RANK() OVER w * 1000 + 0.5) AS BIGINT) AS prank_mils,
      |  CAST(FLOOR(CUME_DIST() OVER w * 1000 + 0.5) AS BIGINT) AS cdist_mils
      |FROM (SELECT o_custkey, o_orderkey,
      |        CAST(FLOOR((o_totalprice) * 100 + 0.5) AS BIGINT) AS pc
      |      FROM orders)
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY pc, o_orderkey)""".stripMargin) { (s, dir) =>
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("pc"), col("o_orderkey"))
    Tables.load(s, dir, "orders")
      .select(col("o_custkey"), col("o_orderkey"),
        cents(col("o_totalprice")).as("pc"))
      .select(col("o_custkey"), col("o_orderkey"),
        floor(percent_rank().over(w) * 1000d + 0.5d).cast("long").as("prank_mils"),
        floor(cume_dist().over(w) * 1000d + 0.5d).cast("long").as("cdist_mils"))
  }

  /** FIRST_VALUE / LAST_VALUE / NTH_VALUE over an explicit unbounded
    * ROWS frame (the default frame would stop at CURRENT ROW and make
    * last_value useless — the classic frame gotcha, pinned here).
    */
  val q47FirstLast: Q = Q(
    "q47_first_last",
    """SELECT o_custkey, o_orderkey,
      |  FIRST_VALUE(o_orderkey) OVER w AS first_ok,
      |  LAST_VALUE(o_orderkey) OVER w AS last_ok,
      |  NTH_VALUE(o_orderkey, 2) OVER w AS second_ok
      |FROM orders
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderkey
      |  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)""".stripMargin) { (s, dir) =>
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    Tables.load(s, dir, "orders")
      .select(col("o_custkey"), col("o_orderkey"),
        first(col("o_orderkey")).over(w).as("first_ok"),
        last(col("o_orderkey")).over(w).as("last_ok"),
        nth_value(col("o_orderkey"), 2).over(w).as("second_ok"))
  }

  /** RANGE-frame window (value-based bounds, not row counts): ±5-char
    * smoothed length histogram per language, over the domain-compressed
    * (lang, n_chars) counts — window input is |distinct lengths| rows,
    * never the corpus.
    */
  val q49RangeFrame: Q = Q(
    "q49_range_frame",
    """WITH c AS (
      |  SELECT lang, n_chars, COUNT(*) AS cnt
      |  FROM documents GROUP BY lang, n_chars)
      |SELECT lang, n_chars,
      |  CAST(SUM(cnt) OVER (PARTITION BY lang ORDER BY n_chars
      |    RANGE BETWEEN 5 PRECEDING AND 5 FOLLOWING) AS BIGINT) AS smoothed
      |FROM c""".stripMargin) { (s, dir) =>
    val w = Window.partitionBy(col("lang")).orderBy(col("n_chars"))
      .rangeBetween(-5, 5)
    Tables.load(s, dir, "documents")
      .groupBy(col("lang"), col("n_chars"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("lang"), col("n_chars"),
        sum(col("cnt")).over(w).as("smoothed"))
  }

  /** Time-interval RANGE frame (r15): a trailing one-hour window per
    * event row — the batch twin of the streaming over-aggregation's
    * `RANGE BETWEEN INTERVAL ... PRECEDING` frame (OverAggSpec pins
    * streaming equal to THIS form, and this row pins the form against
    * DuckDB). The summed metric is integer-quantized (floor of
    * value×100 — IEEE multiply rounds identically everywhere) so the
    * frame sum is exact int64 in both engines; RANGE peers (equal
    * timestamps) share frames by definition, so tie order cannot
    * change any value.
    */
  val q113OverTimeRange: Q = Q(
    "q113_over_time_range",
    """SELECT event_id,
      |  CAST(COUNT(*) OVER (PARTITION BY event_type ORDER BY ts
      |    RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
      |    AS BIGINT) AS n_1h,
      |  CAST(SUM(CAST(FLOOR(value * 100) AS BIGINT)) OVER (
      |    PARTITION BY event_type ORDER BY ts
      |    RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
      |    AS BIGINT) AS s_1h
      |FROM events WHERE ts IS NOT NULL""".stripMargin) { (s, dir) =>
    Tables.load(s, dir, "events").createOrReplaceTempView("otr_events")
    s.sql(
      """SELECT event_id,
        |  COUNT(*) OVER (PARTITION BY event_type ORDER BY ts
        |    RANGE BETWEEN INTERVAL '1' HOUR PRECEDING AND CURRENT ROW)
        |    AS n_1h,
        |  SUM(CAST(FLOOR(value * 100) AS BIGINT)) OVER (
        |    PARTITION BY event_type ORDER BY ts
        |    RANGE BETWEEN INTERVAL '1' HOUR PRECEDING AND CURRENT ROW)
        |    AS s_1h
        |FROM otr_events WHERE ts IS NOT NULL""".stripMargin)
  }

  /** Variance family over a time-RANGE frame (r16): the batch twin of
    * the streaming over-aggregation's STDDEV/VAR kinds (OverAggSpec
    * pins streaming bit-equal to THIS form; this row pins the form
    * against DuckDB). Quantization law: over integer inputs
    * (`floor(value*100) % 97` ∈ [0, 96], identical in both engines on
    * non-negative values), `VAR_POP × n²` and `VAR_SAMP × n(n−1)` are
    * the EXACT integer `n·Σq² − (Σq)²` — both engines land within
    * ~1e-6 of it (fp error ε·E with E ≤ n²·2500 and n ≤ ~11 per
    * hour frame at sf0.01), so FLOOR(x + 0.5) is boundary-safe, where
    * a fixed milli quantization flips on the dyadic-rational variances
    * integers produce (observed: 77/10000 rows off by one). STDDEV is
    * exercised through its square, same law. Single-row frames pin
    * *_SAMP's NULL in both engines (Spark ANSI / DuckDB).
    */
  val q115OverVariance: Q = Q(
    "q115_over_variance",
    """SELECT event_id,
      |  CAST(COUNT(q) OVER w AS BIGINT) AS n,
      |  CAST(FLOOR(VAR_SAMP(q) OVER w
      |    * (COUNT(q) OVER w * (COUNT(q) OVER w - 1)) + 0.5) AS BIGINT)
      |    AS vs_e,
      |  CAST(FLOOR(VAR_POP(q) OVER w
      |    * (COUNT(q) OVER w * COUNT(q) OVER w) + 0.5) AS BIGINT)
      |    AS vp_e,
      |  CAST(FLOOR(STDDEV_SAMP(q) OVER w * STDDEV_SAMP(q) OVER w
      |    * (COUNT(q) OVER w * (COUNT(q) OVER w - 1)) + 0.5) AS BIGINT)
      |    AS ss_e,
      |  CAST(FLOOR(STDDEV_POP(q) OVER w * STDDEV_POP(q) OVER w
      |    * (COUNT(q) OVER w * COUNT(q) OVER w) + 0.5) AS BIGINT)
      |    AS sp_e
      |FROM (SELECT event_id, event_type, ts,
      |        CAST(FLOOR(value * 100) AS BIGINT) % 97 AS q
      |      FROM events WHERE ts IS NOT NULL)
      |WINDOW w AS (PARTITION BY event_type ORDER BY ts
      |  RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)""".stripMargin) {
    (s, dir) =>
    Tables.load(s, dir, "events").createOrReplaceTempView("ovar_events")
    s.sql(
      """SELECT event_id,
        |  CAST(COUNT(q) OVER w AS BIGINT) AS n,
        |  CAST(FLOOR(VAR_SAMP(q) OVER w
        |    * (COUNT(q) OVER w * (COUNT(q) OVER w - 1)) + 0.5) AS BIGINT)
        |    AS vs_e,
        |  CAST(FLOOR(VAR_POP(q) OVER w
        |    * (COUNT(q) OVER w * COUNT(q) OVER w) + 0.5) AS BIGINT)
        |    AS vp_e,
        |  CAST(FLOOR(STDDEV_SAMP(q) OVER w * STDDEV_SAMP(q) OVER w
        |    * (COUNT(q) OVER w * (COUNT(q) OVER w - 1)) + 0.5) AS BIGINT)
        |    AS ss_e,
        |  CAST(FLOOR(STDDEV_POP(q) OVER w * STDDEV_POP(q) OVER w
        |    * (COUNT(q) OVER w * COUNT(q) OVER w) + 0.5) AS BIGINT)
        |    AS sp_e
        |FROM (SELECT event_id, event_type, ts,
        |        CAST(FLOOR(value * 100) AS BIGINT) % 97 AS q
        |      FROM ovar_events WHERE ts IS NOT NULL)
        |WINDOW w AS (PARTITION BY event_type ORDER BY ts
        |  RANGE BETWEEN INTERVAL '1' HOUR PRECEDING AND CURRENT ROW)""".stripMargin)
  }

  /** DISTINCT variance (r17): the batch twin of the streaming kinds
    * 26-29 (OverAggSpec / WindowTvfSpec pin streaming against this
    * form; this row pins the form against DuckDB). Same quantization
    * law as q115: over the deduplicated integer set `q ∈ [0, 96]`,
    * `VAR_POP × n²` and `VAR_SAMP × n(n−1)` are the exact integer
    * `n·Σq² − (Σq)²` with n = COUNT(DISTINCT q) ≤ 97 — both engines
    * land within fp error of it, so FLOOR(x + 0.5) is boundary-safe.
    */
  val q117DistinctVariance: Q = Q(
    "q117_distinct_variance",
    """SELECT event_type,
      |  CAST(COUNT(DISTINCT q) AS BIGINT) AS n,
      |  CAST(FLOOR(VAR_POP(DISTINCT q)
      |    * (COUNT(DISTINCT q) * COUNT(DISTINCT q)) + 0.5) AS BIGINT)
      |    AS vp_e,
      |  CAST(FLOOR(VAR_SAMP(DISTINCT q)
      |    * (COUNT(DISTINCT q) * (COUNT(DISTINCT q) - 1)) + 0.5) AS BIGINT)
      |    AS vs_e,
      |  CAST(FLOOR(STDDEV_POP(DISTINCT q) * STDDEV_POP(DISTINCT q)
      |    * (COUNT(DISTINCT q) * COUNT(DISTINCT q)) + 0.5) AS BIGINT)
      |    AS sp_e
      |FROM (SELECT event_type, CAST(FLOOR(value * 100) AS BIGINT) % 97 AS q
      |      FROM events WHERE ts IS NOT NULL)
      |GROUP BY event_type""".stripMargin) { (s, dir) =>
    Tables.load(s, dir, "events").createOrReplaceTempView("dvar_events")
    s.sql(
      """SELECT event_type,
        |  CAST(COUNT(DISTINCT q) AS BIGINT) AS n,
        |  CAST(FLOOR(VAR_POP(DISTINCT q)
        |    * (COUNT(DISTINCT q) * COUNT(DISTINCT q)) + 0.5) AS BIGINT)
        |    AS vp_e,
        |  CAST(FLOOR(VAR_SAMP(DISTINCT q)
        |    * (COUNT(DISTINCT q) * (COUNT(DISTINCT q) - 1)) + 0.5) AS BIGINT)
        |    AS vs_e,
        |  CAST(FLOOR(STDDEV_POP(DISTINCT q) * STDDEV_POP(DISTINCT q)
        |    * (COUNT(DISTINCT q) * COUNT(DISTINCT q)) + 0.5) AS BIGINT)
        |    AS sp_e
        |FROM (SELECT event_type, CAST(FLOOR(value * 100) AS BIGINT) % 97 AS q
        |      FROM dvar_events WHERE ts IS NOT NULL)
        |GROUP BY event_type""".stripMargin)
  }

  def all: Seq[Q] = Seq(q18TopkPerGroup, q19Rank, q20LagLead, q21RunningSum,
    q22Ntile, q46PercentRank, q47FirstLast, q49RangeFrame,
    q113OverTimeRange, q115OverVariance, q117DistinctVariance)
}
