package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import Det._

/** Core relational surface: projection / filter / scalar expressions /
  * aggregation (SURVEY.md §2.C "Projection/filter" + "Aggregation" rows).
  *
  * Everything is declarative DataFrame API — Catalyst handles pushdown,
  * pruning and partial aggregation; at 100 TB these are single-shuffle
  * hash aggregations over the grouping keys.
  */
object Relational {

  private def li(s: SparkSession, dir: String) = Tables.load(s, dir, "lineitem")

  /** TPC-H Q1-style multi-aggregate scan — the flagship query.
    * Mirrors the reference's streaming multi-aggregate GROUP BY shape
    * (test.sql:47-60: count/count distinct/sum/max/min over 2 keys).
    */
  val q1Agg: Q = Q(
    "q1_agg",
    """SELECT l_returnflag, l_linestatus,
      |  SUM(CAST(FLOOR((l_quantity) * 100 + 0.5) AS BIGINT)) / 100.0 AS sum_qty,
      |  SUM(CAST(FLOOR((l_extendedprice) * 100 + 0.5) AS BIGINT)) / 100.0 AS sum_base_price,
      |  SUM(CAST(FLOOR((l_extendedprice * (1 - l_discount)) * 100 + 0.5) AS BIGINT)) / 100.0 AS sum_disc_price,
      |  SUM(CAST(FLOOR((l_quantity) * 100 + 0.5) AS BIGINT)) / 100.0 / COUNT(*) AS avg_qty,
      |  MAX(l_quantity) AS max_qty,
      |  MIN(l_quantity) AS min_qty,
      |  COUNT(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      |GROUP BY l_returnflag, l_linestatus""".stripMargin) { (s, dir) =>
    li(s, dir)
      .filter(col("l_shipdate") <= to_timestamp(lit("1998-09-02 00:00:00")))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        dsum(col("l_extendedprice") * (lit(1d) - col("l_discount")))
          .as("sum_disc_price"),
        davg(col("l_quantity")).as("avg_qty"),
        max(col("l_quantity")).as("max_qty"),
        min(col("l_quantity")).as("min_qty"),
        count(lit(1)).as("count_order"))
  }

  /** Filter + projection with scalar arithmetic; predicate and the
    * two-column read schema both push into the parquet scan.
    */
  val q2FilterProject: Q = Q(
    "q2_filter_project",
    """SELECT l_orderkey, l_linenumber,
      |  CAST(FLOOR((l_extendedprice * (1 - l_discount) * (1 + l_tax)) * 100 + 0.5) AS BIGINT) AS charge_cents
      |FROM lineitem
      |WHERE l_quantity > 45 AND l_discount >= 0.05""".stripMargin) { (s, dir) =>
    li(s, dir)
      .filter(col("l_quantity") > 45 && col("l_discount") >= 0.05)
      .select(
        col("l_orderkey"),
        col("l_linenumber"),
        cents(col("l_extendedprice") * (lit(1d) - col("l_discount")) *
          (lit(1d) + col("l_tax"))).as("charge_cents"))
  }

  /** COUNT(DISTINCT) + multi-distinct aggregation (test.sql:51 `uv`). */
  val q3AggDistinct: Q = Q(
    "q3_agg_distinct",
    """SELECT o_orderstatus,
      |  COUNT(*) AS cnt,
      |  COUNT(DISTINCT o_custkey) AS uniq_cust,
      |  SUM(CAST(FLOOR((o_totalprice) * 100 + 0.5) AS BIGINT)) / 100.0 AS sum_price
      |FROM orders
      |GROUP BY o_orderstatus""".stripMargin) { (s, dir) =>
    Tables.load(s, dir, "orders")
      .groupBy(col("o_orderstatus"))
      .agg(
        count(lit(1)).as("cnt"),
        countDistinct(col("o_custkey")).as("uniq_cust"),
        dsum(col("o_totalprice")).as("sum_price"))
  }

  /** HAVING over a grouped aggregate (SURVEY §2.C HAVING row). */
  val q4Having: Q = Q(
    "q4_having",
    """SELECT l_suppkey, COUNT(*) AS n_items,
      |  SUM(CAST(FLOOR((l_quantity) * 100 + 0.5) AS BIGINT)) / 100.0 AS total_qty
      |FROM lineitem
      |GROUP BY l_suppkey
      |HAVING COUNT(*) > 50""".stripMargin) { (s, dir) =>
    li(s, dir)
      .groupBy(col("l_suppkey"))
      .agg(count(lit(1)).as("n_items"), dsum(col("l_quantity")).as("total_qty"))
      .filter(col("n_items") > 50)
  }

  /** CASE WHEN conditional aggregation (pivot-style). */
  val q5CaseWhen: Q = Q(
    "q5_case_when",
    """SELECT l_returnflag,
      |  CAST(SUM(CASE WHEN l_quantity > 25 THEN 1 ELSE 0 END) AS BIGINT) AS big_cnt,
      |  CAST(SUM(CASE WHEN l_quantity <= 25 THEN 1 ELSE 0 END) AS BIGINT) AS small_cnt,
      |  SUM(CASE WHEN l_linestatus = 'F' THEN CAST(FLOOR((l_extendedprice) * 100 + 0.5) AS BIGINT) ELSE 0 END) / 100.0 AS f_price
      |FROM lineitem
      |GROUP BY l_returnflag""".stripMargin) { (s, dir) =>
    li(s, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        sum(when(col("l_quantity") > 25, 1).otherwise(0)).as("big_cnt"),
        sum(when(col("l_quantity") <= 25, 1).otherwise(0)).as("small_cnt"),
        (sum(when(col("l_linestatus") === "F", cents(col("l_extendedprice")))
          .otherwise(0L)) / 100.0d).as("f_price"))
  }

  /** ORDER BY + LIMIT (top-N; Catalyst runs TakeOrderedAndProject — no
    * full sort at scale).
    */
  val q6SortLimit: Q = Q(
    "q6_sort_limit",
    """SELECT o_orderkey, o_custkey,
      |  CAST(FLOOR((o_totalprice) * 100 + 0.5) AS BIGINT) AS price_cents
      |FROM orders
      |ORDER BY price_cents DESC, o_orderkey ASC
      |LIMIT 25""".stripMargin) { (s, dir) =>
    Tables.load(s, dir, "orders")
      .select(
        col("o_orderkey"), col("o_custkey"),
        cents(col("o_totalprice")).as("price_cents"))
      .orderBy(col("price_cents").desc, col("o_orderkey").asc)
      .limit(25)
  }

  /** String function surface: substring/upper/lower/trim/concat/like/
    * regexp (SURVEY §2.C string fns row).
    */
  val q7StringFns: Q = Q(
    "q7_string_fns",
    """SELECT c_custkey,
      |  UPPER(c_name) AS uname,
      |  LOWER(c_mktsegment) AS lseg,
      |  SUBSTRING(c_name, 1, 8) AS name8,
      |  CONCAT(c_mktsegment, '#', c_name) AS tagged,
      |  LENGTH(c_name) AS name_len
      |FROM customer
      |WHERE c_name LIKE 'Customer%' AND REGEXP_MATCHES(c_name, '[0-9]$')""".stripMargin) { (s, dir) =>
    Tables.load(s, dir, "customer")
      .filter(col("c_name").like("Customer%") &&
        col("c_name").rlike("[0-9]$"))
      .select(
        col("c_custkey"),
        upper(col("c_name")).as("uname"),
        lower(col("c_mktsegment")).as("lseg"),
        substring(col("c_name"), 1, 8).as("name8"),
        concat(col("c_mktsegment"), lit("#"), col("c_name")).as("tagged"),
        length(col("c_name")).cast("long").as("name_len"))
  }

  /** Second string-function tier (Flink built-ins beyond q7's basics):
    * TRANSLATE, INSTR, LPAD, SPLIT_PART (Flink's SPLIT_INDEX), and
    * STR_TO_MAP with element access. DuckDB has no STR_TO_MAP, so the
    * oracle extracts the same entry with a regex — the values, not the
    * function name, are what's compared. All map-side, codegen'd.
    */
  val q94StringFns2: Q = Q(
    "q94_string_fns2",
    """SELECT c_custkey,
      |  TRANSLATE(c_mktsegment, 'AEIOU', 'aeiou') AS tseg,
      |  CAST(INSTR(c_name, '9') AS BIGINT) AS pos9,
      |  LPAD(CAST(c_custkey AS VARCHAR), 10, '0') AS padded,
      |  SPLIT_PART(c_name, '#', 2) AS name_num,
      |  REGEXP_EXTRACT(CONCAT('seg=', c_mktsegment, ';id=', CAST(c_custkey AS VARCHAR)), 'seg=([^;]*)', 1) AS seg_from_map
      |FROM customer WHERE c_custkey < 1000""".stripMargin) { (s, dir) =>
    Tables.registerAll(s, dir)
    s.sql(
      """SELECT c_custkey,
        |  TRANSLATE(c_mktsegment, 'AEIOU', 'aeiou') AS tseg,
        |  CAST(INSTR(c_name, '9') AS BIGINT) AS pos9,
        |  LPAD(CAST(c_custkey AS STRING), 10, '0') AS padded,
        |  SPLIT_PART(c_name, '#', 2) AS name_num,
        |  STR_TO_MAP(CONCAT('seg=', c_mktsegment, ';id=', CAST(c_custkey AS STRING)), ';', '=')['seg'] AS seg_from_map
        |FROM customer WHERE c_custkey < 1000""".stripMargin)
  }

  /** Date/time function surface over order dates. */
  val q8DatetimeFns: Q = Q(
    "q8_datetime_fns",
    """SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS order_year,
      |  CAST(EXTRACT(month FROM o_orderdate) AS BIGINT) AS order_month,
      |  COUNT(*) AS n_orders,
      |  SUM(CAST(FLOOR((o_totalprice) * 100 + 0.5) AS BIGINT)) / 100.0 AS revenue
      |FROM orders
      |WHERE o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
      |GROUP BY 1, 2""".stripMargin) { (s, dir) =>
    Tables.load(s, dir, "orders")
      .filter(col("o_orderdate") >= to_timestamp(lit("1995-01-01 00:00:00")))
      .groupBy(
        year(col("o_orderdate")).cast("long").as("order_year"),
        month(col("o_orderdate")).cast("long").as("order_month"))
      .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("revenue"))
  }

  /** Math function surface (abs/round/ceil/floor/power/ln/exp are all
    * quantized through integer cents to stay hash-deterministic).
    */
  val q9MathFns: Q = Q(
    "q9_math_fns",
    """SELECT p_partkey,
      |  CAST(FLOOR((SQRT(p_retailprice)) * 100 + 0.5) AS BIGINT) AS sqrt_cents,
      |  CAST(FLOOR((LN(p_retailprice)) * 100 + 0.5) AS BIGINT) AS ln_cents,
      |  CAST(CEIL(p_retailprice) AS BIGINT) AS ceil_price,
      |  CAST(FLOOR(p_retailprice) AS BIGINT) AS floor_price,
      |  ABS(p_size - 25) AS size_dist
      |FROM part
      |WHERE p_retailprice > 1""".stripMargin) { (s, dir) =>
    Tables.load(s, dir, "part")
      .filter(col("p_retailprice") > 1)
      .select(
        col("p_partkey"),
        cents(sqrt(col("p_retailprice"))).as("sqrt_cents"),
        cents(log(col("p_retailprice"))).as("ln_cents"),
        ceil(col("p_retailprice")).cast("long").as("ceil_price"),
        floor(col("p_retailprice")).cast("long").as("floor_price"),
        abs(col("p_size") - 25).as("size_dist"))
  }

  /** GROUPING SETS / ROLLUP (SURVEY §2.C grouping sets row). NULL group
    * keys are COALESCEd so the hash compare is stable.
    */
  val q10Rollup: Q = Q(
    "q10_rollup",
    """SELECT COALESCE(l_returnflag, '<all>') AS returnflag,
      |  COALESCE(l_linestatus, '<all>') AS linestatus,
      |  COUNT(*) AS cnt,
      |  SUM(CAST(FLOOR((l_quantity) * 100 + 0.5) AS BIGINT)) / 100.0 AS sum_qty
      |FROM lineitem
      |GROUP BY ROLLUP(l_returnflag, l_linestatus)""".stripMargin) { (s, dir) =>
    li(s, dir)
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("cnt"), dsum(col("l_quantity")).as("sum_qty"))
      .select(
        coalesce(col("l_returnflag"), lit("<all>")).as("returnflag"),
        coalesce(col("l_linestatus"), lit("<all>")).as("linestatus"),
        col("cnt"), col("sum_qty"))
  }

  /** STDDEV_SAMP / VAR_SAMP aggregates (SURVEY §2.C stats row) —
    * previously pass-through-only with no oracle. Inputs are the
    * integer-valued quantities cast to BIGINT, so both engines
    * aggregate the identical multiset; outputs quantize to milli units
    * (the engines' central-moment accumulations can differ in the last
    * ulps, ~1e-13 relative — after the 1e3 quantization the boundary-
    * flip risk is negligible, and the exact integer n/sum columns pin
    * the group contents independently).
    */
  val q71Stddev: Q = Q(
    "q71_stddev",
    """SELECT l_returnflag,
      |  COUNT(*) AS n,
      |  CAST(SUM(q) AS BIGINT) AS sum_q,
      |  CAST(FLOOR(STDDEV_SAMP(q) * 1000 + 0.5) AS BIGINT) AS stddev_milli,
      |  CAST(FLOOR(VAR_SAMP(q) * 1000 + 0.5) AS BIGINT) AS var_milli
      |FROM (SELECT l_returnflag, CAST(l_quantity AS BIGINT) AS q FROM lineitem)
      |GROUP BY l_returnflag""".stripMargin) { (s, dir) =>
    // l_quantity is whole-valued, so the double→bigint cast is exact in
    // both engines (they differ on fractional casts: Spark truncates,
    // DuckDB rounds — never feed this pattern fractional doubles)
    li(s, dir)
      .select(col("l_returnflag"), col("l_quantity").cast("long").as("q"))
      .groupBy(col("l_returnflag"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("q")).cast("long").as("sum_q"),
        floor(stddev_samp(col("q")) * 1000d + 0.5d).cast("long").as("stddev_milli"),
        floor(var_samp(col("q")) * 1000d + 0.5d).cast("long").as("var_milli"))
  }

  def all: Seq[Q] = Seq(
    q1Agg, q2FilterProject, q3AggDistinct, q4Having, q5CaseWhen,
    q6SortLimit, q7StringFns, q8DatetimeFns, q9MathFns, q10Rollup,
    q71Stddev, q94StringFns2)
}
