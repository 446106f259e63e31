package graft.operators

import org.apache.spark.sql.functions._
import Det._

/** Join surface (SURVEY.md §2.C "Joins"): inner/left/semi/anti/theta and
  * multi-way star joins.
  *
  * Scale design: constant-size dimensions (region: 5 rows, nation: 25)
  * are explicitly `broadcast()`; SF-scaled sides (customer, supplier,
  * part) carry no hint so the planner broadcasts at small SF and
  * shuffles at corpus SF; fact-fact joins (orders⋈lineitem) shuffle on
  * the join key once and AQE handles skew.
  */
object Joins {

  /** Star join: orders ⋈ customer ⋈ nation ⋈ region, dims broadcast. */
  val q11JoinInner: Q = Q(
    "q11_join_inner",
    """SELECT r.r_name AS region_name, n.n_name AS nation_name,
      |  COUNT(*) AS n_orders,
      |  SUM(CAST(FLOOR((o.o_totalprice) * 100 + 0.5) AS BIGINT)) / 100.0 AS revenue
      |FROM orders o
      |JOIN customer c ON o.o_custkey = c.c_custkey
      |JOIN nation n ON c.c_nationkey = n.n_nationkey
      |JOIN region r ON n.n_regionkey = r.r_regionkey
      |GROUP BY r.r_name, n.n_name""".stripMargin) { (s, dir) =>
    val orders = Tables.load(s, dir, "orders")
    val customer = Tables.load(s, dir, "customer")
    val nation = Tables.load(s, dir, "nation")
    val region = Tables.load(s, dir, "region")
    // customer scales with SF (not a fixed-size dim like nation/region):
    // no hint — the planner broadcasts at small SF, shuffles at corpus SF
    orders
      .join(customer, orders("o_custkey") === customer("c_custkey"))
      .join(broadcast(nation), customer("c_nationkey") === nation("n_nationkey"))
      .join(broadcast(region), nation("n_regionkey") === region("r_regionkey"))
      .groupBy(region("r_name").as("region_name"), nation("n_name").as("nation_name"))
      .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("revenue"))
  }

  /** Left outer join keeping customers with zero orders. */
  val q12JoinLeft: Q = Q(
    "q12_join_left",
    """SELECT c.c_custkey,
      |  COUNT(o.o_orderkey) AS n_orders,
      |  COALESCE(SUM(CAST(FLOOR((o.o_totalprice) * 100 + 0.5) AS BIGINT)), 0) / 100.0 AS revenue
      |FROM customer c
      |LEFT JOIN orders o ON o.o_custkey = c.c_custkey
      |GROUP BY c.c_custkey""".stripMargin) { (s, dir) =>
    val customer = Tables.load(s, dir, "customer")
    val orders = Tables.load(s, dir, "orders")
    customer
      .join(orders, orders("o_custkey") === customer("c_custkey"), "left")
      .groupBy(customer("c_custkey"))
      .agg(
        count(col("o_orderkey")).as("n_orders"),
        (coalesce(sum(cents(col("o_totalprice"))), lit(0L)) / 100.0d).as("revenue"))
  }

  /** Left-semi join (EXISTS): customers that have at least one urgent order. */
  val q13SemiJoin: Q = Q(
    "q13_semi_join",
    """SELECT c_custkey, c_mktsegment
      |FROM customer c
      |WHERE EXISTS (
      |  SELECT 1 FROM orders o
      |  WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT')""".stripMargin) { (s, dir) =>
    val customer = Tables.load(s, dir, "customer")
    val urgent = Tables.load(s, dir, "orders")
      .filter(col("o_orderpriority") === "1-URGENT")
    customer
      .join(urgent, customer("c_custkey") === urgent("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_mktsegment"))
  }

  /** Left-anti join (NOT EXISTS): parts never ordered. */
  val q14AntiJoin: Q = Q(
    "q14_anti_join",
    """SELECT p_partkey, p_brand
      |FROM part p
      |WHERE NOT EXISTS (
      |  SELECT 1 FROM lineitem l WHERE l.l_partkey = p.p_partkey)""".stripMargin) { (s, dir) =>
    val part = Tables.load(s, dir, "part")
    val lineitem = Tables.load(s, dir, "lineitem")
    part
      .join(lineitem, part("p_partkey") === lineitem("l_partkey"), "left_anti")
      .select(col("p_partkey"), col("p_brand"))
  }

  /** Theta (non-equi) join on tiny dims — broadcast nested-loop. */
  val q15ThetaJoin: Q = Q(
    "q15_theta_join",
    """SELECT r.r_name, n.n_name
      |FROM region r
      |JOIN nation n ON n.n_nationkey > r.r_regionkey + 20""".stripMargin) { (s, dir) =>
    val region = Tables.load(s, dir, "region")
    val nation = Tables.load(s, dir, "nation")
    region.join(broadcast(nation),
        nation("n_nationkey") > region("r_regionkey") + 20)
      .select(col("r_name"), col("n_name"))
  }

  /** TPC-H Q5-shaped 6-way join: local-supplier revenue per nation.
    * Fact-fact orders⋈lineitem shuffles once on orderkey; all dims
    * broadcast; the extra c_nationkey = s_nationkey condition is applied
    * as a post-join filter on broadcast columns.
    */
  val q16JoinQ5: Q = Q(
    "q16_join_q5",
    """SELECT n.n_name AS nation_name,
      |  SUM(CAST(FLOOR((l.l_extendedprice * (1 - l.l_discount)) * 100 + 0.5) AS BIGINT)) / 100.0 AS revenue
      |FROM customer c
      |JOIN orders o ON c.c_custkey = o.o_custkey
      |JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      |JOIN supplier s ON l.l_suppkey = s.s_suppkey
      |JOIN nation n ON s.s_nationkey = n.n_nationkey
      |JOIN region r ON n.n_regionkey = r.r_regionkey
      |WHERE c.c_nationkey = s.s_nationkey
      |GROUP BY n.n_name""".stripMargin) { (s, dir) =>
    val customer = Tables.load(s, dir, "customer")
    val orders = Tables.load(s, dir, "orders")
    val lineitem = Tables.load(s, dir, "lineitem")
    val supplier = Tables.load(s, dir, "supplier")
    val nation = Tables.load(s, dir, "nation")
    val region = Tables.load(s, dir, "region")
    // customer/supplier scale with SF — no broadcast hint (see q11);
    // nation/region are constant-size and stay hinted
    lineitem
      .join(orders, lineitem("l_orderkey") === orders("o_orderkey"))
      .join(customer, customer("c_custkey") === orders("o_custkey"))
      .join(supplier, lineitem("l_suppkey") === supplier("s_suppkey"))
      .filter(customer("c_nationkey") === supplier("s_nationkey"))
      .join(broadcast(nation), supplier("s_nationkey") === nation("n_nationkey"))
      .join(broadcast(region), nation("n_regionkey") === region("r_regionkey"))
      .groupBy(nation("n_name").as("nation_name"))
      .agg(dsum(lineitem("l_extendedprice") * (lit(1d) - lineitem("l_discount")))
        .as("revenue"))
  }

  /** Scalar subquery: orders above the global average price. */
  val q17ScalarSubquery: Q = Q(
    "q17_scalar_subquery",
    """SELECT o_orderkey,
      |  CAST(FLOOR((o_totalprice) * 100 + 0.5) AS BIGINT) AS price_cents
      |FROM orders
      |WHERE o_totalprice > 2 * (
      |  SELECT SUM(CAST(FLOOR((o_totalprice) * 100 + 0.5) AS BIGINT)) / 100.0 / COUNT(*) FROM orders)""".stripMargin) { (s, dir) =>
    Tables.registerAll(s, dir)
    s.sql(
      """SELECT o_orderkey,
        |  CAST(FLOOR((o_totalprice) * 100 + 0.5) AS BIGINT) AS price_cents
        |FROM orders
        |WHERE o_totalprice > 2 * (
        |  SELECT SUM(CAST(FLOOR((o_totalprice) * 100 + 0.5) AS BIGINT)) / 100.0 / COUNT(*) FROM orders)""".stripMargin)
  }

  /** Correlated EXISTS with a cross-table inequality conjunct (TPC-H Q4
    * shape): orders with at least one lineitem shipped after the order
    * date. Decorrelates to a left-semi join whose condition mixes the
    * equi key with the non-equi date compare — the semi join shuffles
    * on the key, the inequality evaluates post-match.
    */
  val q54ExistsIneq: Q = Q(
    "q54_exists_ineq",
    """SELECT o_orderpriority, COUNT(*) AS order_count
      |FROM orders o
      |WHERE EXISTS (
      |  SELECT 1 FROM lineitem l
      |  WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate)
      |GROUP BY o_orderpriority""".stripMargin) { (s, dir) =>
    Tables.registerAll(s, dir)
    s.sql(
      """SELECT o_orderpriority, COUNT(*) AS order_count
        |FROM orders o
        |WHERE EXISTS (
        |  SELECT 1 FROM lineitem l
        |  WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate)
        |GROUP BY o_orderpriority""".stripMargin)
  }

  /** Conditional revenue ratio per ship month (TPC-H Q14 shape): promo
    * parts' share of discounted revenue. No broadcast hint on part —
    * unlike nation/region it grows with the scale factor, so the
    * planner/AQE picks broadcast at small SF and shuffled join at
    * corpus scale. Revenue terms quantize to cents before summing so
    * the ratio is an exact integer division both engines compute
    * identically.
    */
  val q55PromoRatio: Q = Q(
    "q55_promo_ratio",
    """WITH r AS (
      |  SELECT EXTRACT(YEAR FROM l.l_shipdate) AS yr,
      |    EXTRACT(MONTH FROM l.l_shipdate) AS mo,
      |    CAST(FLOOR(l.l_extendedprice * (1 - l.l_discount) * 100 + 0.5) AS BIGINT) AS rev_cents,
      |    CASE WHEN p.p_type LIKE 'PROMO%' THEN 1 ELSE 0 END AS promo
      |  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey)
      |SELECT yr, mo,
      |  CAST(SUM(promo * rev_cents) AS BIGINT) AS promo_cents,
      |  CAST(SUM(rev_cents) AS BIGINT) AS total_cents,
      |  CAST(FLOOR(SUM(promo * rev_cents) * 100000.0 / SUM(rev_cents) + 0.5) AS BIGINT) AS promo_share_e5
      |FROM r GROUP BY yr, mo""".stripMargin) { (s, dir) =>
    val l = Tables.load(s, dir, "lineitem")
    val p = Tables.load(s, dir, "part")
    val revCents = floor(col("l_extendedprice") * (lit(1) - col("l_discount"))
      * 100d + 0.5d).cast("long")
    l.join(p, col("l_partkey") === col("p_partkey"))
      .select(
        year(col("l_shipdate")).cast("long").as("yr"),
        month(col("l_shipdate")).cast("long").as("mo"),
        revCents.as("rev_cents"),
        when(col("p_type").like("PROMO%"), 1).otherwise(0).as("promo"))
      .groupBy(col("yr"), col("mo"))
      .agg(
        sum(col("promo") * col("rev_cents")).as("promo_cents"),
        sum(col("rev_cents")).as("total_cents"),
        floor(sum(col("promo") * col("rev_cents")) * 100000.0d /
          sum(col("rev_cents")) + 0.5d).cast("long").as("promo_share_e5"))
  }

  /** RIGHT and FULL OUTER equi-joins — the reference's pass-through
    * router admits both (`SQLSubmitAction.java:76`), previously covered
    * only by Catalyst pass-through with no oracle. Big-spender order
    * counts FULL OUTER negative-balance customers (both sides produce
    * unmatched rows), then the combined frame RIGHT JOINs the full
    * customer table so right-side row preservation is exercised too.
    * No hints: every side scales with SF, so the planner broadcasts at
    * small SF and shuffles at corpus scale.
    */
  val q70OuterJoin: Q = Q(
    "q70_outer_join",
    """WITH big AS (
      |  SELECT o_custkey AS k, COUNT(*) AS n_big
      |  FROM orders WHERE o_totalprice > 450000 GROUP BY o_custkey),
      |neg AS (
      |  SELECT c_custkey AS k,
      |    CAST(FLOOR((c_acctbal) * 100 + 0.5) AS BIGINT) AS bal_cents
      |  FROM customer WHERE c_acctbal < 0),
      |fo AS (
      |  SELECT COALESCE(b.k, n.k) AS k, b.n_big, n.bal_cents
      |  FROM big b FULL OUTER JOIN neg n ON b.k = n.k)
      |SELECT c.c_custkey, c.c_mktsegment, fo.n_big, fo.bal_cents
      |FROM fo RIGHT JOIN customer c ON fo.k = c.c_custkey""".stripMargin) { (s, dir) =>
    val orders = Tables.load(s, dir, "orders")
    val customer = Tables.load(s, dir, "customer")
    val big = orders.filter(col("o_totalprice") > 450000d)
      .groupBy(col("o_custkey").as("k")).agg(count(lit(1)).as("n_big"))
    val neg = customer.filter(col("c_acctbal") < 0d)
      .select(col("c_custkey").as("nk"), cents(col("c_acctbal")).as("bal_cents"))
    val fo = big.join(neg, col("k") === col("nk"), "full_outer")
      .select(coalesce(col("k"), col("nk")).as("fk"), col("n_big"), col("bal_cents"))
    // `neg` shares the customer lineage, so the second customer use is
    // a self-join: disambiguate with dataset aliases + qualified names
    fo.as("fo")
      .join(customer.as("c"), col("fo.fk") === col("c.c_custkey"), "right")
      .select(col("c.c_custkey"), col("c.c_mktsegment"),
        col("fo.n_big"), col("fo.bal_cents"))
  }

  def all: Seq[Q] = Seq(
    q11JoinInner, q12JoinLeft, q13SemiJoin, q14AntiJoin, q15ThetaJoin,
    q16JoinQ5, q17ScalarSubquery, q54ExistsIneq, q55PromoRatio,
    q70OuterJoin)
}
