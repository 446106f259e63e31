package graft.operators

import org.apache.spark.sql.functions._

/** Set-operation surface: UNION [ALL] / INTERSECT / EXCEPT
  * (SURVEY.md §2.C "Sort / limit / set ops").
  */
object SetOps {

  /** UNION ALL of two role-tagged projections + distinct UNION on top. */
  val q23UnionAll: Q = Q(
    "q23_union_all",
    """SELECT 'customer' AS kind, c_nationkey AS nationkey FROM customer
      |UNION ALL
      |SELECT 'supplier' AS kind, s_nationkey AS nationkey FROM supplier""".stripMargin) { (s, dir) =>
    val c = Tables.load(s, dir, "customer")
      .select(lit("customer").as("kind"), col("c_nationkey").as("nationkey"))
    val sup = Tables.load(s, dir, "supplier")
      .select(lit("supplier").as("kind"), col("s_nationkey").as("nationkey"))
    c.unionAll(sup)
  }

  /** INTERSECT: nations that have both customers and suppliers. */
  val q24Intersect: Q = Q(
    "q24_intersect",
    """SELECT c_nationkey AS nationkey FROM customer
      |INTERSECT
      |SELECT s_nationkey AS nationkey FROM supplier""".stripMargin) { (s, dir) =>
    val c = Tables.load(s, dir, "customer").select(col("c_nationkey").as("nationkey"))
    val sup = Tables.load(s, dir, "supplier").select(col("s_nationkey").as("nationkey"))
    c.intersect(sup)
  }

  /** EXCEPT: nations with customers but no suppliers. */
  val q25Except: Q = Q(
    "q25_except",
    """SELECT c_nationkey AS nationkey FROM customer
      |EXCEPT
      |SELECT s_nationkey AS nationkey FROM supplier""".stripMargin) { (s, dir) =>
    val c = Tables.load(s, dir, "customer").select(col("c_nationkey").as("nationkey"))
    val sup = Tables.load(s, dir, "supplier").select(col("s_nationkey").as("nationkey"))
    c.except(sup)
  }

  /** DISTINCT projection (exact dedup of a key tuple). */
  val q26Distinct: Q = Q(
    "q26_distinct",
    """SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem""".stripMargin) { (s, dir) =>
    Tables.load(s, dir, "lineitem")
      .select(col("l_returnflag"), col("l_linestatus"))
      .distinct()
  }

  /** INTERSECT ALL (multiset): per part, min(multiplicity) of its
    * 'R'-flag and 'A'-flag lineitems survive — duplicate-preserving
    * semantics DISTINCT-based INTERSECT can't express. Catalyst plans
    * this as a counted aggregate + generate (no join blowup).
    */
  val q88IntersectAll: Q = Q(
    "q88_intersect_all",
    """SELECT l_partkey AS partkey FROM lineitem WHERE l_returnflag = 'R'
      |INTERSECT ALL
      |SELECT l_partkey AS partkey FROM lineitem WHERE l_returnflag = 'A'""".stripMargin) { (s, dir) =>
    val li = Tables.load(s, dir, "lineitem")
    val r = li.filter(col("l_returnflag") === "R").select(col("l_partkey").as("partkey"))
    val a = li.filter(col("l_returnflag") === "A").select(col("l_partkey").as("partkey"))
    r.intersectAll(a)
  }

  /** EXCEPT ALL (multiset difference): each part's 'R' occurrences
    * minus its 'A' occurrences, surplus copies retained.
    */
  val q89ExceptAll: Q = Q(
    "q89_except_all",
    """SELECT l_partkey AS partkey FROM lineitem WHERE l_returnflag = 'R'
      |EXCEPT ALL
      |SELECT l_partkey AS partkey FROM lineitem WHERE l_returnflag = 'A'""".stripMargin) { (s, dir) =>
    val li = Tables.load(s, dir, "lineitem")
    val r = li.filter(col("l_returnflag") === "R").select(col("l_partkey").as("partkey"))
    val a = li.filter(col("l_returnflag") === "A").select(col("l_partkey").as("partkey"))
    r.exceptAll(a)
  }

  def all: Seq[Q] = Seq(q23UnionAll, q24Intersect, q25Except, q26Distinct,
    q88IntersectAll, q89ExceptAll)
}
