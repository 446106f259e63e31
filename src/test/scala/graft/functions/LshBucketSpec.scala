package graft.functions

import graft.SparkFixture
import org.scalatest.funsuite.AnyFunSuite

/** The LSH bucket's plane-count knob: more planes refine (never
  * re-shuffle across) the 8-plane default buckets, the default stays
  * byte-identical to the 1-arg form, and out-of-range counts fail.
  */
class LshBucketSpec extends AnyFunSuite {

  test("planes argument refines buckets; default equals the 1-arg form") {
    val spark = SparkFixture.spark
    GraftFunctions.register(spark)
    val rows = spark.sql(
      """SELECT graft_lsh_bucket(v) AS b1,
        |  graft_lsh_bucket(v, 8) AS b8,
        |  graft_lsh_bucket(v, 12) AS b12
        |FROM VALUES
        |  (array(0.3D, -0.7D, 0.2D, 0.9D)),
        |  (array(-0.1D, 0.4D, -0.6D, 0.5D)),
        |  (array(0.8D, 0.1D, 0.1D, -0.3D)) AS t(v)""".stripMargin)
      .collect()
    rows.foreach { r =>
      assert(r.getLong(0) == r.getLong(1)) // default = 8 planes
      // extra planes only ADD high bits: the low 8 bits are unchanged,
      // so a 12-plane bucket is a strict refinement of the 8-plane one
      assert((r.getLong(2) & 0xffL) == r.getLong(1))
    }
    val e = intercept[Exception](spark.sql(
      "SELECT graft_lsh_bucket(array(1.0D), 64)").collect())
    assert(e.getMessage.contains("planes") ||
      Option(e.getCause).exists(_.getMessage.contains("planes")),
      e.getMessage)
  }

  test("planes must be a constant: a per-row INT column is rejected at analysis") {
    val spark = SparkFixture.spark
    GraftFunctions.register(spark)
    // planes is a plan-wide scale knob — a non-foldable expression
    // would silently yield per-row plane counts; the analyzer must
    // reject it by name, and an out-of-range LITERAL must fail at
    // analysis time too (not per-row at runtime)
    val e = intercept[Exception](spark.sql(
      """SELECT graft_lsh_bucket(array(1.0D), p)
        |FROM VALUES (8), (12) AS t(p)""".stripMargin).collect())
    assert(e.getMessage.contains("INT literal"), e.getMessage)
    val e2 = intercept[Exception](spark.sql(
      "SELECT graft_lsh_bucket(array(1.0D), 0)").collect())
    assert(e2.getMessage.contains("[1, 63]"), e2.getMessage)
  }
}
