package graft.operators

import graft.SparkFixture
import org.scalatest.funsuite.AnyFunSuite

/** Bucketed co-located join: both sides pre-bucketed on the join key ⇒
  * SortMergeJoin with no shuffle Exchange on either side.
  */
class BucketingSpec extends AnyFunSuite {

  test("join of two same-bucketed tables has no shuffle exchange") {
    val spark = SparkFixture.spark
    import spark.implicits._
    val sf = "/root/testdata/sf0.001"
    // disable auto-broadcast so the join strategy decision is about
    // bucketing, not table size
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      Bucketing.saveBucketed(
        Tables.load(spark, sf, "orders"), "b_orders", 4, Seq("o_orderkey"))
      Bucketing.saveBucketed(
        Tables.load(spark, sf, "lineitem")
          .withColumnRenamed("l_orderkey", "o_orderkey"),
        "b_lineitem", 4, Seq("o_orderkey"))
      val joined = Bucketing.bucketedJoin(
        spark, "b_orders", "b_lineitem", Seq("o_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
      assert(joined.count() > 0)
    } finally {
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }
}
