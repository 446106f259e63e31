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

  test("partitioned layout prunes non-matching partitions at plan time") {
    val spark = SparkFixture.spark
    val sf = "/root/testdata/sf0.001"
    val path = "/tmp/graft_part_docs"
    Bucketing.savePartitioned(
      Tables.load(spark, sf, "documents"), path, Seq("lang"))
    val langs = spark.read.parquet(path)
      .select("lang").distinct().count()
    assert(langs > 1, "need multiple partitions for a meaningful prune")
    val pruned = spark.read.parquet(path)
      .filter(org.apache.spark.sql.functions.col("lang") === "en")
    val scan = pruned.queryExecution.executedPlan.collectFirst {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.get
    // the lang predicate must land in PartitionFilters (directory
    // pruning), not PushedFilters (row-group skipping)
    assert(scan.partitionFilters.exists(_.toString.contains("lang")),
      s"partition filter missing: ${scan.partitionFilters}")
    // and the pruned scan must read strictly fewer files than the
    // full-table scan while returning exactly the en rows. collect()
    // executes this dataframe's own plan instance, so the captured
    // scan's metrics populate (count() would build a new plan)
    assert(pruned.collect().nonEmpty)
    val fullScan = spark.read.parquet(path).queryExecution.executedPlan
      .collectFirst { case f: org.apache.spark.sql.execution.FileSourceScanExec => f }.get
    val filesRead = scan.metrics("numFiles").value
    assert(filesRead > 0 && filesRead < fullScan.relation.location.inputFiles.length,
      s"no pruning: read $filesRead of ${fullScan.relation.location.inputFiles.length}")
  }
}
