package graft.operators

import graft.SparkFixture
import org.scalatest.funsuite.AnyFunSuite

/** AQE skew handling: a sort-merge join with one hot key must be split
  * by OptimizeSkewedJoin at runtime (the engine's answer to skewed
  * 100 TB joins, alongside the manual salting shown in q39_salted_agg).
  */
class AdaptiveSpec extends AnyFunSuite {

  test("AQE splits the skewed partition of a sort-merge join") {
    val spark = SparkFixture.spark
    import spark.implicits._
    val saved = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes")
      .map(k => k -> spark.conf.getOption(k)).toMap
    try {
      // force SMJ and make the skew detector fire at toy scale
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "8KB")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8KB")
      // 50k rows on ONE key vs a handful elsewhere ⇒ one hot partition
      val left = spark.range(0, 50000).select(
          (($"id" % 10) * ($"id" % 10) % 7 * 0).as("k"), $"id".as("v"))
        .union(spark.range(0, 40).select(($"id" % 4 + 1).as("k"), $"id".as("v")))
      val right = spark.range(0, 5).select($"id".as("k"), $"id".as("w"))
      val joined = left.join(right, "k")
      // collect() executes this dataframe's own AQE plan instance, so
      // the final adaptive plan is inspectable afterwards
      assert(joined.collect().length == 50040)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"no skew split in adaptive plan:\n$plan")
    } finally saved.foreach { case (k, v) =>
      v.fold(spark.conf.unset(k))(spark.conf.set(k, _))
    }
  }
}
