package graft.operators

import graft.{SparkEntry, SparkFixture}

/** Dev aid: print executed plans for a comma-list of query names. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = SparkFixture.spark
    args.head.split(",").foreach { n =>
      println(s"===== $n =====")
      println(SparkEntry.queries(n)(spark, "/root/testdata/sf0.001")
        .queryExecution.executedPlan.toString.take(4000))
    }
  }
}
