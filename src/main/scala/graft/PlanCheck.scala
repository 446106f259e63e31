package graft

import org.apache.spark.sql.SparkSession

/** Plan-quality inspector: prints `explain(formatted)` for selected
  * queries and greps for the properties that matter at scale —
  * PushedFilters reaching the parquet scan, pruned ReadSchema,
  * broadcast joins on dimension tables, TakeOrderedAndProject instead
  * of global sorts, WholeStageCodegen coverage.
  *
  * Usage: runMain graft.PlanCheck [sfDir] [queryName ...]
  */
object PlanCheck {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = if (args.length > 1) args.drop(1).toSet else Set.empty[String]
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", "local[4]"))
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.registry
      .filter(q => names.isEmpty || names.contains(q.name))
      .foreach { q =>
        println(s"\n========== ${q.name} ==========")
        try {
          val df = q.fn(spark, sfDir)
          println(df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode))
        } catch {
          case e: Throwable => println(s"FAILED: ${e.getMessage}")
        }
      }
    spark.stop()
  }
}
