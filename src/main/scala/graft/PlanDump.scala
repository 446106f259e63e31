package graft

import org.apache.spark.sql.SparkSession

/** Dumps `.explain("formatted")` for registered queries to files.
  *
  * Usage: sbt "runMain graft.PlanDump <outDir> [suffix] [q1,q2,...]"
  * Writes <outDir>/<query>_<suffix>.txt for each selected query (all
  * registered queries when no list is given). Used to commit the
  * optimization-round plan evidence under plans/r21 (before/after files).
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = args.headOption.getOrElse("plans/r21")
    val suffix = if (args.length > 1) args(1) else "before"
    val only = if (args.length > 2)
      Some(args(2).split(",").map(_.trim).toSet) else None
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.min(32, Runtime.getRuntime.availableProcessors()).toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
        try {
          val df = fn(spark, sfDir)
          val plan = df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
          val w = new java.io.PrintWriter(
            s"$outDir/${name}_$suffix.txt", "UTF-8")
          try w.println(plan) finally w.close()
        } catch {
          case e: Exception =>
            System.err.println(s"[plandump] $name FAILED: $e")
        }
      }
    spark.stop()
  }
}
