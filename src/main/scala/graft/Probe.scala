package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Dev-only timing probe: runs selected queries N times each (same
  * methodology as Bench: `.count()` the DataFrame) and prints per-run
  * seconds plus the number of Spark jobs each run launched — the
  * round-trip/job-overhead signal Bench's single reading hides.
  *
  * Usage: sbt "runMain graft.Probe q1,q2 [repeats]"
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val names = args.headOption.getOrElse("q1_agg").split(",").map(_.trim)
    val repeats = if (args.length > 1) args(1).toInt else 3
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
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(s: SparkListenerJobStart): Unit =
        jobs.incrementAndGet(): Unit
    })
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      (1 to repeats).foreach { i =>
        spark.sharedState.cacheManager.clearCache()
        jobs.set(0)
        val t0 = System.nanoTime()
        val n = fn(spark, sfDir).count()
        val dt = (System.nanoTime() - t0) / 1e9
        println(f"[probe] $name run$i: $dt%.3f s, rows=$n, jobs=${jobs.get()}" +
          s", propRounds=${graft.operators.Graph.lastPropRounds}" +
          s"(conv=${graft.operators.Graph.lastPropConverged})" +
          s", starRounds=${graft.operators.Graph.lastStarRounds}")
      }
    }
    spark.stop()
  }
}
