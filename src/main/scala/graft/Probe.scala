package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
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
    // per-job wall times + stage task summaries so a probe run shows WHERE
    // a multi-job query spends its seconds (SPARK_GRAFT_PROBE_JOBS=1)
    val verbose = sys.env.get("SPARK_GRAFT_PROBE_JOBS").contains("1")
    val jobStartNs = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(s: SparkListenerJobStart): Unit = {
        jobs.incrementAndGet()
        jobStartNs.put(s.jobId, System.nanoTime()): Unit
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = if (verbose) {
        val t0 = jobStartNs.getOrDefault(e.jobId, 0L)
        if (t0 > 0)
          println(f"  [job ${e.jobId}%3d] ${(System.nanoTime() - t0) / 1e9}%7.3f s")
      }
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit =
        if (verbose) {
          val si = sc.stageInfo
          val ms = si.completionTime.flatMap(c =>
            si.submissionTime.map(c - _)).getOrElse(-1L)
          val tm = si.taskMetrics
          println(f"    [stage ${si.stageId}%3d] $ms%6d ms wall, " +
            f"${tm.executorRunTime}%6d ms run, " +
            f"${tm.executorCpuTime / 1000000}%6d ms cpu, " +
            f"${si.numTasks}%3d tasks, " +
            f"sr=${tm.shuffleReadMetrics.totalBytesRead / 1024}%dK " +
            f"sw=${tm.shuffleWriteMetrics.bytesWritten / 1024}%dK  " +
            si.name.takeWhile(_ != '(').trim)
        }
    })
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      (1 to repeats).foreach { i =>
        spark.sharedState.cacheManager.clearCache()
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = false))
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
