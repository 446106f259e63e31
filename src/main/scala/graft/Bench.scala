package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every registered query on SPARK_GRAFT_SF_DIR and
  * prints ONE JSON line with per-query seconds and the total.
  *
  * A short untimed warmup (flagship query + a row-count per table) runs
  * first so JIT compilation, codegen caches, and parquet footer reads
  * don't land in the first measured query.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // contract: bench runs at local[32]; default to the machine's cores
    // rather than a fixed small number so an unset env var doesn't
    // silently under-parallelize the measured run
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.min(32, Runtime.getRuntime.availableProcessors()).toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // 1-minute system load average, sampled at start and end: a bench
    // entry far above its isolated-run time with loadavg >> cores is a
    // shared-box contention episode, not a regression (this has cost
    // two rounds of adjudication; now the evidence rides the JSON)
    def loadAvg(): Double =
      java.lang.management.ManagementFactory
        .getOperatingSystemMXBean.getSystemLoadAverage
    val loadStart = loadAvg()

    // dev aid: SPARK_GRAFT_ONLY=q1_agg,q16_join_q5 times a subset
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).toSet)

    // one stuck query must not stall the whole bench line: run each
    // bounded (see graft.Timeouts) with a per-query ceiling
    val timeoutSec =
      sys.env.getOrElse("SPARK_GRAFT_QUERY_TIMEOUT_SEC", "300").toLong
    def bounded(name: String)(body: => Unit): Option[String] =
      Timeouts.bounded(spark, name, timeoutSec)(body)
    // set once any query times out; cache cleanup is skipped from then
    // on to avoid deadlocking against the leaked thread's cache locks
    var degraded = false

    // JMH-style warmup: run every measured query once at the smallest
    // scale factor (sf0.001 when present, else the target dir) so codegen
    // compilation and JIT of each query's generated classes happen before
    // its timed run — the timed pass then measures execution, not
    // first-call compilation. Skippable via SPARK_GRAFT_NO_WARMUP=1.
    if (!sys.env.get("SPARK_GRAFT_NO_WARMUP").contains("1")) {
      val warmDir = {
        val small = new java.io.File("/root/testdata/sf0.001")
        if (small.isDirectory) small.getPath else sfDir
      }
      try graft.operators.Tables.names.foreach(n =>
        graft.operators.Tables.load(spark, sfDir, n).count())
      catch { case _: Throwable => () }
      SparkEntry.queries.toSeq.sortBy(_._1)
        .filter { case (name, _) => only.forall(_.contains(name)) }
        .foreach { case (name, fn) =>
          if (bounded(s"warmup:$name")(fn(spark, warmDir).count())
              .exists(_.startsWith(Timeouts.TimeoutPrefix)))
            degraded = true
        }
      if (!degraded) Timeouts.boundedClearCache(spark, timeoutSec): Unit
    }
    val failures = scala.collection.mutable.Buffer.empty[String]
    var i = 0
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .map { case (name, fn) =>
      // drop state retained by earlier queries (cached relations,
      // unreferenced broadcasts) so later joins aren't pushed into
      // spill by accumulated heap pressure — measured 10x on the
      // heaviest join when 60+ queries share one JVM; the full GC is
      // periodic so its fixed cost doesn't tax every small query.
      // After any timeout, cleanup is skipped entirely — a leaked
      // thread may hold cache locks (see Timeouts.boundedClearCache)
      if (!degraded &&
          Timeouts.boundedClearCache(spark, timeoutSec).isDefined)
        degraded = true
      i += 1
      if (i % 8 == 0) System.gc()
      val t0 = System.nanoTime()
      bounded(name)(fn(spark, sfDir).count()).foreach { reason =>
        failures += name
        if (reason.startsWith(Timeouts.TimeoutPrefix)) degraded = true
        System.err.println(s"[bench] $name FAILED: $reason")
      }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val failed = failures.toSet
    def f3(v: Double): String = "%.3f".formatLocal(java.util.Locale.ROOT, v)
    val fs = failures.map("\"" + _ + "\"").mkString("[", ",", "]")
    // a timed-out query would otherwise add its whole ceiling (~300 s)
    // to the headline number and make round totals incomparable; the
    // `failures` list carries that signal instead
    val ok = results.filterNot { case (k, _) => failed(k) }
    val total = if (ok.nonEmpty) ok.map(_._2).sum else 0.0
    val loadEnd = loadAvg()
    def line(qs: Seq[(String, Double)], extra: String): String = {
      val qj = qs.map { case (k, v) => "\"" + k + "\":" + f3(v) }
        .mkString("{", ",", "}")
      s"""{"metric":"total","value":${f3(total)},"unit":"sec"""" +
        s""","queries":$qj,"failures":$fs,"sf":"$sfDir"""" +
        s""","loadavg_start":${f3(loadStart)},"loadavg_end":${f3(loadEnd)}""" +
        extra + "}"
    }
    // The complete per-query reading goes to a FILE: at 170+ queries
    // the full line is ~4 KiB, and the capture window that records
    // this process's output keeps only its last ~2 KiB — a full line
    // printed to stdout loses its head (the `{"metric":...` opener)
    // and never parses (BENCH_r01/BENCH_r13). The printed line is a
    // tail-safe summary: same schema, with `queries` holding only the
    // SLOWEST entries that fit a ~1.2 KiB budget (the informative
    // tail of the distribution) and the rest counted + pointed at.
    val fullPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH_FULL.json")
    try {
      val w = new java.io.PrintWriter(fullPath, "UTF-8")
      try w.println(line(results, "")) finally w.close()
    } catch { case e: Exception =>
      System.err.println(s"[bench] could not write $fullPath: $e")
    }
    val byTime = results.sortBy(-_._2)
    val budget = 1200
    var used = 0
    val kept = byTime.takeWhile { case (k, _) =>
      used += k.length + 10; used <= budget
    }
    println(line(kept.sortBy(_._1),
      s""","n_queries":${results.size},"queries_truncated":${results.size - kept.size},"queries_file":"$fullPath""""))
    spark.stop()
  }
}
