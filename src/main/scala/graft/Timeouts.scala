package graft

import org.apache.spark.sql.SparkSession

/** Shared cancellable-timeout runner for the Verify and Bench harness
  * loops: one stuck query must not stall a round.
  *
  * The body runs on a worker thread under its own job group; on timeout
  * `cancelJobGroupAndFutureJobs` makes the cancellation *sticky*, so
  * jobs the leaked body submits after the deadline (a driver that was
  * between jobs at cancel time, AQE re-planning, a multi-action query)
  * are killed on arrival instead of competing with later queries. A
  * body hung purely driver-side (no Spark job at all) cannot be
  * interrupted and keeps its thread — bounded by one thread per
  * timed-out query.
  */
object Timeouts {

  /** Marker prefix so callers can tell a timeout from a query error. */
  val TimeoutPrefix = "timeout "

  /** Run `body` with a ceiling; returns None on success, Some(reason)
    * on timeout or failure.
    */
  def bounded(spark: SparkSession, name: String, timeoutSec: Long)(
      body: => Unit): Option[String] = {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    try {
      Await.result(Future {
        // job-group is thread-local: set it on the executing thread.
        // The active session is too (an InheritableThreadLocal a pool
        // thread may or may not have picked up at creation): without
        // pinning it, SQLConf.get on this thread falls back to the
        // default conf, so session confs a query depends on (e.g. the
        // nanosAsLong parquet mapping in Tables.loadEvents) silently
        // vanish for whichever queries land on an unlucky thread.
        SparkSession.setActiveSession(spark)
        spark.sparkContext.setJobGroup(name, s"bounded:$name",
          interruptOnCancel = true)
        body
      }, timeoutSec.seconds)
      None
    } catch {
      case _: java.util.concurrent.TimeoutException =>
        spark.sparkContext.cancelJobGroupAndFutureJobs(
          name, s"timed out after ${timeoutSec}s")
        Some(s"$TimeoutPrefix${timeoutSec}s")
      case e: Throwable => Some(String.valueOf(e.getMessage))
    }
  }

  /** Cache cleanup between queries, deadlock-safe.
    *
    * `clearCache` from the driver loop while a timed-out query's leaked
    * thread is still materializing a persisted relation deadlocks:
    * clearCache takes CacheManager → per-builder monitors, the
    * materializer takes its builder monitor → CacheManager (observed as
    * a JVM-reported deadlock). So cleanup itself runs bounded — if it
    * can't finish it is abandoned (one stuck thread, loop continues) —
    * and after any timeout callers should stop clearing entirely
    * (degraded mode: caches accumulate, results stay correct).
    */
  def boundedClearCache(spark: SparkSession, timeoutSec: Long): Option[String] =
    bounded(spark, s"clear-cache-${System.nanoTime()}", timeoutSec) {
      spark.catalog.clearCache()
      // also drop leftover localCheckpoint blocks: clearCache only
      // covers CacheManager entries, while the query library's lazy
      // localCheckpoints register plain persisted RDDs that otherwise
      // wait for GC + ContextCleaner — stale blocks from earlier
      // queries inflate later ones' storage pressure in a long run
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
    }
}
