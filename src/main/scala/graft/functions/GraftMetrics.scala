package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** Surfaces `Dataset.observe` metrics named `graft_*` — the
  * no-silent-caps rule: whenever an operator bounds its coverage (the
  * dedup document-frequency cap), the dropped count is computed inline
  * by the query (one `observe` aggregate, no extra pass) and logged
  * here on completion, so a capped run is visibly capped.
  */
object GraftMetrics {
  private val registered = java.util.Collections.newSetFromMap(
    new java.util.WeakHashMap[SparkSession, java.lang.Boolean]())

  /** Idempotent per-session listener registration. */
  def ensureListener(spark: SparkSession): Unit = synchronized {
    if (registered.add(spark)) {
      spark.listenerManager.register(new QueryExecutionListener {
        override def onSuccess(
            funcName: String, qe: QueryExecution, durationNs: Long): Unit =
          qe.observedMetrics.foreach { case (name, row) =>
            if (name.startsWith("graft_"))
              Console.err.println(s"[graft-metrics] $name: $row")
          }
        override def onFailure(
            funcName: String, qe: QueryExecution, exception: Exception): Unit =
          ()
      })
    }
  }
}
