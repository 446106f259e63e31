package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.catalyst.plans.logical.EventTimeWatermark

/** Watermark application that tolerates an upstream definition. A CLI
  * source view registers its DDL `WATERMARK FOR col` as a
  * `withWatermark` on the relation (SqlSubmitAction's source
  * decorations), and every stateful rewrite downstream needs one too —
  * but Spark disallows stacking a second `EventTimeWatermark` over the
  * first ("Redefining watermark is disallowed" once
  * `spark.sql.streaming.statefulOperator.allowMultiple` is on, the
  * default). The harness guarantees both definitions agree (the
  * rewrites resolve their event-time column and delay from the same
  * DDL via `watermarkOf`), so reusing the existing node is exact, not
  * an approximation; direct tracker invocations over raw views (the
  * spec pattern) still get the watermark applied here.
  */
object Watermarks {

  /** `ds.withWatermark(column, delay)` unless an existing event-time
    * watermark node already DEFINES this column — same attribute name,
    * or the column carries the event-time delay tag (how a rename or
    * cast of the watermarked attribute identifies itself: the harness
    * rewrites project the source's watermarked column to `ts` via
    * [[eventTimeCol]], which propagates the tag). A node on an
    * UNRELATED column is not a substitute — a direct caller asking
    * for a fresh, untagged column still gets its own watermark (an
    * upstream node on another attribute is legal input state, e.g. a
    * join side watermarked elsewhere). When the reused definition's
    * delay differs from the request, a warning logs the divergence —
    * stacking a second definition over one attribute is what Spark
    * rejects ("Redefining watermark is disallowed"), so the upstream
    * delay wins.
    */
  def ensure[T](ds: Dataset[T], column: String, delay: String): Dataset[T] = {
    val existing = ds.queryExecution.analyzed.collect {
      case e: EventTimeWatermark => e
    }
    val tagged = ds.schema.find(_.name.equalsIgnoreCase(column))
      .exists(_.metadata.contains(EventTimeWatermark.delayKey))
    if (existing.isEmpty) ds.withWatermark(column, delay)
    else if (tagged ||
        existing.exists(_.eventTime.name.equalsIgnoreCase(column))) {
      val want = org.apache.spark.sql.catalyst.util.IntervalUtils
        .fromIntervalString(delay)
      if (!existing.exists(_.delay == want) && log.isWarnEnabled)
        log.warn(s"reusing existing watermark for $column (delays " +
          s"${existing.map(_.delay).mkString(", ")}) instead of " +
          s"requested $delay")
      ds
    } else ds.withWatermark(column, delay)
  }

  private lazy val log =
    org.slf4j.LoggerFactory.getLogger(Watermarks.getClass)

  /** `col(column).cast("timestamp").as(alias)`, carrying the column's
    * event-time watermark tag (if any) through the cast. A plain cast
    * alias drops attribute metadata, and `flatMapGroupsWithState` with
    * an event-time timeout requires a delay-tagged attribute in its
    * child output even when the watermark node itself sits upstream of
    * the projection — without the tag, a tracker over a
    * source-watermarked relation fails analysis.
    */
  def eventTimeCol(df: org.apache.spark.sql.DataFrame, column: String,
      alias: String): org.apache.spark.sql.Column = {
    val c = org.apache.spark.sql.functions.col(column).cast("timestamp")
    df.schema.find(_.name.equalsIgnoreCase(column))
      .filter(_.metadata.contains(EventTimeWatermark.delayKey))
      .map(f => c.as(alias, f.metadata))
      .getOrElse(c.as(alias))
  }
}
