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

  /** `ds.withWatermark(column, delay)` unless the analyzed plan
    * already carries an event-time watermark node.
    */
  def ensure[T](ds: Dataset[T], column: String, delay: String): Dataset[T] =
    if (ds.queryExecution.analyzed.exists(_.isInstanceOf[EventTimeWatermark]))
      ds
    else ds.withWatermark(column, delay)

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
