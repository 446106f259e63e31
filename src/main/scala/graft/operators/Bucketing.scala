package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table helpers: pre-shuffle once at write time so repeated
  * joins/aggregations on the bucket keys run shuffle-free (SURVEY.md
  * §2.C join surface; the co-located-join strategy for 100 TB fact
  * tables that are joined on the same key every day).
  *
  * `spark.sql.sources.bucketing.enabled` is on by default; both sides
  * bucketed into the same count on the join key ⇒ SortMergeJoin with no
  * Exchange.
  */
object Bucketing {

  def saveBucketed(
      df: DataFrame,
      table: String,
      buckets: Int,
      keys: Seq[String]): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .format("parquet")
      .saveAsTable(table)

  /** Join two same-bucketed tables on their bucket keys. */
  def bucketedJoin(
      spark: SparkSession,
      left: String,
      right: String,
      on: Seq[String]): DataFrame =
    spark.table(left).join(spark.table(right), on)

  /** Hive-style partitioned layout: one directory per key value, so a
    * filter on the partition key prunes whole directories at planning
    * time — the layout every 100 TB corpus uses for its coarse keys
    * (lang, source, date).
    */
  def savePartitioned(
      df: DataFrame,
      path: String,
      keys: Seq[String]): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .partitionBy(keys: _*)
      .parquet(path)
}
