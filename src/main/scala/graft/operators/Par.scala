package graft.operators

import org.apache.spark.sql.DataFrame

/** Partitioning helpers for CPU-dense derivations.
  *
  * AQE sizes post-shuffle partitions by BYTES (advisory/min partition
  * size), which is right for I/O-bound work but serializes CPU-dense
  * text/vector derivations over small byte volumes: a few MB of
  * canonical documents coalesce to 1-2 partitions, and every
  * downstream hash/shingle/signature pass (and anything reading a
  * checkpoint that froze that partitioning) runs on 1-2 cores.
  */
object Par {

  /** Fan a SMALL relation out to the session's default parallelism
    * before CPU-dense downstream work. Scale-adaptive, not a constant:
    * the repartition fires only when the optimizer's size estimate
    * says AQE would otherwise produce fewer partitions than the
    * session has cores (estimate below parallelism × advisory
    * partition size); large relations — and plans whose size is
    * unknown (estimates default to huge) — pass through untouched, so
    * at corpus scale this is a no-op and nothing pays an extra
    * shuffle.
    */
  private[graft] def fanOut(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val target = spark.sparkContext.defaultParallelism
    val advisory = spark.conf
      .getOption("spark.sql.adaptive.advisoryPartitionSizeInBytes")
      .map(parseBytes).getOrElse(64L << 20)
    val est = df.queryExecution.optimizedPlan.stats.sizeInBytes
    if (est < BigInt(target) * advisory) df.repartition(target) else df
  }

  /** Parse Spark byte-size strings ("64m", "128MB", plain bytes). */
  private def parseBytes(s: String): Long = {
    val t = s.trim.toLowerCase
    val num = t.takeWhile(c => c.isDigit || c == '.')
    val unit = t.drop(num.length).trim match {
      case "" | "b" => 1L
      case "k" | "kb" => 1L << 10
      case "m" | "mb" => 1L << 20
      case "g" | "gb" => 1L << 30
      case "t" | "tb" => 1L << 40
      case other =>
        throw new IllegalArgumentException(s"unparseable byte size: $other")
    }
    (num.toDouble * unit).toLong
  }
}
