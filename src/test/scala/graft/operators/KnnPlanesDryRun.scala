package graft.operators

import graft.SparkFixture
import org.apache.spark.sql.functions._

/** Dev aid: times the k-NN-graph shape at a given LSH plane count —
  * the blocking scale knob (`graft_lsh_bucket(v, planes)`). Usage:
  * `Test/runMain graft.operators.KnnPlanesDryRun <dir> <planes>`.
  * Prints elapsed seconds, edge count, and the mean bucket occupancy.
  */
object KnnPlanesDryRun {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val planes = args.lift(1).map(_.toInt).getOrElse(8)
    val spark = SparkFixture.spark
    val t0 = System.nanoTime()
    // the SHARED operator pipeline — a drifted copy here would make
    // the published scaling numbers measure a different query
    val edges = VectorSearch.knnGraphEdges(spark, dir, planes, 3).count()
    val sec = (System.nanoTime() - t0) / 1e9d
    graft.functions.GraftFunctions.register(spark)
    val occ = Tables.load(spark, dir, "embeddings")
      .select(expr(s"graft_lsh_bucket(graft_l2_normalize(embedding), $planes)")
        .as("bucket"))
      .groupBy(col("bucket")).count()
      .agg(avg(col("count"))).head.getDouble(0)
    println(f"planes=$planes edges=$edges mean_bucket_occupancy=$occ%.1f " +
      f"elapsed=$sec%.2f s")
  }
}
