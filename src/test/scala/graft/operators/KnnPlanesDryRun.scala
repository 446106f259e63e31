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
    graft.functions.GraftFunctions.register(spark)
    val topk = udaf(new graft.functions.TopKByScore(3),
      org.apache.spark.sql.Encoders.product[graft.functions.Scored])
    val b = Tables.load(spark, dir, "embeddings")
      .select(col("vec_id"), expr("graft_l2_normalize(embedding)").as("nv"))
      .withColumn("bucket", expr(s"graft_lsh_bucket(nv, $planes)"))
    val e = b.select(col("vec_id").as("e_id"), col("nv").as("env"),
      col("bucket").as("e_bucket"))
    val t0 = System.nanoTime()
    val edges = b
      .join(e, col("bucket") === col("e_bucket") && col("e_id") =!= col("vec_id"))
      .select(col("vec_id").as("node_id"), col("e_id"),
        floor(expr("graft_dot(nv, env)") * 1e6d + 0.5d).cast("long")
          .as("cos_micros"))
      .groupBy(col("node_id"))
      .agg(topk(col("cos_micros"), col("e_id")).as("tk"))
      .select(col("node_id"), posexplode(col("tk.top")).as(Seq("pos", "t")))
      .count()
    val sec = (System.nanoTime() - t0) / 1e9d
    val occ = b.groupBy(col("bucket")).count()
      .agg(avg(col("count"))).head.getDouble(0)
    println(f"planes=$planes edges=$edges mean_bucket_occupancy=$occ%.1f " +
      f"elapsed=$sec%.2f s")
  }
}
