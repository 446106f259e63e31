package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only micro-decomposition of the dedup candidate pipeline: times
  * each sub-relation with the noop sink (guide §1.4) so the expensive
  * stage of a multi-stage query is identified by measurement, not
  * guesswork.
  *
  * Usage: sbt "runMain graft.Decompose [repeats]"
  */
object Decompose {
  def main(args: Array[String]): Unit = {
    val repeats = args.headOption.map(_.toInt).getOrElse(2)
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
    graft.functions.GraftFunctions.register(spark)

    def time(name: String)(mk: => DataFrame): Unit = {
      (1 to repeats).foreach { i =>
        spark.sharedState.cacheManager.clearCache()
        val t0 = System.nanoTime()
        mk.write.format("noop").mode("overwrite").save()
        val dt = (System.nanoTime() - t0) / 1e9
        println(f"[decomp] $name run$i: $dt%.3f s")
      }
    }

    import graft.operators.{Dedup, Tables}
    val docs = Tables.load(spark, sfDir, "documents")
    val canon = () => Dedup.devCanonicalDocs(docs)

    time("0 raw scan")(docs)
    time("1 fingerprint project")(
      docs.withColumn("fp", expr("graft_poly_hash(text)"))
        .withColumn("fp2", expr("graft_poly_hash2(text)")))
    time("2 canon agg")(canon())
    time("3 ghs project")(
      canon().select(col("doc_id"), col("lang"),
        expr(s"array_distinct(graft_shingle_hashes(split(text, ' '), 3))")
          .as("ghs")))
    time("4 postings explode")(
      canon().select(col("doc_id"), col("lang"),
        expr(s"array_distinct(graft_shingle_hashes(split(text, ' '), 3))")
          .as("ghs"))
        .select(col("doc_id"), col("lang"),
          size(col("ghs")).cast("long").as("sz"),
          explode(col("ghs")).as("gh")))
    time("5 capped agg")(
      Dedup.devPairsFromPost(
        canon().select(col("doc_id"), col("lang"),
          expr(s"array_distinct(graft_shingle_hashes(split(text, ' '), 3))")
            .as("ghs"))
          .select(col("doc_id"), col("lang"),
            size(col("ghs")).cast("long").as("sz"),
            explode(col("ghs")).as("gh")),
        aggOnly = true))
    time("6 full candidatePairs")(
      Dedup.devPairsFromPost(
        canon().select(col("doc_id"), col("lang"),
          expr(s"array_distinct(graft_shingle_hashes(split(text, ' '), 3))")
            .as("ghs"))
          .select(col("doc_id"), col("lang"),
            size(col("ghs")).cast("long").as("sz"),
            explode(col("ghs")).as("gh")),
        aggOnly = false))
    def fullPairs() = Dedup.devPairsFromPost(
      canon().select(col("doc_id"), col("lang"),
        expr(s"array_distinct(graft_shingle_hashes(split(text, ' '), 3))")
          .as("ghs"))
        .select(col("doc_id"), col("lang"),
          size(col("ghs")).cast("long").as("sz"),
          explode(col("ghs")).as("gh")),
      aggOnly = false)
    val jac = col("inter") * lit(1.0d) / (col("sz_a") + col("sz_b") - col("inter"))
    time("7 edges (jac>=0.5)")(
      fullPairs().filter(jac >= 0.5d).select(col("doc_a"), col("doc_b")))
    time("8 connected components")(
      graft.operators.Graph.connectedComponents(
        fullPairs().filter(jac >= 0.5d)
          .select(col("doc_a"), col("doc_b")).toDF("src", "dst")))
    time("9 full ext_dedup_cluster")(
      SparkEntry.queries("ext_dedup_cluster")(spark, sfDir))
    spark.stop()
  }
}
