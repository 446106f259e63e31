package graft.operators

import graft.{SparkEntry, SparkFixture}
import org.scalatest.funsuite.AnyFunSuite

/** Partition-count invariance: every oracle hash comparison rests on
  * results being independent of physical parallelism (partial-agg
  * order, shuffle layout, task count). Representative queries from each
  * risk class — double aggregation, windowing, iterative clustering,
  * hash sampling, top-k — must produce identical row multisets at
  * different shuffle.partitions settings.
  */
class DeterminismSpec extends AnyFunSuite {

  private val names = Seq(
    "q1_agg",            // quantized double SUM (order-dependence risk)
    "q41_median",        // exact order statistic
    "ext_minhash_sig",   // per-row hashing
    "ext_dedup_cluster", // iterative label propagation
    "ext_stratified_sample", // per-stratum top-k by hash
    "ext_ngram_top",     // global top-k with ties broken
    "ext_tfidf_top",     // double division + per-doc ranked ties
    "ext_simhash_pairs", // DISTINCT over a bucketed self-join
    "q56_temporal",      // window-derived validity intervals
    "q62_session_tvf",   // gaps-and-islands with tied-timestamp breaks
    "ext_knn_graph",     // heap aggregate merge order under ties
    "ext_source_overlap", // distinct-postings self-join + broadcast totals
    "q103_legacy_session_join") // islands over a join, 5-key partitions

  private def rows(name: String, partitions: Int): Seq[String] = {
    val spark = SparkFixture.spark
    val before = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      spark.conf.set("spark.sql.shuffle.partitions", partitions.toString)
      SparkEntry.queries(name)(spark, "/root/testdata/sf0.001")
        .collect().map(_.toString).sorted.toSeq
    } finally spark.conf.set("spark.sql.shuffle.partitions", before)
  }

  names.foreach { name =>
    test(s"$name is invariant to shuffle partition count") {
      val a = rows(name, 3)
      val b = rows(name, 13)
      assert(a == b, s"$name differs between 3 and 13 shuffle partitions")
    }
  }
}
