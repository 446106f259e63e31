package graft.operators

import graft.SparkFixture
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.functions._
import org.apache.spark.sql.util.QueryExecutionListener
import org.scalatest.funsuite.AnyFunSuite

/** End-to-end df-cap behavior of the exact-Jaccard pair expansion on a
  * synthetic corpus where the cap actually FIRES — oracle data never
  * reaches the default cap, so this is the only distributed exercise of
  * [[graft.functions.CappedPostings]]' truncated merge/finish path:
  * hot shingles must drop from candidate generation (with the drop
  * observed), non-hot pairs must survive with exact inter counts, and
  * the cap must sit in the plan as a PRE-expansion filter.
  */
class DedupCapSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark

  /** 5 docs sharing one hot trigram ("common a b", df 5); d1/d5 also
    * share the non-hot "a b x1" (df 2). With cap 2 the only surviving
    * pair is (1, 5) through that one shingle.
    */
  private def docs = {
    graft.functions.GraftFunctions.register(spark)
    import spark.implicits._
    Seq(
      (1L, "en", "common a b x1"),
      (2L, "en", "common a b x2"),
      (3L, "en", "common a b x3"),
      (4L, "en", "common a b x4"),
      (5L, "en", "common a b x1 y")
    ).toDF("doc_id", "lang", "text")
      // spread the hot shingle's postings over partitions so partial
      // aggregation produces several buffers and the SATURATED merge
      // branch runs, not just reduce
      .repartition(5, col("doc_id"))
  }

  test("hot shingles drop from pair generation; non-hot pairs survive exactly") {
    spark.conf.set("graft.dedup.df-cap", "2")
    try {
      val got = Dedup.candidatePairs(Dedup.canonicalDocs(docs),
          "graft_cap_spec_pairs")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4))).toSet
      // d1 has 2 distinct trigrams, d5 has 3; they share only "a b x1"
      // once "common a b" (df 5 > 2) is dropped
      assert(got == Set((1L, 5L, 2L, 3L, 1L)))
    } finally spark.conf.unset("graft.dedup.df-cap")
  }

  test("capped pairs equal the uncapped self-join filtered by the dfc rule") {
    // the DuckDB oracle's dfc CTE (HAVING COUNT(*) <= cap), spelled in
    // Spark over the same corpus: the grouped-posting-list path must
    // produce exactly the pairs the filtered self-join produces
    spark.conf.set("graft.dedup.df-cap", "2")
    try {
      val canon = Dedup.canonicalDocs(docs)
      canon.createOrReplaceTempView("cap_spec_canon")
      val expected = spark.sql(
        s"""WITH d AS (
           |  SELECT doc_id, array_distinct(graft_shingle_hashes(split(text, ' '), 3)) AS ghs
           |  FROM cap_spec_canon),
           |post AS (
           |  SELECT doc_id, CAST(size(ghs) AS BIGINT) AS sz, gh
           |  FROM d LATERAL VIEW explode(ghs) t AS gh),
           |dfc AS (SELECT gh FROM post GROUP BY gh HAVING COUNT(*) <= 2)
           |SELECT p1.doc_id AS doc_a, p2.doc_id AS doc_b,
           |  p1.sz AS sz_a, p2.sz AS sz_b, COUNT(*) AS inter
           |FROM post p1 JOIN post p2
           |  ON p1.gh = p2.gh AND p1.doc_id < p2.doc_id
           |JOIN dfc ON dfc.gh = p1.gh
           |GROUP BY 1, 2, 3, 4""".stripMargin)
        .collect().map(_.toSeq).toSet
      val got = Dedup.candidatePairs(canon, "graft_cap_spec_mirror")
        .collect().map(_.toSeq).toSet
      assert(got == expected)
    } finally spark.conf.unset("graft.dedup.df-cap")
  }

  test("the dropped-shingle count surfaces through the observe metric") {
    spark.conf.set("graft.dedup.df-cap", "2")
    @volatile var captured: Option[org.apache.spark.sql.Row] = None
    val listener = new QueryExecutionListener {
      override def onSuccess(f: String, qe: QueryExecution, d: Long): Unit =
        qe.observedMetrics.get("graft_cap_spec_observe")
          .foreach(r => captured = Some(r))
      override def onFailure(f: String, qe: QueryExecution, e: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      Dedup.candidatePairs(Dedup.canonicalDocs(docs),
        "graft_cap_spec_observe").collect()
      val deadline = System.nanoTime() + 10L * 1000 * 1000 * 1000
      while (captured.isEmpty && System.nanoTime() < deadline) Thread.sleep(50)
      val row = captured.getOrElse(fail("observe metric never arrived"))
      assert(row.getLong(row.fieldIndex("dropped_shingles")) == 1L)
      assert(row.getLong(row.fieldIndex("max_df")) == 5L)
    } finally {
      spark.listenerManager.unregister(listener)
      spark.conf.unset("graft.dedup.df-cap")
    }
  }

  test("two capped subtrees compose in one plan under distinct metric names") {
    spark.conf.set("graft.dedup.df-cap", "2")
    try {
      val canon = Dedup.canonicalDocs(docs)
      val u = Dedup.candidatePairs(canon, "graft_cap_spec_u1")
        .unionAll(Dedup.candidatePairs(canon, "graft_cap_spec_u2"))
      // duplicate observe names would throw AnalysisException here
      assert(u.collect().length == 2)
    } finally spark.conf.unset("graft.dedup.df-cap")
  }

  test("plan audit: the cap is a pre-expansion filter over an object-hash aggregate") {
    import org.apache.spark.sql.catalyst.plans.logical.{Filter, Generate}
    spark.conf.set("graft.dedup.df-cap", "2")
    try {
      val df = Dedup.candidatePairs(Dedup.canonicalDocs(docs),
        "graft_cap_spec_plan")
      val gens = df.queryExecution.optimizedPlan.collect { case g: Generate => g }
      assert(gens.nonEmpty, "no pair-expansion Generate in the plan")
      assert(gens.exists(_.child.collectFirst {
        case f: Filter if f.condition.toString.contains("df") => f
      }.isDefined), "df-cap filter is not below the pair expansion")
      val physical = df.queryExecution.executedPlan.toString
      assert(physical.contains("ObjectHashAggregate"),
        s"capped postings did not plan as ObjectHashAggregate:\n$physical")
    } finally spark.conf.unset("graft.dedup.df-cap")
  }

  test("a malformed df-cap conf fails with the named error") {
    spark.conf.set("graft.dedup.df-cap", "lots")
    try {
      val e = intercept[IllegalArgumentException] {
        Dedup.candidatePairs(Dedup.canonicalDocs(docs), "graft_cap_spec_bad")
      }
      assert(e.getMessage.contains("graft.dedup.df-cap"))
    } finally spark.conf.unset("graft.dedup.df-cap")
  }
}
