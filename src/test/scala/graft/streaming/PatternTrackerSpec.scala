package graft.streaming

import java.sql.Timestamp
import graft.SparkFixture
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** Streaming row-pattern recognition: watermark-matured greedy matching
  * (regex-hitEnd finality), skip modes, match numbering across batches,
  * and the harness streaming MATCH_RECOGNIZE bridge end-to-end.
  */
class PatternTrackerSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  import spark.implicits._

  private def ts(sec: Long) = new Timestamp(sec * 1000L)

  /** view=bit0, click=bit1, purchase=bit2. */
  private def defs(t: String): Long = t match {
    case "view" => 1L
    case "click" => 2L
    case "purchase" => 4L
    case _ => 0L
  }

  private val VCP = Seq(
    PatternTracker.Elem(0, 1, 1),            // V
    PatternTracker.Elem(1, 1, Int.MaxValue), // C+
    PatternTracker.Elem(2, 1, 1))            // P

  // measures: FIRST(V.ts), LAST(P.ts), COUNT(C.*), MATCH_NUMBER()
  private val Measures = Seq((0, 0), (1, 2), (2, 1), (4, -1))

  test("V C+ P completes only after the watermark passes the purchase") {
    implicit val sc = spark.sqlContext
    val input = MemoryStream[(String, Timestamp, String)]
    val events = input.toDF().toDF("key", "ts", "t")
      .selectExpr("key", "ts",
        "CASE t WHEN 'view' THEN 1L WHEN 'click' THEN 2L WHEN 'purchase' THEN 4L ELSE 0L END AS defs")
      .as[PatternEvent]
    val out = PatternTracker.track(events, "5 seconds", VCP, Measures,
      skipToNextRow = false)
    val query = out.writeStream.format("memory")
      .queryName("pt_vcp").outputMode("append").start()
    try {
      input.addData(("u1", ts(10), "view"), ("u1", ts(11), "click"),
        ("u1", ts(12), "click"), ("u1", ts(13), "purchase"))
      query.processAllAvailable()
      // watermark still at 13-5=8: nothing matured, no output
      assert(spark.table("pt_vcp").count() === 0)
      // push the watermark past the purchase AND past any possible
      // extension of the (already-closed) click run
      input.addData(("u2", ts(100), "view"))
      query.processAllAvailable()
      val rows = spark.table("pt_vcp").as[PatternMatch].collect()
      assert(rows.toSeq === Seq(
        PatternMatch("u1", List(10000L, 13000L, 2L, 1L))))
    } finally query.stop()
  }

  test("greedy run stays pending while the boundary could extend it") {
    implicit val sc = spark.sqlContext
    val input = MemoryStream[(String, Timestamp, Long)]
    val events = input.toDF().toDF("key", "ts", "defs").as[PatternEvent]
    // pattern: A+ (bit0), measures COUNT(*), MATCH_NUMBER()
    val out = PatternTracker.track(events, "5 seconds",
      Seq(PatternTracker.Elem(0, 1, Int.MaxValue)), Seq((3, -1), (4, -1)),
      skipToNextRow = false)
    val query = out.writeStream.format("memory")
      .queryName("pt_greedy").outputMode("append").start()
    try {
      input.addData(("k", ts(10), 1L), ("k", ts(11), 1L))
      query.processAllAvailable()
      input.addData(("k", ts(20), 1L)) // watermark 15: rows 10,11 matured
      query.processAllAvailable()
      // the matured A-run touches the maturity boundary — emitting now
      // would under-count; the decision must wait
      assert(spark.table("pt_greedy").count() === 0)
      input.addData(("k", ts(40), 0L)) // watermark 35: run 10,11,20 closed by non-A at 40? not matured yet
      query.processAllAvailable()
      input.addData(("k", ts(60), 0L)) // watermark 55: the non-A row at 40 matures, closing the run
      query.processAllAvailable()
      val rows = spark.table("pt_greedy").as[PatternMatch].collect()
      assert(rows.toSeq === Seq(PatternMatch("k", List(3L, 1L))))
    } finally query.stop()
  }

  test("match numbers continue across micro-batches per key") {
    implicit val sc = spark.sqlContext
    val input = MemoryStream[(String, Timestamp, Long)]
    val events = input.toDF().toDF("key", "ts", "defs").as[PatternEvent]
    // pattern: single A (bit0); count + match number
    val out = PatternTracker.track(events, "5 seconds",
      Seq(PatternTracker.Elem(0, 1, 1)), Seq((4, -1)),
      skipToNextRow = false)
    val query = out.writeStream.format("memory")
      .queryName("pt_mn").outputMode("append").start()
    try {
      input.addData(("k", ts(10), 1L), ("k", ts(11), 1L))
      query.processAllAvailable()
      input.addData(("k", ts(100), 1L)) // matures both
      query.processAllAvailable()
      input.addData(("k", ts(200), 0L)) // matures the third A
      query.processAllAvailable()
      val mns = spark.table("pt_mn").as[PatternMatch]
        .collect().map(_.values.head).sorted.toSeq
      assert(mns === Seq(1L, 2L, 3L))
    } finally query.stop()
  }

  test("e2e: streaming MATCH_RECOGNIZE script over a datagen source") {
    val dir = java.nio.file.Files.createTempDirectory("graft-mr-stream")
    val script = java.nio.file.Files.createTempFile("mr-stream", ".sql")
    java.nio.file.Files.writeString(script,
      s"""SET execution.runtime-mode = streaming;
         |create table src (
         |  id bigint,
         |  row_time as current_timestamp,
         |  watermark for row_time as row_time - interval '1' second
         |) with (
         |  'connector' = 'datagen',
         |  'rows-per-second' = '50',
         |  'number-of-rows' = '100',
         |  'fields.id.min' = '1',
         |  'fields.id.max' = '3'
         |);
         |create table snk (k bigint, n bigint, mn bigint) with (
         |  'connector' = 'filesystem',
         |  'path' = 'file://${dir.toString}/out',
         |  'format' = 'parquet'
         |);
         |insert into snk
         |SELECT k, n, mn FROM src
         |MATCH_RECOGNIZE (
         |  PARTITION BY id
         |  ORDER BY row_time
         |  MEASURES COUNT(A.*) AS n, MATCH_NUMBER() AS mn
         |  PATTERN (A)
         |  DEFINE A AS id >= 1
         |) AS m (k, n, mn);
         |""".stripMargin)
    // the MR view exposes (id, n, mn); alias column list maps k
    new graft.harness.SqlSubmitAction(script.toString, Map.empty,
      Some(SparkFixture.spark), durationSec = 30L).run()
    // every generated row is its own match; late stragglers behind the
    // final watermark may stay pending, so expect a prefix
    val got = SparkFixture.spark.read.parquet(s"$dir/out")
    assert(got.count() > 0)
  }
}
