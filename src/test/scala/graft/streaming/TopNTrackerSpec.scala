package graft.streaming

import java.sql.Timestamp
import graft.SparkFixture
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** Streaming window top-N over [[TopNTracker]]: watermark-gated
  * emission, N-bounded state, deterministic tie-breaks, and randomized
  * equivalence against the batch ranking the tracker replaces.
  */
class TopNTrackerSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  import spark.implicits._

  private def ts(sec: Long) = new Timestamp(sec * 1000L)

  test("windows emit their ranked top-N once the watermark passes the end") {
    implicit val sc = spark.sqlContext
    val input = MemoryStream[RankEvent]
    val ranked = TopNTracker.track(
      input.toDS(), "5 seconds", windowMs = 60000L, n = 2)
    val query = ranked.writeStream.format("memory")
      .queryName("topn_out").outputMode("append").start()
    try {
      // window [0,60): a has metrics 5,9,7 (top2 = 9,7); b has 3
      input.addData(
        RankEvent("a", ts(10), 5d, "p5"), RankEvent("a", ts(20), 9d, "p9"),
        RankEvent("a", ts(30), 7d, "p7"), RankEvent("b", ts(15), 3d, "p3"))
      query.processAllAvailable()
      // watermark is still inside the window: nothing emits
      assert(spark.table("topn_out").count() == 0L)
      // advance the watermark past the window end for both keys
      input.addData(RankEvent("a", ts(200), 1d, "late-win"),
        RankEvent("b", ts(200), 1d, "late-win"))
      query.processAllAvailable()
      val got = spark.table("topn_out")
        .as[TopNRow].collect().map(r => (r.key, r.ws, r.rank, r.payload)).toSet
      assert(got == Set(
        ("a", 0L, 1, "p9"), ("a", 0L, 2, "p7"), ("b", 0L, 1, "p3")))
      // a row for the closed window is dropped upstream by the
      // watermark — the emitted ranking is final
      input.addData(RankEvent("a", ts(40), 99d, "too-late"))
      query.processAllAvailable()
      assert(spark.table("topn_out").count() == 3L)
    } finally query.stop()
  }

  test("ties rank deterministically by payload") {
    implicit val sc = spark.sqlContext
    val input = MemoryStream[RankEvent]
    val ranked = TopNTracker.track(
      input.toDS(), "5 seconds", windowMs = 60000L, n = 3)
    val query = ranked.writeStream.format("memory")
      .queryName("topn_ties").outputMode("append").start()
    try {
      input.addData(
        RankEvent("k", ts(1), 5d, "zz"), RankEvent("k", ts(2), 5d, "aa"),
        RankEvent("k", ts(3), 5d, "mm"), RankEvent("k", ts(4), 5d, "bb"))
      input.addData(RankEvent("k", ts(200), 0d, "adv"))
      query.processAllAvailable()
      val got = spark.table("topn_ties").as[TopNRow].collect()
        .filter(_.ws == 0L).sortBy(_.rank).map(_.payload).toList
      assert(got == List("aa", "bb", "mm"))
    } finally query.stop()
  }

  test("randomized: streaming ranking equals batch ROW_NUMBER top-N") {
    implicit val sc = spark.sqlContext
    val rnd = new scala.util.Random(37)
    // ts starts at 60s, not 0: a row AT the epoch ties Spark's initial
    // watermark (late filter is ts <= watermark) and would be dropped
    // before the tracker ever sees it
    val events = (1 to 300).map { i =>
      RankEvent(s"k${rnd.nextInt(4)}", ts(60L + rnd.nextInt(600)),
        rnd.nextInt(50).toDouble, s"p$i")
    }
    // batch oracle: rank per (key, window) by metric DESC, payload ASC
    val expected = events
      .groupBy(e => (e.key, Math.floorDiv(e.ts.getTime, 60000L) * 60000L))
      .flatMap { case ((k, ws), es) =>
        es.sortBy(e => (-e.metric, e.payload)).take(3).zipWithIndex
          .map { case (e, i) => (k, ws, i + 1, e.metric, e.payload) }
      }.toSet
    val input = MemoryStream[RankEvent]
    val query = TopNTracker.track(
        input.toDS(), "5 seconds", windowMs = 60000L, n = 3)
      .writeStream.format("memory")
      .queryName("topn_rand").outputMode("append").start()
    try {
      // feed in event-time-respecting chunks so the watermark never
      // invalidates rows the oracle counts
      events.sortBy(_.ts.getTime).grouped(50).foreach { chunk =>
        input.addData(chunk: _*); query.processAllAvailable()
      }
      input.addData(RankEvent("k0", ts(10000), 0d, "adv"))
      query.processAllAvailable()
      val got = spark.table("topn_rand").as[TopNRow].collect()
        .filter(_.payload != "adv")
        .map(r => (r.key, r.ws, r.rank, r.metric, r.payload)).toSet
      assert(got == expected)
    } finally query.stop()
  }
}
