package graft.streaming

import java.sql.Timestamp
import graft.SparkFixture
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

/** Streaming-state soak under scaled KEY cardinality + hot-key skew
  * (r19): the TTL'd trackers have scaled-corpus evidence on the batch
  * side (README dedup/ANN curve) but their STATE had only been
  * observed at toy key counts. Each soak drives 100k+ keys with a
  * skewed hot key, reads the per-tracker peak gauges and Spark's
  * numRowsTotal, and asserts the TTL actually bounds steady-state
  * size — state must drain to ~zero once keys go idle, not plateau at
  * the key count (which at 100 TB cardinalities would be an OOM, not
  * a soak).
  */
class StateSoakSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  import spark.implicits._

  private def awaitTrue(hint: => String, sec: Long = 90L)(
      pred: => Boolean): Unit = {
    val deadline = System.nanoTime() + sec * 1000000000L
    while (!pred && System.nanoTime() < deadline) Thread.sleep(200L)
    assert(pred, hint)
  }

  private val nCold = 100000
  private val nHotDistinct = 5000

  test("soak: UnboundedAggTracker holds 100k keys + a 5k-distinct hot " +
      "key, then the TTL drains the state to zero") {
    implicit val sc = spark.sqlContext
    val input = MemoryStream[(String, Long, String)]
    input.toDF().toDF("k", "v", "tag").createOrReplaceTempView("soak_uagg")
    val rewritten = graft.harness.UnboundedAgg.rewrite(spark,
      "SELECT k, COUNT(*) AS c, COUNT(DISTINCT tag) AS d " +
        "FROM soak_uagg GROUP BY k", stateTtlSec = 5L)
    val q = spark.sql(rewritten).writeStream.format("memory")
      .queryName("soak_uagg_out")
      .trigger(Trigger.ProcessingTime("200 milliseconds"))
      .outputMode("update").start()
    try {
      // 100k cold keys x 1 row; one hot key x 5k rows, all-distinct
      // tags — the dimension the idle TTL cannot bound, which the
      // high-water gauge makes observable
      input.addData(
        (0 until nCold).map(i => (s"k$i", 1L, "t")) ++
          (0 until nHotDistinct).map(i => ("hot", 1L, s"tag$i")): _*)
      def stateRows: Long =
        Option(q.lastProgress)
          .flatMap(_.stateOperators.headOption.map(_.numRowsTotal))
          .getOrElse(-1L)
      awaitTrue(s"state for all ${nCold + 1} keys, saw $stateRows")(
        stateRows >= nCold.toLong + 1L)
      val peakDistinct = UnboundedAggTracker.peakDistinctValues.get()
      info(s"peak state rows: $stateRows; " +
        s"peakDistinctValues: $peakDistinct")
      assert(peakDistinct >= nHotDistinct.toLong,
        s"hot key's distinct set ($nHotDistinct) must register on the " +
          s"gauge, saw $peakDistinct")
      // idle past the 5 s TTL: processing-time timers expire every key
      awaitTrue(s"TTL drains the state, saw $stateRows rows")(
        stateRows == 0L)
    } finally q.stop()
  }

  test("soak: TtlTopNTracker state is one row PER KEY (the hot key's " +
      "5k updates fold into its n-bounded vector), then drains") {
    implicit val sc = spark.sqlContext
    val input = MemoryStream[RankedEvent]
    val ranked = TtlTopNTracker.track(input.toDS(), n = 3, asc = false,
      ttlSec = 5L)
    val q = ranked.writeStream.format("memory")
      .queryName("soak_topn_out")
      .trigger(Trigger.ProcessingTime("200 milliseconds"))
      .outputMode("update").start()
    try {
      input.addData(
        (0 until nCold).map(i =>
          RankedEvent(s"k$i", i.toDouble, nullMetric = false, "p")) ++
          (0 until nHotDistinct).map(i =>
            RankedEvent("hot", i.toDouble, nullMetric = false, s"p$i")): _*)
      def stateRows: Long =
        Option(q.lastProgress)
          .flatMap(_.stateOperators.headOption.map(_.numRowsTotal))
          .getOrElse(-1L)
      awaitTrue(s"state for all ${nCold + 1} keys, saw $stateRows")(
        stateRows >= nCold.toLong + 1L)
      // per-key state is the rank vector, NOT the key's history: the
      // hot key's 5k rows must not add 5k state rows
      assert(stateRows <= nCold.toLong + 16L,
        s"state must be one row per key, saw $stateRows")
      // the hot key's final top-3 is the three largest metrics
      awaitTrue("hot top-3") {
        val hot = spark.table("soak_topn_out")
          .filter($"key" === "hot").select($"pos", $"metric")
          .as[(Int, Double)].collect().groupBy(_._1)
          .map { case (p, vs) => (p, vs.last._2) }
        hot.get(0).contains(4999.0d) && hot.get(1).contains(4998.0d) &&
          hot.get(2).contains(4997.0d)
      }
      info(s"peak state rows: $stateRows")
      awaitTrue(s"TTL drains the state, saw $stateRows rows")(
        stateRows == 0L)
    } finally q.stop()
  }

  test("soak: TemporalJoinTracker under 100k version keys + a hot key's " +
      "probe/version churn keeps per-key state bounded, then the idle " +
      "TTL drains it") {
    implicit val sc = spark.sqlContext
    val input = MemoryStream[TemporalRow]
    val joined = TemporalJoinTracker.joinRows(input.toDS(), "5 seconds",
      idleVersionTtlSec = 5L)
    val q = joined.toDF().writeStream.format("memory")
      .queryName("soak_tj_out").outputMode("append").start()
    def ts(sec: Long) = new Timestamp(sec * 1000L)
    try {
      // 100k cold keys: one version each at t=10
      input.addData((0 until nCold).map(i =>
        TemporalRow(s"k$i", ts(10), isVersion = true, s"v$i")): _*)
      q.processAllAvailable()
      // hot key: 2000 versions at 1 s spacing, probes riding between
      // them — event-time order keeps everything on time as the
      // watermark advances, and retention must hold latest-at-wm plus
      // newer, NOT the whole history
      (0 until 20).foreach { chunk =>
        input.addData((0 until 100).flatMap { i =>
          val t = 10L + chunk * 100L + i
          Seq(TemporalRow("hot", ts(t), isVersion = true, s"ver$t"),
            TemporalRow("hot", ts(t), isVersion = false, s"probe$t"))
        }: _*)
        q.processAllAvailable()
      }
      def stateRows: Long =
        Option(q.lastProgress)
          .flatMap(_.stateOperators.headOption.map(_.numRowsTotal))
          .getOrElse(-1L)
      val peakV = TemporalJoinTracker.peakVersionRows.get()
      val peakP = TemporalJoinTracker.peakPendingProbes.get()
      info(s"state rows: $stateRows; peakVersionRows: $peakV; " +
        s"peakPendingProbes: $peakP")
      // the hot key saw 2000 versions; retained versions are bounded
      // by the watermark horizon (delay 5 s + batch width 100 s), not
      // the history length
      assert(peakV <= 256L, s"version retention must track the " +
        s"watermark horizon, saw $peakV")
      // matured probes leave state: matches must have flowed
      assert(spark.table("soak_tj_out").count() >= 1500L)
      // idle-TTL expiry is EVENT-time here: advance the watermark far
      // past every key's version + TTL, then run the timeout batches
      input.addData(TemporalRow("flush", ts(1000000L), isVersion = true,
        "f"))
      q.processAllAvailable()
      input.addData(TemporalRow("flush", ts(2000000L), isVersion = true,
        "f2"))
      q.processAllAvailable()
      input.addData(TemporalRow("flush", ts(3000000L), isVersion = true,
        "f3"))
      q.processAllAvailable()
      val after = stateRows
      info(s"state rows after idle TTL: $after")
      assert(after <= 2L,
        s"idle version state must expire after the TTL, saw $after")
    } finally q.stop()
  }
}
