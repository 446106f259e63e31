package graft.streaming

import java.sql.Timestamp
import graft.SparkFixture
import graft.harness.WindowTvf
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** Streaming CUMULATE windows over [[CumulateTracker]]: bounded
  * equivalence against the batch TVF rewrite, incremental emission as
  * the watermark passes each step end, and the contract rejections.
  */
class CumulateSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  import spark.implicits._

  private def ts(sec: Long) = new Timestamp(sec * 1000L)

  private val Stmt =
    """SELECT k, window_start, window_end, COUNT(*) AS n, SUM(v) AS sv,
      |  MIN(v) AS mn, MAX(v) AS mx, AVG(v) AS av
      |FROM TABLE(CUMULATE(TABLE cum_in, DESCRIPTOR(ts),
      |  INTERVAL '1' MINUTE, INTERVAL '5' MINUTE))
      |GROUP BY k, window_start, window_end""".stripMargin

  test("bounded streaming CUMULATE equals the batch TVF rewrite") {
    val rnd = new scala.util.Random(19)
    val rows = (1 to 120).map { i =>
      (s"k${i % 3}", ts(rnd.nextInt(900).toLong), rnd.nextInt(100).toLong)
    }
    rows.toDF("k", "ts", "v").createOrReplaceTempView("cum_in")
    val batch = spark.sql(WindowTvf.rewrite(Stmt))
      .collect().map(_.toSeq).toSet
    val streamSql = WindowTvf.rewriteStreaming(Stmt, spark,
      _ => Some(("ts", "5 seconds")))
    try {
      val streamed = spark.sql(streamSql).collect().map(_.toSeq).toSet
      assert(streamed === batch)
      assert(batch.nonEmpty)
    } finally graft.harness.MatchRecognize.dropViews(spark, streamSql)
  }

  test("CUMULATE offset shifts the span grid identically in batch and streaming") {
    val rnd = new scala.util.Random(23)
    val rows = (1 to 120).map { i =>
      (s"k${i % 3}", ts(rnd.nextInt(900).toLong), rnd.nextInt(100).toLong)
    }
    rows.toDF("k", "ts", "v").createOrReplaceTempView("cum_off_in")
    val stmt =
      """SELECT k, window_start, window_end, COUNT(*) AS n, SUM(v) AS sv
        |FROM TABLE(CUMULATE(TABLE cum_off_in, DESCRIPTOR(ts),
        |  INTERVAL '1' MINUTE, INTERVAL '5' MINUTE, INTERVAL '30' SECOND))
        |GROUP BY k, window_start, window_end""".stripMargin
    val batch = spark.sql(WindowTvf.rewrite(stmt)).collect().map(_.toSeq)
    // every span start lands on the offset grid: 30 s past a 5-min mark
    batch.foreach { r =>
      val ws = r(1).asInstanceOf[Timestamp].getTime
      assert(((ws - 30000L) % 300000L + 300000L) % 300000L == 0L, r)
    }
    val streamSql = WindowTvf.rewriteStreaming(stmt, spark,
      _ => Some(("ts", "5 seconds")))
    try {
      val streamed = spark.sql(streamSql).collect().map(_.toSeq).toSet
      assert(streamed === batch.toSet)
      assert(batch.nonEmpty)
    } finally graft.harness.MatchRecognize.dropViews(spark, streamSql)
  }

  test("streaming CUMULATE HAVING filters like the batch rewrite") {
    val rnd = new scala.util.Random(31)
    val rows = (1 to 120).map { i =>
      (s"k${i % 3}", ts(rnd.nextInt(900).toLong), rnd.nextInt(100).toLong)
    }
    rows.toDF("k", "ts", "v").createOrReplaceTempView("cum_hav_in")
    def stmt(having: String) =
      s"""SELECT k, window_start, window_end, COUNT(*) AS n, SUM(v) AS sv
         |FROM TABLE(CUMULATE(TABLE cum_hav_in, DESCRIPTOR(ts),
         |  INTERVAL '1' MINUTE, INTERVAL '5' MINUTE))
         |GROUP BY k, window_start, window_end$having""".stripMargin
    // the predicate mixes a RAW aggregate call (rebinds to its alias)
    // with an alias reference
    val having = "\nHAVING COUNT(*) > 3 AND sv > 100"
    val batchAll = spark.sql(WindowTvf.rewrite(stmt(""))).collect()
    val batch = spark.sql(WindowTvf.rewrite(stmt(having)))
      .collect().map(_.toSeq).toSet
    assert(batch.nonEmpty && batch.size < batchAll.length,
      "HAVING must actually filter for this test to mean anything")
    val streamSql = WindowTvf.rewriteStreaming(stmt(having), spark,
      _ => Some(("ts", "5 seconds")))
    try {
      val streamed = spark.sql(streamSql).collect().map(_.toSeq).toSet
      assert(streamed === batch)
    } finally graft.harness.MatchRecognize.dropViews(spark, streamSql)

    // an aggregate the select list does not carry rejects by name
    val e = intercept[IllegalArgumentException] {
      WindowTvf.rewriteStreaming(stmt("\nHAVING AVG(v) > 10"), spark,
        _ => Some(("ts", "5 seconds")))
    }
    assert(e.getMessage.contains("select list"), e.getMessage)
    // ORDER BY stays a named rejection
    val e2 = intercept[IllegalArgumentException] {
      WindowTvf.rewriteStreaming(stmt("\nORDER BY sv"), spark,
        _ => Some(("ts", "5 seconds")))
    }
    assert(e2.getMessage.contains("downstream"), e2.getMessage)
  }

  test("streaming CUMULATE WHERE pre-filters the tracker input like batch") {
    val rnd = new scala.util.Random(47)
    val rows = (1 to 120).map { i =>
      (s"k${i % 3}", ts(rnd.nextInt(900).toLong), rnd.nextInt(100).toLong)
    }
    rows.toDF("k", "ts", "v").createOrReplaceTempView("cum_where_in")
    def stmt(mid: String) =
      s"""SELECT k, window_start, window_end, COUNT(*) AS n, SUM(v) AS sv
         |FROM TABLE(CUMULATE(TABLE cum_where_in, DESCRIPTOR(ts),
         |  INTERVAL '1' MINUTE, INTERVAL '5' MINUTE))$mid
         |GROUP BY k, window_start, window_end""".stripMargin
    val where = "\nWHERE v >= 50 AND k <> 'k1'"
    val batchAll = spark.sql(WindowTvf.rewrite(stmt(""))).collect()
    val batch = spark.sql(WindowTvf.rewrite(stmt(where)))
      .collect().map(_.toSeq).toSet
    assert(batch.nonEmpty && batch.size < batchAll.length)
    val streamSql = WindowTvf.rewriteStreaming(stmt(where), spark,
      _ => Some(("ts", "5 seconds")))
    try {
      val streamed = spark.sql(streamSql).collect().map(_.toSeq).toSet
      assert(streamed === batch)
    } finally graft.harness.MatchRecognize.dropViews(spark, streamSql)
    // window columns do not exist before the aggregation
    val e = intercept[IllegalArgumentException] {
      WindowTvf.rewriteStreaming(stmt("\nWHERE window_start IS NOT NULL"),
        spark, _ => Some(("ts", "5 seconds")))
    }
    assert(e.getMessage.contains("HAVING"), e.getMessage)
    // JOINs keep the named rejection
    val e2 = intercept[IllegalArgumentException] {
      WindowTvf.rewriteStreaming(stmt(" JOIN other ON 1 = 1"), spark,
        _ => Some(("ts", "5 seconds")))
    }
    assert(e2.getMessage.contains("pre-join"), e2.getMessage)
  }

  test("WHERE/HAVING literals survive verbatim (no normalization, no keyword trips)") {
    // a WHERE literal holding consecutive spaces must reach the filter
    // byte-for-byte, and a HAVING literal containing the word 'limit'
    // or an aggregate-call shape must neither reject nor rebind
    Seq(("a  b", ts(10), 5L), ("a b", ts(20), 7L), ("COUNT(*)", ts(30), 9L))
      .toDF("k", "ts", "v").createOrReplaceTempView("cum_lit_in")
    val stmt =
      """SELECT k, window_start, window_end, COUNT(*) AS n, SUM(v) AS sv
        |FROM TABLE(CUMULATE(TABLE cum_lit_in, DESCRIPTOR(ts),
        |  INTERVAL '1' MINUTE, INTERVAL '5' MINUTE))
        |WHERE k <> 'a  b'
        |GROUP BY k, window_start, window_end
        |HAVING k <> 'limit me' AND k <> 'COUNT(*)' AND COUNT(*) >= 1""".stripMargin
    val batch = spark.sql(WindowTvf.rewrite(stmt)).collect().map(_.toSeq).toSet
    val streamSql = WindowTvf.rewriteStreaming(stmt, spark,
      _ => Some(("ts", "5 seconds")))
    try {
      val streamed = spark.sql(streamSql).collect().map(_.toSeq).toSet
      assert(streamed === batch)
      // the double-space row is filtered, the single-space row kept,
      // and the literal aggregate-shaped key is HAVING-filtered
      assert(batch.map(_.head) === Set("a b"), batch)
    } finally graft.harness.MatchRecognize.dropViews(spark, streamSql)
  }

  test("windows emit incrementally as the watermark passes step ends") {
    implicit val sc = spark.sqlContext
    val input = MemoryStream[(String, Timestamp, Long)]
    input.toDF().toDF("k", "ts", "v").createOrReplaceTempView("cum_stream")
    val streamSql = WindowTvf.rewriteStreaming(
      """SELECT k, window_start, window_end, COUNT(*) AS n, SUM(v) AS sv
        |FROM TABLE(CUMULATE(TABLE cum_stream, DESCRIPTOR(ts),
        |  INTERVAL '1' MINUTE, INTERVAL '3' MINUTE))
        |GROUP BY k, window_start, window_end""".stripMargin,
      spark, _ => Some(("ts", "5 seconds")))
    val query = spark.sql(streamSql).writeStream.format("memory")
      .queryName("cum_inc").outputMode("append").start()
    try {
      // rows in minutes 0 and 1 of the [0, 180s) span
      input.addData(("a", ts(10), 5L), ("a", ts(70), 7L))
      query.processAllAvailable()
      // watermark 70-5=65 s: window [0,60) matured (end 60 <= 65) with
      // the first row only
      val w1 = spark.table("cum_inc").collect()
      assert(w1.length === 1, w1.toSeq.mkString(","))
      assert(w1.head.getLong(3) === 1L && w1.head.getLong(4) === 5L)
      // advance far: remaining windows [0,120) and [0,180) emit with
      // both rows
      input.addData(("a", ts(1000), 1L))
      query.processAllAvailable()
      val all = spark.table("cum_inc").collect()
        .map(r => (r.getTimestamp(2).getTime / 1000L, r.getLong(3), r.getLong(4)))
        .toSet
      assert(all === Set((60L, 1L, 5L), (120L, 2L, 12L), (180L, 2L, 12L)))
    } finally query.stop()
  }

  test("e2e: streaming CUMULATE script over a datagen source") {
    val dir = java.nio.file.Files.createTempDirectory("graft-cum-stream")
    val script = java.nio.file.Files.createTempFile("cum-stream", ".sql")
    java.nio.file.Files.writeString(script,
      s"""SET execution.runtime-mode = streaming;
         |create table src (
         |  id bigint,
         |  row_time as current_timestamp,
         |  watermark for row_time as row_time - interval '1' second
         |) with (
         |  'connector' = 'datagen',
         |  'rows-per-second' = '50',
         |  'number-of-rows' = '200',
         |  'fields.id.min' = '1',
         |  'fields.id.max' = '3'
         |);
         |create table snk (
         |  id bigint, window_start timestamp, window_end timestamp,
         |  n bigint
         |) with (
         |  'connector' = 'filesystem',
         |  'path' = 'file://${dir.toString}/out',
         |  'format' = 'parquet'
         |);
         |insert into snk
         |SELECT id, window_start, window_end, COUNT(*) AS n
         |FROM TABLE(CUMULATE(TABLE src, DESCRIPTOR(row_time),
         |  INTERVAL '1' SECOND, INTERVAL '4' SECOND))
         |GROUP BY id, window_start, window_end;
         |""".stripMargin)
    new graft.harness.SqlSubmitAction(script.toString, Map.empty,
      Some(spark), durationSec = 30L).run()
    // 4 s of generated rows: the watermark passes several 1 s window
    // ends while the source runs, so early growing windows must emit;
    // trailing windows behind the final watermark may stay pending
    val got = spark.read.parquet(s"$dir/out")
    assert(got.count() > 0)
  }

  test("edge inputs: null event times, NaN doubles, COUNT over arrays") {
    // null ts drops from window assignment (batch WHERE parity, not an
    // NPE); a NaN double aggregate survives the JSON payload; COUNT
    // over a non-castable array column counts rows without a cast
    Seq(
      ("a", ts(10), Some(1.0d), Seq("x", "y")),
      ("a", ts(20), Some(Double.NaN), Seq("z")),
      ("a", null.asInstanceOf[Timestamp], Some(9.0d), Seq("w")))
      .toDF("k", "ts", "d", "tags")
      .createOrReplaceTempView("cum_edge")
    val stmt =
      """SELECT k, window_start, window_end, COUNT(tags) AS n, SUM(d) AS sd
        |FROM
        |  TABLE(CUMULATE(TABLE cum_edge, DESCRIPTOR(ts),
        |    INTERVAL '1' MINUTE, INTERVAL '2' MINUTE))
        |GROUP BY k, window_start, window_end""".stripMargin
    val batch = spark.sql(WindowTvf.rewrite(stmt)).collect().map(_.toSeq)
    val streamSql = WindowTvf.rewriteStreaming(stmt, spark,
      _ => Some(("ts", "5 seconds")))
    try {
      val streamed = spark.sql(streamSql).collect().map(_.toSeq)
      def canon(rows: Seq[Seq[Any]]) = rows.map(_.map {
        case d: Double if d.isNaN => "NaN"
        case v => v
      }).toSet
      assert(canon(streamed.toSeq) === canon(batch.toSeq))
      assert(streamed.nonEmpty)
      // the NaN row is inside the data: SUM must be NaN, not NULL
      assert(streamed.exists(r => r(4).isInstanceOf[Double] &&
        r(4).asInstanceOf[Double].isNaN))
    } finally graft.harness.MatchRecognize.dropViews(spark, streamSql)
  }

  test("MIN/MAX over NaN and infinities match Spark's batch semantics") {
    // Spark orders NaN above every value (MIN({5, NaN}) = 5, MAX gets
    // NaN; all-NaN gives NaN) and a window holding only an infinity
    // must emit that infinity, never an accumulator sentinel. The NaN
    // row for key "a" lands in the second step so the cross-step merge
    // path is exercised, not just single-step ingest.
    Seq(
      ("a", ts(10), 5.0d), ("a", ts(70), Double.NaN),
      ("b", ts(10), Double.PositiveInfinity),
      ("c", ts(10), Double.NegativeInfinity),
      ("d", ts(10), Double.NaN))
      .toDF("k", "ts", "d").createOrReplaceTempView("cum_nan")
    val stmt =
      """SELECT k, window_start, window_end, MIN(d) AS mn, MAX(d) AS mx
        |FROM TABLE(CUMULATE(TABLE cum_nan, DESCRIPTOR(ts),
        |  INTERVAL '1' MINUTE, INTERVAL '2' MINUTE))
        |GROUP BY k, window_start, window_end""".stripMargin
    val batch = spark.sql(WindowTvf.rewrite(stmt)).collect().map(_.toSeq)
    val streamSql = WindowTvf.rewriteStreaming(stmt, spark,
      _ => Some(("ts", "5 seconds")))
    try {
      val streamed = spark.sql(streamSql).collect().map(_.toSeq)
      def canon(rows: Seq[Seq[Any]]) = rows.map(_.map {
        case d: Double if d.isNaN => "NaN"
        case v => v
      }).toSet
      assert(canon(streamed.toSeq) === canon(batch.toSeq))
      def byKey(k: String) = streamed.filter(_.head == k)
      // growing windows: MIN sticks at 5.0 once the NaN arrives, MAX
      // becomes NaN
      assert(byKey("a").exists(r => r(3) == 5.0d &&
        r(4).asInstanceOf[Double].isNaN))
      assert(byKey("b").forall(r =>
        r(3) == Double.PositiveInfinity && r(4) == Double.PositiveInfinity))
      assert(byKey("c").forall(r =>
        r(3) == Double.NegativeInfinity && r(4) == Double.NegativeInfinity))
      assert(byKey("d").forall(r => r(3).asInstanceOf[Double].isNaN &&
        r(4).asInstanceOf[Double].isNaN))
    } finally graft.harness.MatchRecognize.dropViews(spark, streamSql)
  }

  test("checkpoint restart recovers cumulate state exactly-once") {
    // stop mid-span with windows pending, deliver more rows while the
    // query is down, restart from the checkpoint: the recovered state
    // must finish the span with no lost and no duplicated windows
    implicit val sc = spark.sqlContext
    val input = MemoryStream[(String, Timestamp, Long)]
    input.toDF().toDF("k", "ts", "v").createOrReplaceTempView("cum_ckpt")
    val streamSql = WindowTvf.rewriteStreaming(
      """SELECT k, window_start, window_end, COUNT(*) AS n, SUM(v) AS sv
        |FROM TABLE(CUMULATE(TABLE cum_ckpt, DESCRIPTOR(ts),
        |  INTERVAL '1' MINUTE, INTERVAL '3' MINUTE))
        |GROUP BY k, window_start, window_end""".stripMargin,
      spark, _ => Some(("ts", "5 seconds")))
    val ckpt = java.nio.file.Files.createTempDirectory("graft-cum-ckpt").toString
    val outDir = java.nio.file.Files.createTempDirectory("graft-cum-out").toString
    // parquet sink: the memory sink cannot recover in append mode
    def start() = spark.sql(streamSql).writeStream
      .format("parquet").option("path", outDir).outputMode("append")
      .option("checkpointLocation", ckpt).start()
    val q1 = start()
    try {
      input.addData(("a", ts(10), 5L), ("a", ts(70), 7L))
      q1.processAllAvailable()
      // watermark 65 s: only [0,60) emitted; [0,120) and [0,180) pend
      assert(spark.read.parquet(outDir).count() === 1)
    } finally q1.stop()
    // rows arriving while the query is down
    input.addData(("a", ts(130), 3L), ("a", ts(1000), 1L))
    val q2 = start()
    try {
      q2.processAllAvailable()
      val all = spark.read.parquet(outDir).collect()
        .map(r => (r.getTimestamp(2).getTime / 1000L, r.getLong(3), r.getLong(4)))
        .toSet
      // the sink holds each window exactly once: [0,60) from before the
      // stop (not re-emitted), [0,120) with both early rows, [0,180)
      // with all three span rows including the one delivered during
      // downtime
      assert(all === Set((60L, 1L, 5L), (120L, 2L, 12L), (180L, 3L, 15L)))
    } finally q2.stop()
  }

  test("soak: 100k keys across spans; state drops as spans close") {
    // scale evidence for the tracker itself: state is bounded by the
    // ACTIVE (key, span) set, so once the watermark passes a span's
    // last window end every key's state must be reclaimed, not retained
    implicit val sc = spark.sqlContext
    val nKeys = 100000
    val input = MemoryStream[(String, Timestamp, Long)]
    input.toDF().toDF("k", "ts", "v").createOrReplaceTempView("cum_soak")
    val streamSql = WindowTvf.rewriteStreaming(
      """SELECT k, window_start, window_end, COUNT(*) AS n, SUM(v) AS sv
        |FROM TABLE(CUMULATE(TABLE cum_soak, DESCRIPTOR(ts),
        |  INTERVAL '1' MINUTE, INTERVAL '5' MINUTE))
        |GROUP BY k, window_start, window_end""".stripMargin,
      spark, _ => Some(("ts", "5 seconds")))
    val query = spark.sql(streamSql).writeStream.format("memory")
      .queryName("cum_soak_out").outputMode("append").start()
    try {
      // every key gets one row inside the [0, 300 s) span; a constant
      // event time keeps the data watermark-safe even if the runtime
      // splits the 100k rows across micro-batches (spread times made
      // the tail of a split batch late and silently dropped)
      input.addData((0 until nKeys).map(i => (s"k$i", ts(10L), 1L)): _*)
      query.processAllAvailable()
      val peak = query.lastProgress.stateOperators.head.numRowsTotal
      assert(peak >= nKeys.toLong,
        s"expected state for all $nKeys active keys, saw $peak")
      // advance the watermark far past the span: timeouts emit the
      // remaining growing windows and every span-0 key's state drops
      input.addData(("late", ts(1000000L), 1L))
      query.processAllAvailable()
      val after = query.lastProgress.stateOperators.head.numRowsTotal
      assert(after <= 2L,
        s"span closed but $after state rows remain (expected <= 2)")
      // each key emitted all five growing windows of its span exactly
      // once
      val emitted = spark.table("cum_soak_out")
        .filter($"k" =!= "late").count()
      assert(emitted === nKeys.toLong * 5L)
    } finally query.stop()
  }

  test("contract rejections name the violation") {
    Seq(("x", ts(1), 1L)).toDF("k", "ts", "v")
      .createOrReplaceTempView("cum_rej")
    def rejects(stmt: String, needle: String): Unit = {
      val e = intercept[IllegalArgumentException](
        WindowTvf.rewriteStreaming(stmt, spark, _ => Some(("ts", "5 seconds"))))
      assert(e.getMessage.contains(needle), s"message: ${e.getMessage}")
    }
    // distinct arithmetic covers integral (r14), float/double (r15),
    // and decimal (r16) inputs — and plain decimal aggregates stream
    // too (kinds 22-25) — but distinct arithmetic over a non-numeric
    // type still rejects by name
    Seq(("x", ts(1), 1L, new java.math.BigDecimal("2.50")))
      .toDF("k", "ts", "v", "dv")
      .withColumn("dv", $"dv".cast("decimal(10,2)"))
      .createOrReplaceTempView("cum_rej_sumd")
    rejects(
      """SELECT k, window_start, window_end, SUM(DISTINCT k) AS n
        |FROM TABLE(CUMULATE(TABLE cum_rej_sumd, DESCRIPTOR(ts),
        |  INTERVAL '1' MINUTE, INTERVAL '5' MINUTE))
        |GROUP BY k, window_start, window_end""".stripMargin,
      "integral, float/double, and decimal")
    // WHERE on source columns is supported since r13b (pre-filters the
    // tracker input); a JOIN in the between-region still rejects
    rejects(
      """SELECT k, window_start, window_end, COUNT(*) AS n
        |FROM TABLE(CUMULATE(TABLE cum_rej, DESCRIPTOR(ts),
        |  INTERVAL '1' MINUTE, INTERVAL '5' MINUTE))
        |JOIN cum_rej2 ON 1 = 1
        |GROUP BY k, window_start, window_end""".stripMargin,
      "pre-join")
    rejects(
      """SELECT k, window_start, window_end, MIN(k) AS mk
        |FROM TABLE(CUMULATE(TABLE cum_rej, DESCRIPTOR(ts),
        |  INTERVAL '1' MINUTE, INTERVAL '5' MINUTE))
        |GROUP BY k, window_start, window_end""".stripMargin,
      "numeric")
    rejects(
      """SELECT k, window_start, window_end
        |FROM TABLE(CUMULATE(TABLE cum_rej, DESCRIPTOR(ts),
        |  INTERVAL '1' MINUTE, INTERVAL '5' MINUTE))
        |GROUP BY k, window_start, window_end""".stripMargin,
      "at least one aggregate")
    // Flink treats a TVF agg not grouped by BOTH window_start and
    // window_end as a plain aggregation (different cardinality)
    rejects(
      """SELECT k, window_start, COUNT(*) AS n
        |FROM TABLE(CUMULATE(TABLE cum_rej, DESCRIPTOR(ts),
        |  INTERVAL '1' MINUTE, INTERVAL '5' MINUTE))
        |GROUP BY k, window_start""".stripMargin,
      "window_start and window_end")
    // non-lossless JSON round-trip key types are rejected like the
    // streaming MATCH_RECOGNIZE PARTITION BY gate
    Seq(("x", ts(1), 1L, 2.5d)).toDF("k", "ts", "v", "dk")
      .createOrReplaceTempView("cum_rej_dk")
    rejects(
      """SELECT dk, window_start, window_end, COUNT(*) AS n
        |FROM TABLE(CUMULATE(TABLE cum_rej_dk, DESCRIPTOR(ts),
        |  INTERVAL '1' MINUTE, INTERVAL '5' MINUTE))
        |GROUP BY dk, window_start, window_end""".stripMargin,
      "round-trip")
    // distinct over a nested type has no injective string encoding —
    // rejects by name (scalar types, doubles included, ride since r15)
    Seq(("x", ts(1), Seq(1L))).toDF("k", "ts", "av")
      .createOrReplaceTempView("cum_rej_av")
    rejects(
      """SELECT k, window_start, window_end, COUNT(DISTINCT av) AS n
        |FROM TABLE(CUMULATE(TABLE cum_rej_av, DESCRIPTOR(ts),
        |  INTERVAL '1' MINUTE, INTERVAL '5' MINUTE))
        |GROUP BY k, window_start, window_end""".stripMargin,
      "injectively")
  }

  test("COUNT(DISTINCT) matches the batch TVF exactly") {
    // duplicate values within and across steps, a null stripe, 3 keys
    val rnd = new scala.util.Random(31)
    val rows = (1 to 200).map { i =>
      (s"k${i % 3}", ts(rnd.nextInt(900).toLong),
        if (i % 7 == 0) null else s"u${rnd.nextInt(12)}")
    }
    rows.toDF("k", "ts", "u").createOrReplaceTempView("cum_dist_in")
    val stmt =
      """SELECT k, window_start, window_end, COUNT(DISTINCT u) AS du,
        |  COUNT(u) AS cu
        |FROM TABLE(CUMULATE(TABLE cum_dist_in, DESCRIPTOR(ts),
        |  INTERVAL '1' MINUTE, INTERVAL '5' MINUTE))
        |GROUP BY k, window_start, window_end""".stripMargin
    val batch = spark.sql(WindowTvf.rewrite(stmt)).collect().map(_.toSeq).toSet
    val streamSql = WindowTvf.rewriteStreaming(stmt, spark,
      _ => Some(("ts", "5 seconds")))
    try {
      val streamed = spark.sql(streamSql).collect().map(_.toSeq).toSet
      assert(streamed === batch)
      // the data must actually exercise dedup: some window saw a repeat
      assert(batch.exists(r =>
        r(3).asInstanceOf[Long] < r(4).asInstanceOf[Long]))
    } finally graft.harness.MatchRecognize.dropViews(spark, streamSql)
  }

  test("SUM/AVG/MIN/MAX(DISTINCT) match the batch TVF exactly") {
    // repeated integral values within and across steps so the distinct
    // fold differs from the plain one; a null stripe exercises the
    // empty-set NULL emission
    val rnd = new scala.util.Random(47)
    val rows = (1 to 200).map { i =>
      (s"k${i % 3}", ts(rnd.nextInt(900).toLong),
        if (i % 9 == 0) null.asInstanceOf[java.lang.Long]
        else java.lang.Long.valueOf(rnd.nextInt(8).toLong))
    }
    rows.toDF("k", "ts", "v").createOrReplaceTempView("cum_dsum_in")
    val stmt =
      """SELECT k, window_start, window_end, SUM(DISTINCT v) AS sd,
        |  AVG(DISTINCT v) AS ad, MIN(DISTINCT v) AS mnd,
        |  MAX(DISTINCT v) AS mxd, SUM(v) AS s
        |FROM TABLE(CUMULATE(TABLE cum_dsum_in, DESCRIPTOR(ts),
        |  INTERVAL '1' MINUTE, INTERVAL '5' MINUTE))
        |GROUP BY k, window_start, window_end""".stripMargin
    val batch = spark.sql(WindowTvf.rewrite(stmt)).collect().map(_.toSeq).toSet
    val streamSql = WindowTvf.rewriteStreaming(stmt, spark,
      _ => Some(("ts", "5 seconds")))
    try {
      val streamed = spark.sql(streamSql).collect().map(_.toSeq).toSet
      assert(streamed === batch)
      // the data must actually exercise dedup: some window's distinct
      // sum differs from its plain sum
      assert(batch.exists(r => r(3) != r(7)))
    } finally graft.harness.MatchRecognize.dropViews(spark, streamSql)
  }

  test("SUM/AVG/COUNT(DISTINCT) over doubles match the batch TVF exactly") {
    // round 15 (kinds 12/13): double distinct arithmetic rides the
    // exact string carrier. Values are dyadic rationals (k * 0.25) so
    // double addition is exact in ANY order — the batch fold's
    // partition order and the tracker's sorted fold must then agree
    // bit-for-bit; NaN and a -0.0/0.0 collision pin the carrier's
    // SQL-equality normalization
    val rnd = new scala.util.Random(53)
    val rows = (1 to 200).map { i =>
      (s"k${i % 3}", ts(rnd.nextInt(900).toLong),
        if (i % 9 == 0) null.asInstanceOf[java.lang.Double]
        else if (i % 50 == 0) java.lang.Double.valueOf(Double.NaN)
        else if (i % 23 == 0) java.lang.Double.valueOf(-0.0d)
        else if (i % 29 == 0) java.lang.Double.valueOf(0.0d)
        else java.lang.Double.valueOf(rnd.nextInt(8) * 0.25d))
    }
    rows.toDF("k", "ts", "v").createOrReplaceTempView("cum_ddsum_in")
    val stmt =
      """SELECT k, window_start, window_end, SUM(DISTINCT v) AS sd,
        |  AVG(DISTINCT v) AS ad, COUNT(DISTINCT v) AS cd, SUM(v) AS s
        |FROM TABLE(CUMULATE(TABLE cum_ddsum_in, DESCRIPTOR(ts),
        |  INTERVAL '1' MINUTE, INTERVAL '5' MINUTE))
        |GROUP BY k, window_start, window_end""".stripMargin
    def canon(r: Seq[Any]): Seq[Any] = r.map {
      case d: java.lang.Double if d.isNaN => "NaN"
      case x => x
    }
    val batch = spark.sql(WindowTvf.rewrite(stmt)).collect()
      .map(r => canon(r.toSeq)).toSet
    val streamSql = WindowTvf.rewriteStreaming(stmt, spark,
      _ => Some(("ts", "5 seconds")))
    try {
      val streamed = spark.sql(streamSql).collect()
        .map(r => canon(r.toSeq)).toSet
      assert(streamed === batch)
      // the data must actually exercise dedup somewhere
      assert(batch.exists(r => r(3) != r(6)))
    } finally graft.harness.MatchRecognize.dropViews(spark, streamSql)
  }

  test("SUM/AVG(DISTINCT decimal) match the batch TVF exactly") {
    // r16 (kind 21): decimal distinct arithmetic rides the
    // set-passthrough slot — the tracker emits the sorted value set
    // and the harness finishes in Catalyst decimal expressions, so
    // results are exact, fold-order-free, and bit-identical to batch
    // (sum at Spark's p+10 precision, AVG via the DECIMAL(20,0) count
    // division cast to Spark's Average result type)
    val rnd = new scala.util.Random(71)
    val rows = (1 to 200).map { i =>
      (s"k${i % 3}", ts(rnd.nextInt(900).toLong),
        if (i % 9 == 0) null
        else new java.math.BigDecimal(rnd.nextInt(800))
          .movePointLeft(2).add(new java.math.BigDecimal(i % 4)))
    }
    rows.toDF("k", "ts", "v")
      .selectExpr("k", "ts", "CAST(v AS DECIMAL(7,2)) AS v")
      .createOrReplaceTempView("cum_decd_in")
    val stmt =
      """SELECT k, window_start, window_end, SUM(DISTINCT v) AS sd,
        |  AVG(DISTINCT v) AS ad, COUNT(DISTINCT v) AS cd, COUNT(v) AS n
        |FROM TABLE(CUMULATE(TABLE cum_decd_in, DESCRIPTOR(ts),
        |  INTERVAL '1' MINUTE, INTERVAL '5' MINUTE))
        |GROUP BY k, window_start, window_end""".stripMargin
    val batchDf = spark.sql(WindowTvf.rewrite(stmt))
    val batch = batchDf.collect().map(_.toSeq).toSet
    val streamSql = WindowTvf.rewriteStreaming(stmt, spark,
      _ => Some(("ts", "5 seconds")))
    try {
      val streamedDf = spark.sql(streamSql)
      // the finished columns carry Spark's own aggregate result types
      assert(streamedDf.schema("sd").dataType ===
        batchDf.schema("sd").dataType)
      assert(streamedDf.schema("ad").dataType ===
        batchDf.schema("ad").dataType)
      val streamed = streamedDf.collect().map(_.toSeq).toSet
      assert(streamed === batch)
      // dedup actually exercised: some window saw a repeated value
      assert(batch.exists(r =>
        r(5).asInstanceOf[Long] < r(6).asInstanceOf[Long]))
    } finally graft.harness.MatchRecognize.dropViews(spark, streamSql)
  }

  test("plain decimal SUM/AVG/MIN/MAX match the batch TVF exactly") {
    // r16 (kinds 22-25): the exact BigDecimal string seat accumulates
    // per (key, span, step) and merges across steps; addition is
    // exact and associative so the result is fold-order-free and
    // bit-identical to batch — result TYPES included (sum at p+10,
    // AVG through the Catalyst division finish at (p+4, s+4))
    val rnd = new scala.util.Random(83)
    val rows = (1 to 200).map { i =>
      (s"k${i % 3}", ts(rnd.nextInt(900).toLong),
        if (i % 9 == 0) null
        else new java.math.BigDecimal(rnd.nextInt(100000) - 50000)
          .movePointLeft(2))
    }
    rows.toDF("k", "ts", "v")
      .selectExpr("k", "ts", "CAST(v AS DECIMAL(9,2)) AS v")
      .createOrReplaceTempView("cum_decp_in")
    val stmt =
      """SELECT k, window_start, window_end, SUM(v) AS s, AVG(v) AS a,
        |  MIN(v) AS mn, MAX(v) AS mx, COUNT(v) AS n
        |FROM TABLE(CUMULATE(TABLE cum_decp_in, DESCRIPTOR(ts),
        |  INTERVAL '1' MINUTE, INTERVAL '5' MINUTE))
        |GROUP BY k, window_start, window_end""".stripMargin
    val batchDf = spark.sql(WindowTvf.rewrite(stmt))
    val batch = batchDf.collect().map(_.toSeq).toSet
    val streamSql = WindowTvf.rewriteStreaming(stmt, spark,
      _ => Some(("ts", "5 seconds")))
    try {
      val streamedDf = spark.sql(streamSql)
      for (c <- Seq("s", "a", "mn", "mx"))
        assert(streamedDf.schema(c).dataType === batchDf.schema(c).dataType,
          c)
      val streamed = streamedDf.collect().map(_.toSeq).toSet
      assert(streamed === batch)
      assert(batch.nonEmpty)
    } finally graft.harness.MatchRecognize.dropViews(spark, streamSql)
  }

  test("STDDEV/VAR aggregates match the batch TVF (moment law)") {
    // r16: the variance family streams through the central-moment
    // slots (kinds 17-20). The tracker runs Spark's own
    // CentralMomentAgg update/merge arithmetic, but the FOLD TREE
    // differs (batch: per-partition partials + merge; tracker:
    // arrival-order fold + in-order step merge), so doubles can differ
    // in the last ulps — the comparison quantizes at 1e-9 relative.
    // The exact-arithmetic law itself is pinned bit-for-bit by the
    // OVER specs, where both sides fold sequentially. A lone far-away
    // row pins the ANSI single-row semantics (*_SAMP NULL, *_POP 0.0),
    // and a null stripe the all-null NULL emission.
    val rnd = new scala.util.Random(67)
    val rows = (1 to 200).map { i =>
      (s"k${i % 3}", ts(rnd.nextInt(900).toLong),
        if (i % 9 == 0) null.asInstanceOf[java.lang.Long]
        else java.lang.Long.valueOf(rnd.nextInt(100).toLong),
        rnd.nextInt(40) * 0.25d)
    } :+ (("k9", ts(5000L), java.lang.Long.valueOf(7L), 1.5d))
    rows.toDF("k", "ts", "v", "d").createOrReplaceTempView("cum_var_in")
    val stmt =
      """SELECT k, window_start, window_end, COUNT(*) AS n,
        |  STDDEV_SAMP(v) AS ss, STDDEV_POP(d) AS sp,
        |  VAR_SAMP(d) AS vs, VAR_POP(v) AS vp,
        |  VARIANCE(v) AS vv, STDDEV(d) AS sd
        |FROM TABLE(CUMULATE(TABLE cum_var_in, DESCRIPTOR(ts),
        |  INTERVAL '1' MINUTE, INTERVAL '5' MINUTE))
        |GROUP BY k, window_start, window_end""".stripMargin
    val batch = spark.sql(WindowTvf.rewrite(stmt)).collect().map(_.toSeq)
    val streamSql = WindowTvf.rewriteStreaming(stmt, spark,
      _ => Some(("ts", "5 seconds")))
    try {
      val streamed = spark.sql(streamSql).collect().map(_.toSeq)
      assertApproxSetEqual(streamed, batch)
      // the lone row actually pins the single-row law
      val lone = batch.filter(_.head == "k9")
      assert(lone.nonEmpty && lone.forall(r =>
        r(4) == null && r(6) == null && r(5) == 0.0d && r(7) == 0.0d))
    } finally graft.harness.MatchRecognize.dropViews(spark, streamSql)
  }

  /** Set equality keyed on the leading (key, window) cells, doubles
    * compared at 1e-9 relative tolerance (variance fold trees differ
    * between batch partial-merge and the tracker's arrival order). */
  private def assertApproxSetEqual(got: Seq[Seq[Any]],
      exp: Seq[Seq[Any]]): Unit = {
    def keyOf(r: Seq[Any]) = r.take(3).map(String.valueOf).mkString("|")
    val g = got.sortBy(keyOf)
    val e = exp.sortBy(keyOf)
    assert(g.map(keyOf) === e.map(keyOf))
    g.lazyZip(e).foreach { (a, b) =>
      a.lazyZip(b).foreach {
        case (x: java.lang.Double, y: java.lang.Double) =>
          assert(math.abs(x - y) <= 1e-9 *
            math.max(1d, math.max(math.abs(x), math.abs(y))),
            s"\ngot $a\nexp $b")
        case (x, y) => assert(x == y, s"\ngot $a\nexp $b")
      }
    }
  }

  test("COUNT(DISTINCT) unions values across steps incrementally") {
    implicit val sc = spark.sqlContext
    val input = MemoryStream[(String, Timestamp, String)]
    input.toDF().toDF("k", "ts", "u").createOrReplaceTempView("cum_dist_inc")
    val stmt =
      """SELECT k, window_start, window_end, COUNT(DISTINCT u) AS du
        |FROM TABLE(CUMULATE(TABLE cum_dist_inc, DESCRIPTOR(ts),
        |  INTERVAL '1' MINUTE, INTERVAL '3' MINUTE))
        |GROUP BY k, window_start, window_end""".stripMargin
    val streamSql = WindowTvf.rewriteStreaming(stmt, spark,
      _ => Some(("ts", "5 seconds")))
    val q = spark.sql(streamSql).writeStream.format("memory")
      .queryName("cum_dist_out").outputMode("append").start()
    try {
      // minute 0 holds {a, b, a}; minute 1 adds {b, c} — the growing
      // windows must union across steps: [0,60)=2, [0,120)=3, [0,180)=3
      input.addData(("x", ts(10), "a"), ("x", ts(20), "b"), ("x", ts(30), "a"))
      q.processAllAvailable()
      input.addData(("x", ts(70), "b"), ("x", ts(80), "c"))
      q.processAllAvailable()
      input.addData(("x", ts(1000), "z"))
      q.processAllAvailable()
      val got = spark.table("cum_dist_out")
        .select($"window_end", $"du").as[(Timestamp, Long)].collect()
        .map { case (we, du) => (we.getTime / 1000L, du) }
        .filter(_._1 <= 180L).toSet
      assert(got === Set((60L, 2L), (120L, 3L), (180L, 3L)))
    } finally q.stop()
  }
}
