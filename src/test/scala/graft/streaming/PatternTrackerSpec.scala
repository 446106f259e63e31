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

  // measures (def-bit masks): FIRST(V.ts), LAST(P.ts), COUNT(C.*), MATCH_NUMBER()
  private val Measures = Seq((0, 1L), (1, 4L), (2, 2L), (4, 0L))

  test("V C+ P completes only after the watermark passes the purchase") {
    implicit val sc = spark.sqlContext
    val input = MemoryStream[(String, Timestamp, String)]
    val events = input.toDF().toDF("key", "ts", "t")
      .selectExpr("key", "ts",
        "CASE t WHEN 'view' THEN 1L WHEN 'click' THEN 2L WHEN 'purchase' THEN 4L ELSE 0L END AS defs",
        "'' AS vals", "'' AS lag")
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
        PatternMatch("u1", List(10000L, 13000L, 2L, 1L), Nil)))
    } finally query.stop()
  }

  test("greedy run stays pending while the boundary could extend it") {
    implicit val sc = spark.sqlContext
    val input = MemoryStream[(String, Timestamp, Long)]
    val events = input.toDF().toDF("key", "ts", "defs")
      .selectExpr("*", "'' AS vals", "'' AS lag").as[PatternEvent]
    // pattern: A+ (bit0), measures COUNT(*), MATCH_NUMBER()
    val out = PatternTracker.track(events, "5 seconds",
      Seq(PatternTracker.Elem(0, 1, Int.MaxValue)), Seq((3, 0L), (4, 0L)),
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
      assert(rows.toSeq === Seq(PatternMatch("k", List(3L, 1L), Nil)))
    } finally query.stop()
  }

  test("match numbers continue across micro-batches per key") {
    implicit val sc = spark.sqlContext
    val input = MemoryStream[(String, Timestamp, Long)]
    val events = input.toDF().toDF("key", "ts", "defs")
      .selectExpr("*", "'' AS vals", "'' AS lag").as[PatternEvent]
    // pattern: single A (bit0); count + match number
    val out = PatternTracker.track(events, "5 seconds",
      Seq(PatternTracker.Elem(0, 1, 1)), Seq((4, 0L)),
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

  test("idle keys expire after the TTL; numbering restarts on return") {
    implicit val sc = spark.sqlContext
    val input = MemoryStream[(String, Timestamp, String)]
    val events = input.toDF().toDF("key", "ts", "t")
      .selectExpr("key", "ts",
        "CASE t WHEN 'view' THEN 1L WHEN 'click' THEN 2L WHEN 'purchase' THEN 4L ELSE 0L END AS defs",
        "'' AS vals", "'' AS lag")
      .as[PatternEvent]
    val out = PatternTracker.track(events, "5 seconds", VCP, Measures,
      skipToNextRow = false)
    val query = out.writeStream.format("memory")
      .queryName("pt_idle").outputMode("append").start()
    try {
      // u1 completes a match; watermark then advances (via u2) so the
      // match emits and u1's buffer is consumed
      input.addData(("u1", ts(10), "view"), ("u1", ts(11), "click"),
        ("u1", ts(12), "purchase"))
      query.processAllAvailable()
      input.addData(("u2", ts(100), "view"))
      query.processAllAvailable()
      assert(spark.table("pt_idle").as[PatternMatch].collect().toSeq ===
        Seq(PatternMatch("u1", List(10000L, 12000L, 1L, 1L), Nil)))
      // push the watermark > IdleTtl past u1's last activity: its
      // match-number continuity state may be dropped (bounded state);
      // extra intermediate batches let the idle timeout fire
      val far = 100L + PatternTracker.IdleTtlMs / 1000L + 1000L
      input.addData(("u2", ts(far), "view"))
      query.processAllAvailable()
      input.addData(("u2", ts(far + 100), "view"))
      query.processAllAvailable()
      // u1 returns: a new match numbers from 1 again (documented trade
      // for bounded state — same as Flink under state TTL)
      input.addData(("u1", ts(far + 200), "view"),
        ("u1", ts(far + 201), "click"), ("u1", ts(far + 202), "purchase"))
      query.processAllAvailable()
      input.addData(("u2", ts(far + 1000), "view"))
      query.processAllAvailable()
      val u1 = spark.table("pt_idle").as[PatternMatch].collect()
        .filter(_.key == "u1").sortBy(_.values.head)
      assert(u1.length === 2)
      assert(u1(1).values(3) === 1L,
        s"expected restarted match numbering, got ${u1.toSeq}")
    } finally query.stop()
  }

  test("WITHIN closes greedy runs at the horizon without a breaker row") {
    // A B* with every later row matching B: without WITHIN the greedy
    // run keeps hitting the maturity boundary and stays pending until
    // a non-B row arrives. With a 5 s horizon, the decision finalizes
    // as soon as the watermark passes ts(A) + 5 s — no breaker needed.
    implicit val sc = spark.sqlContext
    val input = MemoryStream[(String, Timestamp, Long)]
    val events = input.toDF().toDF("key", "ts", "defs")
      .selectExpr("*", "'' AS vals", "'' AS lag").as[PatternEvent]
    val out = PatternTracker.track(events, "5 seconds",
      Seq(PatternTracker.Elem(0, 1, 1),
        PatternTracker.Elem(1, 0, Int.MaxValue)),
      Seq((3, 0L)), skipToNextRow = false, withinMs = 5000L)
    val query = out.writeStream.format("memory")
      .queryName("pt_within").outputMode("append").start()
    try {
      // A at 10 s, B at 11-13 s (all inside the horizon), no closer
      input.addData(("k", ts(10), 1L), ("k", ts(11), 2L),
        ("k", ts(12), 2L), ("k", ts(13), 2L))
      query.processAllAvailable()
      assert(spark.table("pt_within").count() === 0) // nothing matured
      // another key's row pushes the watermark far past the horizon
      input.addData(("other", ts(100), 0L))
      query.processAllAvailable()
      val rows = spark.table("pt_within").as[PatternMatch].collect()
      assert(rows.toSeq === Seq(PatternMatch("k", List(4L), Nil)))
    } finally query.stop()
  }

  test("streaming matches equal batch matches on random sequences") {
    // the watermark-finality (hitEnd) discipline must make incremental
    // delivery invisible: chunked streaming output == one-shot batch
    // output for the same ordered rows. Pattern: A B* C over random
    // tag sequences, measures FIRST(A.ts), COUNT(B.*), COUNT(*), mn.
    implicit val sc = spark.sqlContext
    val elems = Seq(PatternTracker.Elem(0, 1, 1),
      PatternTracker.Elem(1, 0, Int.MaxValue), PatternTracker.Elem(2, 1, 1))
    val measures = Seq((0, 1L), (2, 2L), (3, 0L), (4, 0L))
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 6) {
      // trials 5-6 add a WITHIN horizon (3 row-gaps), exercising the
      // horizon-finality path against the batch reference
      val within = if (trial > 4) 30000L else 0L
      val rows = (1 to 30).map { i =>
        // bits: A=1, B=2, C=4; a row can satisfy several variables
        val defs = 1L << rnd.nextInt(3) | (if (rnd.nextBoolean()) 2L else 0L)
        (s"k${i % 2}", ts(10L + i * 10L), defs)
      }
      // batch reference: the same operator in final mode (bounded input)
      val batch = PatternTracker.track(
        rows.toDS().toDF("key", "ts", "defs")
        .selectExpr("*", "'' AS vals", "'' AS lag").as[PatternEvent],
        "5 seconds", elems, measures, skipToNextRow = false, within)
        .collect().toSet

      val input = MemoryStream[(String, Timestamp, Long)]
      val out = PatternTracker.track(
        input.toDF().toDF("key", "ts", "defs")
      .selectExpr("*", "'' AS vals", "'' AS lag").as[PatternEvent],
        "5 seconds", elems, measures, skipToNextRow = false, within)
      val name = s"pt_eq_$trial"
      val query = out.writeStream.format("memory")
        .queryName(name).outputMode("append").start()
      try {
        rows.grouped(7).foreach { chunk =>
          input.addData(chunk: _*)
          query.processAllAvailable()
        }
        // two non-matching flush rows: the first matures the real rows
        // and closes any boundary-pending run, the second matures it
        input.addData(("k0", ts(500000L), 0L), ("k1", ts(500000L), 0L))
        query.processAllAvailable()
        input.addData(("k0", ts(900000L), 0L))
        query.processAllAvailable()
        val streamed = spark.table(name).as[PatternMatch].collect().toSet
        // batch also sees the flush rows? No — compare on real matches:
        // flush rows satisfy no variable, so they can't join a match
        assert(streamed === batch, s"trial $trial")
      } finally query.stop()
    }
  }

  test("chunked PREV equals batch on random value sequences") {
    // PREV-dependent def bits must recompute identically regardless of
    // delivery chunking: S R+ with R := v > PREV(v) over random small
    // values (plenty of rises, falls, and ties), chunked streaming vs
    // one-shot batch on the same ordered rows
    implicit val sc = spark.sqlContext
    import org.apache.spark.sql.catalyst.expressions.{BoundReference, GreaterThan}
    import org.apache.spark.sql.types.LongType
    val elems = Seq(PatternTracker.Elem(0, 1, 1),
      PatternTracker.Elem(1, 1, Int.MaxValue))
    val measures = Seq((0, 1L), (2, 2L), (4, 0L))
    // layout: ordinal 0 = v (current), ordinal 1 = __prev_1_v
    val prevSpec = Some(PatternTracker.PrevSpec(
      Array("v"), Array(LongType), 1,
      Array((1, GreaterThan(BoundReference(0, LongType, nullable = true),
        BoundReference(1, LongType, nullable = true))))))
    val rnd = new scala.util.Random(23)
    for (trial <- 1 to 4) {
      val rows = (1 to 30).map { i =>
        // both bits set upstream (no non-PREV conjuncts); the tracker
        // CLEARS bit 1 (R) when the PREV predicate doesn't hold
        (s"k${i % 2}", ts(10L + i * 10L), 3L, s"""{"v":${rnd.nextInt(5)}}""")
      }
      val batch = PatternTracker.trackBranches(
        rows.toDS().toDF("key", "ts", "defs", "lag")
          .selectExpr("key", "ts", "defs", "'' AS vals", "lag")
          .as[PatternEvent],
        "5 seconds", Seq(elems), measures, skipToNextRow = false, None, 0L,
        prevSpec).collect().toSet
      val input = MemoryStream[(String, Timestamp, Long, String)]
      val out = PatternTracker.trackBranches(
        input.toDF().toDF("key", "ts", "defs", "lag")
          .selectExpr("key", "ts", "defs", "'' AS vals", "lag")
          .as[PatternEvent],
        "5 seconds", Seq(elems), measures, skipToNextRow = false, None, 0L,
        prevSpec)
      val name = s"pt_prev_$trial"
      val query = out.writeStream.format("memory")
        .queryName(name).outputMode("append").start()
      try {
        rows.grouped(7).foreach { chunk =>
          input.addData(chunk: _*)
          query.processAllAvailable()
        }
        // flush rows satisfy no variable and nothing follows them, so
        // they are PREV sources for no matching row — batch parity holds
        input.addData(("k0", ts(500000L), 0L, "{}"),
          ("k1", ts(500000L), 0L, "{}"))
        query.processAllAvailable()
        input.addData(("k0", ts(900000L), 0L, "{}"))
        query.processAllAvailable()
        val streamed = spark.table(name).as[PatternMatch].collect().toSet
        assert(streamed === batch, s"trial $trial")
      } finally query.stop()
    }
  }

  test("soak: 100k keys with PREV; state bounded, idle TTL reclaims it") {
    // scale evidence for the PREV path: after every key's rows are
    // consumed, each key retains only its ctx window + MATCH_NUMBER
    // continuity (one state row per key), and the idle TTL must
    // reclaim all of it once the watermark moves IdleTtlMs past the
    // quiet keys — state is bounded by ACTIVE key cardinality, not
    // lifetime key cardinality
    import graft.harness.MatchRecognize
    implicit val sc = spark.sqlContext
    val nKeys = 100000
    val input = MemoryStream[(String, Timestamp, Long)]
    input.toDF().toDF("k", "ts", "vm").createOrReplaceTempView("mr_prev_soak")
    val streamSql = MatchRecognize.rewriteStreaming(spark,
      """SELECT * FROM mr_prev_soak MATCH_RECOGNIZE (
        |  PARTITION BY k ORDER BY ts
        |  MEASURES LAST(R.vm) AS rv
        |  AFTER MATCH SKIP PAST LAST ROW
        |  PATTERN (R)
        |  DEFINE R AS vm > PREV(vm))""".stripMargin,
      _ => Some(("ts", "5 seconds")))
    val query = spark.sql(streamSql).writeStream.format("memory")
      .queryName("mr_prev_soak_out").outputMode("append").start()
    try {
      // every key: vm rises 1 -> 2 across two constant event times
      // (constant per position: watermark-split-safe)
      input.addData((0 until nKeys).map(i => (s"k$i", ts(10), 1L)): _*)
      input.addData((0 until nKeys).map(i => (s"k$i", ts(20), 2L)): _*)
      input.addData(("z", ts(100), 0L))
      query.processAllAvailable()
      input.addData(("z", ts(200), 0L))
      query.processAllAvailable()
      val matches = spark.table("mr_prev_soak_out")
        .filter("k != 'z'").count()
      assert(matches === nKeys.toLong)
      // all rows consumed: every key holds exactly one state row (its
      // ctx + match counter)
      val held = query.lastProgress.stateOperators.head.numRowsTotal
      assert(held >= nKeys.toLong,
        s"expected ctx state for all $nKeys keys, saw $held")
      // push the watermark IdleTtlMs past the quiet keys: the idle
      // timeout wave drops all of them
      input.addData(("z", ts(10L + PatternTracker.IdleTtlMs / 1000L + 600L), 0L))
      query.processAllAvailable()
      input.addData(("z", ts(10L + PatternTracker.IdleTtlMs / 1000L + 900L), 0L))
      query.processAllAvailable()
      val after = query.lastProgress.stateOperators.head.numRowsTotal
      assert(after <= 2L,
        s"idle TTL passed but $after state rows remain (expected <= 2)")
    } finally {
      query.stop()
      MatchRecognize.dropViews(spark, streamSql)
    }
  }

  test("chunked alternation equals batch on random sequences") {
    // alternation + hitEnd interplay: a deferred higher-preference
    // branch must keep later branches from deciding early, and the
    // final chunked output must equal the one-shot batch output
    implicit val sc = spark.sqlContext
    val branches = Seq(
      Seq(PatternTracker.Elem(0, 1, 1), PatternTracker.Elem(1, 1, Int.MaxValue)),
      Seq(PatternTracker.Elem(2, 1, 1))) // (A B+ | C)
    val measures = Seq((3, 0L), (2, 2L), (4, 0L))
    val rnd = new scala.util.Random(11)
    for (trial <- 1 to 3) {
      val rows = (1 to 30).map { i =>
        // any PAIR of variable bits can co-occur — in particular A and
        // C together, the case where a boundary-deferred (A B+) branch
        // interacts with the fallback C branch
        val defs = (1L << rnd.nextInt(3)) | (1L << rnd.nextInt(3))
        (s"k${i % 2}", ts(10L + i * 10L), defs)
      }
      val batch = PatternTracker.trackBranches(
        rows.toDS().toDF("key", "ts", "defs")
          .selectExpr("*", "'' AS vals", "'' AS lag").as[PatternEvent],
        "5 seconds", branches, measures, skipToNextRow = false, None, 0L)
        .collect().toSet
      val input = MemoryStream[(String, Timestamp, Long)]
      val out = PatternTracker.trackBranches(
        input.toDF().toDF("key", "ts", "defs")
          .selectExpr("*", "'' AS vals", "'' AS lag").as[PatternEvent],
        "5 seconds", branches, measures, skipToNextRow = false, None, 0L)
      val name = s"pt_alt_$trial"
      val query = out.writeStream.format("memory")
        .queryName(name).outputMode("append").start()
      try {
        rows.grouped(5).foreach { chunk =>
          input.addData(chunk: _*)
          query.processAllAvailable()
        }
        input.addData(("k0", ts(500000L), 0L), ("k1", ts(500000L), 0L))
        query.processAllAvailable()
        input.addData(("k0", ts(900000L), 0L))
        query.processAllAvailable()
        val streamed = spark.table(name).as[PatternMatch].collect().toSet
        assert(streamed === batch, s"trial $trial")
      } finally query.stop()
    }
  }

  test("chunked aggregate measures equal batch on random value sequences") {
    // SUM/MIN/MAX/AVG (kinds 8-11) aggregate over the assigned rows'
    // vals payload; chunked delivery must be invisible, including the
    // SQL null discipline (some payloads carry v = null / no v at all)
    implicit val sc = spark.sqlContext
    val branches = Seq(
      Seq(PatternTracker.Elem(0, 1, Int.MaxValue), PatternTracker.Elem(1, 1, 1)),
      Seq(PatternTracker.Elem(2, 1, 1))) // (A+ B | C)
    val measures = Seq((8, 1L), (9, 1L), (10, 1L), (11, 1L), (2, 1L), (4, 0L))
    val aggSpec = Some(PatternTracker.AggSpec(Array("v", "v", "v", "v")))
    val rnd = new scala.util.Random(31)
    for (trial <- 1 to 4) {
      val rows = (1 to 30).map { i =>
        val defs = (1L << rnd.nextInt(3)) | (1L << rnd.nextInt(3))
        val vals = rnd.nextInt(5) match {
          case 0 => "{}"                      // no v field
          case 1 => """{"v":null}"""          // explicit null
          case _ => s"""{"v":${rnd.nextInt(9) - 2}}""" // incl. negatives
        }
        (s"k${i % 2}", ts(10L + i * 10L), defs, vals)
      }
      val batch = PatternTracker.trackBranches(
        rows.toDS().toDF("key", "ts", "defs", "vals")
          .selectExpr("key", "ts", "defs", "vals", "'' AS lag")
          .as[PatternEvent],
        "5 seconds", branches, measures, skipToNextRow = false, None, 0L,
        None, aggSpec).collect().toSet
      val input = MemoryStream[(String, Timestamp, Long, String)]
      val out = PatternTracker.trackBranches(
        input.toDF().toDF("key", "ts", "defs", "vals")
          .selectExpr("key", "ts", "defs", "vals", "'' AS lag")
          .as[PatternEvent],
        "5 seconds", branches, measures, skipToNextRow = false, None, 0L,
        None, aggSpec)
      val name = s"pt_agg_$trial"
      val query = out.writeStream.format("memory")
        .queryName(name).outputMode("append").start()
      try {
        rows.grouped(5).foreach { chunk =>
          input.addData(chunk: _*)
          query.processAllAvailable()
        }
        input.addData(("k0", ts(500000L), 0L, "{}"),
          ("k1", ts(500000L), 0L, "{}"))
        query.processAllAvailable()
        input.addData(("k0", ts(900000L), 0L, "{}"))
        query.processAllAvailable()
        val streamed = spark.table(name).as[PatternMatch].collect().toSet
        assert(streamed === batch, s"trial $trial")
        // sanity: at least one match carried a real aggregate and at
        // least one carried a NULL (all-null / no-v payloads)
        val all = streamed.flatMap(_.cvals)
        if (trial == 1) assert(all.exists(_ != null))
      } finally query.stop()
    }
  }

  test("chunked SUBSET union-mask measures equal batch") {
    // measures over OR-masks (the SQL:2016 SUBSET representation):
    // SUM over A|B (mask 3), COUNT and FIRST-ts over B|C (mask 6) —
    // chunked delivery must be invisible, exactly like the single-bit
    // measure kinds
    implicit val sc = spark.sqlContext
    val branches = Seq(
      Seq(PatternTracker.Elem(0, 1, Int.MaxValue), PatternTracker.Elem(1, 1, 1)),
      Seq(PatternTracker.Elem(2, 1, 1))) // (A+ B | C)
    val measures = Seq((8, 3L), (2, 6L), (0, 6L), (4, 0L))
    val aggSpec = Some(PatternTracker.AggSpec(Array("v")))
    val rnd = new scala.util.Random(47)
    for (trial <- 1 to 3) {
      val rows = (1 to 30).map { i =>
        val defs = (1L << rnd.nextInt(3)) | (1L << rnd.nextInt(3))
        (s"k${i % 2}", ts(10L + i * 10L), defs,
          s"""{"v":${rnd.nextInt(7) - 1}}""")
      }
      val batch = PatternTracker.trackBranches(
        rows.toDS().toDF("key", "ts", "defs", "vals")
          .selectExpr("key", "ts", "defs", "vals", "'' AS lag")
          .as[PatternEvent],
        "5 seconds", branches, measures, skipToNextRow = false, None, 0L,
        None, aggSpec).collect().toSet
      val input = MemoryStream[(String, Timestamp, Long, String)]
      val out = PatternTracker.trackBranches(
        input.toDF().toDF("key", "ts", "defs", "vals")
          .selectExpr("key", "ts", "defs", "vals", "'' AS lag")
          .as[PatternEvent],
        "5 seconds", branches, measures, skipToNextRow = false, None, 0L,
        None, aggSpec)
      val name = s"pt_subset_$trial"
      val query = out.writeStream.format("memory")
        .queryName(name).outputMode("append").start()
      try {
        rows.grouped(5).foreach { chunk =>
          input.addData(chunk: _*)
          query.processAllAvailable()
        }
        input.addData(("k0", ts(500000L), 0L, "{}"),
          ("k1", ts(500000L), 0L, "{}"))
        query.processAllAvailable()
        input.addData(("k0", ts(900000L), 0L, "{}"))
        query.processAllAvailable()
        val streamed = spark.table(name).as[PatternMatch].collect().toSet
        assert(streamed === batch, s"trial $trial")
      } finally query.stop()
    }
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
         |create table snk (k bigint, n bigint, sa bigint, mn bigint) with (
         |  'connector' = 'filesystem',
         |  'path' = 'file://${dir.toString}/out',
         |  'format' = 'parquet'
         |);
         |insert into snk
         |SELECT k, n, sa, mn FROM src
         |MATCH_RECOGNIZE (
         |  PARTITION BY id
         |  ORDER BY row_time
         |  MEASURES COUNT(A.*) AS n, SUM(A.id) AS sa, MATCH_NUMBER() AS mn
         |  PATTERN (A{1,2})
         |  DEFINE A AS id >= 1
         |) AS m (k, n, sa, mn);
         |""".stripMargin)
    // the MR view exposes (id, n, sa, mn); alias column list maps k
    new graft.harness.SqlSubmitAction(script.toString, Map.empty,
      Some(SparkFixture.spark), durationSec = 30L).run()
    // greedy A{1,2} takes up to two rows per match; late stragglers
    // behind the final watermark may stay pending, so expect a prefix
    val got = SparkFixture.spark.read.parquet(s"$dir/out")
    assert(got.count() > 0)
    // SUM(A.id) streams through the vals payload: n rows of id=k sum
    // to exactly n*k, and the aggregate is never NULL (id >= 1 matched)
    got.collect().foreach { r =>
      assert(!r.isNullAt(r.fieldIndex("sa")))
      assert(r.getAs[Long]("sa") == r.getAs[Long]("n") * r.getAs[Long]("k"),
        s"row $r")
    }
  }

  test("streaming subquery source equals batch; contract guards the lineage") {
    import graft.harness.MatchRecognize
    implicit val sc = spark.sqlContext
    // rows: per key, vm walks 1 -> 2 with decoys the subquery filters
    val rows = (0 until 40).flatMap { i =>
      Seq((s"k${i % 5}", ts(10L + i * 10L), if (i % 2 == 0) 1L else 2L, "keep"),
        (s"k${i % 5}", ts(15L + i * 10L), 7L, "drop"))
    }
    def mrTail(src: String) =
      s"""SELECT * FROM $src MATCH_RECOGNIZE (
         |  PARTITION BY k ORDER BY ts
         |  MEASURES FIRST(A.ts) AS a_ts, LAST(B.vm) AS b_vm
         |  AFTER MATCH SKIP PAST LAST ROW
         |  PATTERN (A B)
         |  DEFINE A AS vm = 1, B AS vm = 2)""".stripMargin
    val subq = "(SELECT k, ts, vm FROM %s WHERE tag = 'keep')"
    // batch oracle over the same data through the batch subquery path
    rows.toDF("k", "ts", "vm", "tag").createOrReplaceTempView("mr_subq_b")
    val batchSql = MatchRecognize.rewrite(spark, mrTail(subq.format("mr_subq_b")))
    val batch = spark.sql(batchSql).collect()
      .map(r => (r.getString(0), r.getTimestamp(1), r.getLong(2))).toSet
    MatchRecognize.dropViews(spark, batchSql)
    assert(batch.nonEmpty)
    // streaming: same subquery over a watermarked memory stream
    val input = MemoryStream[(String, Timestamp, Long, String)]
    input.toDF().toDF("k", "ts", "vm", "tag")
      .createOrReplaceTempView("mr_subq_s")
    val wm: String => Option[(String, String)] =
      t => if (t.equalsIgnoreCase("mr_subq_s")) Some(("ts", "5 seconds")) else None
    val streamSql = MatchRecognize.rewriteStreaming(
      spark, mrTail(subq.format("mr_subq_s")), wm)
    val query = spark.sql(streamSql).writeStream.format("memory")
      .queryName("mr_subq_out").outputMode("append").start()
    try {
      rows.grouped(13).foreach { chunk =>
        input.addData(chunk: _*)
        query.processAllAvailable()
      }
      input.addData(("zz", ts(99999L), 0L, "keep")) // watermark flush
      query.processAllAvailable()
      input.addData(("zz", ts(100999L), 0L, "keep"))
      query.processAllAvailable()
      val streamed = spark.table("mr_subq_out").collect()
        .map(r => (r.getString(0), r.getTimestamp(1), r.getLong(2))).toSet
      assert(streamed === batch)
    } finally {
      query.stop()
      MatchRecognize.dropViews(spark, streamSql)
    }
    // lineage guards: a projection dropping the event-time column, and
    // a subquery with no watermarked source, both reject by name
    val eDrop = intercept[IllegalArgumentException](
      MatchRecognize.rewriteStreaming(spark,
        mrTail("(SELECT k, vm FROM mr_subq_s WHERE tag = 'keep')"), wm))
    assert(eDrop.getMessage.contains("project the event-time column"),
      eDrop.getMessage)
    val eNoWm = intercept[IllegalArgumentException](
      MatchRecognize.rewriteStreaming(spark,
        mrTail(subq.format("mr_subq_b")), wm))
    assert(eNoWm.getMessage.contains("no WATERMARK-declared table"),
      eNoWm.getMessage)
  }

  test("PERMUTE streams: the alternation expansion equals batch") {
    import graft.harness.MatchRecognize
    implicit val sc = spark.sqlContext
    // PERMUTE(A, B) expands to (A B | B A) at parse time — lexicographic
    // position order, per the SQL:2016 expansion — BEFORE the batch /
    // streaming split, so the tracker sees plain alternation branches
    // and preference-deferral applies unchanged
    val rnd = new scala.util.Random(23)
    val rows = (0 until 60).map { i =>
      (s"k${i % 4}", ts(10L + i * 10L), (rnd.nextInt(3) + 1).toLong)
    }
    def mrTail(src: String) =
      s"""SELECT * FROM $src MATCH_RECOGNIZE (
         |  PARTITION BY k ORDER BY ts
         |  MEASURES FIRST(A.ts) AS a_ts, LAST(B.ts) AS b_ts,
         |    MATCH_NUMBER() AS mn
         |  AFTER MATCH SKIP PAST LAST ROW
         |  PATTERN (PERMUTE(A, B))
         |  DEFINE A AS vm = 1, B AS vm = 2)""".stripMargin
    rows.toDF("k", "ts", "vm").createOrReplaceTempView("mr_perm_b")
    val batchSql = MatchRecognize.rewrite(spark, mrTail("mr_perm_b"))
    val batch = spark.sql(batchSql).collect()
      .map(r => (r.getString(0), r.getTimestamp(1), r.getTimestamp(2),
        r.getLong(3))).toSet
    MatchRecognize.dropViews(spark, batchSql)
    assert(batch.nonEmpty) // vm=3 decoys leave both orderings present
    val input = MemoryStream[(String, Timestamp, Long)]
    input.toDF().toDF("k", "ts", "vm")
      .createOrReplaceTempView("mr_perm_s")
    val wm: String => Option[(String, String)] =
      t => if (t.equalsIgnoreCase("mr_perm_s")) Some(("ts", "5 seconds"))
      else None
    val streamSql = MatchRecognize.rewriteStreaming(
      spark, mrTail("mr_perm_s"), wm)
    val query = spark.sql(streamSql).writeStream.format("memory")
      .queryName("mr_perm_out").outputMode("append").start()
    try {
      rows.grouped(11).foreach { chunk =>
        input.addData(chunk: _*)
        query.processAllAvailable()
      }
      input.addData(("zz", ts(99999L), 0L)) // watermark flush
      query.processAllAvailable()
      input.addData(("zz", ts(199999L), 0L))
      query.processAllAvailable()
      val streamed = spark.table("mr_perm_out").collect()
        .map(r => (r.getString(0), r.getTimestamp(1), r.getTimestamp(2),
          r.getLong(3))).toSet
      assert(streamed === batch)
    } finally {
      query.stop()
      MatchRecognize.dropViews(spark, streamSql)
    }
  }

  test("e2e: streaming MATCH_RECOGNIZE above a CREATE VIEW source " +
      "(r16 — the view registry answers the shared watermarkOf)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-mr-view")
    val script = java.nio.file.Files.createTempFile("mr-view", ".sql")
    java.nio.file.Files.writeString(script,
      s"""SET execution.runtime-mode = streaming;
         |SET execution.checkpointing.enabled = true;
         |SET state.checkpoints.dir = file://${dir.toString}/cp;
         |create table vsrc (
         |  id bigint,
         |  row_time as timestamp '2024-01-01 00:00:00' +
         |    make_interval(0, 0, 0, 0, 0, 0, cast(id as int)),
         |  watermark for row_time as row_time - interval '1' second
         |) with (
         |  'connector' = 'datagen',
         |  'rows-per-second' = '100',
         |  'fields.id.kind' = 'sequence',
         |  'fields.id.start' = '0',
         |  'fields.id.end' = '19'
         |);
         |create temporary view v_small as
         |  select id, row_time from vsrc where id < 10;
         |create table msnk (n bigint, mn bigint) with (
         |  'connector' = 'filesystem',
         |  'path' = 'file://${dir.toString}/out',
         |  'format' = 'parquet'
         |);
         |insert into msnk
         |SELECT n, mn FROM v_small
         |MATCH_RECOGNIZE (
         |  ORDER BY row_time
         |  MEASURES COUNT(A.*) AS n, MATCH_NUMBER() AS mn
         |  AFTER MATCH SKIP PAST LAST ROW
         |  PATTERN (A A)
         |  DEFINE A AS id >= 0
         |) AS m (n, mn);
         |""".stripMargin)
    new graft.harness.SqlSubmitAction(script.toString, Map.empty,
      Some(SparkFixture.spark), durationSec = 30L).run()
    // ids 0..9 pass the view filter. Catalyst pushes the view's
    // predicate BELOW the reused EventTimeWatermark node, so the
    // watermark tracks the post-filter maximum (9 s − 1 s = 8 s) —
    // conservative and correct; on this bounded run the tail pair
    // (8,9) stays pending, and the four matured (A A) matches emit
    val got = SparkFixture.spark.read.parquet(s"$dir/out")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === (1L to 4L).map(mn => (2L, mn)).toSet, got.toString)
  }
}
