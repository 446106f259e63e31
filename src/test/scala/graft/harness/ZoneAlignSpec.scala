package graft.harness

import java.nio.file.Files
import graft.SparkFixture
import org.scalatest.funsuite.AnyFunSuite

/** Shifted `table.local-time-zone` window alignment (Flink's
  * local-timeline grid semantics): a FIXED-offset zone composes
  * `-shift` into every TUMBLE/HOP/CUMULATE offset argument
  * ([[WindowTvf.alignToZone]]); grid-free forms (SESSION,
  * MATCH_RECOGNIZE, temporal joins) run unchanged under any zone; DST
  * region zones run wall-clock grids in BOTH modes — batch via
  * `WindowTvf.rewrite` localZone, streaming via the pinned-window
  * [[graft.streaming.GridAggTracker]] (r14) — with the window JOIN
  * and TOP-N streaming shapes keeping a named rejection.
  */
class ZoneAlignSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark

  /** Streaming-vs-batch equivalence of a zone-grid aggregation:
    * runs `sql` through the region-zone streaming rewrite over a
    * MemoryStream fed `rows`, closes windows with a late `advance`
    * row, and compares the emitted set against the batch wall-clock
    * rewrite over the same rows.
    */
  private def streamingMatchesBatch(
      zone: String, sqlOf: String => String,
      rows: Seq[(Long, Long)], advanceMs: Long): Set[(Long, Long, Long, Long)] = {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(java.sql.Timestamp, Long)]
    val sname = s"za_s_${System.nanoTime()}"
    input.toDF().toDF("ts", "v").createOrReplaceTempView(sname)
    val rewritten = WindowTvf.rewriteStreaming(sqlOf(sname), spark,
      t => if (t.equalsIgnoreCase(sname)) Some(("ts", "5 seconds")) else None,
      Some(zone))
    val qn = s"za_out_${System.nanoTime()}"
    val q = spark.sql(rewritten).writeStream.format("memory")
      .queryName(qn).outputMode("append").start()
    def canon(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Long, Long)] =
      df.select(
        org.apache.spark.sql.functions.unix_millis($"window_start"),
        org.apache.spark.sql.functions.unix_millis($"window_end"),
        $"n", $"s")
        .as[(Long, Long, Long, Long)].collect().toSet
    try {
      input.addData(rows.map { case (ms, v) =>
        (new java.sql.Timestamp(ms), v) }: _*)
      q.processAllAvailable()
      input.addData((new java.sql.Timestamp(advanceMs), 0L))
      q.processAllAvailable()
      val got = canon(spark.table(qn))
      val bname = s"za_b_${System.nanoTime()}"
      rows.map { case (ms, v) => (new java.sql.Timestamp(ms), v) }
        .toDF("ts", "v").createOrReplaceTempView(bname)
      val exp = canon(spark.sql(WindowTvf.rewrite(sqlOf(bname), Some(zone))))
      assert(got === exp, s"zone $zone\nstreaming: $got\nbatch: $exp")
      got
    } finally q.stop()
  }

  test("fixedOffsetMillis resolves fixed zones and refuses DST regions") {
    assert(EngineConfig.fixedOffsetMillis("GMT+08:00") === Some(28800000L))
    assert(EngineConfig.fixedOffsetMillis("+05:30") === Some(19800000L))
    // Etc/GMT sign convention is INVERTED per POSIX: Etc/GMT-8 is +08:00
    assert(EngineConfig.fixedOffsetMillis("Etc/GMT-8") === Some(28800000L))
    assert(EngineConfig.fixedOffsetMillis("UTC") === Some(0L))
    assert(EngineConfig.fixedOffsetMillis("Asia/Shanghai") === None)
    assert(EngineConfig.fixedOffsetMillis("America/New_York") === None)
    assert(EngineConfig.fixedOffsetMillis("Mars/Olympus") === None)
  }

  test("zoneGridShiftMillis is Some only for SHIFTED fixed zones") {
    val c = new EngineConfig(spark)
    val before = spark.conf.get("spark.sql.session.timeZone")
    try {
      assert(c.zoneGridShiftMillis === None) // unset
      c.setOperation("SET table.local-time-zone = UTC")
      assert(c.zoneGridShiftMillis === None) // fixed but not shifted
      c.setOperation("SET table.local-time-zone = GMT+08:00")
      assert(c.zoneGridShiftMillis === Some(28800000L))
      c.setOperation("SET table.local-time-zone = Asia/Shanghai")
      assert(c.zoneGridShiftMillis === None) // shifted but not fixed
      assert(c.isShiftedTimeline)
    } finally spark.conf.set("spark.sql.session.timeZone", before)
  }

  test("alignToZone composes -shift into TUMBLE, keeping declared offsets") {
    val plain = WindowTvf.alignToZone(
      "SELECT * FROM TABLE(TUMBLE(TABLE t, DESCRIPTOR(ts), INTERVAL '1' DAY))",
      28800000L)
    assert(plain.contains("INTERVAL '-28800000' MILLISECOND"))
    // a declared offset combines: 1h - 8h = -7h
    val combined = WindowTvf.alignToZone(
      "SELECT * FROM TABLE(TUMBLE(TABLE t, DESCRIPTOR(ts), " +
        "INTERVAL '1' DAY, INTERVAL '1' HOUR))",
      28800000L)
    assert(combined.contains("INTERVAL '-25200000' MILLISECOND"))
    // named arguments survive so declaration-order validation still fires
    val named = WindowTvf.alignToZone(
      "SELECT * FROM TABLE(TUMBLE(DATA => TABLE t, " +
        "TIMECOL => DESCRIPTOR(ts), SIZE => INTERVAL '2' HOUR))",
      19800000L)
    assert(named.contains("SIZE => INTERVAL '2' HOUR"))
    assert(named.contains("INTERVAL '-19800000' MILLISECOND"))
    // HOP and CUMULATE get the same trailing composition
    val hop = WindowTvf.alignToZone(
      "SELECT * FROM TABLE(HOP(TABLE t, DESCRIPTOR(ts), " +
        "INTERVAL '5' MINUTE, INTERVAL '10' MINUTE))", 28800000L)
    assert(hop.contains("INTERVAL '5' MINUTE, INTERVAL '10' MINUTE, " +
      "INTERVAL '-28800000' MILLISECOND"))
    val cum = WindowTvf.alignToZone(
      "SELECT * FROM TABLE(CUMULATE(TABLE t, DESCRIPTOR(ts), " +
        "INTERVAL '1' HOUR, INTERVAL '4' HOUR, INTERVAL '10' MINUTE))",
      28800000L)
    assert(cum.contains(s"INTERVAL '${600000L - 28800000L}' MILLISECOND"))
    // SESSION is grid-free: the call text is untouched
    val sess = "SELECT * FROM TABLE(SESSION(TABLE t PARTITION BY k, " +
      "DESCRIPTOR(ts), INTERVAL '5' MINUTE))"
    assert(WindowTvf.alignToZone(sess, 28800000L) === sess)
  }

  test("streaming inherits the zone shift through the native startTime") {
    // the pre-pass runs before rewriteStreaming parses the TVF, so the
    // composed offset lands in window()'s startTime slot: -8h over a
    // 1-day grid normalizes to 16h
    val aligned = WindowTvf.alignToZone(
      "SELECT window_start, COUNT(*) AS n FROM TABLE(TUMBLE(TABLE s, " +
        "DESCRIPTOR(ts), INTERVAL '1' DAY)) GROUP BY window_start",
      28800000L)
    val t = WindowTvf.rewriteStreaming(aligned)
    assert(t.contains(
      "window(ts, '86400000 milliseconds', '86400000 milliseconds', " +
        "'57600000 milliseconds')"), t)
  }

  test("daily TUMBLE under GMT+08:00 splits at local midnight (16:00Z)") {
    import spark.implicits._
    // 2024-01-01T15:59Z and T16:01Z straddle the +08:00 local-day
    // boundary (local midnight = 16:00Z) but share the UTC day
    Seq(1704124740000L, 1704124860000L)
      .toDF("ms").selectExpr("timestamp_millis(ms) AS ts")
      .createOrReplaceTempView("za_t")
    val sql = WindowTvf.rewrite(WindowTvf.alignToZone(
      "SELECT unix_millis(window_start) AS ws, COUNT(*) AS n FROM " +
        "TABLE(TUMBLE(TABLE za_t, DESCRIPTOR(ts), INTERVAL '1' DAY)) " +
        "GROUP BY window_start", 28800000L))
    val rows = spark.sql(sql).collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(rows.toSet === Set((1704038400000L, 1L), (1704124800000L, 1L)))
    // without the zone shift both rows share the UTC day window
    val utc = spark.sql(WindowTvf.rewrite(
      "SELECT unix_millis(window_start) AS ws, COUNT(*) AS n FROM " +
        "TABLE(TUMBLE(TABLE za_t, DESCRIPTOR(ts), INTERVAL '1' DAY)) " +
        "GROUP BY window_start")).collect()
    assert(utc.length === 1 && utc(0).getLong(1) === 2L)
  }

  test("batch DST zone: daily TUMBLE is 23h across the spring-forward day") {
    import spark.implicits._
    // 2024-03-10T04:59Z = 2024-03-09 23:59 EST (local day 03-09);
    // 2024-03-10T05:01Z = 2024-03-10 00:01 EST. The US springs forward
    // at 02:00 local on 03-10, so the 03-10 local day is 23 hours.
    Seq(1710046740000L, 1710046860000L)
      .toDF("ms").selectExpr("timestamp_millis(ms) AS ts")
      .createOrReplaceTempView("za_dst")
    val sql = WindowTvf.rewrite(
      "SELECT unix_millis(window_start) AS ws, unix_millis(window_end) " +
        "AS we, COUNT(*) AS n FROM " +
        "TABLE(TUMBLE(TABLE za_dst, DESCRIPTOR(ts), INTERVAL '1' DAY)) " +
        "GROUP BY window_start, window_end",
      Some("America/New_York"))
    val rows = spark.sql(sql).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // local midnights as instants: 03-09 00:00 EST = 05:00Z,
    // 03-10 00:00 EST = 05:00Z, 03-11 00:00 EDT = 04:00Z
    assert(rows === Set(
      (1709960400000L, 1710046800000L, 1L),
      (1710046800000L, 1710129600000L, 1L)))
    // the transition-day window is 23 hours, not 24
    assert(rows.exists(r => r._2 - r._1 == 82800000L))
    // window_time stays end − 1 ms in instant space
    val wt = spark.sql(WindowTvf.rewrite(
      "SELECT unix_millis(window_time) AS wt FROM " +
        "TABLE(TUMBLE(TABLE za_dst, DESCRIPTOR(ts), INTERVAL '1' DAY)) " +
        "GROUP BY window_time", Some("America/New_York")))
      .collect().map(_.getLong(0)).toSet
    assert(wt === Set(1710046800000L - 1L, 1710129600000L - 1L))
  }

  test("randomized: aligned TUMBLE windows contain their rows on the shifted grid") {
    import spark.implicits._
    val rnd = new scala.util.Random(61)
    (1 to 200).map(_ => rnd.nextLong() % (400L * 86400000L))
      .toDF("ms").selectExpr("timestamp_millis(ms) AS ts", "ms")
      .createOrReplaceTempView("za_prop")
    val sizes = Seq(60000L, 3600000L, 86400000L)
    for (_ <- 1 to 8) {
      val size = sizes(rnd.nextInt(sizes.length))
      // declared offsets and zone shifts in whole seconds, both signs
      val declSec = rnd.nextLong() % (size / 1000L)
      val shiftMs = (rnd.nextLong() % 50400L) * 1000L // within ±14 h
      val sql = WindowTvf.rewrite(WindowTvf.alignToZone(
        s"SELECT ms, unix_millis(window_start) AS ws, " +
          s"unix_millis(window_end) AS we FROM " +
          s"TABLE(TUMBLE(TABLE za_prop, DESCRIPTOR(ts), " +
          s"INTERVAL '${size / 1000L}' SECOND, " +
          s"INTERVAL '$declSec' SECOND))", shiftMs))
      val eff = (((declSec * 1000L - shiftMs) % size) + size) % size
      spark.sql(sql).collect().foreach { r =>
        val (ms, ws, we) = (r.getLong(0), r.getLong(1), r.getLong(2))
        assert(we - ws == size, s"size $size declared $declSec shift $shiftMs")
        assert(ws <= ms && ms < we, s"row $ms outside [$ws, $we)")
        assert((((ws - eff) % size) + size) % size == 0L,
          s"start $ws off the grid (size $size eff $eff)")
      }
    }
  }

  test("streaming TUMBLE under a DST region zone matches the batch wall-clock grid") {
    // spring-forward 2024-03-10 in America/New_York: the local day is
    // 23 hours (02:00→03:00 gap). Rows straddle local midnight and sit
    // at both edges of the transition day.
    val rows = Seq(
      (1710046740000L, 1L), // 2024-03-10T04:59Z = 03-09 23:59 EST
      (1710046860000L, 2L), // 2024-03-10T05:01Z = 03-10 00:01 EST
      (1710129540000L, 4L)) // 2024-03-11T03:59Z = 03-10 23:59 EDT
    val got = streamingMatchesBatch("America/New_York",
      src => s"SELECT window_start, window_end, COUNT(*) AS n, " +
        s"SUM(v) AS s FROM TABLE(TUMBLE(TABLE $src, DESCRIPTOR(ts), " +
        s"INTERVAL '1' DAY)) GROUP BY window_start, window_end",
      rows, advanceMs = 1710500000000L)
    // the two closed local days as instants: 03-09 = [05:00Z, 05:00Z+24h),
    // 03-10 = [05:00Z, 04:00Z+1d) — 23 hours across the transition
    assert(got === Set(
      (1709960400000L, 1710046800000L, 1L, 1L),
      (1710046800000L, 1710129600000L, 2L, 6L)))
    assert(got.exists(w => w._2 - w._1 == 82800000L))
  }

  test("streaming HOP and CUMULATE under a DST region zone match batch") {
    // fall-back 2024-11-03 in America/New_York (25-hour local day):
    // rows on both sides of the repeated 01:00-02:00 local hour
    val rows = Seq(
      (1730610000000L, 1L), // 2024-11-03T05:00Z = 01:00 EDT (1st pass)
      (1730613600000L, 2L), // 2024-11-03T06:00Z = 01:00 EST (2nd pass)
      (1730656800000L, 4L)) // 2024-11-03T18:00Z = 13:00 EST
    streamingMatchesBatch("America/New_York",
      src => s"SELECT window_start, window_end, COUNT(*) AS n, " +
        s"SUM(v) AS s FROM TABLE(HOP(TABLE $src, DESCRIPTOR(ts), " +
        s"INTERVAL '12' HOUR, INTERVAL '1' DAY)) " +
        s"GROUP BY window_start, window_end",
      rows, advanceMs = 1731000000000L)
    streamingMatchesBatch("America/New_York",
      src => s"SELECT window_start, window_end, COUNT(*) AS n, " +
        s"SUM(v) AS s FROM TABLE(CUMULATE(TABLE $src, DESCRIPTOR(ts), " +
        s"INTERVAL '12' HOUR, INTERVAL '1' DAY)) " +
        s"GROUP BY window_start, window_end",
      rows, advanceMs = 1731000000000L)
  }

  test("streaming GROUPING SETS and window join under a region zone") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    // GROUPING SETS thread the zone through per-set expansion — each
    // branch streams on the wall-clock tracker
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(java.sql.Timestamp, String, Long)]
    input.toDF().toDF("ts", "k", "v").createOrReplaceTempView("za_gs_src")
    val wm: String => Option[(String, String)] =
      t => if (t.equalsIgnoreCase("za_gs_src")) Some(("ts", "5 seconds"))
      else None
    val rewritten = WindowTvf.rewriteStreaming(
      "SELECT window_start, window_end, k, COUNT(*) AS n FROM " +
        "TABLE(TUMBLE(TABLE za_gs_src, DESCRIPTOR(ts), INTERVAL '1' DAY)) " +
        "GROUP BY GROUPING SETS ((window_start, window_end, k), " +
        "(window_start, window_end))",
      spark, wm, Some("America/New_York"))
    val q = spark.sql(rewritten).writeStream.format("memory")
      .queryName("za_gs_out").outputMode("append").start()
    try {
      input.addData(
        (new java.sql.Timestamp(1710046740000L), "a", 1L),
        (new java.sql.Timestamp(1710046860000L), "b", 2L))
      q.processAllAvailable()
      input.addData((new java.sql.Timestamp(1710500000000L), "z", 0L))
      q.processAllAvailable()
      val got = spark.table("za_gs_out")
        .select(org.apache.spark.sql.functions.unix_millis($"window_start"),
          $"k", $"n")
        .as[(Long, Option[String], Long)].collect().toSet
      // per-key sets for both local days plus the key-rollup rows
      assert(got === Set(
        (1709960400000L, Some("a"), 1L), (1710046800000L, Some("b"), 1L),
        (1709960400000L, None, 1L), (1710046800000L, None, 1L)))
    } finally q.stop()
  }

  test("streaming CUMULATE window JOIN under a DST region zone matches batch") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    // r15 (previously a named rejection): the span grid is the NY
    // wall-clock day — the two 03-10-day rows sit 22 h apart in
    // instants (a 23-hour local day) and must share a span, while the
    // 03-09 23:59 EST row is 2 minutes from one of them but in the
    // previous local day; joined pairs fan to the growing windows
    // covering BOTH rows
    val l = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(java.sql.Timestamp, String, Long)]
    val r = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(java.sql.Timestamp, String, Long)]
    l.toDF().toDF("lts", "lk", "lv").createOrReplaceTempView("za_cj_l")
    r.toDF().toDF("rts", "rk", "rv").createOrReplaceTempView("za_cj_r")
    val wmj: String => Option[(String, String)] = {
      case t if t.equalsIgnoreCase("za_cj_l") => Some(("lts", "5 seconds"))
      case t if t.equalsIgnoreCase("za_cj_r") => Some(("rts", "5 seconds"))
      case _ => None
    }
    def joinSql(lt: String, rt: String) =
      s"""SELECT L.lk, L.lv, R.rv, L.window_start, L.window_end
         |FROM TABLE(CUMULATE(TABLE $lt, DESCRIPTOR(lts),
         |  INTERVAL '12' HOUR, INTERVAL '1' DAY)) L
         |JOIN TABLE(CUMULATE(TABLE $rt, DESCRIPTOR(rts),
         |  INTERVAL '12' HOUR, INTERVAL '1' DAY)) R
         |ON L.window_start = R.window_start
         |  AND L.window_end = R.window_end AND L.lk = R.rk""".stripMargin
    val rewritten = WindowTvf.rewriteStreaming(
      joinSql("za_cj_l", "za_cj_r"), spark, wmj, Some("America/New_York"))
    val q = spark.sql(rewritten).writeStream.format("memory")
      .queryName("za_cj_out").outputMode("append").start()
    try {
      val rows = Seq(
        (new java.sql.Timestamp(1710046740000L), "a", 1L), // 03-09 23:59 EST
        (new java.sql.Timestamp(1710046860000L), "a", 2L), // 03-10 00:01 EST
        (new java.sql.Timestamp(1710126000000L), "a", 4L)) // 03-10 23:00 EDT
      l.addData(rows: _*)
      r.addData(rows: _*)
      q.processAllAvailable()
      l.addData((new java.sql.Timestamp(1710500000000L), "z", 0L))
      r.addData((new java.sql.Timestamp(1710500000000L), "z", 0L))
      q.processAllAvailable()
      val got = spark.table("za_cj_out")
        .select($"lk", $"lv", $"rv",
          org.apache.spark.sql.functions.unix_millis($"window_start"),
          org.apache.spark.sql.functions.unix_millis($"window_end"))
        .as[(String, Long, Long, Long, Long)].collect()
        .filter(_._1 == "a").toSet
      // 03-09 span: (1,1) in the [noon, midnight] growing windows of
      // a 23:59 row → the full-day window only; 03-10 (23 instant
      // hours): (2,2) pairs in both growing windows (noon end =
      // 16:00Z under EDT), every pair touching the 23:00 row only in
      // the full-day window ending 04:00Z 03-11
      val day9End = 1710046800000L // 03-10 00:00 NY as instant
      val noon10 = 1710086400000L // 03-10 12:00 EDT
      val day10End = 1710129600000L // 03-11 00:00 NY (23-hour day)
      val span9 = 1709960400000L
      val span10 = 1710046800000L
      assert(got === Set(
        ("a", 1L, 1L, span9, day9End),
        ("a", 2L, 2L, span10, noon10), ("a", 2L, 2L, span10, day10End),
        ("a", 2L, 4L, span10, day10End), ("a", 4L, 2L, span10, day10End),
        ("a", 4L, 4L, span10, day10End)))
      // batch twin through the wall-clock TVF rewrite
      rows.toDF("lts", "lk", "lv").createOrReplaceTempView("za_cjb_l")
      rows.toDF("rts", "rk", "rv").createOrReplaceTempView("za_cjb_r")
      val bgot = spark.sql(WindowTvf.rewrite(
        joinSql("za_cjb_l", "za_cjb_r"), Some("America/New_York")))
        .select($"lk", $"lv", $"rv",
          org.apache.spark.sql.functions.unix_millis($"window_start"),
          org.apache.spark.sql.functions.unix_millis($"window_end"))
        .as[(String, Long, Long, Long, Long)].collect().toSet
      assert(bgot === got)
    } finally q.stop()
  }

  test("streaming window JOIN under a DST region zone matches batch") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    // rows pair iff they share the NY wall-clock day: the two
    // 03-10-day rows sit 22 h apart in instants (a 23-hour local day),
    // while the 03-09 23:59 EST row is 2 minutes from one of them but
    // in the previous local day — instant-grid windows would pair the
    // wrong rows
    val l = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(java.sql.Timestamp, String, Long)]
    val r = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(java.sql.Timestamp, String, Long)]
    l.toDF().toDF("lts", "lk", "lv").createOrReplaceTempView("za_wj_l")
    r.toDF().toDF("rts", "rk", "rv").createOrReplaceTempView("za_wj_r")
    val wmj: String => Option[(String, String)] = {
      case t if t.equalsIgnoreCase("za_wj_l") => Some(("lts", "5 seconds"))
      case t if t.equalsIgnoreCase("za_wj_r") => Some(("rts", "5 seconds"))
      case _ => None
    }
    def joinSql(lt: String, rt: String) =
      s"""SELECT L.lk, L.lv, R.rv, L.window_start, L.window_end
         |FROM TABLE(TUMBLE(TABLE $lt, DESCRIPTOR(lts), INTERVAL '1' DAY)) L
         |JOIN TABLE(TUMBLE(TABLE $rt, DESCRIPTOR(rts), INTERVAL '1' DAY)) R
         |ON L.window_start = R.window_start
         |  AND L.window_end = R.window_end AND L.lk = R.rk""".stripMargin
    val rewritten = WindowTvf.rewriteStreaming(
      joinSql("za_wj_l", "za_wj_r"), spark, wmj, Some("America/New_York"))
    val q = spark.sql(rewritten).writeStream.format("memory")
      .queryName("za_wj_out").outputMode("append").start()
    try {
      val rows = Seq(
        (new java.sql.Timestamp(1710046740000L), "a", 1L), // 03-09 23:59 EST
        (new java.sql.Timestamp(1710046860000L), "a", 2L), // 03-10 00:01 EST
        (new java.sql.Timestamp(1710126000000L), "a", 4L)) // 03-10 23:00 EDT
      l.addData(rows: _*)
      r.addData(rows: _*)
      q.processAllAvailable()
      l.addData((new java.sql.Timestamp(1710500000000L), "z", 0L))
      r.addData((new java.sql.Timestamp(1710500000000L), "z", 0L))
      q.processAllAvailable()
      val got = spark.table("za_wj_out")
        .select($"lk", $"lv", $"rv",
          org.apache.spark.sql.functions.unix_millis($"window_start"))
        .as[(String, Long, Long, Long)].collect()
        .filter(_._1 == "a").toSet
      // day 03-09 pairs {1}×{1}; the 23-hour day 03-10 pairs {2,4}²
      assert(got === Set(
        ("a", 1L, 1L, 1709960400000L),
        ("a", 2L, 2L, 1710046800000L), ("a", 2L, 4L, 1710046800000L),
        ("a", 4L, 2L, 1710046800000L), ("a", 4L, 4L, 1710046800000L)))
      // batch twin through the wall-clock TVF rewrite
      rows.toDF("lts", "lk", "lv").createOrReplaceTempView("za_wjb_l")
      rows.toDF("rts", "rk", "rv").createOrReplaceTempView("za_wjb_r")
      val bgot = spark.sql(WindowTvf.rewrite(
        joinSql("za_wjb_l", "za_wjb_r"), Some("America/New_York")))
        .select($"lk", $"lv", $"rv",
          org.apache.spark.sql.functions.unix_millis($"window_start"))
        .as[(String, Long, Long, Long)].collect().toSet
      assert(bgot === got)
    } finally q.stop()
  }

  test("e2e: streaming TUMBLE under a DST region zone through the CLI") {
    val before = spark.conf.get("spark.sql.session.timeZone")
    val dir = Files.createTempDirectory("graft-za-stream")
    val script = Files.createTempFile("graft-za3", ".sql")
    try {
      // 100 sequential hourly rows starting 2024-03-09 12:00 New York
      // wall time — they cross the 2024-03-10 spring-forward, so the
      // closed local-day windows must include one 23-hour window
      Files.writeString(script,
        s"""SET execution.runtime-mode = streaming;
           |SET table.local-time-zone = America/New_York;
           |SET execution.checkpointing.enabled = true;
           |SET state.checkpoints.dir = file://${dir.toString}/cp;
           |create table src (
           |  id bigint,
           |  row_time as timestamp '2024-03-09 12:00:00' +
           |    make_interval(0, 0, 0, 0, cast(id as int), 0, 0),
           |  watermark for row_time as row_time - interval '1' second
           |) with (
           |  'connector' = 'datagen',
           |  'rows-per-second' = '100',
           |  'fields.id.kind' = 'sequence',
           |  'fields.id.start' = '0',
           |  'fields.id.end' = '99'
           |);
           |create table snk (
           |  window_start timestamp, window_end timestamp, n bigint
           |) with (
           |  'connector' = 'filesystem',
           |  'path' = 'file://${dir.toString}/out',
           |  'format' = 'parquet'
           |);
           |insert into snk
           |SELECT window_start, window_end, COUNT(*) AS n
           |FROM TABLE(TUMBLE(TABLE src, DESCRIPTOR(row_time),
           |  INTERVAL '1' DAY))
           |GROUP BY window_start, window_end;
           |""".stripMargin)
      new SqlSubmitAction(script.toString, Map.empty, Some(spark),
        durationSec = 30L).run()
      import spark.implicits._
      val got = spark.read.parquet(s"$dir/out")
        .select(
          org.apache.spark.sql.functions.unix_millis($"window_start"),
          org.apache.spark.sql.functions.unix_millis($"window_end"), $"n")
        .as[(Long, Long, Long)].collect().toSeq.sortBy(_._1)
      // watermark reaches 03-13 14:59:59 NY: the four local days
      // 03-09..03-12 close (03-13 stays pending behind the watermark)
      assert(got.size >= 4, got.mkString(","))
      // the transition day 2024-03-10 spans 23 hours of instants
      // [05:00Z, 04:00Z+1d) and holds 23 hourly rows
      assert(got.contains((1710046800000L, 1710129600000L, 23L)),
        got.mkString(","))
      // its neighbors are full 24-hour windows
      assert(got.forall(w => w._2 - w._1 == 86400000L ||
        (w._1, w._2) == (1710046800000L, 1710129600000L)), got.mkString(","))
    } finally {
      spark.conf.set("spark.sql.session.timeZone", before)
      Files.deleteIfExists(script): Unit
    }
  }

  test("e2e: fixed shifted zone runs grid TVFs and LEGACY windows locally aligned") {
    val before = spark.conf.get("spark.sql.session.timeZone")
    val script = Files.createTempFile("graft-za", ".sql")
    val dir = Files.createTempDirectory("graft-za-legacy")
    try {
      import spark.implicits._
      // 15:59Z and 16:01Z straddle GMT+08:00's local midnight (16:00Z)
      Seq(1704124740000L, 1704124860000L)
        .toDF("ms").selectExpr("timestamp_millis(ms) AS ts", "ms")
        .createOrReplaceTempView("za_e2e")
      Files.writeString(script,
        """SET execution.runtime-mode = batch;
          |SET table.local-time-zone = GMT+08:00;
          |SELECT window_start, COUNT(*) AS n
          |FROM TABLE(TUMBLE(TABLE za_e2e, DESCRIPTOR(ts), INTERVAL '1' DAY))
          |GROUP BY window_start;
          |""".stripMargin)
      new SqlSubmitAction(script.toString, Map.empty, Some(spark)).run()
      // a legacy group window has no OFFSET argument of its own: it
      // escalates to the TVF form first (r14) and inherits the same
      // local alignment — the two rows split at local midnight
      Files.writeString(script,
        s"""SET execution.runtime-mode = batch;
           |SET table.local-time-zone = GMT+08:00;
           |create table za_leg_snk (ws timestamp, n bigint) with (
           |  'connector' = 'filesystem',
           |  'path' = 'file://${dir.toString}/out',
           |  'format' = 'parquet'
           |);
           |insert into za_leg_snk
           |SELECT TUMBLE_START(ts, INTERVAL '1' DAY) AS ws, COUNT(*) AS n
           |FROM za_e2e GROUP BY TUMBLE(ts, INTERVAL '1' DAY);
           |""".stripMargin)
      new SqlSubmitAction(script.toString, Map.empty, Some(spark)).run()
      val got = spark.read.parquet(s"$dir/out")
        .select(org.apache.spark.sql.functions.unix_millis($"ws"), $"n")
        .as[(Long, Long)].collect().toSet
      // local days [2023-12-31 16:00Z, +24h) and [2024-01-01 16:00Z, +24h)
      assert(got === Set((1704038400000L, 1L), (1704124800000L, 1L)))
    } finally {
      spark.conf.set("spark.sql.session.timeZone", before)
      Files.deleteIfExists(script): Unit
    }
  }

  test("legacy grid escalation composes with alignToZone (q61/q63 shapes)") {
    // legacy HOP + accessors escalate to the TVF text, which the
    // fixed-offset alignment then shifts like any user-written TVF
    val esc = WindowTvf.escalateLegacyGridsForZone(
      "SELECT k, HOP_START(ts, INTERVAL '5' MINUTE, INTERVAL '10' MINUTE) " +
        "AS ws, COUNT(*) AS n FROM t " +
        "GROUP BY k, HOP(ts, INTERVAL '5' MINUTE, INTERVAL '10' MINUTE)")
    assert(esc.contains("TABLE(HOP(TABLE t, DESCRIPTOR(ts), " +
      "INTERVAL '5' MINUTE, INTERVAL '10' MINUTE))"), esc)
    assert(esc.contains("window_start") && !esc.toUpperCase.contains("HOP_START"), esc)
    val aligned = WindowTvf.alignToZone(esc, 8L * 3600000L)
    assert(aligned.contains("INTERVAL '-28800000' MILLISECOND"), aligned)
    // multi-table FROM keeps the single-table contract error
    val e = intercept[IllegalArgumentException](
      WindowTvf.escalateLegacyGridsForZone(
        "SELECT COUNT(*) AS n FROM a JOIN b ON a.k = b.k " +
          "GROUP BY TUMBLE(a.ts, INTERVAL '1' HOUR)"))
    assert(e.getMessage.contains("single-table"), e.getMessage)
    // statements without a legacy grid window pass through untouched
    val same = "SELECT window_start FROM TABLE(TUMBLE(TABLE t, " +
      "DESCRIPTOR(ts), INTERVAL '1' HOUR)) GROUP BY window_start"
    assert(WindowTvf.escalateLegacyGridsForZone(same) === same)
  }

  test("e2e: grid-free forms run under any shifted zone") {
    val before = spark.conf.get("spark.sql.session.timeZone")
    val script = Files.createTempFile("graft-za2", ".sql")
    try {
      import spark.implicits._
      Seq((1L, 1L, "view"), (1L, 2L, "click"), (1L, 3L, "purchase"))
        .toDF("k", "o", "t").createOrReplaceTempView("za_mr")
      Seq((1L, new java.sql.Timestamp(0L)), (1L, new java.sql.Timestamp(400000L)))
        .toDF("k", "ts").createOrReplaceTempView("za_sess")
      // MATCH_RECOGNIZE under a fixed shifted zone, SESSION TVF under a
      // DST region zone: both are instant-difference arithmetic, which
      // no session zone can move
      Files.writeString(script,
        """SET execution.runtime-mode = batch;
          |SET table.local-time-zone = GMT+08:00;
          |SELECT * FROM za_mr MATCH_RECOGNIZE (
          |  PARTITION BY k ORDER BY o
          |  MEASURES FIRST(V.o) AS s, LAST(P.o) AS e
          |  ONE ROW PER MATCH AFTER MATCH SKIP PAST LAST ROW
          |  PATTERN (V C P)
          |  DEFINE V AS t = 'view', C AS t = 'click', P AS t = 'purchase');
          |SET table.local-time-zone = Asia/Shanghai;
          |SELECT window_start, COUNT(*) AS n
          |FROM TABLE(SESSION(TABLE za_sess PARTITION BY k,
          |  DESCRIPTOR(ts), INTERVAL '5' MINUTE))
          |GROUP BY window_start;
          |""".stripMargin)
      new SqlSubmitAction(script.toString, Map.empty, Some(spark)).run()
    } finally {
      spark.conf.set("spark.sql.session.timeZone", before)
      Files.deleteIfExists(script): Unit
    }
  }
}
