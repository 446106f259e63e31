package graft.harness

import graft.SparkFixture
import org.scalatest.funsuite.AnyFunSuite

/** SET-statement translation (reference `SQLSubmitAction.java:85-99` +
  * SURVEY.md §4 config table).
  */
class EngineConfigSpec extends AnyFunSuite {

  private def fresh = new EngineConfig(SparkFixture.spark)

  test("setOperation parses 'SET k = v' with first-= split and trims") {
    val c = fresh
    c.setOperation("SET pipeline.name = my-job")
    assert(c.pipelineName.contains("my-job"))
    c.setOperation("set execution.runtime-mode = batch")
    assert(!c.isStreaming)
    val e = intercept[IllegalArgumentException](c.setOperation("SET novalue"))
    assert(e.getMessage.contains("key=value"))
  }

  test("flink duration strings map to Spark trigger durations") {
    val c = fresh
    c.set("table.exec.mini-batch.allow-latency", "5s")
    assert(c.miniBatchLatency.contains("5 seconds"))
    c.set("table.exec.mini-batch.allow-latency", "500ms")
    assert(c.miniBatchLatency.contains("500 milliseconds"))
    // Flink parses unit-less durations as milliseconds
    c.set("table.exec.mini-batch.allow-latency", "5000")
    assert(c.miniBatchLatency.contains("5000 milliseconds"))
    c.set("execution.checkpointing.interval", "3 s")
    assert(c.checkpointInterval.contains("3 seconds"))
    c.set("execution.checkpointing.enabled", "true")
    assert(c.checkpointingEnabled)
  }

  test("table.exec.state.ttl parses to seconds; sub-second TTLs round " +
      "UP instead of degrading to retain-forever") {
    val c = fresh
    c.set("table.exec.state.ttl", "30 s")
    assert(c.stateTtlSec.contains(30L))
    c.set("table.exec.state.ttl", "2 min")
    assert(c.stateTtlSec.contains(120L))
    // Flink parses unit-less durations as milliseconds
    c.set("table.exec.state.ttl", "5000")
    assert(c.stateTtlSec.contains(5L))
    // a positive sub-second TTL must stay an aggressive expiry (round
    // up to 1 s), never truncate to 0 = never-expire — the inversion
    // the r16 advice flagged
    c.set("table.exec.state.ttl", "500ms")
    assert(c.stateTtlSec.contains(1L))
    c.set("table.exec.state.ttl", "1500ms")
    assert(c.stateTtlSec.contains(2L))
    // Flink's 0 means never expire — None
    c.set("table.exec.state.ttl", "0")
    assert(c.stateTtlSec.isEmpty)
    c.set("table.exec.state.ttl", "not-a-duration")
    assert(c.stateTtlSec.isEmpty)
  }

  test("table.exec.source.idle-timeout maps onto the max watermark " +
      "policy; 0 / RESET restore Flink's no-idleness min") {
    val spark = SparkFixture.spark
    val key = "spark.sql.streaming.multipleWatermarkPolicy"
    val before = spark.conf.getOption(key)
    try {
      val c = fresh
      // a positive timeout excludes idle inputs from the
      // min-across-inputs watermark — Spark's native mechanism is the
      // max policy (caveat vs Flink documented at the set() site)
      c.set("table.exec.source.idle-timeout", "30 s")
      assert(spark.conf.get(key) == "max")
      // Flink's 0 disables idleness → min policy (the default)
      c.set("table.exec.source.idle-timeout", "0")
      assert(spark.conf.get(key) == "min")
      c.set("table.exec.source.idle-timeout", "500ms")
      assert(spark.conf.get(key) == "max")
      // keyed RESET restores the no-idleness default
      c.reset(Some("table.exec.source.idle-timeout"))
      assert(spark.conf.get(key) == "min")
      // bare RESET too
      c.set("table.exec.source.idle-timeout", "1 min")
      assert(spark.conf.get(key) == "max")
      c.reset(None)
      assert(spark.conf.get(key) == "min")
      // an unparseable duration fails by name, never a silent no-op
      val e = intercept[IllegalArgumentException](
        c.set("table.exec.source.idle-timeout", "soon"))
      assert(e.getMessage.contains("table.exec.source.idle-timeout"))
      // a duration too large for Long millis is unparseable too — the
      // NAMED error, never a raw NumberFormatException (20 digits) or
      // a silently overflowed negative product (huge day count)
      for (big <- Seq("99999999999999999999", "9999999999999999 d")) {
        val e2 = intercept[IllegalArgumentException](
          c.set("table.exec.source.idle-timeout", big))
        assert(e2.getMessage.contains("table.exec.source.idle-timeout"),
          e2.getMessage)
      }
      // and the TTL route degrades to retain-forever (None), no throw
      c.set("table.exec.state.ttl", "99999999999999999999")
      assert(c.stateTtlSec.isEmpty)
    } finally before match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("a rejected SET leaves no trace in the snapshot: a later bare " +
      "RESET or isShiftedTimeline must not act on the invalid value " +
      "(r19 advice)") {
    val spark = SparkFixture.spark
    val key = "spark.sql.streaming.multipleWatermarkPolicy"
    val before = spark.conf.getOption(key)
    try {
      val c = fresh
      intercept[IllegalArgumentException](
        c.set("table.exec.source.idle-timeout", "soon"))
      assert(!c.raw.contains("table.exec.source.idle-timeout"))
      intercept[IllegalArgumentException](
        c.set("table.local-time-zone", "Not/AZone"))
      assert(!c.raw.contains("table.local-time-zone"))
      // the failed zone SET must not gate time-attribute statements
      assert(!c.isShiftedTimeline)
      // a bare RESET after the failed idle-timeout SET must NOT flip
      // the watermark policy back (it was never applied)
      spark.conf.set(key, "max")
      c.reset(None)
      assert(spark.conf.get(key) == "max")
    } finally before match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("graft.streaming.intermediate-retention validates at SET time " +
      "and leaves no trace on rejection (r20)") {
    val c = fresh
    intercept[IllegalArgumentException](
      c.set("graft.streaming.intermediate-retention", "weekly"))
    assert(!c.raw.contains("graft.streaming.intermediate-retention"))
    c.set("graft.streaming.intermediate-retention", "10 min")
    assert(c.raw("graft.streaming.intermediate-retention") == "10 min")
  }

  test("parallelism.default drives shuffle partitions") {
    val spark = SparkFixture.spark
    val before = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      val c = new EngineConfig(spark)
      c.setOperation("SET parallelism.default = 7")
      assert(spark.conf.get("spark.sql.shuffle.partitions") == "7")
    } finally spark.conf.set("spark.sql.shuffle.partitions", before)
  }

  test("runtime-mode defaults to streaming (Flink default) until set") {
    assert(fresh.isStreaming)
  }

  test("graft.* keys reach the session conf (Catalyst rules read SQLConf)") {
    val spark = SparkFixture.spark
    try {
      val c = new EngineConfig(spark)
      c.setOperation("SET graft.streaming.approx-distinct = false")
      assert(spark.conf.get("graft.streaming.approx-distinct") == "false")
      assert(c.raw("graft.streaming.approx-distinct") == "false")
    } finally spark.conf.unset("graft.streaming.approx-distinct")
  }

  test("RESET drops engine keys: keyed form one key, bare form all") {
    val spark = graft.SparkFixture.spark
    val c = new EngineConfig(spark)
    c.setOperation("SET execution.runtime-mode = batch")
    c.setOperation("SET pipeline.name = p1")
    assert(!c.isStreaming)
    c.reset(Some("execution.runtime-mode"))
    assert(c.isStreaming) // back to Flink's streaming default
    assert(c.raw.contains("pipeline.name"))
    c.reset(None)
    assert(c.raw.isEmpty)
  }

  test("table.local-time-zone maps onto the session zone; parallelism key maps") {
    val spark = graft.SparkFixture.spark
    val before = spark.conf.get("spark.sql.session.timeZone")
    try {
      val c = new EngineConfig(spark)
      // UTC-timeline spellings are exact no-ops on a UTC session;
      // acceptance goes through ZoneId, not a spelling set
      c.setOperation("SET table.local-time-zone = UTC")
      c.setOperation("SET table.local-time-zone = Etc/UTC")
      assert(spark.conf.get("spark.sql.session.timeZone") == "UTC")
      assert(c.raw("table.local-time-zone") == "Etc/UTC")
      assert(!c.isShiftedTimeline)
      Seq("Etc/GMT+0", "etc/gmt-0", "UTC+00:00", "+00:00", "+0000",
          "GMT", "gmt", "Z", "z").foreach { z =>
        c.setOperation(s"SET table.local-time-zone = $z")
      }
      assert(spark.conf.get("spark.sql.session.timeZone") == "UTC")
      // a genuinely shifted zone maps onto spark.sql.session.timeZone
      // (Flink's local-time-zone semantics for LTZ rendering, casts,
      // and time functions) and flags the shifted timeline that gates
      // time-attribute statements
      c.setOperation("SET table.local-time-zone = Asia/Shanghai")
      assert(spark.conf.get("spark.sql.session.timeZone") == "Asia/Shanghai")
      assert(c.isShiftedTimeline)
      // the epoch renders at +08:00 — the observable Flink behavior
      assert(spark.sql("SELECT CAST(timestamp_millis(0) AS STRING)")
        .head.getString(0) == "1970-01-01 08:00:00")
      // DST-bearing zones and shifted offsets are accepted the same way
      Seq("+01:00", "Etc/GMT-8", "Europe/London", "UTC+05:30").foreach { z =>
        c.setOperation(s"SET table.local-time-zone = $z")
        assert(c.isShiftedTimeline, z)
      }
      // an unresolvable zone fails by name
      val bad = intercept[IllegalArgumentException](
        c.setOperation("SET table.local-time-zone = Mars/Olympus"))
      assert(bad.getMessage.contains("resolvable"), bad.getMessage)
      // RESET of the key reverts the session timeline to UTC
      c.reset(Some("table.local-time-zone"))
      assert(spark.conf.get("spark.sql.session.timeZone") == "UTC")
      assert(!c.isShiftedTimeline)
      // setting back a zero-offset spelling from a shifted zone also
      // restores UTC
      c.setOperation("SET table.local-time-zone = Asia/Shanghai")
      c.setOperation("SET table.local-time-zone = +0000")
      assert(spark.conf.get("spark.sql.session.timeZone") == "UTC")
      c.setOperation("SET table.exec.resource.default-parallelism = 7")
      assert(spark.conf.get("spark.sql.shuffle.partitions") == "7")
    } finally {
      spark.conf.set("spark.sql.session.timeZone", before)
      spark.conf.set("spark.sql.shuffle.partitions", "4")
    }
  }

  test("a DST region zone runs batch grids wall-clock, gates streaming ones") {
    val spark = graft.SparkFixture.spark
    val before = spark.conf.get("spark.sql.session.timeZone")
    val script = java.nio.file.Files.createTempFile("graft-tz", ".sql")
    try {
      import spark.implicits._
      Seq((1L, new java.sql.Timestamp(0L))).toDF("k", "ts")
        .createOrReplaceTempView("tz_probe")
      // BATCH grid windows under a DST region zone run on the zone's
      // wall-clock timeline (r13b); LTZ rendering applies throughout
      java.nio.file.Files.writeString(script,
        """SET execution.runtime-mode = batch;
          |SET table.local-time-zone = Asia/Shanghai;
          |SELECT CAST(TO_TIMESTAMP_LTZ(0, 3) AS STRING) AS t;
          |SELECT window_start, COUNT(*) AS n
          |FROM TABLE(TUMBLE(TABLE tz_probe, DESCRIPTOR(ts), INTERVAL '1' HOUR))
          |GROUP BY window_start;
          |""".stripMargin)
      new SqlSubmitAction(script.toString, Map.empty, Some(spark)).run()
      // a STREAMING grid under a DST zone routes to the wall-clock
      // tracker path (r14) — no DST rejection; the contract it trips
      // here is the tracker's own watermark requirement, proving the
      // statement reached the zone-grid compile
      java.nio.file.Files.writeString(script,
        """SET execution.runtime-mode = streaming;
          |SET table.local-time-zone = Asia/Shanghai;
          |SELECT window_start, COUNT(*) AS n
          |FROM TABLE(TUMBLE(TABLE tz_probe, DESCRIPTOR(ts), INTERVAL '1' HOUR))
          |GROUP BY window_start;
          |""".stripMargin)
      val e = intercept[Exception](
        new SqlSubmitAction(script.toString, Map.empty, Some(spark)).run())
      val msgs = Iterator.iterate(e: Throwable)(_.getCause)
        .takeWhile(_ != null).take(8)
        .flatMap(t => Option(t.getMessage)).mkString("\n")
      assert(msgs.contains("streaming TUMBLE under zone Asia/Shanghai"), msgs)
      assert(msgs.contains("WATERMARK"), msgs)
      assert(!msgs.contains("DST transitions"), msgs)
      // the same streaming statement with the zone reverted runs... in
      // batch form here (the batch runtime path) — zone reset works
      java.nio.file.Files.writeString(script,
        """SET execution.runtime-mode = batch;
          |SET table.local-time-zone = Asia/Shanghai;
          |SET table.local-time-zone = UTC;
          |SELECT window_start, COUNT(*) AS n
          |FROM TABLE(TUMBLE(TABLE tz_probe, DESCRIPTOR(ts), INTERVAL '1' HOUR))
          |GROUP BY window_start;
          |""".stripMargin)
      new SqlSubmitAction(script.toString, Map.empty, Some(spark)).run()
    } finally spark.conf.set("spark.sql.session.timeZone", before)
  }
}
