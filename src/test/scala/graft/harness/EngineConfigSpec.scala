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

  test("table.local-time-zone keeps the UTC timeline; parallelism key maps") {
    val spark = graft.SparkFixture.spark
    val before = spark.conf.get("spark.sql.session.timeZone")
    try {
      val c = new EngineConfig(spark)
      // window arithmetic is pinned to the UTC session (the
      // window-offset argument is the supported alignment path):
      // UTC spellings are no-ops, anything else fails loudly rather
      // than running with silently shifted window boundaries
      c.setOperation("SET table.local-time-zone = UTC")
      c.setOperation("SET table.local-time-zone = Etc/UTC")
      assert(spark.conf.get("spark.sql.session.timeZone") == before)
      assert(c.raw("table.local-time-zone") == "Etc/UTC")
      // acceptance goes through ZoneId, not a spelling set: any FIXED
      // zero-offset zone keeps the UTC timeline
      Seq("Etc/GMT+0", "etc/gmt-0", "UTC+00:00", "+00:00", "+0000",
          "GMT", "gmt", "Z", "z").foreach { z =>
        c.setOperation(s"SET table.local-time-zone = $z")
      }
      assert(spark.conf.get("spark.sql.session.timeZone") == before)
      val e = intercept[IllegalArgumentException](
        c.setOperation("SET table.local-time-zone = Asia/Shanghai"))
      assert(e.getMessage.contains("window-offset"))
      // genuinely shifted offsets and DST-bearing region zones fail
      // even when their CURRENT offset is zero (London in winter)
      Seq("+01:00", "Etc/GMT-8", "Europe/London", "UTC+05:30").foreach { z =>
        intercept[IllegalArgumentException](
          c.setOperation(s"SET table.local-time-zone = $z")): Unit
      }
      c.setOperation("SET table.exec.resource.default-parallelism = 7")
      assert(spark.conf.get("spark.sql.shuffle.partitions") == "7")
    } finally {
      spark.conf.set("spark.sql.session.timeZone", before)
      spark.conf.set("spark.sql.shuffle.partitions", "4")
    }
  }
}
