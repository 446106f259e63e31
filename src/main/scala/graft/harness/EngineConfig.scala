package graft.harness

import org.apache.spark.sql.SparkSession
import scala.collection.mutable

/** SET-statement handling + Flink-key → Spark translation table
  * (SURVEY.md §4 config table; reference `SQLSubmitAction.java:85-99`).
  *
  * Mid-script SET must affect subsequent statements; some Spark settings
  * are only consumable at query-compile time (trigger interval, checkpoint
  * location, job name), so the harness keeps its own engine-key snapshot
  * that INSERT compilation reads — mirroring when Flink reads TableConfig.
  */
final class EngineConfig(spark: SparkSession) {
  /** Raw keys as SET by the script, in script order. */
  val raw: mutable.LinkedHashMap[String, String] = mutable.LinkedHashMap.empty

  /** The max-policy caveat is printed once per session, not per SET —
    * a script SETting the key in a loop must not spam stderr. */
  private var warnedMaxPolicy = false

  def set(key: String, value: String): Unit = {
    // validate FIRST: a rejected SET (unparseable duration,
    // unresolvable zone) must leave NO trace in the compile-time
    // snapshot, or a later bare RESET / isShiftedTimeline would act
    // as if the key had been applied (r19 advice)
    key match {
      case "parallelism.default" | "table.exec.resource.default-parallelism" =>
        spark.conf.set("spark.sql.shuffle.partitions", value)
        spark.conf.set("spark.default.parallelism", value)
      case "table.local-time-zone" =>
        // Session-zone translation (r13): any RESOLVABLE zone maps onto
        // spark.sql.session.timeZone, which carries Flink's
        // local-time-zone semantics for TIMESTAMP_LTZ rendering,
        // string↔timestamp casts, and the LTZ time functions
        // (CURRENT_TIMESTAMP, TO_TIMESTAMP_LTZ display). The WINDOW
        // timeline stays UTC-pinned — WindowTvf.epochMs, the streaming
        // trackers, MATCH_RECOGNIZE, and temporal joins all run epoch
        // arithmetic that assumes a UTC session — so time-attribute
        // statements are rejected by name while a SHIFTED zone is
        // active (SqlSubmitAction.rewriteFlinkDialect); the window
        // OFFSET argument is the supported local-alignment path.
        // Fixed zero-offset spellings ('UTC', 'Etc/GMT+0', '+00:00',
        // 'Z', ...) stay exact no-ops on a UTC session.
        val zone = EngineConfig.resolveZone(value).getOrElse(
          throw new IllegalArgumentException(
            s"table.local-time-zone = $value is not a resolvable time " +
              "zone (java.time.ZoneId)"))
        spark.conf.set("spark.sql.session.timeZone",
          if (EngineConfig.isUtcTimeline(value)) "UTC" else zone.getId)
      case "table.exec.mini-batch.allow-latency" =>
        // drives the micro-batch trigger at INSERT-compile time
        ()
      case "table.exec.source.idle-timeout" =>
        // Flink's idle-source watermark exclusion: a source quiet for
        // the timeout stops holding back the min-across-inputs
        // watermark. Spark's per-source watermark is already the
        // GLOBAL max event time minus delay — an idle PARTITION never
        // stalls it, so Flink's per-partition idleness concern has no
        // Spark counterpart. What CAN stall is a multi-watermark plan
        // (the unioned temporal-join inputs): Spark's global watermark
        // is the MIN across watermark nodes by default, so one idle
        // input freezes maturity exactly like an idle Flink source.
        // Spark's native exclusion for that case is
        // multipleWatermarkPolicy=max — the documented mechanism for
        // idle/slow inputs — so a positive timeout maps onto it.
        // Caveat vs Flink (documented, SURVEY §2): Flink excludes an
        // input only AFTER the timeout elapses; Spark's max policy
        // excludes the slower input continuously, so an ACTIVE but
        // lagging input's rows can be treated as late where Flink
        // would have held the watermark. Flink's 0 (its default)
        // disables idleness → min policy restored.
        val ms = EngineConfig.parseDurationMs(value).getOrElse(
          throw new IllegalArgumentException(
            s"table.exec.source.idle-timeout = $value is not a " +
              "duration (expected e.g. '30 s', '500 ms', '1 min')"))
        if (ms > 0L && !warnedMaxPolicy) {
          // surface the documented divergence at runtime, not just in
          // the docs: script authors see it where the SET runs
          System.err.println(
            "table.exec.source.idle-timeout: mapping onto " +
              "spark.sql.streaming.multipleWatermarkPolicy=max - Spark " +
              "excludes the slower input of a multi-watermark plan " +
              "CONTINUOUSLY, where Flink excludes it only after the " +
              "timeout elapses; an active-but-lagging input's rows may " +
              "be treated as late")
          warnedMaxPolicy = true
        }
        spark.conf.set("spark.sql.streaming.multipleWatermarkPolicy",
          if (ms > 0L) "max" else "min")
      case "pipeline.name" =>
        spark.sparkContext.setJobDescription(value)
      case "graft.streaming.intermediate-retention" =>
        // validate-before-record (r19 advice pattern): the auto-split
        // retention sweeper consumes this at INSERT time; an
        // unparseable duration must fail HERE, at the SET, not surface
        // later as a silently-never-sweeping intermediate
        EngineConfig.parseDurationMs(value).getOrElse(
          throw new IllegalArgumentException(
            s"graft.streaming.intermediate-retention = $value is not " +
              "a duration (expected e.g. '0 s', '10 min', '1 h')")): Unit
        spark.conf.set(key, value)
      case k if k.startsWith("spark.") =>
        spark.conf.set(k, value)
      case k if k.startsWith("graft.") =>
        // engine extension knobs (e.g. graft.streaming.approx-distinct)
        // are read from SQLConf by injected Catalyst rules — they must
        // reach the session conf, not just the harness snapshot
        spark.conf.set(k, value)
      case _ =>
        // engine-level key consumed at compile time (runtime-mode,
        // checkpointing, mini-batch, dynamic-table-options) — keep in `raw`
        ()
    }
    raw(key) = value
  }

  /** Flink's `RESET [key]`: drop the key from the engine snapshot (all
    * keys for the bare form) so compile-time consumers see defaults
    * again — the Spark-side conf reset rides the native statement.
    */
  def reset(key: Option[String]): Unit = key match {
    case Some(k) =>
      val kk = k.trim
      // dropping the zone key reverts the session timeline to UTC —
      // compile-time consumers AND the session conf must agree
      if (kk.equalsIgnoreCase("table.local-time-zone"))
        spark.conf.set("spark.sql.session.timeZone", "UTC")
      // dropping idle-timeout restores Flink's no-idleness default:
      // the min-across-inputs watermark policy
      if (kk.equalsIgnoreCase("table.exec.source.idle-timeout"))
        spark.conf.set("spark.sql.streaming.multipleWatermarkPolicy", "min")
      raw.remove(kk): Unit
    case None =>
      if (raw.contains("table.local-time-zone"))
        spark.conf.set("spark.sql.session.timeZone", "UTC")
      if (raw.contains("table.exec.source.idle-timeout"))
        spark.conf.set("spark.sql.streaming.multipleWatermarkPolicy", "min")
      raw.clear()
  }

  /** A genuinely shifted (non-UTC-timeline) session zone is active —
    * the state that gates time-attribute statements.
    */
  def isShiftedTimeline: Boolean =
    raw.get("table.local-time-zone")
      .exists(v => !EngineConfig.isUtcTimeline(v))

  /** The constant instant-shift of the active session zone, when the
    * zone is SHIFTED and FIXED-offset (`GMT+08:00`, `+05:30`,
    * `Etc/GMT-8`, ...): Flink aligns grid windows (TUMBLE/HOP/CUMULATE)
    * to the LOCAL timeline, and under a fixed offset that alignment is
    * exactly one extra window offset of `-shift` composed into each
    * call ([[WindowTvf.alignToZone]]). `None` for UTC-timeline zones
    * (no alignment needed) and for DST region zones (the offset varies
    * over the data's time range — no single grid shift represents it;
    * those run wall-clock grids via [[dstGridZone]] instead).
    */
  def zoneGridShiftMillis: Option[Long] =
    raw.get("table.local-time-zone")
      .filter(v => !EngineConfig.isUtcTimeline(v))
      .flatMap(EngineConfig.fixedOffsetMillis)

  /** The resolved zone id when the active session zone is a DST
    * REGION zone (shifted, variable offset): grid windows run
    * wall-clock arithmetic in this zone — batch via
    * [[WindowTvf.rewrite]]'s localZone, streaming via the
    * pinned-window tracker path ([[WindowTvf.rewriteStreaming]]'s
    * localZone, r14); `None` for UTC-timeline and fixed-offset zones
    * (those compose through the offset argument instead).
    */
  def dstGridZone: Option[String] =
    raw.get("table.local-time-zone")
      .filter(v => !EngineConfig.isUtcTimeline(v))
      .filter(v => EngineConfig.fixedOffsetMillis(v).isEmpty)
      .flatMap(EngineConfig.resolveZone).map(_.getId)

  def localTimeZone: Option[String] = raw.get("table.local-time-zone")

  /** Parse + apply a full `SET k = v` statement
    * (`SQLSubmitAction.java:85-99`): strip the SET keyword, split on the
    * first `=`, trim both sides.
    */
  def setOperation(sql: String): Unit = {
    val kvString = sql.trim.substring("SET".length).trim
    val kv = kvString.split("=", 2)
    if (kv.length != 2)
      throw new IllegalArgumentException(
        s"Invalid key-value string '$kvString'. Please use format 'key=value'.")
    set(kv(0).trim, kv(1).trim)
  }

  def isStreaming: Boolean =
    raw.get("execution.runtime-mode").forall(_.equalsIgnoreCase("streaming"))

  def pipelineName: Option[String] = raw.get("pipeline.name")

  def checkpointingEnabled: Boolean =
    raw.get("execution.checkpointing.enabled").exists(_.toBoolean)

  /** Durable checkpoint base (Flink's `state.checkpoints.dir` /
    * `execution.checkpointing.dir`): queries checkpoint under
    * `<base>/<pipeline>-<sink>` and recover across restarts. Unset →
    * a fresh temp directory per run (enabled-but-undirected parity).
    */
  def checkpointDir: Option[String] =
    raw.get("state.checkpoints.dir")
      .orElse(raw.get("execution.checkpointing.dir"))

  /** `5s` / `3 s` / `500ms` → Spark duration string. */
  def miniBatchLatency: Option[String] =
    raw.get("table.exec.mini-batch.allow-latency").map(toDuration)

  def checkpointInterval: Option[String] =
    raw.get("execution.checkpointing.interval").map(toDuration)

  /** Flink `table.exec.state.ttl` in SECONDS. Flink's default 0 means
    * never expire — mapped to None, like any unparseable spelling.
    * Consumed by every unbounded-state operator Flink applies the key
    * to: the streaming temporal join's version state, the unbounded
    * updating top-N and keep-first/keep-last deduplication (r17,
    * [[graft.streaming.TtlTopNTracker]]), and plain unbounded GROUP BY
    * aggregation (r17, [[graft.streaming.UnboundedAggTracker]]); the
    * window/pattern trackers bound their state by the watermark by
    * design. A positive sub-second TTL rounds UP to one second (state
    * retained slightly longer than configured, never the
    * retain-forever inversion a truncation to 0 would produce). */
  def stateTtlSec: Option[Long] =
    raw.get("table.exec.state.ttl")
      .flatMap(EngineConfig.parseDurationMs)
      .map(ms => (ms + 999L) / 1000L)
      .filter(_ > 0L)

  private def toDuration(v: String): String = {
    val re = raw"(?i)^\s*(\d+)\s*(ms|s|min|m|h)?\s*$$".r
    v match {
      case re(n, unit) =>
        Option(unit).map(_.toLowerCase) match {
          case Some("ms")              => s"$n milliseconds"
          case Some("s")               => s"$n seconds"
          case Some("min") | Some("m") => s"$n minutes"
          case Some("h")               => s"$n hours"
          // Flink parses unit-less durations as milliseconds
          case None                    => s"$n milliseconds"
          case Some(other)             => s"$n $other"
        }
      case _ => v
    }
  }
}

object EngineConfig {
  /** Flink duration spellings (`30 s`, `500ms`, `1 min`, bare millis)
    * → milliseconds; None for anything unparseable. Shared by
    * `table.exec.state.ttl` and `table.exec.source.idle-timeout`. */
  def parseDurationMs(v: String): Option[Long] = {
    val re = raw"(?i)^\s*(\d+)\s*(ms|s|sec|min|m|h|d)?\s*$$".r
    v match {
      case re(n, unit) =>
        val mult = Option(unit).map(_.toLowerCase) match {
          case Some("ms") | None => 1L
          case Some("s") | Some("sec") => 1000L
          case Some("min") | Some("m") => 60000L
          case Some("h") => 3600000L
          case Some("d") => 86400000L
          case _ => 1L
        }
        // overflow-safe: a value that won't fit a Long in millis is
        // unparseable (None), never a raw NumberFormatException or a
        // silently negative product — callers map None to a named
        // error or the retain-forever default
        n.toLongOption.filter(x => x <= Long.MaxValue / mult)
          .map(_ * mult)
      case _ => None
    }
  }

  /** True iff the zone spelling resolves to a FIXED zero-offset zone —
    * i.e. it keeps the UTC timeline exactly ('UTC', 'Z', 'Etc/GMT+0',
    * '+00:00', '+0000', 'GMT', ...). Region zones with DST history
    * (even ones currently at +0) and any shifted offset return false.
    * Resolution is case-tolerant for the offset/alias spellings Flink
    * scripts carry ('utc', 'z', 'etc/utc'); region-zone IDs are
    * otherwise case-sensitive per java.time.
    */
  private def zoneCandidates(value: String): Seq[String] = {
    val s = value.trim
    Seq(
      s,
      s.toUpperCase(java.util.Locale.ROOT),
      // lowercased Etc/… region ids ('etc/utc', 'etc/gmt+0')
      if (s.length >= 4 && s.substring(0, 4).equalsIgnoreCase("etc/"))
        "Etc/" + s.substring(4).toUpperCase(java.util.Locale.ROOT)
      else s).distinct
  }

  /** First ZoneId a tolerant spelling of `value` resolves to. */
  def resolveZone(value: String): Option[java.time.ZoneId] =
    zoneCandidates(value).flatMap { c =>
      try Some(java.time.ZoneId.of(c, java.time.ZoneId.SHORT_IDS))
      catch { case _: java.time.DateTimeException => None }
    }.headOption

  /** The zone's constant offset from UTC in milliseconds, when its
    * rules are FIXED (no DST transitions ever — `ZoneRules
    * .isFixedOffset`); `None` for region zones with a transition
    * history and for unresolvable spellings. `ZoneOffset
    * .getTotalSeconds` is whole seconds by construction, so the
    * returned shift is always millisecond-exact.
    */
  def fixedOffsetMillis(value: String): Option[Long] =
    resolveZone(value).flatMap { z =>
      val rules = z.getRules
      if (rules.isFixedOffset)
        Some(rules.getOffset(java.time.Instant.EPOCH).getTotalSeconds * 1000L)
      else None
    }

  def isUtcTimeline(value: String): Boolean =
    zoneCandidates(value).exists { c =>
      try {
        val rules = java.time.ZoneId.of(c, java.time.ZoneId.SHORT_IDS).getRules
        rules.isFixedOffset &&
          rules.getOffset(java.time.Instant.EPOCH).getTotalSeconds == 0
      } catch {
        case _: java.time.DateTimeException => false
      }
    }
}
