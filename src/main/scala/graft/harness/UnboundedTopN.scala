package graft.harness

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructField

/** Flink's UNBOUNDED updating Top-N for N ≥ 2 — `SELECT ... FROM
  * (SELECT *, ROW_NUMBER() OVER (PARTITION BY keys ORDER BY m
  * DESC|ASC) AS rn FROM t) WHERE rn <= N [AND conditions]` on a stream
  * with NO window TVF. Spark rejects ranking functions on streams;
  * Flink runs this as an updating operator holding the N best rows per
  * key. The rewrite compiles the same semantics natively: an
  * update-mode aggregation through the bounded
  * [[graft.functions.TopRows]] collector (per-key state = exactly N
  * rows, Flink's own bound), a `posexplode` fanning the held rows back
  * out with their ranks, and a view the statement's outer SELECT reads
  * — each micro-batch that changes a key re-emits its current top N,
  * which an updating sink (print changelog, keyed jdbc upsert on
  * (keys, rn)) renders as Flink's retraction stream.
  *
  * Contract (violations fail by name): partition keys are plain
  * columns; one ORDER BY column, numeric or timestamp (ranked through
  * the double slot — exact for integral values under 2^53 and
  * microsecond epochs); ties break by payload text ascending; NULL
  * metrics rank as the smallest value and NaN as the greatest
  * (first under DESC), matching batch ROW_NUMBER under Spark's
  * null-first/NaN-greatest total order; non-key payload columns the
  * outer select references must round-trip the JSON state encoding
  * losslessly — natively JSON-lossless types pass through, and
  * doubles / floats / decimals / dates ride an exact string carrier
  * (Java's round-trip `Double.toString` guarantee) while timestamps
  * ride epoch micros, so every scalar type a real stream carries is
  * admitted; only nested/binary payload columns drop. `rn = 1`
  * shapes stay on the analysis-rule paths (Deduplicate / argmax),
  * which avoid the JSON carrier entirely — EXCEPT under
  * `table.exec.state.ttl` (r17), where every rank-bounded shape
  * (N ≥ 1, keep-first/keep-last dedup included) compiles onto
  * [[graft.streaming.TtlTopNTracker]] instead: the same TopRows rank
  * order on `flatMapGroupsWithState`, with a processing-time idle-key
  * TTL Spark's native aggregation state cannot express.
  */
object UnboundedTopN {

  private def fail(msg: String): Nothing =
    throw new IllegalArgumentException(msg)

  private val viewCounter = new java.util.concurrent.atomic.AtomicInteger()

  private val OuterRe =
    raw"(?is)^\s*SELECT\s+(.*?)\s+FROM\s*\(".r
  private val InnerRe = (
    raw"(?is)^\s*SELECT\s+\*\s*,\s*ROW_NUMBER\s*\(\s*\)\s+OVER\s*\(\s*" +
      raw"PARTITION\s+BY\s+(.+?)\s+ORDER\s+BY\s+([A-Za-z_]\w*)\s+(DESC|ASC)\s*\)\s+" +
      raw"AS\s+([A-Za-z_]\w*)\s+FROM\s+([A-Za-z_][\w.]*)\s*$$").r
  private val WhereRe =
    raw"(?is)^(?:AS\s+)?([A-Za-z_]\w*\s+)?WHERE\s+([A-Za-z_]\w*)\s*(<=|<|=)\s*(\d{1,9})\s*(?:\bAND\b\s+(.+?))?\s*$$".r
  private val InsertPrefixRe =
    raw"(?is)^\s*(INSERT\s+(?:INTO|OVERWRITE)\s+[\w.`]+\s*(?:\([^)]*\)\s*)?)".r

  /** The rank bound N of a `rn <op> k` filter, if the filter is a
    * top-N prefix: `<=` keeps k, `<` keeps k-1, and `=` is a top-N
    * only for `rn = 1` (Flink's deduplication shape — `rn = 2` pins a
    * single rank, not a prefix). */
  private def boundOf(op: String, k: Int): Option[Int] = op match {
    case "<"  => Some(k - 1)
    case "<=" => Some(k)
    case _    => if (k == 1) Some(1) else None
  }

  /** The unbounded updating-top-N shape: a rank-bounded ROW_NUMBER
    * subquery over a bare table with no window TVF, N ≥ `minN`. The
    * default (2) leaves N = 1 to the Deduplicate/argmax analysis-rule
    * family; under `table.exec.state.ttl` the caller passes 1 so the
    * rn = 1 deduplication shapes route onto the TTL'd tracker instead
    * (the analysis rules compile onto Spark's native state, which has
    * no TTL).
    */
  def hasShape(sql: String, minN: Int = 2): Boolean = {
    if (WindowTvf.hasWindowTvf(sql)) return false
    val body = InsertPrefixRe.findFirstMatchIn(sql)
      .map(m => sql.substring(m.end)).getOrElse(sql)
    (for {
      om <- OuterRe.findFirstMatchIn(body)
      open = om.end - 1
      end <- scala.util.Try(MatchRecognize.closeParen(body, open)).toOption
      im <- InnerRe.findFirstMatchIn(body.substring(open + 1, end - 1))
      wm <- WhereRe.findFirstMatchIn(body.substring(end).trim)
    } yield wm.group(2).equalsIgnoreCase(im.group(4)) &&
      boundOf(wm.group(3), wm.group(4).toInt).exists(_ >= minN)
    ).getOrElse(false)
  }

  def rewrite(spark: SparkSession, fullSql: String,
      stateTtlSec: Long = 0L): String = {
    val (insertPrefix, sql) = InsertPrefixRe.findFirstMatchIn(fullSql)
      .map(m => (m.group(1), fullSql.substring(m.end)))
      .getOrElse(("", fullSql))
    val om = OuterRe.findFirstMatchIn(sql).getOrElse(fail(
      "streaming top-N must be `SELECT ... FROM (SELECT *, ROW_NUMBER() " +
        "OVER (...) AS rn FROM t) WHERE rn <= N`"))
    val outSel = om.group(1)
    val open = om.end - 1
    val end = MatchRecognize.closeParen(sql, open)
    val im = InnerRe.findFirstMatchIn(sql.substring(open + 1, end - 1))
      .getOrElse(fail(
        "streaming top-N inner query must be exactly `SELECT *, " +
          "ROW_NUMBER() OVER (PARTITION BY keys ORDER BY <column> " +
          "DESC|ASC) AS rn FROM <table>`"))
    val keys = MatchRecognize.splitTopLevel(im.group(1)).map(_.trim)
    val metricCol = im.group(2)
    val asc = im.group(3).equalsIgnoreCase("ASC")
    val rnAlias = im.group(4)
    val table = im.group(5)
    keys.foreach { k =>
      if (!k.matches(raw"^[A-Za-z_]\w*$$"))
        fail(s"streaming top-N PARTITION BY keys must be plain columns, " +
          s"got: $k")
    }
    val wm = WhereRe.findFirstMatchIn(sql.substring(end).trim).getOrElse(fail(
      "streaming top-N must end `WHERE rn <= N [AND conditions]`"))
    val outerAlias = Option(wm.group(1)).map(_.trim)
    if (!wm.group(2).equalsIgnoreCase(rnAlias))
      fail(s"the WHERE rank filter must use the ROW_NUMBER alias " +
        s"$rnAlias, got ${wm.group(2)}")
    val n = boundOf(wm.group(3), wm.group(4).toInt).getOrElse(fail(
      s"WHERE $rnAlias = ${wm.group(4)} pins a single rank, not a " +
        "top-N prefix; only rn = 1 (deduplication) takes the equality " +
        "form"))
    if (n < 2 && stateTtlSec <= 0L)
      fail("unbounded streaming top-N compiles N >= 2; rn = 1 " +
        "runs through the dedup/argmax analysis rules")
    val residual = Option(wm.group(5)).map(_.trim).filter(_.nonEmpty)
    WindowTopN.rejectResidualOr(residual, fail)

    val src = spark.table(table)
    def fieldOf(c: String): StructField = {
      val i = src.schema.fieldNames.indexWhere(_.equalsIgnoreCase(c))
      if (i < 0) fail(s"column $c not found in $table")
      src.schema(i)
    }
    val metricField = fieldOf(metricCol)
    val metricIsTime =
      metricField.dataType.isInstanceOf[org.apache.spark.sql.types.TimestampType] ||
        metricField.dataType.isInstanceOf[org.apache.spark.sql.types.TimestampNTZType]
    if (!metricIsTime &&
        !metricField.dataType.isInstanceOf[org.apache.spark.sql.types.NumericType])
      fail(s"streaming top-N ORDER BY $metricCol: numeric or timestamp " +
        s"column required (got ${metricField.dataType.simpleString})")
    // timestamps rank through epoch MILLIS (NTZ has no direct double
    // cast, and millis stay exact in the double slot under 2^53);
    // numerics cast directly
    val metricIn =
      if (metricIsTime)
        expr(s"cast(unix_millis(cast($metricCol as timestamp)) as double)")
      else col(metricCol).cast("double")
    def metricBack(m: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      if (metricIsTime)
        expr(s"cast(timestamp_millis(cast(__m as long)) " +
          s"as ${metricField.dataType.sql})")
      else m.cast(metricField.dataType)
    keys.foreach(fieldOf) // existence; keys pass through natively
    // payload: every non-key, non-metric column that can round-trip
    // the JSON state encoding — through the shared exact carrier
    // ([[graft.streaming.StateFormat.carrierOf]]: lossless types pass
    // natively, doubles/floats/decimals/dates ride an exact string,
    // timestamps ride epoch micros); nested/binary columns drop (and
    // fail loudly upstream if the outer select references them)
    import org.apache.spark.sql.types._
    def carrierOf(f: StructField): Option[graft.streaming.StateFormat.Carrier] =
      graft.streaming.StateFormat.carrierOf(f)
    val payloadFields = src.schema.fields.filter { f =>
      !f.name.equalsIgnoreCase(metricCol) &&
        !keys.exists(_.equalsIgnoreCase(f.name)) &&
        carrierOf(f).isDefined
    }
    WindowTopN.failOnStarOverDropped(outSel,
      src.schema.fields.map(_.name).toSeq
        .filterNot(n => n.equalsIgnoreCase(metricCol) ||
          keys.exists(_.equalsIgnoreCase(n)) ||
          payloadFields.exists(_.name.equalsIgnoreCase(n))),
      fail)
    val payloadExpr =
      if (payloadFields.isEmpty) lit("{}")
      else to_json(struct(payloadFields.map(f =>
        carrierOf(f).get.enc.as(f.name)): _*))

    // a NULL metric ranks (smallest — batch parity) instead of dying
    // in the collector's primitive double slot: the null flag rides
    // beside a 0.0 placeholder. Two state engines share the exact
    // TopRows rank order: without a TTL, Spark's native streaming
    // aggregation through the bounded TopRows UDAF (partial
    // aggregation pre-trims per partition); under
    // `table.exec.state.ttl`, the flatMapGroupsWithState form
    // ([[graft.streaming.TtlTopNTracker]]) whose idle keys EXPIRE —
    // Spark's native aggregation state has no TTL, and this shape
    // (plus the rn = 1 deduplication family the TTL path admits) is
    // the dominant state-growth risk at high key cardinality.
    val uniform =
      if (stateTtlSec > 0L) {
        // per-key state groups on a to_json/from_json round-trip of
        // the PARTITION BY tuple (same contract as the window-TVF
        // trackers) — only losslessly JSON-codable key types admit
        AggSlots.requireLosslessKeys(k => fieldOf(k).dataType, keys,
          "streaming top-N under table.exec.state.ttl: PARTITION BY",
          fail, hint = "; unset the TTL for the native path")
        val prepared = src.select(
          to_json(struct(keys.map(col): _*)).as("key"),
          coalesce(metricIn, lit(0.0d)).as("metric"),
          metricIn.isNull.as("nullMetric"),
          payloadExpr.as("payload"))
        implicit val evEnc =
          org.apache.spark.sql.Encoders.product[graft.streaming.RankedEvent]
        val tracked = graft.streaming.TtlTopNTracker.track(
          prepared.as[graft.streaming.RankedEvent], n, asc, stateTtlSec)
          .toDF()
        val keyStruct = StructType(keys.map(fieldOf).toArray)
        tracked.select(
          keys.map(k => from_json(col("key"), keyStruct)
            .getField(fieldOf(k).name).as(fieldOf(k).name)) ++
            Seq(col("metric").as("__m"), col("nullMetric").as("__mnull"),
              col("payload").as("__pay"), col("pos").as("__pos")): _*)
      } else {
        val topAgg = udaf(new graft.functions.TopRows(n, asc),
          org.apache.spark.sql.Encoders.product[graft.functions.RankedRow])
        src
          .groupBy(keys.map(col): _*)
          .agg(topAgg(coalesce(metricIn, lit(0.0d)), payloadExpr,
            metricIn.isNull).as("__top"))
          .select(keys.map(col) :+
            posexplode(col("__top.rows")).as(Seq("__pos", "__r")): _*)
          .select(keys.map(col) ++
            Seq(col("__r.metric").as("__m"),
              col("__r.nullMetric").as("__mnull"),
              col("__r.payload").as("__pay"), col("__pos")): _*)
      }
    val decoded = {
      val payloadCols =
        if (payloadFields.isEmpty) Seq.empty
        else {
          val schema = StructType(payloadFields.map(f =>
            StructField(f.name, carrierOf(f).get.storage, nullable = true)))
          Seq(from_json(col("__pay"), schema,
            Map("allowNonNumericNumbers" -> "true")).as("__p"))
        }
      val base = uniform.select((keys.map(col) ++
        Seq(col("__m"), col("__mnull"), col("__pos")) ++
        payloadCols): _*)
      base.select((keys.map(col) ++
        payloadFields.map(f =>
          carrierOf(f).get.dec(col(s"__p.`${f.name}`")).as(f.name)) ++
        Seq(when(col("__mnull"), lit(null).cast(metricField.dataType))
            .otherwise(metricBack(col("__m"))).as(metricCol),
          (col("__pos") + 1).cast("long").as(rnAlias))): _*)
    }
    val view = s"graft_utopn_${viewCounter.incrementAndGet()}"
    decoded.createOrReplaceTempView(view)
    s"${insertPrefix}SELECT $outSel FROM $view" +
      outerAlias.fold("")(a => s" $a") +
      residual.fold("")(r => s" WHERE $r")
  }
}
