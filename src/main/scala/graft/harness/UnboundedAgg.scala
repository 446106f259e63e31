package graft.harness

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, StructField, StructType}

/** Flink's plain unbounded GROUP BY aggregation under
  * `table.exec.state.ttl` — the canonical
  *
  * {{{ [INSERT INTO sink] SELECT k1, ..., AGG(expr) AS a, ...
  *     FROM stream [WHERE pred] GROUP BY k1, ... }}}
  *
  * shape on a STREAM relation. Spark's native update-mode aggregation
  * runs this fine but keeps one state row per key FOREVER (no TTL
  * hook); Flink expires the per-key accumulator after the configured
  * idle TTL — the dominant state-growth difference at 100 TB key
  * cardinalities. When the TTL key is set, this pass compiles the
  * shape onto [[graft.streaming.UnboundedAggTracker]]: the shared
  * slot planner ([[AggSlots]] — the same kind table the window-TVF
  * and OVER passes use), a JSON-packed group key, update-mode
  * emission of each touched key's current aggregate row, and a
  * processing-time idle-key timeout. COUNT(DISTINCT) and decimal
  * aggregates come out EXACT on this path (value-set / BigDecimal
  * state), where the native streaming route would HLL-approximate.
  *
  * Shapes outside the contract (joins, expression group keys,
  * unaliased aggregates, HAVING, set ops) stay on the native path —
  * [[hasShape]] returns false — and their state remains TTL-less;
  * statements the shape admits but whose details violate the contract
  * (non-JSON-lossless keys, nested-type aggregate inputs) fail by
  * name inside [[rewrite]] exactly like the window-TVF pass.
  */
object UnboundedAgg {

  private def fail(msg: String): Nothing =
    throw new IllegalArgumentException(msg)

  private val viewCounter = new java.util.concurrent.atomic.AtomicInteger()

  private val InsertPrefixRe =
    raw"(?is)^\s*(INSERT\s+(?:INTO|OVERWRITE)\s+[\w.`]+\s*(?:\([^)]*\)\s*)?)".r
  private val SelectRe = raw"(?is)^\s*SELECT\s+".r
  private val TableRe =
    raw"(?is)^([A-Za-z_][\w.]*)(?:\s+(?:AS\s+)?([A-Za-z_]\w*))?$$".r
  private val AggItemRe =
    (raw"(?is)^(" + AggSlots.FnAlternation +
      raw")\s*\((.+)\)\s+AS\s+([A-Za-z_]\w*)$$").r
  private val KeyRe = raw"(?s)^[A-Za-z_]\w*$$".r

  /** Structural parse of the canonical shape; None when the statement
    * is not a plain single-table GROUP BY aggregation. Yields
    * (insert prefix, select list, table, optional alias, optional
    * WHERE, group keys). */
  private def parse(sql: String): Option[(String, String, String,
      Option[String], Option[String], Seq[String])] = {
    if (WindowTvf.hasWindowTvf(sql) || MatchRecognize.hasMatchRecognize(sql))
      return None
    val (prefix, body) = InsertPrefixRe.findFirstMatchIn(sql)
      .map(m => (m.group(1), sql.substring(m.end)))
      .getOrElse(("", sql))
    val masked = MatchRecognize.maskQuoted(body)
    // OVER / QUALIFY / nested SELECT / set ops: other passes' territory
    if (raw"(?is)\bOVER\s*\(|\bQUALIFY\b|\bUNION\b|\bINTERSECT\b|\bEXCEPT\b|\bHAVING\b|\bORDER\s+BY\b|\bLIMIT\b".r
        .findFirstIn(masked).isDefined) return None
    if (raw"(?is)\bSELECT\b".r.findAllMatchIn(masked).size != 1) return None
    for {
      selM <- SelectRe.findFirstMatchIn(masked)
      fromIdx <- WindowTvf.findTopLevel(masked, selM.end, "FROM")
      groupIdx <- WindowTvf.findTopLevel(masked, fromIdx, "GROUP")
      if raw"(?is)^GROUP\s+BY\b".r
        .findFirstIn(masked.substring(groupIdx)).isDefined
      whereIdx = WindowTvf.findTopLevel(masked, fromIdx, "WHERE")
        .filter(_ < groupIdx)
      relEnd = whereIdx.getOrElse(groupIdx)
      relRegion = body.substring(fromIdx + "FROM".length, relEnd).trim
      tm <- TableRe.findFirstMatchIn(relRegion)
      keysRegion = raw"(?is)^GROUP\s+BY\b".r
        .replaceFirstIn(body.substring(groupIdx), "").stripSuffix(";").trim
    } yield (prefix, body.substring(selM.end, fromIdx).trim,
      ddl.DdlParser.unquoteName(tm.group(1)), Option(tm.group(2)),
      whereIdx.map(w => body.substring(w + "WHERE".length, groupIdx).trim),
      MatchRecognize.splitTopLevel(keysRegion).map(_.trim))
  }

  /** The TTL-routable shape: the canonical parse succeeds, the group
    * keys are plain columns, every select item is a group key or an
    * ALIASED aggregate call, and the FROM names a STREAM relation
    * (a bounded relation aggregates natively with no state to bound).
    */
  def hasShape(spark: SparkSession, sql: String): Boolean =
    parse(sql).exists { case (_, items, table, _, _, keys) =>
      keys.forall(KeyRe.matches) &&
        MatchRecognize.splitTopLevel(items).map(_.trim).forall(it =>
          keys.exists(_.equalsIgnoreCase(it)) ||
            AggItemRe.findFirstMatchIn(it).isDefined) &&
        scala.util.Try(spark.table(table).isStreaming).getOrElse(false)
    }

  /** Compiles the shape onto the TTL'd tracker; call only when
    * [[hasShape]] holds. Mirrors the window-TVF pass' slot plumbing:
    * AggSlots plans each aggregate, inputs ride the (nn, lv, dv, sv)
    * slots, results decode from the vals JSON with per-slot finish
    * transforms.
    */
  def rewrite(spark: SparkSession, sql: String, stateTtlSec: Long): String = {
    require(stateTtlSec > 0L, "UnboundedAgg is the TTL'd route")
    val (prefix, selectList, table, aliasOpt, wherePred, keys) =
      parse(sql).getOrElse(fail("not an unbounded GROUP BY shape"))
    keys.foreach(k => if (!KeyRe.matches(k))
      fail(s"GROUP BY key must be a plain column, got: $k"))

    // the relation rides under its statement alias so alias-qualified
    // references in WHERE and aggregate inputs resolve
    val src0 = aliasOpt.fold(spark.table(table))(a =>
      spark.table(table).alias(a))
    val src = wherePred.foldLeft(src0)((d, p) =>
      d.where(DialectFunctions.rewriteScalars(p)))
    def fieldOf(c: String): StructField =
      src.schema.fields.find(_.name.equalsIgnoreCase(c)).getOrElse(
        fail(s"column $c not found in $table"))

    sealed trait Item
    final case class KeyItem(name: String) extends Item
    final case class AggItem(fn: String, distinct: Boolean, input: String,
        alias: String) extends Item
    val items: Seq[Item] = MatchRecognize.splitTopLevel(selectList)
      .map(_.trim).filter(_.nonEmpty).map {
        case it if keys.exists(_.equalsIgnoreCase(it)) => KeyItem(it)
        case AggItemRe(fn, in, alias) =>
          val distinct =
            raw"(?i)^DISTINCT\b".r.findFirstIn(in.trim).isDefined
          val arg =
            if (distinct) in.trim.replaceFirst(raw"(?i)^DISTINCT\s+", "")
            else in.trim
          if (!distinct &&
              raw"(?i)\bDISTINCT\b".r.findFirstIn(in).isDefined)
            fail(s"unsupported DISTINCT placement in ${fn.toUpperCase}($in)")
          // MIN/MAX are distinct-invariant (Flink plans the same)
          val f = fn.toUpperCase
          val d = distinct && f != "MIN" && f != "MAX"
          AggItem(f, d, arg, alias)
        case other => fail("unsupported select item under the TTL'd " +
          "unbounded aggregation (want a group key or AGG(expr) AS " +
          s"alias): $other")
      }
    val aggs = items.collect { case a: AggItem => a }
    if (aggs.isEmpty) fail("at least one aggregate is required")

    def resolveInput(in: String): DataType =
      try src.selectExpr(in).schema.head.dataType
      catch { case e: Exception =>
        fail(s"cannot resolve aggregate input $in: ${e.getMessage}")
      }
    val plans: Seq[(AggItem, AggSlots.Slot)] = aggs.map(a =>
      (a, AggSlots.plan(a.fn, a.distinct, a.input, resolveInput, fail)))

    // per-key state groups on a to_json/from_json round-trip of the
    // GROUP BY tuple — the shared AggSlots key/slot builders
    AggSlots.requireLosslessKeys(
      k => fieldOf(k).dataType, keys, "GROUP BY", fail,
      hint = "; unset table.exec.state.ttl for the native path")
    val keyStruct = StructType(keys.map(fieldOf).toArray)
    val keyExpr =
      if (keys.isEmpty) lit("{}") else to_json(struct(keys.map(col): _*))
    val (nnArr, lvArr, dvArr, svArr) =
      AggSlots.slotInputArrays(plans.map(_._2))
    val prepared = src.select(keyExpr.as("key"),
      nnArr.as("nn"), lvArr.as("lv"), dvArr.as("dv"), svArr.as("sv"))
    implicit val evEnc =
      org.apache.spark.sql.Encoders.product[graft.streaming.UnboundedAggEvent]
    val tracked = graft.streaming.UnboundedAggTracker.track(
      prepared.as[graft.streaming.UnboundedAggEvent],
      plans.map(_._2.kind), stateTtlSec).toDF()

    val valsSchema = StructType(plans.zipWithIndex.map { case (p, i) =>
      StructField(s"a$i", p._2.storage, nullable = true)
    }.toArray)
    var ai = -1
    val outCols = items.map {
      case KeyItem(name) =>
        from_json(col("key"), keyStruct)
          .getField(fieldOf(name).name).as(name)
      case a: AggItem =>
        ai += 1
        val raw = from_json(col("vals"), valsSchema,
            Map("allowNonNumericNumbers" -> "true"))
          .getField(s"a$ai")
        plans(ai)._2.finish.fold(raw)(f => f(raw)).as(a.alias)
    }
    val result: DataFrame = tracked.select(outCols: _*)
    val view = s"graft_uagg_${viewCounter.incrementAndGet()}"
    result.createOrReplaceTempView(view)
    s"${prefix}SELECT * FROM $view"
  }
}
