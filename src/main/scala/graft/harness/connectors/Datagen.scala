package graft.harness.connectors

import graft.harness.ddl.TableDef
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** `datagen` source connector: rate-limited random rows with per-field
  * `length` / `min` / `max` options (reference fixture test.sql:21-27).
  *
  * Streaming flavor builds on Spark's `rate` source (one row per tick at
  * `rows-per-second`) and projects generated columns; batch flavor uses
  * `spark.range(number-of-rows)`. Both are pure Catalyst projections over
  * codegen'd `rand()` — no driver-side generation, scales linearly with
  * partitions.
  *
  * Options honored: `rows-per-second` (streaming rate), `number-of-rows`
  * (bounded row count; also makes the streaming flavor finite via
  * rate-source rampDown... for the harness we treat it as batch bound),
  * `fields.<col>.length` (random alphanumeric string of that length),
  * `fields.<col>.min` / `fields.<col>.max` (uniform numeric range),
  * `fields.<col>.kind` = 'sequence' with `fields.<col>.start`/`end`.
  */
object Datagen {
  private val Alphabet =
    "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789"

  private def randomString(len: Int): Column = {
    // pick a random alphabet char per position: substr(alphabet, 1+floor(rand()*62), 1)
    val picks = (0 until len).map { _ =>
      expr(s"substring('$Alphabet', cast(floor(rand() * ${Alphabet.length}) as int) + 1, 1)")
    }
    if (picks.isEmpty) lit("") else concat(picks: _*)
  }

  private def generatedColumn(dataType: String, fieldOpts: Map[String, String]): Column = {
    val t = dataType.toLowerCase.replaceAll(raw"\(.*\)", "").trim
    def min = fieldOpts.get("min").map(_.toDouble)
    def max = fieldOpts.get("max").map(_.toDouble)
    t match {
      case "string" | "varchar" | "char" =>
        randomString(fieldOpts.get("length").map(_.toInt).getOrElse(100))
      case "tinyint" | "smallint" | "int" | "integer" | "bigint" =>
        val lo = min.getOrElse(0d)
        val hi = max.getOrElse(Int.MaxValue.toDouble)
        // uniform integer in [lo, hi] inclusive, Flink-datagen style
        floor(rand() * (lit(hi) - lit(lo) + 1) + lit(lo)).cast(
          if (t == "bigint") "long" else "int")
      case "float" | "double" | "decimal" | "numeric" =>
        val lo = min.getOrElse(0d)
        val hi = max.getOrElse(Double.MaxValue.min(1e9))
        (rand() * (lit(hi) - lit(lo)) + lit(lo)).cast(
          if (t == "float") "float" else "double")
      case "boolean" =>
        (rand() > 0.5)
      case "timestamp" =>
        current_timestamp()
      case other =>
        throw new IllegalArgumentException(s"datagen: unsupported type '$other'")
    }
  }

  /** Generated physical columns only; computed columns + watermark are
    * applied uniformly by the harness (`withSourceDecorations`) for every
    * connector.
    */
  private def project(base: DataFrame, table: TableDef): DataFrame = {
    val fieldCols = table.columns.map { c =>
      val fieldOpts = fieldOptions(table, c.name)
      if (fieldOpts.get("kind").contains("sequence")) {
        val start = fieldOpts.get("start").map(_.toLong).getOrElse(0L)
        (col("__seq_id") + start).cast("long").as(c.name)
      } else generatedColumn(c.dataType, fieldOpts).as(c.name)
    }
    base.select(fieldCols: _*)
  }

  private def fieldOptions(table: TableDef, field: String): Map[String, String] = {
    val prefix = s"fields.$field."
    table.options.collect {
      case (k, v) if k.startsWith(prefix) => k.stripPrefix(prefix) -> v
    }
  }

  /** Row bound: explicit `number-of-rows`, else the tightest sequence
    * field's `end - start + 1` (Flink's sequence generator terminates at
    * `end`), else `defaultRows`.
    */
  private def rowBound(table: TableDef, defaultRows: Long): Long = {
    val explicit = table.options.get("number-of-rows").map(_.toLong)
    val seqBounds = table.columns.flatMap { c =>
      val o = fieldOptions(table, c.name)
      if (o.get("kind").contains("sequence"))
        for (e <- o.get("end").map(_.toLong))
          yield e - o.get("start").map(_.toLong).getOrElse(0L) + 1L
      else None
    }
    (explicit.toSeq ++ seqBounds).minOption.getOrElse(defaultRows)
  }

  /** Bounded batch flavor (used when runtime-mode=batch or for tests). */
  def batch(spark: SparkSession, table: TableDef, defaultRows: Long = 1000L): DataFrame =
    project(spark.range(rowBound(table, defaultRows))
      .withColumnRenamed("id", "__seq_id"), table)

  /** Streaming flavor on the `rate` source. Unbounded unless a
    * sequence field declares an `end`: Flink's sequence generator
    * TERMINATES at `end`, so the tightest sequence bound filters the
    * rate ticks — emission stops after `end - start + 1` rows (the
    * query itself stays live; `--duration-sec` bounds the run), where
    * an unfiltered rate source would keep counting past the declared
    * range forever.
    */
  def stream(spark: SparkSession, table: TableDef): DataFrame = {
    val rps = table.options.get("rows-per-second").map(_.toLong).getOrElse(10000L)
    val base = spark.readStream.format("rate")
      .option("rowsPerSecond", rps)
      .load()
      .withColumnRenamed("value", "__seq_id")
    val seqBound = table.columns.flatMap { c =>
      val o = fieldOptions(table, c.name)
      if (o.get("kind").contains("sequence"))
        for (e <- o.get("end").map(_.toLong))
          yield e - o.get("start").map(_.toLong).getOrElse(0L) + 1L
      else None
    }.minOption
    project(seqBound.fold(base)(n => base.where(col("__seq_id") < n)), table)
  }
}
