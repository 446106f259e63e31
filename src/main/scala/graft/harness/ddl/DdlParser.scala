package graft.harness.ddl

import scala.collection.mutable

/** A small, honest parser for the `CREATE TABLE` forms the harness
  * supports (Flink-flavored DDL with a `WITH ('k'='v')` clause, computed
  * columns, and a `WATERMARK FOR` declaration — test.sql:14-44). Not a
  * general SQL parser: statements without a WITH clause are left for the
  * engine's native `spark.sql`.
  */
object DdlParser {

  private val CreateHead =
    raw"(?is)^\s*CREATE\s+(?:TEMPORARY\s+)?TABLE\s+(IF\s+NOT\s+EXISTS\s+)?(.+)$$".r

  /** True if this CREATE statement carries a connector WITH clause and so
    * must be handled by the shim rather than Spark SQL.
    */
  def isConnectorCreate(sql: String): Boolean =
    sql match {
      case CreateHead(_, _) =>
        // a WITH ( 'key' = 'value' ...) clause after the column list
        raw"(?is)\)\s*WITH\s*\(\s*'".r.findFirstIn(sql).isDefined
      case _ => false
    }

  def parse(sql: String): TableDef = {
    val (ifNotExists, rest) = sql match {
      case CreateHead(ine, r) => (ine != null, r.trim)
      case _ =>
        throw new IllegalArgumentException(s"Not a CREATE TABLE statement: $sql")
    }
    // rest = qualified.name ( schema ) WITH ( options )
    val open = rest.indexOf('(')
    if (open < 0)
      throw new IllegalArgumentException(s"CREATE TABLE missing column list: $sql")
    val rawName = rest.substring(0, open).trim
    val name = unquoteName(rawName)
    val (schemaPart, afterSchema) = matchParen(rest, open)
    // optional Flink-style PARTITIONED BY (c1, c2) before the WITH clause
    val partRe = raw"(?is)PARTITIONED\s+BY\s*\(([^)]*)\)".r
    val partitionedBy = partRe.findFirstMatchIn(afterSchema)
      .map(_.group(1).split(",").map(c => unquoteName(c.trim)).toVector)
      .getOrElse(Vector.empty)
    val withIdx = raw"(?is)\bWITH\b".r.findFirstMatchIn(afterSchema)
      .map(_.start)
      .getOrElse(throw new IllegalArgumentException(
        s"CREATE TABLE missing WITH clause: $sql"))
    val afterWith = afterSchema.substring(withIdx + 4)
    val optOpen = afterWith.indexOf('(')
    val (optionsPart, _) = matchParen(afterWith, optOpen)
    val options = parseOptions(optionsPart)

    val columns = Vector.newBuilder[ColumnDef]
    val computed = Vector.newBuilder[ComputedColumnDef]
    var watermark: Option[WatermarkDef] = None
    var primaryKey: Vector[String] = Vector.empty

    splitTopLevel(schemaPart).map(_.trim).filter(_.nonEmpty).foreach { entry =>
      val wmRe = raw"(?is)^WATERMARK\s+FOR\s+(\S+)\s+AS\s+(.+)$$".r
      val compRe = raw"(?is)^(`[^`]+`|\w+)\s+AS\s+(.+)$$".r
      val colRe = raw"(?is)^(`[^`]+`|\w+)\s+(.+)$$".r
      val constraintRe = raw"(?is)^(PRIMARY\s+KEY|CONSTRAINT|UNIQUE)\b.*".r
      val pkRe = raw"(?is)^(?:CONSTRAINT\s+\S+\s+)?PRIMARY\s+KEY\s*\(([^)]*)\).*".r
      entry match {
        case pkRe(cols) =>
          // NOT ENFORCED in Flink, but it names the upsert key — the
          // print sink uses it for changelog row kinds (+I/-U/+U)
          primaryKey = cols.split(",").map(c => unquoteName(c.trim)).toVector
        case constraintRe(_) =>
          // other constraints are metadata-only; skip
          ()
        case wmRe(c, expr) =>
          watermark = Some(WatermarkDef(unquoteName(c), parseDelay(expr)))
        case compRe(n, expr) =>
          computed += ComputedColumnDef(unquoteName(n), expr.trim)
        case colRe(n, tpe) =>
          columns += ColumnDef(unquoteName(n), tpe.trim)
        case _ =>
          throw new IllegalArgumentException(s"Cannot parse column entry: $entry")
      }
    }
    TableDef(name, ifNotExists, columns.result(), computed.result(), watermark,
      options, partitionedBy, primaryKey)
  }

  /** `catalog.db.tbl` (possibly backticked parts) → bare table name. */
  def unquoteName(raw: String): String = {
    val parts = splitQualified(raw.trim)
    parts.last.stripPrefix("`").stripSuffix("`")
  }

  private def splitQualified(s: String): Vector[String] = {
    val parts = Vector.newBuilder[String]
    val cur = new mutable.StringBuilder
    var inTick = false
    s.foreach {
      case '`' => inTick = !inTick; cur.append('`')
      case '.' if !inTick => parts += cur.toString; cur.clear()
      case c => cur.append(c)
    }
    parts += cur.toString
    parts.result()
  }

  /** Return (inside, after) for the paren group starting at `openIdx`. */
  private def matchParen(s: String, openIdx: Int): (String, String) = {
    var depth = 0
    var inQuote = false
    var i = openIdx
    while (i < s.length) {
      s.charAt(i) match {
        case '\'' => inQuote = !inQuote
        case '(' if !inQuote => depth += 1
        case ')' if !inQuote =>
          depth -= 1
          if (depth == 0)
            return (s.substring(openIdx + 1, i), s.substring(i + 1))
        case _ =>
      }
      i += 1
    }
    throw new IllegalArgumentException(s"Unbalanced parentheses in: $s")
  }

  /** Split on commas at paren-depth 0, outside single quotes. */
  private def splitTopLevel(s: String): Vector[String] = {
    val parts = Vector.newBuilder[String]
    val cur = new mutable.StringBuilder
    var depth = 0
    var inQuote = false
    s.foreach { c =>
      c match {
        case '\'' => inQuote = !inQuote; cur.append(c)
        case '(' if !inQuote => depth += 1; cur.append(c)
        case ')' if !inQuote => depth -= 1; cur.append(c)
        case ',' if depth == 0 && !inQuote => parts += cur.toString; cur.clear()
        case _ => cur.append(c)
      }
    }
    parts += cur.toString
    parts.result()
  }

  /** `'k' = 'v', 'k2' = 'v2'` → map. */
  def parseOptions(s: String): Map[String, String] = {
    val optRe = raw"(?s)'((?:[^']|'')*)'\s*=\s*'((?:[^']|'')*)'".r
    optRe.findAllMatchIn(s).map { m =>
      m.group(1).replace("''", "'") -> m.group(2).replace("''", "'")
    }.toMap
  }

  /** `row_time - INTERVAL '5' SECOND` → "5 seconds" (withWatermark delay). */
  private def parseDelay(expr: String): String = {
    val re = raw"(?is)INTERVAL\s+'([\d.]+)'\s+(\w+)".r
    re.findFirstMatchIn(expr) match {
      case Some(m) => s"${m.group(1)} ${m.group(2).toLowerCase}s"
      case None => "0 seconds"
    }
  }
}
