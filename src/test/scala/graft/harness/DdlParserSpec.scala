package graft.harness

import graft.harness.ddl.DdlParser
import org.scalatest.funsuite.AnyFunSuite

class DdlParserSpec extends AnyFunSuite {

  private val datagenDdl =
    """create table if not exists `default_catalog`.`default_database`.`tbl_src`(
      |  dim string,
      |  user_id bigint,
      |  price double,
      |  row_time as cast(current_timestamp as timestamp(3)),
      |  watermark for row_time as row_time - interval '5' second
      |) with (
      |  'connector' = 'datagen',
      |  'rows-per-second' = '10',
      |  'fields.dim.length' = '1',
      |  'fields.user_id.min' = '1',
      |  'fields.user_id.max' = '100000'
      |)""".stripMargin

  test("parses the reference fixture source DDL (test.sql:14-28 shape)") {
    val t = DdlParser.parse(datagenDdl)
    assert(t.name == "tbl_src")
    assert(t.ifNotExists)
    assert(t.columns.map(_.name) == Vector("dim", "user_id", "price"))
    assert(t.columns.map(_.dataType) == Vector("string", "bigint", "double"))
    assert(t.computedColumns.map(_.name) == Vector("row_time"))
    assert(t.computedColumns.head.expr ==
      "cast(current_timestamp as timestamp(3))")
    assert(t.watermark.exists(w => w.column == "row_time" && w.delay == "5 seconds"))
    assert(t.connector.contains("datagen"))
    assert(t.options("fields.user_id.max") == "100000")
  }

  test("isConnectorCreate: true for WITH-clause DDL, false otherwise") {
    assert(DdlParser.isConnectorCreate(datagenDdl))
    assert(!DdlParser.isConnectorCreate("CREATE TABLE t (a int)"))
    assert(!DdlParser.isConnectorCreate("CREATE VIEW v AS SELECT 1"))
  }

  test("qualified + backticked names reduce to the bare table name") {
    assert(DdlParser.unquoteName("`cat`.`db`.`tbl`") == "tbl")
    assert(DdlParser.unquoteName("db.tbl") == "tbl")
    assert(DdlParser.unquoteName("tbl") == "tbl")
  }

  test("PARTITIONED BY clause between schema and WITH is parsed") {
    val t = DdlParser.parse(
      "CREATE TABLE t (a int, dt string) PARTITIONED BY (dt) " +
        "WITH ('connector'='filesystem', 'path'='/tmp/x')")
    assert(t.partitionedBy == Vector("dt"))
    assert(t.columns.map(_.name) == Vector("a", "dt"))
  }

  test("PRIMARY KEY / constraint entries are skipped, not parsed as columns") {
    val t = DdlParser.parse(
      "CREATE TABLE t (id INT, v STRING, PRIMARY KEY (id) NOT ENFORCED) " +
        "WITH ('connector'='datagen')")
    assert(t.columns.map(_.name) == Vector("id", "v"))
    // ...but the PK columns are captured as the upsert key
    assert(t.primaryKey == Vector("id"))
    val named = DdlParser.parse(
      "CREATE TABLE t2 (a INT, b INT, CONSTRAINT pk PRIMARY KEY (a, b) NOT ENFORCED) " +
        "WITH ('connector'='print')")
    assert(named.primaryKey == Vector("a", "b"))
  }

  test("types with parens (decimal/timestamp) survive column splitting") {
    val t = DdlParser.parse(
      "CREATE TABLE t (a decimal(10,2), b timestamp(3)) WITH ('connector'='print')")
    assert(t.columns.map(_.dataType) == Vector("decimal(10,2)", "timestamp(3)"))
  }

  test("METADATA columns parse with FROM keys and VIRTUAL markers") {
    val t = DdlParser.parse(
      """CREATE TABLE m (v BIGINT,
        |  fname STRING METADATA FROM 'file.name',
        |  mtime TIMESTAMP(3) METADATA FROM 'file.modification-time' VIRTUAL,
        |  self_key STRING METADATA
        |) WITH ('connector'='filesystem','path'='/x','format'='parquet')""".stripMargin)
    assert(t.columns.map(_.name) == Vector("v"))
    assert(t.metadataColumns.map(m => (m.name, m.key, m.virtual)) == Vector(
      ("fname", "file.name", false),
      ("mtime", "file.modification-time", true),
      ("self_key", "self_key", false)))
    assert(t.metadataColumns(1).dataType == "TIMESTAMP(3)")
  }

  test("LIKE: bare clone parses without a column list or WITH clause") {
    val t = DdlParser.parse("CREATE TABLE t2 LIKE tbl_src")
    assert(t.name == "t2" && t.columns.isEmpty && t.options.isEmpty)
    assert(t.like.exists(l => l.table == "tbl_src" && l.opts.isEmpty))
    assert(DdlParser.likeTarget("CREATE TABLE t2 LIKE tbl_src")
      .contains("tbl_src"))
  }

  test("LIKE: merge options parse; unsupported directives are rejected") {
    val t = DdlParser.parse(
      "CREATE TABLE t2 (extra INT) WITH ('rows-per-second'='1') " +
        "LIKE tbl_src (EXCLUDING OPTIONS, OVERWRITING WATERMARKS)")
    assert(t.like.exists(_.opts ==
      Vector(("EXCLUDING", "OPTIONS"), ("OVERWRITING", "WATERMARKS"))))
    val e = intercept[IllegalArgumentException](DdlParser.parse(
      "CREATE TABLE t2 LIKE tbl_src (OVERWRITING CONSTRAINTS)"))
    assert(e.getMessage.contains("OVERWRITING only for"))
  }

  test("LIKE resolution: defaults copy everything, conflicts error") {
    val parent = DdlParser.parse(datagenDdl)
    val bare = DdlParser.resolveLike(
      DdlParser.parse("CREATE TABLE t2 LIKE tbl_src"), parent)
    assert(bare.name == "t2")
    assert(bare.columns == parent.columns)
    assert(bare.computedColumns == parent.computedColumns)
    assert(bare.watermark == parent.watermark)
    assert(bare.options == parent.options && bare.like.isEmpty)
    // child adds a column and an option: both merge in
    val add = DdlParser.resolveLike(DdlParser.parse(
      "CREATE TABLE t2 (note STRING) WITH ('number-of-rows'='5') LIKE tbl_src"),
      parent)
    assert(add.columns.map(_.name) ==
      parent.columns.map(_.name) :+ "note")
    assert(add.options("number-of-rows") == "5" &&
      add.options("connector") == "datagen")
    // duplicate option with a DIFFERENT value errors without OVERWRITING
    val e = intercept[IllegalArgumentException](DdlParser.resolveLike(
      DdlParser.parse(
        "CREATE TABLE t2 WITH ('rows-per-second'='99') LIKE tbl_src"), parent))
    assert(e.getMessage.contains("OVERWRITING"))
    // ... and wins with it
    val ow = DdlParser.resolveLike(DdlParser.parse(
      "CREATE TABLE t2 WITH ('rows-per-second'='99') " +
        "LIKE tbl_src (OVERWRITING OPTIONS)"), parent)
    assert(ow.options("rows-per-second") == "99")
    // duplicate column name errors
    val ec = intercept[IllegalArgumentException](DdlParser.resolveLike(
      DdlParser.parse("CREATE TABLE t2 (dim STRING) LIKE tbl_src"), parent))
    assert(ec.getMessage.contains("already exists"))
    // EXCLUDING ALL keeps only the child's declarations (columns aside)
    val ex = DdlParser.resolveLike(DdlParser.parse(
      "CREATE TABLE t2 WITH ('connector'='blackhole') " +
        "LIKE tbl_src (EXCLUDING ALL)"), parent)
    assert(ex.options == Map("connector" -> "blackhole"))
    assert(ex.watermark.isEmpty && ex.computedColumns.isEmpty)
    assert(ex.columns == parent.columns) // plain columns always copy
    // watermark conflict errors unless OVERWRITING WATERMARKS
    val wmChild = "CREATE TABLE t2 (watermark for row_time as " +
      "row_time - interval '9' second) LIKE tbl_src"
    val ew = intercept[IllegalArgumentException](
      DdlParser.resolveLike(DdlParser.parse(wmChild), parent))
    assert(ew.getMessage.contains("watermark"))
    val wow = DdlParser.resolveLike(DdlParser.parse(
      wmChild + " (OVERWRITING WATERMARKS)"), parent)
    assert(wow.watermark.exists(_.delay == "9 seconds"))
    // a child COMPUTED column colliding with a parent PHYSICAL column
    // would silently shadow the data column at registration — error
    val ecc = intercept[IllegalArgumentException](DdlParser.resolveLike(
      DdlParser.parse("CREATE TABLE t2 (dim AS upper(dim)) LIKE tbl_src"),
      parent))
    assert(ecc.getMessage.contains("more than once"))
  }

  test("showCreate round-trips: reconstructed DDL re-parses to the same def") {
    val t = DdlParser.parse(datagenDdl)
    val shown = DdlParser.showCreate(t)
    assert(shown.startsWith("CREATE TABLE `tbl_src` ("))
    assert(shown.contains("WATERMARK FOR `row_time` AS `row_time` - INTERVAL '5' SECOND"))
    assert(shown.contains("'connector' = 'datagen'"))
    val reparsed = DdlParser.parse(shown)
    assert(reparsed.columns == t.columns)
    assert(reparsed.computedColumns == t.computedColumns)
    assert(reparsed.watermark == t.watermark)
    assert(reparsed.options == t.options)
    // metadata + pk + partitioning render too
    val full = DdlParser.parse(
      """CREATE TABLE f (v BIGINT, fname STRING METADATA FROM 'file.name' VIRTUAL,
        |  PRIMARY KEY (v) NOT ENFORCED)
        |PARTITIONED BY (v)
        |WITH ('connector'='filesystem','path'='/x','format'='parquet')""".stripMargin)
    val shownFull = DdlParser.showCreate(full)
    assert(shownFull.contains("METADATA FROM 'file.name' VIRTUAL"))
    assert(shownFull.contains("PRIMARY KEY (`v`) NOT ENFORCED"))
    assert(shownFull.contains("PARTITIONED BY (`v`)"))
    val rf = DdlParser.parse(shownFull)
    assert(rf.metadataColumns == full.metadataColumns)
    assert(rf.primaryKey == full.primaryKey &&
      rf.partitionedBy == full.partitionedBy)
  }

  test("likeTarget ignores CTAS bodies whose final predicate is a LIKE") {
    assert(DdlParser.likeTarget(
      "CREATE TABLE agg AS SELECT * FROM x WHERE name LIKE pat").isEmpty)
    assert(DdlParser.likeTarget(
      "CREATE TABLE agg AS (SELECT * FROM x WHERE name LIKE pat)").isEmpty)
    assert(DdlParser.likeTarget("CREATE TABLE t2 LIKE tbl_src").contains("tbl_src"))
  }
}
