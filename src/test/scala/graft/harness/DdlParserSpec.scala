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
}
