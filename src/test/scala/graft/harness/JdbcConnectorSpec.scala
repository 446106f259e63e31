package graft.harness

import java.nio.file.Files
import java.sql.DriverManager
import graft.SparkFixture
import org.scalatest.funsuite.AnyFunSuite

/** The `jdbc` connector surface against embedded Derby: a pre-existing
  * database table reads as a dim table through the DDL shim, and an
  * INSERT into a jdbc sink creates and fills a table that later
  * statements in the same script can read back.
  */
class JdbcConnectorSpec extends AnyFunSuite {

  // the create flag stays OUT of the script url: the reference's
  // script splitter cuts statements at the first semicolon, so a
  // semicolon inside a literal cannot survive a script — the spec
  // bootstraps the database first and the script uses the plain url
  private val bootUrl = "jdbc:derby:memory:graftdb;create=true"
  private val url = "jdbc:derby:memory:graftdb"

  test("jdbc dim table reads and jdbc sink writes through sql-submit") {
    val spark = SparkFixture.spark
    // seed the database side out-of-band, as an operator would
    val conn = DriverManager.getConnection(bootUrl)
    try {
      val st = conn.createStatement()
      // the in-memory database outlives the test within a JVM: clear
      // BOTH tables or a re-run appends duplicates
      try st.execute("DROP TABLE DIMT") catch { case _: Exception => () }
      try st.execute("DROP TABLE TOTALS") catch { case _: Exception => () }
      st.execute("CREATE TABLE DIMT (k BIGINT, label VARCHAR(20))")
      st.execute("INSERT INTO DIMT VALUES (1, 'one'), (2, 'two'), (3, 'three')")
      st.close()
    } finally conn.close()

    val dir = Files.createTempDirectory("graft-jdbc").toString
    spark.sql("SELECT * FROM VALUES (1L, 10L), (2L, 20L), (2L, 25L), (9L, 90L) AS t(k, v)")
      .write.parquet(s"$dir/facts")
    val script =
      s"""SET execution.runtime-mode = batch;
         |create table facts(k bigint, v bigint) with (
         |  'connector' = 'filesystem', 'path' = '$dir/facts',
         |  'format' = 'parquet');
         |create table dimt(k bigint, label string) with (
         |  'connector' = 'jdbc', 'url' = '$url', 'table-name' = 'DIMT');
         |create table totals(label string, total bigint) with (
         |  'connector' = 'jdbc', 'url' = '$url', 'table-name' = 'TOTALS');
         |insert into totals
         |select d.label, sum(f.v) as total
         |from facts f join dimt d on f.k = d.k
         |group by d.label;
         |""".stripMargin
    val file = Files.createTempFile("graft-jdbc-", ".sql")
    Files.writeString(file, script)
    new SqlSubmitAction(file.toString, Map.empty,
      existingSession = Some(spark)).run()

    // the INSERT created TOTALS on the database; read it back raw
    val conn2 = DriverManager.getConnection(url)
    try {
      // Spark's JDBC writer quotes identifiers (case-sensitive lowercase
      // names) and maps strings to CLOB, which Derby can't ORDER BY —
      // sort client-side
      val rs = conn2.createStatement()
        .executeQuery("SELECT \"label\", \"total\" FROM TOTALS")
      val got = Iterator.continually(rs)
        .takeWhile(_.next()).map(r => r.getString(1) -> r.getLong(2))
        .toSeq.sortBy(_._1)
      // k=9 has no dim row (inner join drops); k=2 sums both facts
      assert(got === Seq("one" -> 10L, "two" -> 45L))
    } finally conn2.close()

    // and the sink registered itself as a readable view for later
    // statements of the same script/session
    val back = spark.table("totals").collect()
      .map(r => r.getString(0) -> r.getLong(1)).sortBy(_._1).toSeq
    assert(back === Seq("one" -> 10L, "two" -> 45L))
  }

  test("jdbc sink with a PRIMARY KEY upserts instead of appending") {
    val spark = SparkFixture.spark
    val conn = DriverManager.getConnection(bootUrl)
    try {
      val st = conn.createStatement()
      try st.execute("DROP TABLE TOTUP") catch { case _: Exception => () }
      st.execute("CREATE TABLE TOTUP (K BIGINT PRIMARY KEY, V BIGINT)")
      st.close()
    } finally conn.close()

    val script =
      s"""SET execution.runtime-mode = batch;
         |create table totup(
         |  k bigint, v bigint, primary key (k) not enforced
         |) with (
         |  'connector' = 'jdbc', 'url' = '$url', 'table-name' = 'TOTUP');
         |insert into totup select * from (values (1, 10), (2, 20)) as t(k, v);
         |insert into totup select * from (values (2, 25), (3, 30)) as t(k, v);
         |""".stripMargin
    val file = Files.createTempFile("graft-jdbc-up-", ".sql")
    Files.writeString(file, script)
    new SqlSubmitAction(file.toString, Map.empty,
      existingSession = Some(spark)).run()

    val conn2 = DriverManager.getConnection(url)
    try {
      val rs = conn2.createStatement()
        .executeQuery("SELECT K, V FROM TOTUP ORDER BY K")
      val got = Iterator.continually(rs)
        .takeWhile(_.next()).map(r => r.getLong(1) -> r.getLong(2)).toSeq
      // key 2 was updated in place, not duplicated
      assert(got === Seq(1L -> 10L, 2L -> 25L, 3L -> 30L))
    } finally conn2.close()
  }

  test("upsert batches with repeated keys apply in order: last write wins") {
    val spark = SparkFixture.spark
    val conn = DriverManager.getConnection(bootUrl)
    try {
      val st = conn.createStatement()
      try st.execute("DROP TABLE ORDUP") catch { case _: Exception => () }
      st.execute("CREATE TABLE ORDUP (K BIGINT PRIMARY KEY, V BIGINT)")
      st.close()
    } finally conn.close()

    // one INSERT carrying three versions of key 1 — Flink's upsert sink
    // applies the changelog in order, so 12 (the last) must survive;
    // an arbitrary-survivor dedup could leave 10 or 11
    val script =
      s"""SET execution.runtime-mode = batch;
         |create table ordup(
         |  k bigint, v bigint, primary key (k) not enforced
         |) with (
         |  'connector' = 'jdbc', 'url' = '$url', 'table-name' = 'ORDUP');
         |insert into ordup select * from
         |  (values (1, 10), (2, 20), (1, 11), (1, 12)) as t(k, v);
         |""".stripMargin
    val file = Files.createTempFile("graft-jdbc-ord-", ".sql")
    Files.writeString(file, script)
    new SqlSubmitAction(file.toString, Map.empty,
      existingSession = Some(spark)).run()

    val conn2 = DriverManager.getConnection(url)
    try {
      val rs = conn2.createStatement()
        .executeQuery("SELECT K, V FROM ORDUP ORDER BY K")
      val got = Iterator.continually(rs)
        .takeWhile(_.next()).map(r => r.getLong(1) -> r.getLong(2)).toSeq
      assert(got === Seq(1L -> 12L, 2L -> 20L))
    } finally conn2.close()
  }

  test("bad jdbc configuration fails at DDL time, not on first read") {
    val spark = SparkFixture.spark
    val script =
      s"""SET execution.runtime-mode = batch;
         |create table broken(k bigint) with (
         |  'connector' = 'jdbc', 'url' = 'jdbc:derby:memory:nosuchdb',
         |  'table-name' = 'NOPE');
         |""".stripMargin
    val file = Files.createTempFile("graft-jdbc-bad-", ".sql")
    Files.writeString(file, script)
    val e = intercept[Exception] {
      new SqlSubmitAction(file.toString, Map.empty,
        existingSession = Some(spark)).run()
    }
    // Derby raises a connection error (SQLState 08/XJ), not a
    // missing-table 42xxx — the DDL must propagate it
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage) ++: messages(x.getCause))
    assert(messages(e).exists(m =>
      m.contains("nosuchdb") || m.toLowerCase.contains("not found")))
  }

  test("streaming aggregation into a keyless jdbc sink is rejected") {
    val spark = SparkFixture.spark
    DriverManager.getConnection(bootUrl).close() // db must exist for DDL
    val dir = Files.createTempDirectory("graft-jdbc-rej").toString
    spark.sql("SELECT * FROM VALUES (1L), (2L), (2L) AS t(v)")
      .write.parquet(s"$dir/src")
    // no SET batch: default streaming mode, so the filesystem source
    // reads as a stream and the grouped count produces updates
    val script =
      s"""create table src(v bigint) with (
         |  'connector' = 'filesystem', 'path' = '$dir/src',
         |  'format' = 'parquet');
         |create table agg_sink(v bigint, n bigint) with (
         |  'connector' = 'jdbc', 'url' = '$url', 'table-name' = 'AGGK');
         |insert into agg_sink select v, count(*) as n from src group by v;
         |""".stripMargin
    val file = Files.createTempFile("graft-jdbc-rej-", ".sql")
    Files.writeString(file, script)
    val e = intercept[Exception] {
      new SqlSubmitAction(file.toString, Map.empty,
        existingSession = Some(spark), durationSec = 30).run()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage) ++: messages(x.getCause))
    assert(messages(e).exists(_.contains("PRIMARY KEY")), messages(e).mkString(" | "))
  }

  test("append-only streams with a batch-side aggregate pass the keyless guard") {
    val spark = SparkFixture.spark
    val conn = DriverManager.getConnection(bootUrl)
    try {
      val st = conn.createStatement()
      try st.execute("DROP TABLE DIMAGG") catch { case _: Exception => () }
      try st.execute("DROP TABLE APPOUT") catch { case _: Exception => () }
      st.execute("CREATE TABLE DIMAGG (K BIGINT, V BIGINT)")
      st.execute("INSERT INTO DIMAGG VALUES (1, 5), (1, 9), (2, 4)")
      // pre-created so the read-back below never races the sink's
      // lazy auto-create on a slow first micro-batch
      st.execute("CREATE TABLE APPOUT (\"k\" BIGINT, \"mx\" BIGINT)")
      st.close()
    } finally conn.close()
    val dir = Files.createTempDirectory("graft-jdbc-app").toString
    spark.sql("SELECT * FROM VALUES (1L), (2L), (1L) AS t(k)")
      .write.parquet(s"$dir/src")
    // the jdbc dim side aggregates (GROUP BY), but the STREAM side is a
    // pure append join — Flink accepts this into a keyless JDBC sink
    // and so must the guard (an Aggregate anywhere in the plan is not
    // an updating stream)
    val script =
      s"""create table src(k bigint) with (
         |  'connector' = 'filesystem', 'path' = '$dir/src',
         |  'format' = 'parquet');
         |create table dimagg(k bigint, v bigint) with (
         |  'connector' = 'jdbc', 'url' = '$url', 'table-name' = 'DIMAGG');
         |create table appout(k bigint, mx bigint) with (
         |  'connector' = 'jdbc', 'url' = '$url', 'table-name' = 'APPOUT');
         |insert into appout
         |select s.k, d.mx from src s
         |join (select k, max(v) as mx from dimagg group by k) d
         |on s.k = d.k;
         |""".stripMargin
    val file = Files.createTempFile("graft-jdbc-app-", ".sql")
    Files.writeString(file, script)
    new SqlSubmitAction(file.toString, Map.empty,
      existingSession = Some(spark), durationSec = 60).run()
    val conn2 = DriverManager.getConnection(url)
    try {
      val rs = conn2.createStatement()
        .executeQuery("SELECT \"k\", \"mx\" FROM APPOUT")
      val got = Iterator.continually(rs)
        .takeWhile(_.next()).map(r => r.getLong(1) -> r.getLong(2))
        .toSeq.sorted
      assert(got === Seq(1L -> 9L, 1L -> 9L, 2L -> 4L))
    } finally conn2.close()
  }
}
