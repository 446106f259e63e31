package graft.harness

import java.nio.file.Files
import graft.SparkFixture
import graft.harness.TemporalJoin.VersionMeta
import org.scalatest.funsuite.AnyFunSuite

/** The Flink `FOR SYSTEM_TIME AS OF` surface: text rewrite unit cases
  * plus an end-to-end temporal-join script through `sql-submit` with the
  * versioned table's time attribute and primary key taken from its DDL.
  */
class TemporalJoinSpec extends AnyFunSuite {

  private val attr = Map("rates" -> VersionMeta("rt", Seq("k"))).get _

  test("inner temporal join becomes an interval-ized version join") {
    val sql = "SELECT o.k, r.rate FROM orders o " +
      "JOIN rates FOR SYSTEM_TIME AS OF o.ot AS r ON r.k = o.k WHERE o.k > 0"
    val out = TemporalJoin.rewrite(sql, attr)
    assert(out.contains(
      "JOIN (SELECT *, rt AS __vstart, " +
        "LEAD(rt) OVER (PARTITION BY k ORDER BY rt) AS __vend " +
        "FROM rates) AS r " +
        "ON (r.k = o.k) AND o.ot >= r.__vstart " +
        "AND (r.__vend IS NULL OR o.ot < r.__vend)"))
    // the trailing clause must survive untouched
    assert(out.endsWith("WHERE o.k > 0"))
  }

  test("LEFT JOIN keeps unmatched left rows; AS keyword optional") {
    val sql = "SELECT * FROM o LEFT JOIN rates FOR SYSTEM_TIME AS OF o.t r " +
      "ON r.k = o.k"
    val out = TemporalJoin.rewrite(sql, attr)
    assert(out.contains("LEFT OUTER JOIN (SELECT *, rt AS __vstart"))
    assert(out.contains("(r.__vend IS NULL OR o.t < r.__vend)"))
  }

  test("ON scan stops at the next join; both temporal joins rewrite") {
    val sql = "SELECT * FROM o " +
      "JOIN rates FOR SYSTEM_TIME AS OF o.t AS r ON r.k = o.k " +
      "JOIN rates FOR SYSTEM_TIME AS OF o.t AS r2 ON r2.k = o.k2"
    val out = TemporalJoin.rewrite(sql, attr)
    assert(!TemporalJoin.hasTemporalJoin(out))
    assert(out.contains("ON (r.k = o.k) AND"))
    assert(out.contains("ON (r2.k = o.k2) AND"))
  }

  test("alias-free temporal join addresses the version table by name") {
    val sql = "SELECT o.k, rates.rate FROM o " +
      "JOIN rates FOR SYSTEM_TIME AS OF o.t ON rates.k = o.k"
    val out = TemporalJoin.rewrite(sql, attr)
    assert(out.contains("FROM rates) AS rates ON (rates.k = o.k) AND"))
    assert(!TemporalJoin.hasTemporalJoin(out))
  }

  test("SELECT alias.* hides the interval helper columns") {
    val sql = "SELECT o.k, r.* FROM orders o " +
      "JOIN rates FOR SYSTEM_TIME AS OF o.ot AS r ON r.k = o.k"
    val out = TemporalJoin.rewrite(sql, attr)
    assert(out.contains("r.* EXCEPT (__vstart, __vend)"))
    // the version subquery's own star and qualified references survive
    assert(out.contains("(SELECT *, rt AS __vstart"))
    assert(out.contains("o.ot >= r.__vstart"))
  }

  test("unmatched FOR SYSTEM_TIME forms are rejected, never leaked") {
    // AS OF PROCTIME() is not a column reference — JoinRe skips it; the
    // residual check must fail with the contract instead of leaking
    // Flink syntax into Spark's parser
    val e = intercept[IllegalArgumentException] {
      TemporalJoin.rewrite(
        "SELECT * FROM o JOIN rates FOR SYSTEM_TIME AS OF PROCTIME() AS r " +
          "ON r.k = o.k", attr)
    }
    assert(e.getMessage.contains("Unsupported FOR SYSTEM_TIME"))
  }

  test("alias-free over a qualified table is rejected (alias required)") {
    val e = intercept[IllegalArgumentException] {
      TemporalJoin.rewrite(
        "SELECT * FROM o JOIN db.rates FOR SYSTEM_TIME AS OF o.t ON db.rates.k = o.k",
        _ => Some(VersionMeta("rt", Seq("k"))))
    }
    assert(e.getMessage.contains("requires an alias"))
  }

  test("e2e: streaming-mode temporal join is rejected with the batch-only contract") {
    val spark = SparkFixture.spark
    val script =
      s"""create table src(
         |  k bigint, ts timestamp(3),
         |  watermark for ts as ts - interval '1' second
         |) with ('connector' = 'datagen');
         |select * from src join src for system_time as of src.ts as v
         |  on v.k = src.k;
         |""".stripMargin
    val file = Files.createTempFile("graft-tj-stream-", ".sql")
    Files.writeString(file, script)
    val e = intercept[Exception] {
      new SqlSubmitAction(file.toString, Map.empty,
        existingSession = Some(spark), durationSec = 5).run()
    }
    // wrapped per-statement; the cause carries the contract message
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage) ++: messages(x.getCause))
    assert(messages(e).exists(_.contains("batch runtime mode")))
  }

  test("temporal join inside a CTE stops the ON scan at the closing paren") {
    val sql = "WITH x AS (SELECT o.k, r.rate FROM o " +
      "JOIN rates FOR SYSTEM_TIME AS OF o.t AS r ON r.k = o.k) " +
      "SELECT * FROM x WHERE k > 0"
    val out = TemporalJoin.rewrite(sql, attr)
    // the rewrite must stay inside the CTE body
    assert(out.contains("(r.__vend IS NULL OR o.t < r.__vend) ) SELECT * FROM x"))
    assert(out.endsWith("WHERE k > 0"))
  }

  test("qualified columns named like clause keywords do not cut the ON scan") {
    val sql = "SELECT * FROM o " +
      "JOIN rates FOR SYSTEM_TIME AS OF o.t AS r ON r.k = o.left AND r.g = o.order"
    val out = TemporalJoin.rewrite(sql, attr)
    assert(out.contains("ON (r.k = o.left AND r.g = o.order) AND"))
  }

  test("RIGHT/FULL temporal joins are rejected like Flink rejects them") {
    val e = intercept[IllegalArgumentException] {
      TemporalJoin.rewrite(
        "SELECT * FROM o RIGHT JOIN rates FOR SYSTEM_TIME AS OF o.t AS r ON r.k = o.k",
        attr)
    }
    assert(e.getMessage.contains("RIGHT"))
  }

  test("tables without time attribute or primary key are rejected") {
    val noTime = intercept[IllegalArgumentException] {
      TemporalJoin.rewrite(
        "SELECT * FROM o JOIN x FOR SYSTEM_TIME AS OF o.t AS r ON r.k = o.k",
        _ => None)
    }
    assert(noTime.getMessage.contains("WATERMARK"))
    val noPk = intercept[IllegalArgumentException] {
      TemporalJoin.rewrite(
        "SELECT * FROM o JOIN x FOR SYSTEM_TIME AS OF o.t AS r ON r.k = o.k",
        _ => Some(VersionMeta("ts", Seq.empty)))
    }
    assert(noPk.getMessage.contains("PRIMARY KEY"))
  }

  test("property: random ON conditions survive the scan; tails stay intact") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val col: Gen[String] = for {
      t <- Gen.oneOf("o", "r")
      // include keyword-named columns: qualified refs must never cut the scan
      c <- Gen.oneOf("k", "v", "left", "order", "group_x")
    } yield s"$t.$c"
    val atom: Gen[String] = for {
      a <- col
      op <- Gen.oneOf("=", "<", ">=", "<>")
      b <- Gen.oneOf(col, Gen.oneOf("5", "'ab'", "'a''b'", "3.5"))
    } yield s"$a $op $b"
    val parened: Gen[String] = for {
      x <- atom; y <- atom; j <- Gen.oneOf("AND", "OR")
    } yield s"($x $j $y)"
    val cond: Gen[String] = Gen.choose(1, 4).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf(atom, parened)).map(_.mkString(" AND ")))
    val tail: Gen[String] = Gen.oneOf(
      "", "WHERE o.z > 1", "GROUP BY o.z", "ORDER BY o.z", "LIMIT 5",
      "JOIN t2 ON t2.a = o.a")
    val prop = Prop.forAll(cond, tail) { (c, t) =>
      val sql = s"SELECT * FROM o JOIN rates FOR SYSTEM_TIME AS OF o.t AS r ON $c" +
        (if (t.isEmpty) "" else s" $t")
      val out = TemporalJoin.rewrite(sql, attr)
      out.contains(s"ON ($c)") && (t.isEmpty || out.endsWith(t)) &&
        !TemporalJoin.hasTemporalJoin(out)
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, res.status.toString)
  }

  test("e2e: temporal-join script runs through sql-submit") {
    val spark = SparkFixture.spark
    val dir = Files.createTempDirectory("graft-tj").toString
    spark.sql(
      """SELECT * FROM VALUES
        |  (1L, TIMESTAMP'2024-01-01 00:00:15'),
        |  (1L, TIMESTAMP'2024-01-01 00:00:25'),
        |  (2L, TIMESTAMP'2024-01-01 00:00:15')
        |AS t(k, ot)""".stripMargin).write.parquet(s"$dir/orders")
    spark.sql(
      """SELECT * FROM VALUES
        |  (1L, 100L, TIMESTAMP'2024-01-01 00:00:10'),
        |  (1L, 200L, TIMESTAMP'2024-01-01 00:00:20')
        |AS t(k, rate, rt)""".stripMargin).write.parquet(s"$dir/rates")
    val script =
      s"""SET execution.runtime-mode = batch;
         |create table orders(k bigint, ot timestamp(3)) with (
         |  'connector' = 'filesystem', 'path' = '$dir/orders',
         |  'format' = 'parquet');
         |create table rates(
         |  k bigint, rate bigint, rt timestamp(3),
         |  primary key (k) not enforced,
         |  watermark for rt as rt - interval '1' second
         |) with (
         |  'connector' = 'filesystem', 'path' = '$dir/rates',
         |  'format' = 'parquet');
         |create table joined(k bigint, rate bigint) with (
         |  'connector' = 'filesystem', 'path' = '$dir/joined',
         |  'format' = 'parquet');
         |insert into joined
         |select o.k, r.rate from orders o
         |join rates for system_time as of o.ot as r on r.k = o.k;
         |""".stripMargin
    val file = Files.createTempFile("graft-tj-", ".sql")
    Files.writeString(file, script)
    new SqlSubmitAction(file.toString, Map.empty,
      existingSession = Some(spark)).run()
    val got = spark.read.parquet(s"$dir/joined")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).sorted.toSeq
    // order@15 sees the rate as of :10; order@25 the rate as of :20;
    // k=2 has no version and the inner temporal join drops it
    assert(got === Seq(1L -> 100L, 1L -> 200L))
  }
}
