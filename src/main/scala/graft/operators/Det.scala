package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic numeric canonicalization shared by every oracle-checked
  * query.
  *
  * The driver hash-compares our parquet output against DuckDB running the
  * oracle SQL. Floating-point SUM/AVG are order-dependent, and Spark's
  * partial aggregation order is nondeterministic — so any query that sums
  * doubles would be flaky. We quantize each double term to integer
  * hundredths ("cents") with `floor(x*100 + 0.5)` — IEEE double multiply +
  * floor is bit-deterministic and identical in Spark and DuckDB — then sum
  * exact longs and divide once at the end. `SUM(cents)/100.0` is exact in
  * both engines.
  *
  * The DuckDB-side spelling of the same operation is
  * `CAST(FLOOR((expr) * 100 + 0.5) AS BIGINT)`; keep expression trees
  * identical between the Spark column and the oracle SQL so the IEEE
  * operations match 1:1.
  */
object Det {
  /** Quantize a double expression to integer hundredths. */
  def cents(c: Column): Column = floor(c * 100d + 0.5d).cast("long")

  /** Deterministic SUM of a double expression, rendered back as double. */
  def dsum(c: Column): Column = sum(cents(c)) / 100.0d

  /** Deterministic AVG of a double expression, rendered back as double. */
  def davg(c: Column): Column = sum(cents(c)) / 100.0d / count(lit(1))

  /** Oracle-SQL spelling of [[cents]] for embedding in DuckDB SQL. */
  def centsSql(expr: String): String =
    s"CAST(FLOOR(($expr) * 100 + 0.5) AS BIGINT)"

  /** Oracle-SQL spelling of [[dsum]]. */
  def dsumSql(expr: String): String = s"SUM(${centsSql(expr)}) / 100.0"

  /** Oracle-SQL spelling of [[davg]]. */
  def davgSql(expr: String): String =
    s"SUM(${centsSql(expr)}) / 100.0 / COUNT(*)"
}
