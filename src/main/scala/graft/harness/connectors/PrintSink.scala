package graft.harness.connectors

import graft.harness.ddl.TableDef
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}

/** `print` sink connector: console output with a `print-identifier` prefix
  * and optional stderr routing (reference fixture test.sql:40-43).
  *
  * Streaming: a `foreach` writer that prefixes each row, matching Flink's
  * `identifier> row` print format; batch: collect-free `foreachPartition`
  * print. Parallel writers interleave, as they do in Flink's print sink.
  */
object PrintSink {

  private class PrefixWriter(identifier: String, stderr: Boolean)
      extends org.apache.spark.sql.ForeachWriter[Row] {
    @transient private var out: java.io.PrintStream = _
    override def open(partitionId: Long, epochId: Long): Boolean = {
      out = if (stderr) System.err else System.out
      true
    }
    override def process(row: Row): Unit = {
      val body = row.mkString("+I[", ", ", "]")
      if (identifier.nonEmpty) out.println(s"$identifier> $body")
      else out.println(body)
    }
    override def close(errorOrNull: Throwable): Unit = ()
  }

  def writer(df: DataFrame, table: TableDef): DataStreamWriter[Row] = {
    val id = table.options.getOrElse("print-identifier", "")
    val stderr = table.options.get("standard-error").exists(_.toBoolean)
    // sink.parallelism is governed by upstream partitioning in Spark
    df.writeStream
      .outputMode("update")
      .foreach(new PrefixWriter(id, stderr))
  }

  def printBatch(df: DataFrame, table: TableDef): Unit = {
    val id = table.options.getOrElse("print-identifier", "")
    val stderr = table.options.get("standard-error").exists(_.toBoolean)
    df.toLocalIterator().forEachRemaining { row =>
      val body = row.mkString("+I[", ", ", "]")
      val out = if (stderr) System.err else System.out
      if (id.nonEmpty) out.println(s"$id> $body") else out.println(body)
    }
  }
}
