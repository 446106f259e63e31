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
  *
  * Changelog row kinds: Flink's print sink labels retract-stream rows
  * +I/-U/+U. Spark's update mode emits only the new row per changed
  * group, so when the sink DDL declares a PRIMARY KEY (the upsert key),
  * the writer tracks the last row per key and emits the Flink-style
  * `-U[old]` / `+U[new]` pair on updates. Update-mode output keeps a
  * stable hash partitioning per key across micro-batches, so the
  * per-partition map sees every version of its keys. Without a declared
  * key the old value is unknowable at the sink and rows print as +I —
  * a documented deviation from Flink's planner-provided changelog.
  */
object PrintSink {

  // ForeachWriter instances are re-deserialized every micro-batch, so
  // upsert state must outlive them: one map per (writer instance,
  // partition), held JVM-global on the executor. The writerId is minted
  // per writer() call, so two sinks sharing an identifier — or two runs
  // of the same script — never cross-contaminate. Update-mode
  // *aggregation* output hash-partitions by group key consistently
  // across batches, so each partition's map sees every version of its
  // keys; for non-keyed update streams (no aggregation) the same key
  // can land on different partitions and row kinds degrade to +I per
  // partition — the upsert-key contract assumes keyed output, as in
  // Flink. Size is bounded by key cardinality per query — and across
  // queries by writer-granularity eviction: the state is executor-local
  // so no driver-side hook can free it when a query stops
  // (ForeachWriter.close fires per micro-batch, not per query), so the
  // sink instead keeps state for at most MaxWriters recently-opened
  // writers and drops the least-recently-opened beyond that. A live
  // query reopens its writer every micro-batch and is never evicted; a
  // long-lived JVM running many scripts stays flat.
  private val upsertState = new java.util.concurrent.ConcurrentHashMap[
    (String, Long), scala.collection.mutable.HashMap[Seq[Any], Row]]
  private val MaxWriters = 64
  private val lastOpened =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]

  private def touchAndEvict(writerId: String): Unit = {
    lastOpened.put(writerId, System.nanoTime())
    if (lastOpened.size > MaxWriters) lastOpened.synchronized {
      while (lastOpened.size > MaxWriters) {
        var oldest: String = null
        var oldestAt = Long.MaxValue
        lastOpened.forEach { (id, at) =>
          if (at < oldestAt) { oldest = id; oldestAt = at }
        }
        lastOpened.remove(oldest)
        upsertState.keySet().removeIf(_._1 == oldest): Unit
        // with 64+ CONCURRENTLY live keyed print queries this evicts a
        // running writer's state and its next update prints +I instead
        // of -U/+U — say so rather than degrade silently
        System.err.println(
          s"print sink: evicted upsert state of writer $oldest " +
            s"(more than $MaxWriters keyed print writers); if it is " +
            "still running, its row kinds degrade to +I")
      }
    }
  }

  private[connectors] class PrefixWriter(
      identifier: String, stderr: Boolean, pkIdx: Seq[Int],
      writerId: String = java.util.UUID.randomUUID().toString)
      extends org.apache.spark.sql.ForeachWriter[Row] {
    @transient private var out: java.io.PrintStream = _
    @transient private var last: scala.collection.mutable.HashMap[Seq[Any], Row] = _
    override def open(partitionId: Long, epochId: Long): Boolean = {
      out = if (stderr) System.err else System.out
      if (pkIdx.nonEmpty) {
        touchAndEvict(writerId)
        last = upsertState.computeIfAbsent((writerId, partitionId),
          _ => scala.collection.mutable.HashMap.empty)
      }
      true
    }
    private def emit(kind: String, row: Row): Unit = {
      val body = row.mkString(s"$kind[", ", ", "]")
      if (identifier.nonEmpty) out.println(s"$identifier> $body")
      else out.println(body)
    }
    override def process(row: Row): Unit =
      if (pkIdx.isEmpty) emit("+I", row)
      else {
        val key = pkIdx.map(row.get)
        last.synchronized {
          last.put(key, row)
        } match {
          case Some(old) => emit("-U", old); emit("+U", row)
          case None => emit("+I", row)
        }
      }
    override def close(errorOrNull: Throwable): Unit = ()
  }

  def writer(df: DataFrame, table: TableDef): DataStreamWriter[Row] = {
    val id = table.options.getOrElse("print-identifier", "")
    val stderr = table.options.get("standard-error").exists(_.toBoolean)
    // the INSERT maps query columns to sink columns positionally
    // (Flink semantics), so PK indices come from the sink DDL's column
    // order, never from the query's output names
    val pkIdx = table.primaryKey.flatMap { pk =>
      val i = table.columns.indexWhere(_.name.equalsIgnoreCase(pk))
      if (i >= 0 && i < df.schema.length) Some(i)
      else {
        System.err.println(
          s"print sink '${table.name}': PRIMARY KEY column '$pk' not in " +
            "sink schema; changelog row kinds disabled")
        None
      }
    }
    // sink.parallelism is governed by upstream partitioning in Spark
    df.writeStream
      .outputMode("update")
      .foreach(new PrefixWriter(id, stderr,
        if (pkIdx.length == table.primaryKey.length) pkIdx else Nil))
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
