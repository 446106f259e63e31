package graft.harness.connectors

import java.io.{ByteArrayOutputStream, PrintStream}
import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

/** Flink changelog row kinds on the print sink: with a declared upsert
  * key, the first version of a key prints +I and each update prints the
  * -U[old] / +U[new] pair — surviving writer re-instantiation across
  * micro-batches (Spark deserializes a fresh ForeachWriter per epoch).
  */
class PrintSinkSpec extends AnyFunSuite {

  test("primary-key print sink emits +I then -U/+U across epochs") {
    val bos = new ByteArrayOutputStream
    val old = System.out
    System.setOut(new PrintStream(bos, true))
    try {
      // Spark deserializes copies of ONE serialized writer per epoch:
      // the writerId field rides along, so two instances sharing it
      // model epoch 0 and epoch 1 of the same query
      val w = new PrintSink.PrefixWriter("pk_spec", stderr = false,
        pkIdx = Seq(0), writerId = "pk_spec_run")
      w.open(partitionId = 0, epochId = 0)
      w.process(Row("a", 1L))
      w.process(Row("b", 1L))
      // next micro-batch: a NEW writer instance, same partition
      val w2 = new PrintSink.PrefixWriter("pk_spec", stderr = false,
        pkIdx = Seq(0), writerId = "pk_spec_run")
      w2.open(partitionId = 0, epochId = 1)
      w2.process(Row("a", 2L))
    } finally System.setOut(old)
    val lines = bos.toString.trim.linesIterator.toSeq
    assert(lines == Seq(
      "pk_spec> +I[a, 1]",
      "pk_spec> +I[b, 1]",
      "pk_spec> -U[a, 1]",
      "pk_spec> +U[a, 2]"))
  }

  test("upsert state is evicted at writer granularity, never for live writers") {
    val bos = new ByteArrayOutputStream
    val old = System.out
    System.setOut(new PrintStream(bos, true))
    try {
      val live = new PrintSink.PrefixWriter("evict_spec", stderr = false,
        pkIdx = Seq(0), writerId = "evict_live")
      live.open(0, 0)
      live.process(Row("a", 1L))
      // 80 other writers churn through — more than the retention cap —
      // but the live writer reopens in between (every micro-batch does)
      (1 to 80).foreach { i =>
        val w = new PrintSink.PrefixWriter("evict_spec", stderr = false,
          pkIdx = Seq(0), writerId = s"evict_churn_$i")
        w.open(0, 0)
        w.process(Row("x", i.toLong))
        if (i % 10 == 0) { // live query's next micro-batches
          val l = new PrintSink.PrefixWriter("evict_spec", stderr = false,
            pkIdx = Seq(0), writerId = "evict_live")
          l.open(0, i.toLong)
        }
      }
      // the live writer's state survived the churn: an update still
      // prints the -U/+U pair, not a fresh +I
      val l = new PrintSink.PrefixWriter("evict_spec", stderr = false,
        pkIdx = Seq(0), writerId = "evict_live")
      l.open(0, 99)
      l.process(Row("a", 2L))
    } finally System.setOut(old)
    val lines = bos.toString.trim.linesIterator.toSeq
    assert(lines.contains("evict_spec> -U[a, 1]"))
    assert(lines.contains("evict_spec> +U[a, 2]"))
    // and an evicted early churn writer restarts from +I if it reopens
    val bos2 = new ByteArrayOutputStream
    System.setOut(new PrintStream(bos2, true))
    try {
      val w = new PrintSink.PrefixWriter("evict_spec", stderr = false,
        pkIdx = Seq(0), writerId = "evict_churn_1")
      w.open(0, 1)
      w.process(Row("x", 9L)) // state gone → +I, the documented degrade
    } finally System.setOut(old)
    assert(bos2.toString.trim.linesIterator.toSeq ==
      Seq("evict_spec> +I[x, 9]"))
  }

  test("without a primary key every row prints as +I (documented deviation)") {
    val bos = new ByteArrayOutputStream
    val old = System.out
    System.setOut(new PrintStream(bos, true))
    try {
      val w = new PrintSink.PrefixWriter("no_pk_spec", stderr = false, pkIdx = Nil)
      w.open(0, 0)
      w.process(Row("a", 1L))
      w.process(Row("a", 2L))
    } finally System.setOut(old)
    assert(bos.toString.trim.linesIterator.toSeq ==
      Seq("no_pk_spec> +I[a, 1]", "no_pk_spec> +I[a, 2]"))
  }
}
