package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Output wrapper: the Bloom filter's bit array as 64-bit words (a
  * product encoder keeps the column a plain `array<bigint>` struct
  * field, readable by `element_at` bit tests — kryo would make it an
  * opaque binary).
  */
case class BloomWords(words: Seq[Long])

/** Fixed-width Bloom bit-mask collector — the bounded-memory
  * membership sketch behind [[graft.operators.Curation]]'s
  * `ext_bloom_screen`.
  *
  * The exact membership alternative (a distinct-fingerprint join)
  * shuffles state proportional to corpus size; this buffer is
  * `bits/64` longs REGARDLESS of input count — at 100 TB the sketch
  * for a billion-document corpus at 10 bits/doc is ~1.2 GB broadcast
  * once, vs a shuffle join against the corpus on every incoming
  * batch. Partial aggregation applies (ScalaAggregator →
  * ObjectHashAggregate), so each partition ORs its own fixed-width
  * mask before the single-row shuffle.
  *
  * Bit-set order never matters: OR is commutative/associative/
  * idempotent, so any reduce/merge interleaving yields the same mask.
  * Input rows are BIT POSITIONS (already `% bits`); the caller
  * derives the k positions per key so the hash family stays in one
  * place next to its DuckDB mirror.
  */
final class BloomMask(bits: Int)
    extends Aggregator[Long, Array[Long], BloomWords] {
  require(bits > 0 && bits % 64 == 0,
    s"bloom mask width must be a positive multiple of 64, got $bits")

  override def zero: Array[Long] = new Array[Long](bits / 64)

  override def reduce(b: Array[Long], pos: Long): Array[Long] = {
    require(pos >= 0 && pos < bits,
      s"bloom bit position $pos out of range [0, $bits)")
    b((pos / 64).toInt) |= 1L << (pos % 64).toInt
    b
  }

  override def merge(x: Array[Long], y: Array[Long]): Array[Long] = {
    var i = 0
    while (i < x.length) { x(i) |= y(i); i += 1 }
    x
  }

  override def finish(r: Array[Long]): BloomWords =
    BloomWords(r.toSeq)

  override def bufferEncoder: Encoder[Array[Long]] =
    Encoders.kryo[Array[Long]]
  override def outputEncoder: Encoder[BloomWords] =
    Encoders.product[BloomWords]
}
