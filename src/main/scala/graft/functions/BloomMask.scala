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

object BloomMask {
  /** SQL array expression of the k affine bit positions of `fpExpr`
    * over a `bits`-wide mask — THE hash family (`(a_j·fp + b_j) mod P
    * mod bits` over [[TextHash]]'s constants), shared by the batch
    * screen, the streaming probe, and constant-for-constant by the
    * DuckDB oracle mirror. All intermediates stay under 2^63
    * (a, fp < P ≈ 2^30).
    */
  def positionsExpr(fpExpr: String, bits: Long, k: Int): String =
    (0 until k).map(j =>
      s"((${TextHash.a(j)}L * ($fpExpr) + ${TextHash.b(j)}L) " +
        s"% ${TextHash.P}L) % ${bits}L")
      .mkString("array(", ", ", ")")

  /** SQL predicate: all k affine positions of `fpExpr` are set in the
    * word array `wordsExpr` (array<bigint>, 1-based element_at) — the
    * map-side membership test of a built mask, UNROLLED per position
    * so the whole test stays inside whole-stage codegen (no
    * higher-order function in the hot path).
    */
  def memberExpr(fpExpr: String, bits: Long, k: Int,
      wordsExpr: String): String =
    (0 until k).map { j =>
      val pos = s"(((${TextHash.a(j)}L * ($fpExpr) + ${TextHash.b(j)}L) " +
        s"% ${TextHash.P}L) % ${bits}L)"
      s"((shiftright(element_at($wordsExpr, CAST($pos div 64 AS INT) + 1), " +
        s"CAST($pos % 64 AS INT)) & 1L) = 1L)"
    }.mkString("(", " AND ", ")")
}
