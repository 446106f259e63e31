package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** One scored candidate: quantized cosine (micros) + document id. */
case class Scored(cos_micros: Long, corpus_id: Long)

/** Product wrapper so the aggregate's output is a plain SQL
  * `struct<top: array<struct<...>>>` (Encoders.product handles Seq
  * fields; a bare Seq output would need a catalyst encoder).
  */
case class ScoredList(top: Seq[Scored])

/** Typed top-k aggregate with state bounded by k, not by group size:
  * the buffer is a rank-sorted vector (cosine descending, corpus id
  * ascending — the deterministic ANN ordering) trimmed to k on every
  * insert and merge. Replaces the `collect_list` + sort/slice shape,
  * whose state grows with the inverted-list (group) size — at 100 TB a
  * hot cluster's list is unbounded, a size-k heap is not. Partial
  * aggregation applies: partitions pre-trim to k before the shuffle,
  * so at most k rows per group per partition move.
  *
  * Insertion is linear in k (k is a user-facing top-k, tens not
  * millions), keeping the buffer always sorted so `finish` is free.
  */
final class TopKByScore(k: Int)
    extends Aggregator[Scored, Vector[Scored], ScoredList] {
  require(k > 0, s"top-k needs k > 0, got $k")

  /** Rank order: higher cosine first, then smaller corpus id. */
  private def outranks(a: Scored, b: Scored): Boolean =
    a.cos_micros > b.cos_micros ||
      (a.cos_micros == b.cos_micros && a.corpus_id < b.corpus_id)

  private def insert(b: Vector[Scored], a: Scored): Vector[Scored] =
    if (b.length == k && !outranks(a, b.last)) b
    else {
      val i = b.indexWhere(outranks(a, _)) match {
        case -1 => b.length
        case at => at
      }
      b.patch(i, Seq(a), 0).take(k)
    }

  override def zero: Vector[Scored] = Vector.empty
  override def reduce(b: Vector[Scored], a: Scored): Vector[Scored] =
    insert(b, a)
  override def merge(b1: Vector[Scored], b2: Vector[Scored]): Vector[Scored] =
    b2.foldLeft(b1)(insert)
  override def finish(reduction: Vector[Scored]): ScoredList =
    ScoredList(reduction)
  override def bufferEncoder: Encoder[Vector[Scored]] =
    Encoders.kryo[Vector[Scored]]
  override def outputEncoder: Encoder[ScoredList] =
    Encoders.product[ScoredList]
}
