package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** One inverted-index posting: a document id carrying its shingle-set
  * size (the Jaccard denominator component rides with the posting so
  * pair expansion never joins back to the corpus).
  */
case class Posting(doc_id: Long, sz: Long)

/** Aggregation buffer: at most cap+1 postings plus the TRUE document
  * frequency (which keeps counting past the cap).
  */
case class PostingBuf(items: Vector[Posting], df: Long)

/** Output: `ds` is the COMPLETE posting list iff `df <= cap` (else
  * empty — the row is about to be dropped and cap+1 postings of dead
  * weight must not ship out of the final aggregation), and `df` is the
  * true document frequency for the filter and the drop accounting.
  */
case class PostingList(ds: Seq[Posting], df: Long)

/** Document-frequency-capped posting-list collector — the scale guard
  * of the inverted-index pair-expansion paths ([[graft.operators.Dedup]]).
  *
  * `collect_list` state grows with a shingle's document frequency: a
  * boilerplate shingle (license header, templated text) shared by
  * millions of documents turns one aggregation buffer into gigabytes
  * and its pair expansion quadratic. This buffer is bounded at cap+1
  * postings — one past the cap proves overflow, the true df keeps
  * counting — so hot shingles DEGRADE (their row is filtered and
  * counted) instead of OOMing the aggregate or tripping the
  * graft_doc_pairs expansion guard. Partial aggregation applies
  * (ScalaAggregator → ObjectHashAggregate), so every partition's
  * pre-shuffle state is equally bounded.
  *
  * Truncation order-dependence is harmless: a truncated list is only
  * ever emitted as empty (df > cap ⇒ `finish` discards the prefix),
  * and an untruncated one (df <= cap) holds every posting regardless
  * of merge order.
  */
final class CappedPostings(cap: Int)
    extends Aggregator[Posting, PostingBuf, PostingList] {
  require(cap > 0, s"df cap must be positive, got $cap")
  private val keep = cap + 1

  override def zero: PostingBuf = PostingBuf(Vector.empty, 0L)

  override def reduce(b: PostingBuf, a: Posting): PostingBuf =
    PostingBuf(if (b.items.length < keep) b.items :+ a else b.items,
      b.df + 1L)

  override def merge(x: PostingBuf, y: PostingBuf): PostingBuf =
    PostingBuf(
      if (x.items.length >= keep) x.items
      else (x.items ++ y.items).take(keep),
      x.df + y.df)

  override def finish(r: PostingBuf): PostingList =
    PostingList(if (r.df <= cap) r.items else Vector.empty, r.df)

  override def bufferEncoder: Encoder[PostingBuf] =
    Encoders.kryo[PostingBuf]
  override def outputEncoder: Encoder[PostingList] =
    Encoders.product[PostingList]
}
