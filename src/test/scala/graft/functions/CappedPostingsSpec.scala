package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** Direct Aggregator-contract tests for [[CappedPostings]]' truncation
  * path — the cap-overflow semantics no oracle run exercises at small
  * SF (max df at sf0.01 is far below the default cap): a buffer is
  * bounded at cap+1 postings while the true df keeps counting, merge
  * must stay bounded and order-insensitive IN ITS OUTPUT, and finish
  * must emit the complete list iff df <= cap and an empty one
  * otherwise.
  */
class CappedPostingsSpec extends AnyFunSuite {

  private def posting(i: Int) = Posting(i.toLong, 10L + i)

  private def agg(cap: Int) = new CappedPostings(cap)

  /** Fold a partition's postings through reduce. */
  private def part(a: CappedPostings, ps: Seq[Posting]): PostingBuf =
    ps.foldLeft(a.zero)(a.reduce)

  test("reduce bounds the buffer at cap+1 while df keeps counting") {
    val a = agg(3)
    val buf = part(a, (1 to 10).map(posting))
    assert(buf.items.length == 4) // cap + 1 proves overflow
    assert(buf.df == 10L)         // the TRUE df, past the cap
  }

  test("finish at df == cap emits the complete list") {
    val a = agg(5)
    val out = a.finish(part(a, (1 to 5).map(posting)))
    assert(out.df == 5L)
    assert(out.ds.toSet == (1 to 5).map(posting).toSet)
  }

  test("finish at df == cap+1 emits empty with the true df") {
    val a = agg(5)
    val out = a.finish(part(a, (1 to 6).map(posting)))
    assert(out.df == 6L)
    assert(out.ds.isEmpty)
  }

  test("finish of the zero buffer is empty with df 0") {
    val a = agg(3)
    val out = a.finish(a.zero)
    assert(out.df == 0L && out.ds.isEmpty)
  }

  test("merge keeps the buffer bounded when either side is saturated") {
    val a = agg(2)
    val full = part(a, (1 to 5).map(posting))   // saturated: 3 items, df 5
    val small = part(a, Seq(posting(9)))        // 1 item, df 1
    for (m <- Seq(a.merge(full, small), a.merge(small, full))) {
      assert(m.items.length <= 3)
      assert(m.df == 6L)
      assert(a.finish(m).ds.isEmpty) // df 6 > cap 2
    }
  }

  test("merge at exactly the cap boundary, split across partitions") {
    val a = agg(4)
    val ps = (1 to 4).map(posting)
    // every 2-way split of 4 postings, both merge orders
    for (k <- 0 to 4) {
      val (l, r) = ps.splitAt(k)
      for (m <- Seq(a.merge(part(a, l), part(a, r)),
                    a.merge(part(a, r), part(a, l)))) {
        assert(m.df == 4L)
        val out = a.finish(m)
        assert(out.ds.toSet == ps.toSet,
          s"split at $k lost postings: ${out.ds}")
      }
    }
  }

  test("one-over-cap split across partitions finishes empty either order") {
    val a = agg(4)
    val ps = (1 to 5).map(posting)
    for (k <- 0 to 5) {
      val (l, r) = ps.splitAt(k)
      for (m <- Seq(a.merge(part(a, l), part(a, r)),
                    a.merge(part(a, r), part(a, l)))) {
        assert(m.df == 5L)
        assert(a.finish(m).ds.isEmpty, s"split at $k leaked a hot list")
      }
    }
  }

  test("randomized: any partitioning and merge order yields the same output") {
    val rnd = new scala.util.Random(41)
    val a = agg(8)
    for (trial <- 1 to 50) {
      val n = 1 + rnd.nextInt(20)
      val ps = (1 to n).map(posting)
      // random partitioning into 1..5 partitions
      val parts = ps.groupBy(_ => rnd.nextInt(1 + rnd.nextInt(5))).values.toList
      val bufs = rnd.shuffle(parts.map(p => part(a, p)))
      val merged = bufs.reduce(a.merge)
      val out = a.finish(merged)
      assert(out.df == n.toLong, s"trial $trial df")
      if (n <= 8) assert(out.ds.toSet == ps.toSet, s"trial $trial complete list")
      else assert(out.ds.isEmpty, s"trial $trial hot list must be empty")
      assert(merged.items.length <= 9, s"trial $trial unbounded buffer")
    }
  }
}
