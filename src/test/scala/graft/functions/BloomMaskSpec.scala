package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** [[BloomMask]] buffer semantics, exercised DIRECTLY (reduce/merge
  * interleavings never depend on partitioning) plus the end-to-end
  * screen decision on a corpus small enough to hand-verify, with the
  * false-positive path forced by a deliberately tiny mask.
  */
class BloomMaskSpec extends AnyFunSuite {

  private def maskOf(bits: Int, positions: Seq[Long]): Array[Long] = {
    val m = new BloomMask(bits)
    positions.foldLeft(m.zero)(m.reduce)
  }

  private def bit(words: Array[Long], pos: Long): Boolean =
    ((words((pos / 64).toInt) >> (pos % 64).toInt) & 1L) == 1L

  test("reduce sets exactly the given bits; order and repeats are free") {
    val m = new BloomMask(128)
    val a = maskOf(128, Seq(0L, 63L, 64L, 127L, 63L))
    val b = maskOf(128, Seq(127L, 64L, 63L, 0L))
    assert(a.toSeq === b.toSeq)
    assert(Seq(0L, 63L, 64L, 127L).forall(bit(a, _)))
    assert(!bit(a, 1L) && !bit(a, 62L) && !bit(a, 65L) && !bit(a, 126L))
    assert(m.finish(a).words.length === 2)
  }

  test("merge is OR: associative, commutative, idempotent across splits") {
    val m = new BloomMask(256)
    val all = Seq(3L, 77L, 129L, 200L, 255L)
    val whole = maskOf(256, all).toSeq
    // every 2-way split of the positions merges to the same mask
    for (k <- 0 to all.length) {
      val (l, r) = all.splitAt(k)
      val merged = m.merge(maskOf(256, l), maskOf(256, r))
      assert(merged.toSeq === whole, s"split at $k")
    }
    // merging a mask with itself changes nothing
    val self = m.merge(maskOf(256, all), maskOf(256, all))
    assert(self.toSeq === whole)
  }

  test("width contract: multiple of 64, positions range-checked") {
    intercept[IllegalArgumentException](new BloomMask(100))
    intercept[IllegalArgumentException](new BloomMask(0))
    val m = new BloomMask(64)
    intercept[IllegalArgumentException](m.reduce(m.zero, 64L))
    intercept[IllegalArgumentException](m.reduce(m.zero, -1L))
  }

  test("screen decisions: hit iff ALL k positions set; tiny mask forces a FP") {
    // model the query's predicate directly: k=3 affine positions over
    // a 64-bit mask (tiny on purpose), corpus of two keys
    val bits = 64L
    def ps(fp: Long): Seq[Long] = (0 until 3).map(j =>
      ((TextHash.a(j) * fp + TextHash.b(j)) % TextHash.P) % bits)
    val corpus = Seq(1001L, 2002L)
    val mask = maskOf(64, corpus.flatMap(ps))
    def hit(fp: Long): Boolean = ps(fp).forall(bit(mask, _))
    // true members always hit (no false negatives, ever)
    assert(corpus.forall(hit))
    // with 6 set bits of 64, some non-member in a small scan collides
    // on all 3 positions (deterministic: same constants every run)
    val nonMembers = (1L to 5000L).filterNot(corpus.contains)
    val fps = nonMembers.filter(hit)
    assert(fps.nonEmpty, "expected at least one false positive")
    // and at least one non-member misses (the screen does screen)
    assert(nonMembers.exists(fp => !hit(fp)))
  }
}
