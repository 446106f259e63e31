package graft.operators

import graft.SparkFixture
import org.scalatest.funsuite.AnyFunSuite

/** Connected components on known graphs: the label propagation must
  * find min-reachable ids across chains (multi-round convergence), keep
  * disjoint components apart, and survive an empty edge set.
  */
class GraphSpec extends AnyFunSuite {

  private def cc(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val spark = SparkFixture.spark
    import spark.implicits._
    Graph.connectedComponents(edges.toDF("src", "dst"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("chain collapses to one component over multiple rounds") {
    // diameter 4 — forces >1 propagation round
    assert(cc(Seq(1L -> 2L, 2L -> 3L, 3L -> 4L, 4L -> 5L)) ===
      Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L))
  }

  test("disjoint components stay separate; orientation is ignored") {
    assert(cc(Seq(10L -> 7L, 20L -> 21L)) ===
      Map(7L -> 7L, 10L -> 7L, 20L -> 20L, 21L -> 20L))
  }

  test("empty edge set yields empty labeling") {
    assert(cc(Seq.empty).isEmpty)
  }

  test("cycle plus tail converges to the global min") {
    assert(cc(Seq(5L -> 6L, 6L -> 7L, 7L -> 5L, 7L -> 2L)) ===
      Map(2L -> 2L, 5L -> 2L, 6L -> 2L, 7L -> 2L))
  }

  test("1000-vertex path: hybrid hands off to star contraction and is exact") {
    // ids ordered along the path — the adversarial case where plain
    // min-label propagation needs one round per hop (999 rounds)
    val edges = (0L until 999L).map(i => i -> (i + 1))
    val got = cc(edges)
    assert(got.size === 1000)
    assert(got.values.forall(_ == 0L))
  }

  test("star contraction alone converges in O(log n) rounds on the path") {
    val spark = SparkFixture.spark
    import spark.implicits._
    val got = Graph.connectedComponentsStar(
        (0L until 999L).map(i => i -> (i + 1)).toDF("src", "dst"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.size === 1000)
    assert(got.values.forall(_ == 0L))
    // log2(1000) ≈ 10; the alternation does better than one halving per
    // round in practice, but pin the contract loosely
    assert(Graph.lastStarRounds <= 12,
      s"took ${Graph.lastStarRounds} rounds")
  }

  test("star contraction: disjoint components, self-loops, empty input") {
    val spark = SparkFixture.spark
    import spark.implicits._
    def star(edges: Seq[(Long, Long)]): Map[Long, Long] =
      Graph.connectedComponentsStar(edges.toDF("src", "dst"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(star(Seq(10L -> 7L, 20L -> 21L, 30L -> 30L)) ===
      Map(7L -> 7L, 10L -> 7L, 20L -> 20L, 21L -> 20L, 30L -> 30L))
    assert(star(Seq.empty).isEmpty)
  }

  test("property: both CC variants agree with union-find on random graphs") {
    val spark = SparkFixture.spark
    import spark.implicits._
    // deterministic seeds — one sparse, one dense, one with id gaps
    for ((seed, n, m) <- Seq((11, 60, 30), (12, 40, 80), (13, 200, 60))) {
      val rnd = new scala.util.Random(seed)
      val edges = Seq.fill(m)(
        (rnd.nextInt(n).toLong * 7, rnd.nextInt(n).toLong * 7))
      // driver-side union-find oracle with path compression, min root
      val parent = scala.collection.mutable.Map.empty[Long, Long]
      def find(x: Long): Long = {
        val p = parent.getOrElse(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      for ((a, b) <- edges) {
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val verts = edges.flatMap(e => Seq(e._1, e._2)).distinct
      val expect = verts.map(v => v -> find(v)).toMap
      val gotProp = Graph.connectedComponents(edges.toDF("src", "dst"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(gotProp === expect, s"propagation differs from oracle (seed $seed)")
      val gotStar = Graph.connectedComponentsStar(edges.toDF("src", "dst"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(gotStar === expect, s"star contraction differs from oracle (seed $seed)")
    }
  }
}
