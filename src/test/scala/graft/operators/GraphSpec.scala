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
}
