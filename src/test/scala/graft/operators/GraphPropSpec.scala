package graft.operators

import graft.SparkFixture
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property check: both component algorithms agree with a brute-force
  * union-find on random graphs (sparse and dense, self-loops allowed).
  */
class GraphPropSpec extends AnyFunSuite {

  private def bruteForce(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    parent.keys.map(v => v -> find(v)).toMap
  }

  private val edgesGen: Gen[List[(Long, Long)]] = for {
    n <- Gen.choose(1, 14) // vertex universe
    m <- Gen.choose(1, 25) // edge count (dense for small n)
    es <- Gen.listOfN(m, for {
      a <- Gen.choose(0L, n.toLong)
      b <- Gen.choose(0L, n.toLong)
    } yield (a, b))
  } yield es

  test("star contraction and hybrid match brute-force union-find") {
    val spark = SparkFixture.spark
    import spark.implicits._
    // few cases: each runs several Spark jobs, and the shapes generated
    // (dense multigraphs, self-loops, singleton chains) cover the
    // adversarial space quickly
    val prop = Prop.forAll(edgesGen) { edges =>
      val expect = bruteForce(edges)
      val df = edges.toDF("src", "dst")
      val star = Graph.connectedComponentsStar(df)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val hybrid = Graph.connectedComponents(df)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      star == expect && hybrid == expect
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(12), prop)
    assert(res.passed, res.status.toString)
  }
}
