package graft.functions

import graft.SparkFixture
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BoundReference, GenericInternalRow, Literal}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

/** The size-k heap aggregate must agree exactly with the sort-based
  * top-k it replaced (`slice(array_sort(collect_list(struct(-score,
  * id))), 1, k)`) — same ordering (cosine desc, id asc), same ties —
  * while its buffer never exceeds k entries, and the partial-
  * aggregation byte image must round-trip losslessly.
  */
class TopKByScoreSpec extends AnyFunSuite {

  test("heap top-k equals sort-based top-k under ties and partial merges") {
    val spark = SparkFixture.spark
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    val rnd = new Random(7)
    // many ties: scores drawn from a narrow domain to force tie-break
    // by corpus id; 8 slices exercise partial-aggregation merges
    val rows = (1 to 500).map { i =>
      (i % 7L, rnd.nextInt(20).toLong, rnd.nextInt(1000).toLong)
    }
    val df = rows.toDF("g", "score", "id").repartition(8)
    for (k <- Seq(1, 3, 10)) {
      val heap = df.groupBy($"g")
        .agg(expr(s"graft_topk_by_score(score, id, $k)").as("tk"))
        .select($"g", posexplode($"tk.top").as(Seq("pos", "t")))
        .select($"g", $"pos", $"t.cos_micros", $"t.corpus_id")
        .collect().map(_.toSeq).toSet
      val sorted = df.groupBy($"g")
        .agg(expr(s"slice(array_sort(collect_list(" +
          s"struct(-score as neg, id))), 1, $k)").as("top"))
        .select($"g", posexplode($"top").as(Seq("pos", "t")))
        .select($"g", $"pos", (-$"t.neg").as("cos_micros"),
          $"t.id".as("corpus_id"))
        .collect().map(_.toSeq).toSet
      assert(heap == sorted, s"k=$k")
    }
  }

  private def agg(k: Int) = TopKByScoreAgg(
    BoundReference(0, LongType, nullable = true),
    BoundReference(1, LongType, nullable = true),
    Literal(k))

  private def reduce(a: TopKByScoreAgg, b: TopKBuffer, s: Long, i: Long): TopKBuffer =
    a.update(b, new GenericInternalRow(Array[Any](s, i)))

  /** Decode eval's struct<top> output as ordered (score, id) pairs. */
  private def finish(a: TopKByScoreAgg, b: TopKBuffer): Seq[(Long, Long)] = {
    val arr = a.eval(b).asInstanceOf[InternalRow].getArray(0)
    (0 until arr.numElements()).map { i =>
      val e = arr.getStruct(i, 2)
      (e.getLong(0), e.getLong(1))
    }
  }

  test("buffer is trimmed to k on reduce and merge") {
    val a = agg(2)
    val full = (1L to 100L).foldLeft(a.createAggregationBuffer()) { (b, i) =>
      val next = reduce(a, b, i, i)
      assert(next.n <= 2)
      next
    }
    assert(finish(a, full) == Seq((100L, 100L), (99L, 99L)))
    val other = (101L to 200L).foldLeft(a.createAggregationBuffer())(
      (b, i) => reduce(a, b, i, i))
    val merged = a.merge(full, other)
    assert(merged.n == 2)
    assert(finish(a, merged) == Seq((200L, 200L), (199L, 199L)))
    // tie on score breaks by SMALLER id
    val tied = a.merge(
      reduce(agg(2), agg(2).createAggregationBuffer(), 5, 9),
      reduce(agg(2), agg(2).createAggregationBuffer(), 5, 3))
    assert(finish(a, tied) == Seq((5L, 3L), (5L, 9L)))
  }

  test("serialize/deserialize round-trips and keeps aggregating") {
    val a = agg(3)
    for (n <- Seq(0, 1, 3, 10)) {
      val buf = (1L to n).foldLeft(a.createAggregationBuffer())(
        (b, i) => reduce(a, b, i, i))
      val back = a.deserialize(a.serialize(buf))
      assert(finish(a, back) == finish(a, buf), s"n=$n")
      val merged = a.merge(back,
        reduce(a, a.createAggregationBuffer(), 1000L, 7L))
      assert(finish(a, merged).head == (1000L, 7L), s"n=$n")
    }
  }
}
