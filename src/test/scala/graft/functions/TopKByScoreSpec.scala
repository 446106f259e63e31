package graft.functions

import graft.SparkFixture
import org.apache.spark.sql.Encoders
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

/** The size-k heap aggregate must agree exactly with the sort-based
  * top-k it replaced (`slice(array_sort(collect_list(struct(-score,
  * id))), 1, k)`) — same ordering (cosine desc, id asc), same ties —
  * while its buffer never exceeds k entries.
  */
class TopKByScoreSpec extends AnyFunSuite {

  test("heap top-k equals sort-based top-k under ties and partial merges") {
    val spark = SparkFixture.spark
    import spark.implicits._
    val rnd = new Random(7)
    // many ties: scores drawn from a narrow domain to force tie-break
    // by corpus id; 8 slices exercise partial-aggregation merges
    val rows = (1 to 500).map { i =>
      (i % 7L, rnd.nextInt(20).toLong, rnd.nextInt(1000).toLong)
    }
    val df = rows.toDF("g", "score", "id").repartition(8)
    for (k <- Seq(1, 3, 10)) {
      val topk = udaf(new TopKByScore(k), Encoders.product[Scored])
      val heap = df.groupBy($"g")
        .agg(topk($"score", $"id").as("tk"))
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

  test("buffer is trimmed to k on reduce and merge") {
    val agg = new TopKByScore(2)
    val full = (1L to 100L).foldLeft(agg.zero) { (b, i) =>
      val next = agg.reduce(b, Scored(i, i))
      assert(next.length <= 2)
      next
    }
    assert(full == Vector(Scored(100, 100), Scored(99, 99)))
    val other = (101L to 200L).foldLeft(agg.zero)(
      (b, i) => agg.reduce(b, Scored(i, i)))
    val merged = agg.merge(full, other)
    assert(merged.length == 2)
    assert(merged == Vector(Scored(200, 200), Scored(199, 199)))
    // tie on score breaks by SMALLER id
    val tied = agg.merge(
      agg.reduce(agg.zero, Scored(5, 9)),
      agg.reduce(agg.zero, Scored(5, 3)))
    assert(tied == Vector(Scored(5, 3), Scored(5, 9)))
  }
}
