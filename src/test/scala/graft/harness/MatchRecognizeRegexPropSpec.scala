package graft.harness

import graft.SparkFixture
import org.scalatest.funsuite.AnyFunSuite

/** Randomized equivalence of the batch MATCH_RECOGNIZE matcher against
  * `java.util.regex` as an independent oracle: single-character
  * variables make a pattern of quantified variables and grouped
  * sub-patterns exactly a regex over the row string, and ONE match
  * scan (anchored attempt at p; on a non-empty match resume past its
  * end, else advance one row — SKIP PAST LAST ROW with empty matches
  * omitted) is the `region + lookingAt` loop. Both engines are
  * greedy-with-backtracking and explore paths in the same order, so
  * the match SPANS must agree exactly.
  *
  * Group bodies are generated with minimum length ≥ 1: engines
  * genuinely diverge on quantified groups whose iterations can match
  * empty (the regex zero-width loop rule interacts with {n,m} minimums
  * differently), and that corner is contract-documented rather than
  * silently chosen.
  */
class MatchRecognizeRegexPropSpec extends AnyFunSuite {

  private lazy val spark = SparkFixture.spark

  private val vars = Vector(("A", 'a'), ("B", 'b'), ("C", 'c'))

  // (sql quantifier, regex quantifier, min repetitions)
  private def quant(rnd: scala.util.Random): (String, String, Int) =
    rnd.nextInt(6) match {
      case 0 => ("", "", 1)
      case 1 => ("?", "?", 0)
      case 2 => ("*", "*", 0)
      case 3 => ("+", "+", 1)
      case 4 => ("{1,2}", "{1,2}", 1)
      case _ => ("{2}", "{2}", 2)
    }

  // one pattern item: (sql text, regex text, min match length). A
  // group body may alternate (`(A | B C)+`): branches generate with
  // min length >= 1 each (see the class doc's empty-group corner), and
  // the regex mirror is a non-capturing alternation, so the oracle
  // verifies branch-preference order for free.
  private def genItem(rnd: scala.util.Random, depth: Int): (String, String, Int) = {
    if (depth < 2 && rnd.nextInt(4) == 0) {
      val nb = 1 + rnd.nextInt(2)
      val branches = Vector.fill(nb) {
        val n = 1 + rnd.nextInt(2)
        var items = Vector.fill(n)(genItem(rnd, depth + 1))
        if (items.forall(_._3 == 0)) {
          val (vn, vc) = vars(rnd.nextInt(vars.size))
          items = items :+ ((vn, vc.toString, 1))
        }
        items
      }
      val (q, rq, minQ) = quant(rnd)
      val minInner = branches.map(_.map(_._3).sum).min
      (s"(${branches.map(_.map(_._1).mkString(" ")).mkString(" | ")})$q",
        s"(?:${branches.map(_.map(_._2).mkString).mkString("|")})$rq",
        minInner * minQ)
    } else {
      val (vn, vc) = vars(rnd.nextInt(vars.size))
      val (q, rq, minQ) = quant(rnd)
      (s"$vn$q", s"$vc$rq", minQ)
    }
  }

  // DEFINE only the variables the pattern actually uses
  private def definesFor(patText: String): String = vars
    .filter { case (vn, _) =>
      s"(?<![A-Za-z_])$vn(?![A-Za-z0-9_])".r.findFirstIn(patText).isDefined }
    .map { case (vn, vc) => s"$vn AS t = '$vc'" }.mkString(", ")

  test("random grouped patterns agree with java.util.regex on match spans") {
    import spark.implicits._
    val rnd = new scala.util.Random(20260813L)

    var trials = 0
    while (trials < 100) {
      val nItems = 1 + rnd.nextInt(3)
      val items = Vector.fill(nItems)(genItem(rnd, 0))
      // an all-empty-capable pattern emits nothing in both engines but
      // makes a weak trial; require some mandatory content
      if (items.map(_._3).sum >= 1) {
        trials += 1
        val patText = items.map(_._1).mkString(" ")
        val regex = items.map(_._2).mkString
        val len = rnd.nextInt(19)
        val str = Array.fill(len)("abcd".charAt(rnd.nextInt(4))).mkString

        // oracle: anchored scan, non-empty matches only
        val jp = java.util.regex.Pattern.compile(regex)
        val jm = jp.matcher(str)
        val expected = Vector.newBuilder[(Int, Int)]
        var pos = 0
        while (pos < str.length) {
          jm.region(pos, str.length)
          if (jm.lookingAt() && jm.end > jm.start) {
            expected += ((jm.start + 1, jm.end)) // 1-based inclusive rows
            pos = jm.end
          } else pos += 1
        }

        str.zipWithIndex.map { case (c, i) => (1L, (i + 1).toLong, c.toString) }
          .toSeq.toDF("k", "o", "t").createOrReplaceTempView("mr_prop_in")
        val defines = definesFor(patText)
        val sql =
          s"""SELECT o, mn FROM mr_prop_in MATCH_RECOGNIZE (
             |  PARTITION BY k ORDER BY o
             |  MEASURES MATCH_NUMBER() AS mn
             |  ALL ROWS PER MATCH
             |  PATTERN ($patText)
             |  DEFINE $defines)""".stripMargin
        val rewritten = MatchRecognize.rewrite(spark, sql)
        val got =
          try spark.sql(rewritten).collect()
            .map(r => (r.getLong(0), r.getLong(1)))
          finally MatchRecognize.dropViews(spark, rewritten)
        val spans = got.groupBy(_._2).toVector.sortBy(_._1)
          .map { case (_, rows) =>
            (rows.map(_._1).min.toInt, rows.map(_._1).max.toInt) }
        assert(spans == expected.result(),
          s"pattern ($patText) ~ /$regex/ over \"$str\": " +
            s"got $spans, regex oracle ${expected.result()}")
      }
    }
  }

  test("random grouped patterns: streaming rewrite equals batch") {
    import spark.implicits._
    val rnd = new scala.util.Random(8130826L)
    var trials = 0
    while (trials < 40) {
      val nItems = 1 + rnd.nextInt(3)
      val items = Vector.fill(nItems)(genItem(rnd, 0))
      if (items.map(_._3).sum >= 1) {
        trials += 1
        val patText = items.map(_._1).mkString(" ")
        val len = rnd.nextInt(16)
        val str = Array.fill(len)("abcd".charAt(rnd.nextInt(4))).mkString
        str.zipWithIndex.map { case (c, i) => (1L, (i + 1).toLong, c.toString) }
          .toSeq.toDF("k", "o", "t").createOrReplaceTempView("mr_prop_s")
        // when the pattern uses 2+ variables, a SUBSET union over two
        // of them rides along with a COUNT(U.*) measure — randomized
        // coverage of the OR-mask evaluation in both engines
        val used = vars.map(_._1).filter(vn =>
          s"(?<![A-Za-z_])$vn(?![A-Za-z0-9_])".r.findFirstIn(patText).isDefined)
        val (subsetClause, subsetMeasure) =
          if (used.size >= 2)
            (s"SUBSET U = (${used.take(2).mkString(", ")})",
              ", COUNT(U.*) AS uc")
          else ("", "")
        val q =
          s"""SELECT * FROM mr_prop_s MATCH_RECOGNIZE (
             |  PARTITION BY k ORDER BY o
             |  MEASURES COUNT(*) AS n, MATCH_NUMBER() AS mn$subsetMeasure
             |  ONE ROW PER MATCH AFTER MATCH SKIP PAST LAST ROW
             |  PATTERN ($patText)
             |  $subsetClause
             |  DEFINE ${definesFor(patText)})""".stripMargin
        val batchSql = MatchRecognize.rewrite(spark, q)
        val streamSql = MatchRecognize.rewriteStreaming(spark, q,
          _ => Some(("o", "5 seconds")))
        try {
          val batch = spark.sql(batchSql).collect().map(_.toSeq).toSet
          val streamed = spark.sql(streamSql).collect().map(_.toSeq).toSet
          assert(streamed === batch,
            s"pattern ($patText) over \"$str\": stream $streamed vs batch $batch")
        } finally {
          MatchRecognize.dropViews(spark, batchSql)
          MatchRecognize.dropViews(spark, streamSql)
        }
      }
    }
  }
}
