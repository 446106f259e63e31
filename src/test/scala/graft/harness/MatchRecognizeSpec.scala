package graft.harness

import java.nio.file.Files
import graft.SparkFixture
import org.scalatest.funsuite.AnyFunSuite

/** The `MATCH_RECOGNIZE` batch subset: greedy quantifiers with
  * backtracking, all four AFTER MATCH skip modes, measure forms, rejection
  * contract, and an end-to-end script through `sql-submit`.
  */
class MatchRecognizeSpec extends AnyFunSuite {

  private lazy val spark = SparkFixture.spark

  private def seq(rows: (Long, Long, String, Long)*): Unit = {
    import spark.implicits._
    rows.toDF("k", "o", "t", "v").createOrReplaceTempView("mr_in")
  }

  private def run(sql: String): Seq[Seq[Any]] =
    spark.sql(MatchRecognize.rewrite(spark, sql))
      .collect().toSeq.map(_.toSeq)

  test("basic V C+ P pattern: greedy run, SKIP PAST LAST ROW") {
    seq((1, 1, "view", 0), (1, 2, "click", 0), (1, 3, "click", 0),
      (1, 4, "purchase", 0), (1, 5, "view", 0), (1, 6, "purchase", 0),
      (2, 1, "view", 0), (2, 2, "click", 0), (2, 3, "purchase", 0))
    val out = run(
      """SELECT * FROM mr_in MATCH_RECOGNIZE (
        |  PARTITION BY k ORDER BY o
        |  MEASURES FIRST(V.o) AS s, LAST(P.o) AS e, COUNT(C.*) AS nc,
        |    MATCH_NUMBER() AS mn
        |  ONE ROW PER MATCH AFTER MATCH SKIP PAST LAST ROW
        |  PATTERN (V C+ P)
        |  DEFINE V AS t = 'view', C AS t = 'click', P AS t = 'purchase')""".stripMargin)
    // k=1: one match rows 1-4 (2 clicks); the view at 5 has no click run.
    // k=2: one match rows 1-3.
    assert(out.toSet === Set(Seq(1L, 1L, 4L, 2L, 1L), Seq(2L, 1L, 3L, 1L, 1L)))
  }

  test("greedy backtracking: A+ gives rows back so B can match") {
    // every row satisfies A; only v > 10 satisfies B. Greedy A+ first
    // swallows the whole run, then backtracks one row for B.
    seq((1, 1, "x", 1), (1, 2, "x", 2), (1, 3, "x", 11))
    val out = run(
      """SELECT * FROM mr_in MATCH_RECOGNIZE (
        |  PARTITION BY k ORDER BY o
        |  MEASURES COUNT(A.*) AS na, B.o AS bo
        |  PATTERN (A+ B)
        |  DEFINE A AS v > 0, B AS v > 10)""".stripMargin)
    assert(out === Seq(Seq(1L, 2L, 3L)))
  }

  test("bounded quantifiers {n} and {n,m}, optional ?") {
    seq((1, 1, "a", 0), (1, 2, "a", 0), (1, 3, "a", 0), (1, 4, "b", 0),
      (1, 5, "c", 0))
    val out = run(
      """SELECT * FROM mr_in MATCH_RECOGNIZE (
        |  PARTITION BY k ORDER BY o
        |  MEASURES COUNT(A.*) AS na, COUNT(B.*) AS nb, COUNT(X.*) AS nx
        |  PATTERN (A{2,3} B? X)
        |  DEFINE A AS t = 'a', B AS t = 'b', X AS t IN ('b', 'c'))""".stripMargin)
    // greedy: A takes rows 1-3, B? takes row 4, X must match row 5 ('c')
    assert(out === Seq(Seq(1L, 3L, 1L, 1L)))
  }

  test("star quantifier allows zero occurrences") {
    seq((1, 1, "a", 0), (1, 2, "c", 0))
    val out = run(
      """SELECT * FROM mr_in MATCH_RECOGNIZE (
        |  PARTITION BY k ORDER BY o
        |  MEASURES COUNT(A.*) AS na, COUNT(B.*) AS nb, COUNT(*) AS n
        |  PATTERN (A B* C)
        |  DEFINE A AS t = 'a', B AS t = 'b', C AS t = 'c')""".stripMargin)
    assert(out === Seq(Seq(1L, 1L, 0L, 2L)))
  }

  test("SKIP TO NEXT ROW emits overlapping matches") {
    seq((1, 1, "a", 0), (1, 2, "a", 0), (1, 3, "a", 0))
    val out = run(
      """SELECT * FROM mr_in MATCH_RECOGNIZE (
        |  PARTITION BY k ORDER BY o
        |  MEASURES FIRST(A.o) AS s, COUNT(A.*) AS n
        |  AFTER MATCH SKIP TO NEXT ROW
        |  PATTERN (A+)
        |  DEFINE A AS t = 'a')""".stripMargin)
    assert(out.toSet === Set(Seq(1L, 1L, 3L), Seq(1L, 2L, 2L), Seq(1L, 3L, 1L)))
  }

  test("undefined pattern variable matches any row") {
    seq((1, 1, "a", 0), (1, 2, "zzz", 7), (1, 3, "c", 0))
    val out = run(
      """SELECT * FROM mr_in MATCH_RECOGNIZE (
        |  PARTITION BY k ORDER BY o
        |  MEASURES ANY.v AS av
        |  PATTERN (A ANY C)
        |  DEFINE A AS t = 'a', C AS t = 'c')""".stripMargin)
    assert(out === Seq(Seq(1L, 7L)))
  }

  test("multiple partitions keep independent match numbers") {
    seq((1, 1, "a", 0), (1, 2, "a", 0), (2, 1, "a", 0))
    val out = run(
      """SELECT * FROM mr_in MATCH_RECOGNIZE (
        |  PARTITION BY k ORDER BY o
        |  MEASURES MATCH_NUMBER() AS mn, FIRST(A.o) AS s
        |  PATTERN (A)
        |  DEFINE A AS t = 'a')""".stripMargin)
    assert(out.toSet === Set(Seq(1L, 1L, 1L), Seq(1L, 2L, 2L), Seq(2L, 1L, 1L)))
  }

  test("hot key with 1M rows matches in a bounded sliding window") {
    // one partition key, 10^6 rows: the old matcher buffered the whole
    // group (an executor OOM at corpus scale); the sliding-window
    // matcher must keep its high-water mark at the match extent —
    // pattern quantifier-sum plus the compaction slack — not the group
    import spark.implicits._
    val n = 1000000L
    spark.range(n)
      .selectExpr("CAST(1 AS BIGINT) AS k", "id AS o", "id % 10 AS v")
      .createOrReplaceTempView("mr_hot")
    MatchRecognize.peakWindowRows.set(0L)
    val out = spark.sql(MatchRecognize.rewrite(
      spark,
      """SELECT COUNT(*) AS matches, SUM(nr) AS rows_matched
        |FROM mr_hot MATCH_RECOGNIZE (
        |  PARTITION BY k ORDER BY o
        |  MEASURES COUNT(*) AS nr
        |  AFTER MATCH SKIP PAST LAST ROW
        |  PATTERN (A B{0,3} C)
        |  DEFINE A AS v = 0, B AS v IN (1, 2), C AS v = 3)""".stripMargin))
      .collect()
    // one match per 10-row block: A(v=0) B(v=1) B(v=2) C(v=3)
    assert(out.map(_.toSeq).toSeq === Seq(Seq(100000L, 400000L)))
    val peak = MatchRecognize.peakWindowRows.get()
    assert(peak > 0L, "peak window tracker never recorded")
    assert(peak <= 1024L,
      s"sliding window buffered $peak rows for a 1M-row key — unbounded buffering is back")
  }

  test("unbounded quantifier without WITHIN buffers the active run, not the group") {
    // the round-5 hazard: PATTERN (A B+) with no WITHIN used to load
    // the WHOLE group up front for every match attempt. Runs now load
    // lazily while their predicate keeps matching, so a 1M-row key
    // whose runs break every 10 rows stays at run-extent memory. (A run
    // that never breaks still buffers itself — Flink CEP's contract for
    // such patterns, documented in the scaladoc.)
    import spark.implicits._
    spark.range(1000000L)
      .selectExpr("CAST(1 AS BIGINT) AS k", "id AS o", "id % 10 AS v")
      .createOrReplaceTempView("mr_hot_unbounded")
    MatchRecognize.peakWindowRows.set(0L)
    val out = spark.sql(MatchRecognize.rewrite(
      spark,
      """SELECT COUNT(*) AS matches, SUM(nb) AS b_rows
        |FROM mr_hot_unbounded MATCH_RECOGNIZE (
        |  PARTITION BY k ORDER BY o
        |  MEASURES COUNT(B.*) AS nb
        |  AFTER MATCH SKIP PAST LAST ROW
        |  PATTERN (A B+)
        |  DEFINE A AS v = 0, B AS v > 0)""".stripMargin))
      .collect()
    // one match per 10-row block: A(v=0) then B+ takes v=1..9
    assert(out.map(_.toSeq).toSeq === Seq(Seq(100000L, 900000L)))
    val peak = MatchRecognize.peakWindowRows.get()
    assert(peak > 0L, "peak window tracker never recorded")
    assert(peak <= 1024L,
      s"unbounded B+ buffered $peak rows of a 1M-row key — whole-group " +
        "buffering is back")
  }

  test("WITHIN bounds the window for unbounded quantifiers") {
    // A B* with no finite quantifier-sum would buffer the whole run;
    // the WITHIN horizon must cap the look-ahead instead
    import spark.implicits._
    spark.range(500000L)
      .selectExpr("CAST(1 AS BIGINT) AS k",
        "timestamp_millis(1700000000000 + id * 1000) AS ts",
        "id % 100 AS v")
      .createOrReplaceTempView("mr_hot_within")
    MatchRecognize.peakWindowRows.set(0L)
    val out = spark.sql(MatchRecognize.rewrite(
      spark,
      """SELECT COUNT(*) AS matches FROM mr_hot_within MATCH_RECOGNIZE (
        |  PARTITION BY k ORDER BY ts
        |  MEASURES COUNT(B.*) AS nb
        |  AFTER MATCH SKIP PAST LAST ROW
        |  PATTERN (A B*) WITHIN INTERVAL '30' SECOND
        |  DEFINE A AS v = 0, B AS v > 0)""".stripMargin))
      .collect()
    // every 100th row starts a match; B* greedily takes the 29 rows
    // inside the 30 s horizon (1 row/s)
    assert(out.map(_.toSeq).toSeq === Seq(Seq(5000L)))
    val peak = MatchRecognize.peakWindowRows.get()
    assert(peak > 0L && peak <= 1024L,
      s"WITHIN horizon did not bound the window: $peak rows buffered")
  }

  test("unsupported forms are rejected with the contract") {
    seq((1, 1, "a", 0))
    def rejects(frag: String, needle: String): Unit = {
      val e = intercept[IllegalArgumentException](run(frag))
      assert(e.getMessage.contains(needle), s"message: ${e.getMessage}")
    }
    rejects(
      """SELECT * FROM mr_in MATCH_RECOGNIZE (
        |  PARTITION BY k ORDER BY o MEASURES COUNT(*) AS n
        |  PATTERN ((A | )+) DEFINE A AS t = 'a')""".stripMargin,
      "empty pattern sequence")
    rejects(
      """SELECT * FROM mr_in MATCH_RECOGNIZE (
        |  PARTITION BY k ORDER BY o MEASURES COUNT(*) AS n
        |  PATTERN (A PERMUTE(B, C)) DEFINE A AS t = 'a')""".stripMargin,
      "PERMUTE")
    rejects(
      """SELECT * FROM mr_in MATCH_RECOGNIZE (
        |  PARTITION BY k ORDER BY o MEASURES COUNT(*) AS n
        |  PATTERN (A B) DEFINE A AS t = 'a', B AS v > FIRST(B.v))""".stripMargin,
      "self navigation")
    rejects(
      """SELECT * FROM mr_in MATCH_RECOGNIZE (
        |  PARTITION BY k ORDER BY o MEASURES COUNT(*) AS n
        |  PATTERN (A B) DEFINE A AS t = 'a', B AS v > PREV(v, k))""".stripMargin,
      "integer-literal offset")
    rejects(
      """SELECT * FROM mr_in MATCH_RECOGNIZE (
        |  PARTITION BY k ORDER BY o MEASURES COUNT(*) AS n
        |  PATTERN (A B) DEFINE A AS t = 'a', B AS SUM(v) > 10)""".stripMargin,
      "unsupported aggregate form")
    rejects(
      """SELECT * FROM mr_in MATCH_RECOGNIZE (
        |  PARTITION BY k ORDER BY o MEASURES COUNT(*) AS n
        |  PATTERN (A B) DEFINE A AS t = 'a', B AS COUNT(B.v) < 3)""".stripMargin,
      "unsupported aggregate form")
    rejects(
      """SELECT * FROM mr_in MATCH_RECOGNIZE (
        |  PARTITION BY k ORDER BY o MEASURES COUNT(*) AS n
        |  PATTERN (A B) DEFINE A AS t = 'a', B AS SUM(B.v + 1) > 10)""".stripMargin,
      "unsupported aggregate form")
    rejects(
      """SELECT * FROM mr_in MATCH_RECOGNIZE (
        |  PARTITION BY k ORDER BY o MEASURES COUNT(*) AS n
        |  PATTERN (A B) DEFINE A AS t = 'a', B AS SUM(B.t) > 10)""".stripMargin,
      "integer or floating")
    // a subquery source inside a FUNCTION call position (no FROM
    // directly before the parens) stays out of the subset
    rejects(
      """SELECT * FROM foo JOIN (SELECT * FROM mr_in) MATCH_RECOGNIZE (
        |  PARTITION BY k ORDER BY o MEASURES COUNT(*) AS n
        |  PATTERN (A) DEFINE A AS t = 'a')""".stripMargin,
      "FROM (subquery)")
  }

  test("subquery sources: FROM (SELECT ...) MATCH_RECOGNIZE") {
    seq((1, 1, "a", 5), (1, 2, "b", 2), (1, 3, "a", 7), (1, 4, "b", 9))
    val before = spark.catalog.listTables().collect()
      .count(_.name.startsWith("graft_mr_"))
    // the subquery filters and renames before the pattern runs
    val out = MatchRecognize.sql(spark,
      """SELECT * FROM (
        |  SELECT k, o, t, v * 10 AS w FROM mr_in WHERE v >= 2
        |) MATCH_RECOGNIZE (
        |  PARTITION BY k ORDER BY o
        |  MEASURES FIRST(A.w) AS fw, COUNT(*) AS n
        |  PATTERN (A B)
        |  DEFINE A AS t = 'a', B AS t = 'b')""".stripMargin)
      .collect().toSeq.map(_.toSeq)
    // v>=2 keeps all four rows; matches (a b) at (1,2) and (3,4);
    // w = v*10 -> first A.w = 50 then 70
    assert(out.toSet === Set(Seq(1L, 50L, 2L), Seq(1L, 70L, 2L)))
    // neither the subquery's source view nor the result view outlives
    // the statement
    val after = spark.catalog.listTables().collect()
      .count(_.name.startsWith("graft_mr_"))
    assert(after <= before, s"views leaked: $before -> $after")
  }

  test("nested PREV/NEXT in DEFINE composes via staged lag columns") {
    seq((1, 1, "x", 1), (1, 2, "x", 3), (1, 3, "x", 4), (1, 4, "x", 10))
    // v > PREV(v + PREV(v)): row i matches iff v(i) > v(i-1) + v(i-2);
    // row 3: 4 > 3+1 fails, row 4: 10 > 4+3 matches (rows 1-2 see NULL)
    val out = run(
      """SELECT * FROM mr_in MATCH_RECOGNIZE (
        |  PARTITION BY k ORDER BY o
        |  MEASURES A.v AS av
        |  PATTERN (A)
        |  DEFINE A AS v > PREV(v + PREV(v)))""".stripMargin)
    assert(out === Seq(Seq(1L, 10L)))
    // cross-keyword nesting: NEXT(PREV(v)) at row i is PREV(v) at row
    // i+1 = v(i) — an identity wherever the next row exists (rows 1-3)
    val out2 = run(
      """SELECT * FROM mr_in MATCH_RECOGNIZE (
        |  PARTITION BY k ORDER BY o
        |  MEASURES COUNT(B.*) AS nb
        |  AFTER MATCH SKIP TO NEXT ROW
        |  PATTERN (B)
        |  DEFINE B AS v = NEXT(PREV(v)))""".stripMargin)
    assert(out2.size === 3)
    // depth 3: v(i) > v(i-1) + v(i-2) + v(i-3) — only row 4 has all
    // three predecessors: 10 > 4+3+1 = 8 matches
    val out3 = run(
      """SELECT * FROM mr_in MATCH_RECOGNIZE (
        |  PARTITION BY k ORDER BY o
        |  MEASURES A.v AS av
        |  PATTERN (A)
        |  DEFINE A AS v > PREV(v + PREV(v + PREV(v))))""".stripMargin)
    assert(out3 === Seq(Seq(1L, 10L)))
    // offsets compose too: PREV(v, 2) inside NEXT — NEXT(PREV(v, 2))
    // at row i = v(i - 1); identity shifted one back, rows 2-3 match
    val out4 = run(
      """SELECT * FROM mr_in MATCH_RECOGNIZE (
        |  PARTITION BY k ORDER BY o
        |  MEASURES B.o AS bo
        |  AFTER MATCH SKIP TO NEXT ROW
        |  PATTERN (B)
        |  DEFINE B AS NEXT(PREV(v, 2)) = PREV(v))""".stripMargin)
    assert(out4.map(_(1)) === Seq(2L, 3L))
  }

  test("grouped sub-pattern (A B)+ repeats the sequence as a unit") {
    // retry cycles: attempt ('a') then outcome ('b'); the group takes
    // every full pair greedily, and a trailing success row closes it
    seq((1, 1, "a", 0), (1, 2, "b", 0), (1, 3, "a", 0), (1, 4, "b", 0),
      (1, 5, "s", 0),
      (2, 1, "a", 0), (2, 2, "b", 0), (2, 3, "s", 0),
      (3, 1, "a", 0), (3, 2, "b", 0), (3, 3, "a", 0), (3, 4, "s", 0))
    val out = run(
      """SELECT * FROM mr_in MATCH_RECOGNIZE (
        |  PARTITION BY k ORDER BY o
        |  MEASURES COUNT(A.*) AS na, COUNT(B.*) AS nb, S.o AS so
        |  AFTER MATCH SKIP PAST LAST ROW
        |  PATTERN ((A B)+ S)
        |  DEFINE A AS t = 'a', B AS t = 'b', S AS t = 's')""".stripMargin)
    // k=1: two full (A B) iterations then S at row 5.
    // k=2: one iteration then S.
    // k=3: `a b a s` has NO match — the dangling A at row 3 blocks S,
    // and one-iteration backtracking leaves S facing row 3 ('a');
    // regex semantics, same as /(ab)+s/ on "abas".
    assert(out.toSet === Set(Seq(1L, 2L, 2L, 5L), Seq(2L, 1L, 1L, 3L)))
  }

  test("group backtracks iterations so a following variable can match") {
    // every row satisfies both A and B inside the group; C needs the
    // final row. Greedy (A B)+ first consumes all three pairs, then
    // gives whole iterations back until C fits.
    seq((1, 1, "x", 1), (1, 2, "x", 2), (1, 3, "x", 3), (1, 4, "x", 4),
      (1, 5, "x", 99))
    val out = run(
      """SELECT * FROM mr_in MATCH_RECOGNIZE (
        |  PARTITION BY k ORDER BY o
        |  MEASURES COUNT(A.*) AS na, COUNT(B.*) AS nb, C.v AS cv
        |  PATTERN ((A B)+ C)
        |  DEFINE A AS v < 50, B AS v < 50, C AS v > 50)""".stripMargin)
    // rows 1-4 form two (A B) pairs; C takes row 5
    assert(out === Seq(Seq(1L, 2L, 2L, 99L)))
  }

  test("backtracking crosses the group boundary into inner quantifiers") {
    // inside the group, A+ is greedy; the group's second iteration and
    // the trailing C both need rows back. The inner quantifier must
    // participate in backtracking across the group boundary.
    seq((1, 1, "x", 1), (1, 2, "x", 1), (1, 3, "y", 1), (1, 4, "x", 1),
      (1, 5, "y", 1), (1, 6, "z", 1))
    val out = run(
      """SELECT * FROM mr_in MATCH_RECOGNIZE (
        |  PARTITION BY k ORDER BY o
        |  MEASURES COUNT(A.*) AS na, COUNT(B.*) AS nb, Z.o AS zo
        |  PATTERN ((A+ B){2} Z)
        |  DEFINE A AS t = 'x', B AS t = 'y', Z AS t = 'z')""".stripMargin)
    // iteration 1: A+ = rows 1-2, B = row 3; iteration 2: A = row 4,
    // B = row 5; Z = row 6
    assert(out === Seq(Seq(1L, 3L, 2L, 6L)))
  }

  test("bounded group quantifier {n,m} is greedy within its bounds") {
    seq((1, 1, "a", 0), (1, 2, "b", 0), (1, 3, "a", 0), (1, 4, "b", 0),
      (1, 5, "a", 0), (1, 6, "b", 0), (1, 7, "a", 0), (1, 8, "b", 0))
    val out = run(
      """SELECT * FROM mr_in MATCH_RECOGNIZE (
        |  PARTITION BY k ORDER BY o
        |  MEASURES COUNT(A.*) AS na
        |  AFTER MATCH SKIP PAST LAST ROW
        |  PATTERN ((A B){1,3})
        |  DEFINE A AS t = 'a', B AS t = 'b')""".stripMargin)
    // greedy: first match takes 3 pairs (cap), second takes the rest
    assert(out === Seq(Seq(1L, 3L), Seq(1L, 1L)))
  }

  test("optional group (A B)? and zero-consuming iterations terminate") {
    seq((1, 1, "c", 0))
    // (A B)? matches zero iterations; C takes the row
    val out = run(
      """SELECT * FROM mr_in MATCH_RECOGNIZE (
        |  PARTITION BY k ORDER BY o
        |  MEASURES COUNT(A.*) AS na, C.o AS co
        |  PATTERN ((A B)? C)
        |  DEFINE A AS t = 'a', B AS t = 'b', C AS t = 'c')""".stripMargin)
    assert(out === Seq(Seq(1L, 0L, 1L)))
    // (A*)+ : an iteration that consumes nothing must not loop forever
    seq((1, 1, "a", 0), (1, 2, "a", 0), (1, 3, "c", 0))
    val out2 = run(
      """SELECT * FROM mr_in MATCH_RECOGNIZE (
        |  PARTITION BY k ORDER BY o
        |  MEASURES COUNT(A.*) AS na, C.o AS co
        |  PATTERN ((A*)+ C)
        |  DEFINE A AS t = 'a', C AS t = 'c')""".stripMargin)
    assert(out2 === Seq(Seq(1L, 2L, 3L)))
  }

  test("nested groups compose") {
    seq((1, 1, "a", 0), (1, 2, "b", 0), (1, 3, "b", 0), (1, 4, "a", 0),
      (1, 5, "b", 0), (1, 6, "b", 0), (1, 7, "z", 0))
    val out = run(
      """SELECT * FROM mr_in MATCH_RECOGNIZE (
        |  PARTITION BY k ORDER BY o
        |  MEASURES COUNT(A.*) AS na, COUNT(B.*) AS nb, Z.o AS zo
        |  PATTERN ((A (B B)){2} Z)
        |  DEFINE A AS t = 'a', B AS t = 'b', Z AS t = 'z')""".stripMargin)
    assert(out === Seq(Seq(1L, 2L, 4L, 7L)))
  }

  test("alternation inside a group repeats either branch") {
    // the Flink CEP retry shape: each iteration is a full (A B) pair
    // OR a lone C, tried leftmost-first, closed by Z
    seq((1, 1, "a", 0), (1, 2, "b", 0), (1, 3, "c", 0), (1, 4, "a", 0),
      (1, 5, "b", 0), (1, 6, "z", 0))
    val out = run(
      """SELECT * FROM mr_in MATCH_RECOGNIZE (
        |  PARTITION BY k ORDER BY o
        |  MEASURES COUNT(A.*) AS na, COUNT(B.*) AS nb, COUNT(C.*) AS nc,
        |    Z.o AS zo
        |  PATTERN ((A B | C)+ Z)
        |  DEFINE A AS t = 'a', B AS t = 'b', C AS t = 'c',
        |    Z AS t = 'z')""".stripMargin)
    // iterations: (A B) rows 1-2, (C) row 3, (A B) rows 4-5, Z row 6
    assert(out === Seq(Seq(1L, 2L, 2L, 1L, 6L)))
  }

  test("group alternation prefers the leftmost branch per iteration") {
    // the row satisfies BOTH A and B; the leftmost branch must claim it
    seq((1, 1, "ab", 0), (1, 2, "z", 0))
    val out = run(
      """SELECT * FROM mr_in MATCH_RECOGNIZE (
        |  PARTITION BY k ORDER BY o
        |  MEASURES COUNT(A.*) AS na, COUNT(B.*) AS nb
        |  PATTERN ((A | B) Z)
        |  DEFINE A AS t LIKE '%a%', B AS t LIKE '%b%',
        |    Z AS t = 'z')""".stripMargin)
    assert(out === Seq(Seq(1L, 1L, 0L)))
  }

  test("backtracking revises the branch choice inside a group") {
    // branch (A B) greedily claims rows 1-2, leaving D facing 'z' —
    // the matcher must back out of the BRANCH choice, take the lone-A
    // branch, and let D have row 2; regex semantics of /(ab|a)bz/
    seq((1, 1, "a", 0), (1, 2, "b", 0), (1, 3, "z", 0))
    val out = run(
      """SELECT * FROM mr_in MATCH_RECOGNIZE (
        |  PARTITION BY k ORDER BY o
        |  MEASURES COUNT(A.*) AS na, COUNT(B.*) AS nb, COUNT(D.*) AS nd,
        |    Z.o AS zo
        |  PATTERN ((A B | A) D Z)
        |  DEFINE A AS t = 'a', B AS t = 'b', D AS t = 'b',
        |    Z AS t = 'z')""".stripMargin)
    assert(out === Seq(Seq(1L, 1L, 0L, 1L, 3L)))
  }

  test("streaming group alternation matches the batch matcher") {
    import spark.implicits._
    Seq(
      (1L, 1L, "a"), (1L, 2L, "b"), (1L, 3L, "c"), (1L, 4L, "a"),
      (1L, 5L, "b"), (1L, 6L, "z"),
      (2L, 1L, "c"), (2L, 2L, "c"), (2L, 3L, "z"),
      (3L, 1L, "a"), (3L, 2L, "z"))
      .toDF("k", "o", "t").createOrReplaceTempView("mr_altgrp_eq")
    val q =
      """SELECT * FROM mr_altgrp_eq MATCH_RECOGNIZE (
        |  PARTITION BY k ORDER BY o
        |  MEASURES COUNT(A.*) AS na, COUNT(B.*) AS nb, COUNT(C.*) AS nc,
        |    MATCH_NUMBER() AS mn
        |  ONE ROW PER MATCH AFTER MATCH SKIP PAST LAST ROW
        |  PATTERN ((A B | C)+ Z)
        |  DEFINE A AS t = 'a', B AS t = 'b', C AS t = 'c',
        |    Z AS t = 'z')""".stripMargin
    val batchSql = MatchRecognize.rewrite(spark, q)
    val streamSql = MatchRecognize.rewriteStreaming(spark, q,
      _ => Some(("o", "5 seconds")))
    try {
      val batch = spark.sql(batchSql).collect().map(_.toSeq).toSet
      val streamed = spark.sql(streamSql).collect().map(_.toSeq).toSet
      assert(streamed === batch)
      // k=1 matches with 2 (A B) pairs + one C; k=2 with two C
      // iterations; k=3 has no match ('a' alone closes no branch)
      assert(batch.map(_.head).toSet === Set(1L, 2L))
    } finally {
      MatchRecognize.dropViews(spark, batchSql)
      MatchRecognize.dropViews(spark, streamSql)
    }
  }

  test("MATCH_RECOGNIZE above a windowed pre-agg view streams (r17 " +
      "chained pipeline): a rising-window-sum pattern over window_time") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sc = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[(String, java.sql.Timestamp, Long)]
    input.toDF().toDF("k", "ts", "v")
      .withWatermark("ts", "5 seconds")
      .createOrReplaceTempView("mrc_src")
    // stage 1 on the TRACKER path (distinct forces it)
    val stage1 = WindowTvf.rewriteStreaming(
      "SELECT k, window_time, SUM(v) AS s, COUNT(DISTINCT v) AS d " +
        "FROM TABLE(TUMBLE(TABLE mrc_src, DESCRIPTOR(ts), " +
        "INTERVAL '1' MINUTE)) " +
        "GROUP BY k, window_start, window_end, window_time",
      spark,
      t => if (t.equalsIgnoreCase("mrc_src")) Some(("ts", "5 seconds"))
        else None)
    spark.sql(stage1).createOrReplaceTempView("mrc_agg")
    val streamSql = MatchRecognize.rewriteStreaming(spark,
      """SELECT * FROM mrc_agg MATCH_RECOGNIZE (
        |  PARTITION BY k ORDER BY window_time
        |  MEASURES A.s AS base, LAST(B.s) AS peak, COUNT(B.*) AS nb
        |  ONE ROW PER MATCH AFTER MATCH SKIP PAST LAST ROW
        |  PATTERN (A B+)
        |  DEFINE B AS B.s > PREV(B.s))""".stripMargin,
      t => if (t.equalsIgnoreCase("mrc_agg"))
        Some(("window_time", "5 seconds")) else None)
    val corrKey =
      "spark.sql.streaming.statefulOperator.checkCorrectness.enabled"
    val multiKey = "spark.sql.streaming.statefulOperator.allowMultiple"
    val savedCorr = spark.conf.getOption(corrKey)
    val savedMulti = spark.conf.getOption(multiKey)
    spark.conf.set(corrKey, "false")
    spark.conf.set(multiKey, "false")
    val q = spark.sql(streamSql).writeStream.format("memory")
      .queryName("mrc_out").outputMode("append").start()
    try {
      def t(sec: Long) = new java.sql.Timestamp(sec * 1000L)
      // window sums per minute for k=a: 2, 5, 9 (rising), then 1 —
      // the pattern matches (A=2, B=5, B=9)
      input.addData(
        ("a", t(10), 2L), ("a", t(70), 5L), ("a", t(130), 9L),
        ("a", t(190), 1L))
      q.processAllAvailable()
      for (sec <- Seq(1000L, 2000L, 3000L, 4000L)) {
        input.addData(("z", t(sec), 0L))
        q.processAllAvailable()
      }
      val got = spark.table("mrc_out").where("k = 'a'")
        .select($"base", $"peak", $"nb")
        .as[(Long, Long, Long)].collect().toSet
      assert(got === Set((2L, 9L, 2L)), got.toString)
    } finally {
      q.stop()
      savedCorr.fold(spark.conf.unset(corrKey))(spark.conf.set(corrKey, _))
      savedMulti.fold(spark.conf.unset(multiKey))(
        spark.conf.set(multiKey, _))
    }
  }

  test("grouped sub-pattern under alternation and cross-variable DEFINE") {
    // branch 1 needs a full (A B)+ Z; branch 2 is a lone Z. The group
    // interacts with cross-variable predicates: B must exceed the
    // FIRST A of the match (spanning group iterations).
    seq((1, 1, "a", 5), (1, 2, "b", 6), (1, 3, "a", 2), (1, 4, "b", 7),
      (1, 5, "z", 0),
      (2, 1, "z", 0))
    val out = run(
      """SELECT * FROM mr_in MATCH_RECOGNIZE (
        |  PARTITION BY k ORDER BY o
        |  MEASURES COUNT(A.*) AS na, COUNT(B.*) AS nb, Z.o AS zo
        |  AFTER MATCH SKIP PAST LAST ROW
        |  PATTERN ((A B)+ Z | Z)
        |  DEFINE A AS t = 'a', B AS t = 'b' AND v > FIRST(A.v),
        |    Z AS t = 'z')""".stripMargin)
    // k=1: both B rows (6, 7) exceed FIRST(A.v)=5 → 2 iterations + Z.
    // k=2: branch 1 can't start; branch 2 matches the lone Z.
    assert(out.toSet === Set(Seq(1L, 2L, 2L, 5L), Seq(2L, 0L, 0L, 1L)))
  }

  test("FIRST/LAST(V.col, k) logical offsets index the assignment list") {
    seq((1, 1, "s", 10), (1, 2, "b", 20), (1, 3, "b", 30), (1, 4, "b", 40))
    val out = run(
      """SELECT * FROM mr_in MATCH_RECOGNIZE (
        |  PARTITION BY k ORDER BY o
        |  MEASURES FIRST(B.v) AS f0, FIRST(B.v, 1) AS f1, LAST(B.v, 1) AS l1,
        |    LAST(B.v, 2) AS l2, FIRST(B.v, 3) AS f3
        |  PATTERN (S B+)
        |  DEFINE S AS t = 's', B AS t = 'b')""".stripMargin)
    // B rows are v=20,30,40: FIRST+1=30, LAST-1=30, LAST-2=20;
    // offset beyond the assignment list (f3) is NULL
    assert(out === Seq(Seq(1L, 20L, 30L, 30L, 20L, null)))
  }

  test("RUNNING vs FINAL measures under ALL ROWS PER MATCH") {
    seq((1, 1, "a", 1), (1, 2, "a", 2), (1, 3, "a", 3))
    val out = run(
      """SELECT o, rn, fn, rs, fs FROM mr_in MATCH_RECOGNIZE (
        |  PARTITION BY k ORDER BY o
        |  MEASURES RUNNING COUNT(A.*) AS rn, FINAL COUNT(A.*) AS fn,
        |    RUNNING SUM(A.v) AS rs, FINAL SUM(A.v) AS fs
        |  ALL ROWS PER MATCH
        |  PATTERN (A+)
        |  DEFINE A AS t = 'a')""".stripMargin)
    // RUNNING counts the prefix; FINAL sees the whole 3-row match
    assert(out === Seq(
      Seq(1L, 1L, 3L, 1L, 6L),
      Seq(2L, 2L, 3L, 3L, 6L),
      Seq(3L, 3L, 3L, 6L, 6L)))
  }

  test("RUNNING and FINAL coincide under ONE ROW PER MATCH") {
    seq((1, 1, "a", 1), (1, 2, "a", 2))
    val out = run(
      """SELECT * FROM mr_in MATCH_RECOGNIZE (
        |  PARTITION BY k ORDER BY o
        |  MEASURES RUNNING COUNT(A.*) AS rn, FINAL SUM(A.v) AS fs,
        |    FINAL LAST(A.v) AS lv
        |  PATTERN (A+)
        |  DEFINE A AS t = 'a')""".stripMargin)
    assert(out === Seq(Seq(1L, 2L, 3L, 2L)))
  }

  test("offset and DEFINE-navigation rejections for FIRST/LAST forms") {
    seq((1, 1, "a", 0))
    def rejects(frag: String, needle: String): Unit = {
      val e = intercept[IllegalArgumentException](run(frag))
      assert(e.getMessage.contains(needle), s"message: ${e.getMessage}")
    }
    // a non-integer offset is not a navigation atom, so the FIRST call
    // survives expression-measure decomposition and fails the residue
    // check
    rejects(
      """SELECT * FROM mr_in MATCH_RECOGNIZE (
        |  PARTITION BY k ORDER BY o MEASURES FIRST(A.v, x) AS n
        |  PATTERN (A) DEFINE A AS t = 'a')""".stripMargin,
      "unsupported FIRST() form in measure")
    // FIRST over an expression would leak a Catalyst first() aggregate
    rejects(
      """SELECT * FROM mr_in MATCH_RECOGNIZE (
        |  PARTITION BY k ORDER BY o MEASURES COUNT(*) AS n
        |  PATTERN (A B) DEFINE A AS t = 'a', B AS v > FIRST(A.v + 1))""".stripMargin,
      "unsupported FIRST() form")
    // offset navigation over the variable's OWN rows stays rejected
    rejects(
      """SELECT * FROM mr_in MATCH_RECOGNIZE (
        |  PARTITION BY k ORDER BY o MEASURES COUNT(*) AS n
        |  PATTERN (A B) DEFINE A AS t = 'a', B AS v > FIRST(B.v, 1))""".stripMargin,
      "self navigation")
  }

  test("FIRST/LAST(V.col, k) offsets navigate another variable in DEFINE") {
    // B rows must exceed the SECOND A row's value (FIRST(A.v, 1));
    // with A rows 10, 30, 20 the threshold is 30 — only v=31 passes,
    // and the 25 row ends the B run
    seq((1, 1, "a", 10), (1, 2, "a", 30), (1, 3, "a", 20),
      (1, 4, "b", 31), (1, 5, "b", 25))
    val out = run(
      """SELECT * FROM mr_in MATCH_RECOGNIZE (
        |  PARTITION BY k ORDER BY o
        |  MEASURES COUNT(A.*) AS na, COUNT(B.*) AS nb, LAST(B.v) AS lb
        |  PATTERN (A{3} B+)
        |  DEFINE A AS t = 'a', B AS t = 'b' AND v > FIRST(A.v, 1))""".stripMargin)
    assert(out === Seq(Seq(1L, 3L, 1L, 31L)))
    // LAST(A.v, 1) is the second-to-last assigned A row (v=30 here)
    val out2 = run(
      """SELECT * FROM mr_in MATCH_RECOGNIZE (
        |  PARTITION BY k ORDER BY o
        |  MEASURES COUNT(B.*) AS nb
        |  PATTERN (A{3} B+)
        |  DEFINE A AS t = 'a', B AS t = 'b' AND v > LAST(A.v, 1))""".stripMargin)
    assert(out2 === Seq(Seq(1L, 1L)))
    // an offset past A's assignment list → NULL → unknown → no match
    val out3 = run(
      """SELECT * FROM mr_in MATCH_RECOGNIZE (
        |  PARTITION BY k ORDER BY o
        |  MEASURES COUNT(B.*) AS nb
        |  PATTERN (A{3} B+)
        |  DEFINE A AS t = 'a', B AS t = 'b' AND v > FIRST(A.v, 9))""".stripMargin)
    assert(out3 === Seq())
  }

  test("streaming FIRST/LAST offsets in DEFINE match the batch matcher") {
    import spark.implicits._
    Seq((1L, 1L, "a", 10L), (1L, 2L, "a", 30L), (1L, 3L, "a", 20L),
      (1L, 4L, "b", 31L), (1L, 5L, "b", 25L),
      (2L, 1L, "a", 1L), (2L, 2L, "a", 2L), (2L, 3L, "a", 3L),
      (2L, 4L, "b", 9L), (2L, 5L, "b", 3L))
      .toDF("k", "o", "t", "v").createOrReplaceTempView("mr_defoff_eq")
    val q =
      """SELECT * FROM mr_defoff_eq MATCH_RECOGNIZE (
        |  PARTITION BY k ORDER BY o
        |  MEASURES COUNT(A.*) AS na, COUNT(B.*) AS nb, MATCH_NUMBER() AS mn
        |  ONE ROW PER MATCH AFTER MATCH SKIP PAST LAST ROW
        |  PATTERN (A{3} B+)
        |  DEFINE A AS t = 'a', B AS t = 'b' AND v > FIRST(A.v, 1))""".stripMargin
    val batchSql = MatchRecognize.rewrite(spark, q)
    val streamSql = MatchRecognize.rewriteStreaming(spark, q,
      _ => Some(("o", "5 seconds")))
    try {
      val batch = spark.sql(batchSql).collect().map(_.toSeq).toSet
      val streamed = spark.sql(streamSql).collect().map(_.toSeq).toSet
      assert(streamed === batch)
      // k=1: threshold FIRST(A.v,1)=30 → one B (31); k=2: threshold 2
      // → both B rows (9, 3) pass
      assert(batch === Set(Seq(1L, 3L, 1L, 1L), Seq(2L, 3L, 2L, 1L)))
    } finally {
      MatchRecognize.dropViews(spark, batchSql)
      MatchRecognize.dropViews(spark, streamSql)
    }
  }

  test("streaming FIRST/LAST offsets match the batch matcher") {
    import spark.implicits._
    Seq((1L, 1L, "s", 10L), (1L, 2L, "b", 20L), (1L, 3L, "b", 30L),
      (1L, 4L, "b", 40L),
      (2L, 1L, "s", 5L), (2L, 2L, "b", 6L))
      .toDF("k", "o", "t", "v").createOrReplaceTempView("mr_off_eq")
    val q =
      """SELECT * FROM mr_off_eq MATCH_RECOGNIZE (
        |  PARTITION BY k ORDER BY o
        |  MEASURES FIRST(B.v, 1) AS f1, LAST(B.v, 1) AS l1,
        |    LAST(B.v, 9) AS l9, COUNT(B.*) AS nb
        |  ONE ROW PER MATCH AFTER MATCH SKIP PAST LAST ROW
        |  PATTERN (S B+)
        |  DEFINE S AS t = 's', B AS t = 'b')""".stripMargin
    val batchSql = MatchRecognize.rewrite(spark, q)
    val streamSql = MatchRecognize.rewriteStreaming(spark, q,
      _ => Some(("o", "5 seconds")))
    try {
      val batch = spark.sql(batchSql).collect().map(_.toSeq).toSet
      val streamed = spark.sql(streamSql).collect().map(_.toSeq).toSet
      assert(streamed === batch)
      // k=1: B rows 20,30,40 → f1=30, l1=30, l9 past the list = NULL;
      // k=2: one B row → offset 1 is NULL for both
      assert(batch === Set(Seq(1L, 30L, 30L, null, 3L),
        Seq(2L, null, null, null, 1L)))
    } finally {
      MatchRecognize.dropViews(spark, batchSql)
      MatchRecognize.dropViews(spark, streamSql)
    }
  }

  test("NEXT() navigation in DEFINE looks one row ahead") {
    // a peak: row higher than both physical neighbors
    seq((1, 1, "x", 1), (1, 2, "x", 5), (1, 3, "x", 2), (1, 4, "x", 7),
      (1, 5, "x", 3))
    val out = run(
      """SELECT * FROM mr_in MATCH_RECOGNIZE (
        |  PARTITION BY k ORDER BY o
        |  MEASURES P.o AS po, P.v AS pv
        |  AFTER MATCH SKIP PAST LAST ROW
        |  PATTERN (P)
        |  DEFINE P AS v > PREV(v) AND v > NEXT(v))""".stripMargin)
    // rows 2 (5>1, 5>2) and 4 (7>2, 7>3) are peaks; rows 1 and 5 have
    // a NULL neighbor → predicate unknown → no match
    assert(out === Seq(Seq(1L, 2L, 5L), Seq(1L, 4L, 7L)))
  }

  test("NEXT(expr, k) navigates k ahead over an expression") {
    seq((1, 1, "x", 1), (1, 2, "x", 2), (1, 3, "x", 3), (1, 4, "x", 10))
    val out = run(
      """SELECT * FROM mr_in MATCH_RECOGNIZE (
        |  PARTITION BY k ORDER BY o
        |  MEASURES A.o AS ao
        |  AFTER MATCH SKIP PAST LAST ROW
        |  PATTERN (A)
        |  DEFINE A AS NEXT(v * 2, 2) > 15)""".stripMargin)
    // row 1: NEXT(v*2,2) = v(3)*2 = 6 — no; row 2: v(4)*2 = 20 — yes;
    // rows 3,4: navigation past the partition end is NULL — no
    assert(out === Seq(Seq(1L, 2L)))
  }

  test("streaming NEXT() in DEFINE matches the batch matcher") {
    import spark.implicits._
    // local peaks: above both physical neighbors — PREV and NEXT in
    // one DEFINE, batch vs streaming rewrite on the same ordered data
    Seq((1L, 1L, 1L), (1L, 2L, 5L), (1L, 3L, 2L), (1L, 4L, 7L),
      (1L, 5L, 3L), (2L, 1L, 9L), (2L, 2L, 1L))
      .toDF("k", "o", "v").createOrReplaceTempView("mr_next_eq")
    val q =
      """SELECT * FROM mr_next_eq MATCH_RECOGNIZE (
        |  PARTITION BY k ORDER BY o
        |  MEASURES P.v AS pv, MATCH_NUMBER() AS mn
        |  ONE ROW PER MATCH AFTER MATCH SKIP PAST LAST ROW
        |  PATTERN (P)
        |  DEFINE P AS v > PREV(v) AND v > NEXT(v))""".stripMargin
    val batchSql = MatchRecognize.rewrite(spark, q)
    val streamSql = MatchRecognize.rewriteStreaming(spark, q,
      _ => Some(("o", "5 seconds")))
    try {
      val batch = spark.sql(batchSql).collect().map(_.toSeq).toSet
      val streamed = spark.sql(streamSql).collect().map(_.toSeq).toSet
      assert(streamed === batch)
      assert(batch === Set(Seq(1L, 5L, 1L), Seq(1L, 7L, 2L)))
    } finally {
      MatchRecognize.dropViews(spark, batchSql)
      MatchRecognize.dropViews(spark, streamSql)
    }
  }

  test("streaming NEXT defers the boundary row until its successor matures") {
    // the candidate peak is the LAST matured row of batch 1: its NEXT
    // is unknown, so no decision may emit (in either direction) until
    // the successor arrives — then the peak must still be found
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sc = spark.sqlContext
    def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)
    val input = MemoryStream[(String, java.sql.Timestamp, Long)]
    input.toDF().toDF("k", "ts", "v").createOrReplaceTempView("mr_next_s")
    val q =
      """SELECT * FROM mr_next_s MATCH_RECOGNIZE (
        |  PARTITION BY k ORDER BY ts
        |  MEASURES P.v AS pv, MATCH_NUMBER() AS mn
        |  ONE ROW PER MATCH AFTER MATCH SKIP PAST LAST ROW
        |  PATTERN (P)
        |  DEFINE P AS v > PREV(v) AND v > NEXT(v))""".stripMargin
    val streamSql = MatchRecognize.rewriteStreaming(spark, q,
      _ => Some(("ts", "5 seconds")))
    val query = spark.sql(streamSql).writeStream.format("memory")
      .queryName("mr_next_out").outputMode("append").start()
    try {
      // batch 1: 1, 5 — row 5 rises but its successor is unknown; z
      // drives the watermark to 17 s (past both, NOT past batch 2)
      input.addData(("g", ts(10), 1L), ("g", ts(20), 5L),
        ("z", ts(22), 0L))
      query.processAllAvailable()
      assert(spark.table("mr_next_out").collect()
        .count(_.getString(0) == "g") === 0,
        "peak decided before its successor matured")
      // batch 2: the falling successor closes the peak; z matures all
      input.addData(("g", ts(30), 2L), ("z", ts(300), 0L))
      query.processAllAvailable()
      input.addData(("z", ts(900), 0L))
      query.processAllAvailable()
      val got = spark.table("mr_next_out").collect()
        .filter(_.getString(0) == "g")
        .map(r => (r.getLong(1), r.getLong(2))).toSet
      assert(got === Set((5L, 1L)))
    } finally {
      query.stop()
      MatchRecognize.dropViews(spark, streamSql)
    }
  }

  test("streaming grouped sub-patterns match the batch matcher") {
    import spark.implicits._
    // retry cycles, iteration backtracking, bounded group quantifiers
    // — compared batch vs streaming rewrite on the same ordered data
    Seq(
      (1L, 1L, "a"), (1L, 2L, "b"), (1L, 3L, "a"), (1L, 4L, "b"),
      (1L, 5L, "s"),
      (2L, 1L, "a"), (2L, 2L, "b"), (2L, 3L, "s"),
      (3L, 1L, "a"), (3L, 2L, "b"), (3L, 3L, "a"), (3L, 4L, "s"))
      .toDF("k", "o", "t").createOrReplaceTempView("mr_grp_eq")
    val queries = Seq(
      """SELECT * FROM mr_grp_eq MATCH_RECOGNIZE (
        |  PARTITION BY k ORDER BY o
        |  MEASURES COUNT(A.*) AS na, COUNT(B.*) AS nb, MATCH_NUMBER() AS mn
        |  ONE ROW PER MATCH AFTER MATCH SKIP PAST LAST ROW
        |  PATTERN ((A B)+ S)
        |  DEFINE A AS t = 'a', B AS t = 'b', S AS t = 's')""".stripMargin,
      """SELECT * FROM mr_grp_eq MATCH_RECOGNIZE (
        |  PARTITION BY k ORDER BY o
        |  MEASURES COUNT(A.*) AS na, MATCH_NUMBER() AS mn
        |  ONE ROW PER MATCH AFTER MATCH SKIP PAST LAST ROW
        |  PATTERN ((A B){1,2})
        |  DEFINE A AS t = 'a', B AS t = 'b')""".stripMargin)
    for (q <- queries) {
      val batchSql = MatchRecognize.rewrite(spark, q)
      val streamSql = MatchRecognize.rewriteStreaming(spark, q,
        _ => Some(("o", "5 seconds")))
      try {
        val batch = spark.sql(batchSql).collect().map(_.toSeq).toSet
        val streamed = spark.sql(streamSql).collect().map(_.toSeq).toSet
        assert(streamed === batch, s"query:\n$q")
      } finally {
        MatchRecognize.dropViews(spark, batchSql)
        MatchRecognize.dropViews(spark, streamSql)
      }
    }
  }

  test("streaming grouped sub-pattern defers across micro-batches") {
    // the group's first iteration arrives in batch 1; (A B)+ could
    // extend, so nothing may emit until the closing S matures — the
    // decision must defer (hitEnd) across the group boundary, then
    // produce exactly the batch answer
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sc = spark.sqlContext
    def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)
    val input = MemoryStream[(String, java.sql.Timestamp, String)]
    input.toDF().toDF("k", "ts", "t").createOrReplaceTempView("mr_grp_s")
    val q =
      """SELECT * FROM mr_grp_s MATCH_RECOGNIZE (
        |  PARTITION BY k ORDER BY ts
        |  MEASURES COUNT(A.*) AS na, COUNT(B.*) AS nb, MATCH_NUMBER() AS mn
        |  ONE ROW PER MATCH AFTER MATCH SKIP PAST LAST ROW
        |  PATTERN ((A B)+ S)
        |  DEFINE A AS t = 'a', B AS t = 'b', S AS t = 's')""".stripMargin
    val streamSql = MatchRecognize.rewriteStreaming(spark, q,
      _ => Some(("ts", "5 seconds")))
    val query = spark.sql(streamSql).writeStream.format("memory")
      .queryName("mr_grp_out").outputMode("append").start()
    try {
      // batch 1: one full (a b) pair, undecided — the group may
      // extend. z drives the watermark to 17 s: past nothing of g's,
      // and NOT past batch 2's rows (a later-than-watermark arrival
      // would be dropped as late upstream)
      input.addData(("g", ts(10), "a"), ("g", ts(20), "b"),
        ("z", ts(22), "x"))
      query.processAllAvailable()
      val mid = spark.table("mr_grp_out").collect()
        .filter(_.getString(0) == "g")
      assert(mid.isEmpty, "group decision leaked before the closing S")
      // batch 2: second pair + closing s, then a watermark driver
      input.addData(("g", ts(30), "a"), ("g", ts(40), "b"),
        ("g", ts(50), "s"), ("z", ts(300), "x"))
      query.processAllAvailable()
      input.addData(("z", ts(900), "x"))
      query.processAllAvailable()
      val got = spark.table("mr_grp_out").collect()
        .filter(_.getString(0) == "g")
        .map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      assert(got === Set((2L, 2L, 1L)))
    } finally {
      query.stop()
      MatchRecognize.dropViews(spark, streamSql)
    }
  }

  test("running SUM in DEFINE stops the greedy run at the budget") {
    // B's running sum (including the candidate row, SQL:2016 running
    // semantics) may not exceed 10: rows 4+5=9 pass, +3 would be 12
    seq((1, 1, "s", 0), (1, 2, "b", 4), (1, 3, "b", 5), (1, 4, "b", 3),
      (1, 5, "b", 2))
    val out = run(
      """SELECT * FROM mr_in MATCH_RECOGNIZE (
        |  PARTITION BY k ORDER BY o
        |  MEASURES COUNT(B.*) AS nb, SUM(B.v) AS sb
        |  ONE ROW PER MATCH AFTER MATCH SKIP PAST LAST ROW
        |  PATTERN (S B*)
        |  DEFINE S AS t = 's', B AS t = 'b' AND SUM(B.v) <= 10)""".stripMargin)
    assert(out === Seq(Seq(1L, 2L, 9L)))
  }

  test("DEFINE aggregate over ANOTHER variable's assigned rows") {
    // C must beat the average of the A rows the match assigned
    seq((1, 1, "a", 5), (1, 2, "a", 7), (1, 3, "c", 6),
      (2, 1, "a", 5), (2, 2, "a", 7), (2, 3, "c", 8))
    val out = run(
      """SELECT * FROM mr_in MATCH_RECOGNIZE (
        |  PARTITION BY k ORDER BY o
        |  MEASURES C.v AS cv
        |  PATTERN (A{2} C)
        |  DEFINE A AS t = 'a', C AS t = 'c' AND v > AVG(A.v))""".stripMargin)
    // k=1: 6 > avg(5,7)=6 is false — no match; k=2: 8 > 6 matches
    assert(out === Seq(Seq(2L, 8L)))
  }

  test("MIN/MAX in DEFINE: bounded-spread run splits at the breach") {
    seq((1, 1, "x", 5), (1, 2, "x", 6), (1, 3, "x", 7), (1, 4, "x", 9))
    val out = run(
      """SELECT * FROM mr_in MATCH_RECOGNIZE (
        |  PARTITION BY k ORDER BY o
        |  MEASURES COUNT(R.*) AS nr, MIN(R.v) AS lo, MAX(R.v) AS hi
        |  AFTER MATCH SKIP PAST LAST ROW
        |  PATTERN (R+)
        |  DEFINE R AS MAX(R.v) - MIN(R.v) <= 2)""".stripMargin)
    // greedy run 5,6,7 (spread 2); 9 would make it 4 → new match
    assert(out === Seq(Seq(1L, 3L, 5L, 7L), Seq(1L, 1L, 9L, 9L)))
  }

  test("DEFINE aggregate over an unmatched variable is NULL → no match") {
    seq((1, 1, "a", 1), (1, 2, "c", 9))
    val out = run(
      """SELECT * FROM mr_in MATCH_RECOGNIZE (
        |  PARTITION BY k ORDER BY o
        |  MEASURES COUNT(*) AS n
        |  PATTERN (A B* C)
        |  DEFINE A AS t = 'a', B AS t = 'b',
        |    C AS t = 'c' AND v > SUM(B.v))""".stripMargin)
    // B matched zero rows: SUM(B.v) is NULL, the predicate is unknown,
    // and C cannot match — SQL three-valued logic, Flink CEP behavior
    assert(out === Seq.empty)
  }

  test("ALL ROWS PER MATCH emits every matched row with RUNNING measures") {
    // one V C C P match: 4 rows out, counts and LAST grow row by row;
    // the unmatched trailing row (o=5) is omitted
    seq((1, 1, "view", 10), (1, 2, "click", 20), (1, 3, "click", 30),
      (1, 4, "purchase", 40), (1, 5, "view", 50))
    val out = run(
      """SELECT o, nc, lastc, mn FROM mr_in MATCH_RECOGNIZE (
        |  PARTITION BY k ORDER BY o
        |  MEASURES COUNT(C.*) AS nc, LAST(C.v) AS lastc, MATCH_NUMBER() AS mn
        |  ALL ROWS PER MATCH
        |  PATTERN (V C+ P)
        |  DEFINE V AS t = 'view', C AS t = 'click', P AS t = 'purchase')""".stripMargin)
    assert(out === Seq(
      Seq(1L, 0L, null, 1L),
      Seq(2L, 1L, 20L, 1L),
      Seq(3L, 2L, 30L, 1L),
      Seq(4L, 2L, 30L, 1L)))
  }

  test("ALL ROWS PER MATCH with SKIP TO NEXT ROW re-emits overlapping rows") {
    // A A with every row matching: matches (1,2), (2,3) — row 2 appears
    // in both, with its per-match running count
    seq((1, 1, "a", 0), (1, 2, "a", 0), (1, 3, "a", 0))
    val out = run(
      """SELECT o, na, mn FROM mr_in MATCH_RECOGNIZE (
        |  PARTITION BY k ORDER BY o
        |  MEASURES COUNT(A.*) AS na, MATCH_NUMBER() AS mn
        |  ALL ROWS PER MATCH
        |  AFTER MATCH SKIP TO NEXT ROW
        |  PATTERN (A A)
        |  DEFINE A AS t = 'a')""".stripMargin)
    assert(out === Seq(
      Seq(1L, 1L, 1L), Seq(2L, 2L, 1L),
      Seq(2L, 1L, 2L), Seq(3L, 2L, 2L)))
  }

  test("alternation prefers the leftmost branch that matches") {
    // both branches match rows 1-2; A P must win over B P
    seq((1, 1, "x", 0), (1, 2, "p", 0))
    val out = run(
      """SELECT na, nb FROM mr_in MATCH_RECOGNIZE (
        |  PARTITION BY k ORDER BY o
        |  MEASURES COUNT(A.*) AS na, COUNT(B.*) AS nb
        |  PATTERN (A P | B P)
        |  DEFINE A AS t = 'x', B AS t = 'x', P AS t = 'p')""".stripMargin)
    assert(out === Seq(Seq(1L, 0L)))
  }

  test("alternation falls through to a later branch when earlier ones fail") {
    seq((1, 1, "y", 0), (1, 2, "p", 0))
    val out = run(
      """SELECT na, nb FROM mr_in MATCH_RECOGNIZE (
        |  PARTITION BY k ORDER BY o
        |  MEASURES COUNT(A.*) AS na, COUNT(B.*) AS nb
        |  PATTERN (A P | B P)
        |  DEFINE A AS t = 'x', B AS t = 'y', P AS t = 'p')""".stripMargin)
    assert(out === Seq(Seq(0L, 1L)))
  }

  test("PERMUTE matches the variables in any order") {
    // B then A in the data: the A B branch fails, B A matches
    seq((1, 1, "b", 0), (1, 2, "a", 0), (2, 1, "a", 0), (2, 2, "b", 0))
    val out = run(
      """SELECT k, ao, bo FROM mr_in MATCH_RECOGNIZE (
        |  PARTITION BY k ORDER BY o
        |  MEASURES LAST(A.o) AS ao, LAST(B.o) AS bo
        |  PATTERN (PERMUTE(A, B))
        |  DEFINE A AS t = 'a', B AS t = 'b')""".stripMargin)
    assert(out.toSet === Set(Seq(1L, 2L, 1L), Seq(2L, 1L, 2L)))
  }

  test("streaming alternation and SKIP TO match the batch matcher") {
    // cross-implementation equivalence: the streaming tracker (batch
    // mode — bounded input, identical code path) must reproduce the
    // batch NFA's output for alternation preference and SKIP TO LAST
    // chaining on the same data
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val rows = (1 to 60).map { i =>
      (1L + i % 3, i.toLong, Seq("a", "b", "c")(rnd.nextInt(3)), (i % 7).toLong)
    }
    rows.toDF("k", "o", "t", "v").createOrReplaceTempView("mr_alt_eq")
    val queries = Seq(
      // alternation: leftmost branch preferred
      """SELECT * FROM mr_alt_eq MATCH_RECOGNIZE (
        |  PARTITION BY k ORDER BY o
        |  MEASURES COUNT(A.*) AS na, COUNT(B.*) AS nb, COUNT(C.*) AS ncc,
        |    MATCH_NUMBER() AS mn
        |  PATTERN (A B | C)
        |  DEFINE A AS t = 'a', B AS t = 'b', C AS t = 'c')""".stripMargin,
      // SKIP TO LAST chaining over adjacent pairs
      """SELECT * FROM mr_alt_eq MATCH_RECOGNIZE (
        |  PARTITION BY k ORDER BY o
        |  MEASURES COUNT(*) AS n, MATCH_NUMBER() AS mn
        |  AFTER MATCH SKIP TO LAST B
        |  PATTERN (A B)
        |  DEFINE A AS v >= 0, B AS v >= 0)""".stripMargin,
      // PREV navigation: ascending-run detection (q65 shape)
      """SELECT * FROM mr_alt_eq MATCH_RECOGNIZE (
        |  PARTITION BY k ORDER BY o
        |  MEASURES LAST(R.v) AS ev, COUNT(R.*) AS len, MATCH_NUMBER() AS mn
        |  AFTER MATCH SKIP PAST LAST ROW
        |  PATTERN (S R+)
        |  DEFINE R AS v > PREV(v))""".stripMargin,
      // PREV(col, k): compare two physical rows back (measure v, not o:
      // the event-time column decodes as TIMESTAMP in streaming)
      """SELECT * FROM mr_alt_eq MATCH_RECOGNIZE (
        |  PARTITION BY k ORDER BY o
        |  MEASURES LAST(B.v) AS bv, MATCH_NUMBER() AS mn
        |  AFTER MATCH SKIP PAST LAST ROW
        |  PATTERN (A B)
        |  DEFINE B AS v > PREV(v, 2))""".stripMargin,
      // CLASSIFIER under alternation: the winning branch's last variable
      """SELECT * FROM mr_alt_eq MATCH_RECOGNIZE (
        |  PARTITION BY k ORDER BY o
        |  MEASURES CLASSIFIER() AS cls, COUNT(*) AS n, MATCH_NUMBER() AS mn
        |  PATTERN (A B | C)
        |  DEFINE A AS t = 'a', B AS t = 'b', C AS t = 'c')""".stripMargin,
      // PREV over an EXPRESSION: batch lags the expression; streaming
      // precomputes it as a synthetic lagged payload column
      """SELECT * FROM mr_alt_eq MATCH_RECOGNIZE (
        |  PARTITION BY k ORDER BY o
        |  MEASURES LAST(R.v) AS ev, COUNT(R.*) AS len, MATCH_NUMBER() AS mn
        |  AFTER MATCH SKIP PAST LAST ROW
        |  PATTERN (S R+)
        |  DEFINE R AS v > PREV(v + 1))""".stripMargin,
      // PREV(expr, 0) is the current row's value (lag 0) in both
      // runtimes — no lag slot needed at all
      """SELECT * FROM mr_alt_eq MATCH_RECOGNIZE (
        |  PARTITION BY k ORDER BY o
        |  MEASURES COUNT(A.*) AS na, MATCH_NUMBER() AS mn
        |  AFTER MATCH SKIP PAST LAST ROW
        |  PATTERN (A+)
        |  DEFINE A AS PREV(v % 3, 0) = 1)""".stripMargin,
      // string literals are opaque to navigation detection: a payload
      // that LOOKS like `S.t AND PREV(` must not be rewritten or split
      """SELECT * FROM mr_alt_eq MATCH_RECOGNIZE (
        |  PARTITION BY k ORDER BY o
        |  MEASURES COUNT(A.*) AS na, MATCH_NUMBER() AS mn
        |  AFTER MATCH SKIP PAST LAST ROW
        |  PATTERN (S A+)
        |  DEFINE A AS t = 'a' AND v > PREV(v) AND t <> 'S.t AND PREV(')""".stripMargin,
      // aggregate measures over a quantified variable under alternation:
      // the C branch leaves A and B unmatched (NULL aggregates)
      """SELECT * FROM mr_alt_eq MATCH_RECOGNIZE (
        |  PARTITION BY k ORDER BY o
        |  MEASURES SUM(A.v) AS sv, MIN(A.v) AS mv, MAX(B.v) AS xv,
        |    AVG(A.v) AS av, MATCH_NUMBER() AS mn
        |  AFTER MATCH SKIP PAST LAST ROW
        |  PATTERN (A+ B | C)
        |  DEFINE A AS t = 'a', B AS t = 'b', C AS t = 'c')""".stripMargin)
    for (q <- queries) {
      val batchSql = MatchRecognize.rewrite(spark, q)
      val streamSql = MatchRecognize.rewriteStreaming(spark, q,
        _ => Some(("o", "5 seconds")))
      try {
        val batch = spark.sql(batchSql).collect().map(_.toSeq).toSet
        val streamed = spark.sql(streamSql).collect().map(_.toSeq).toSet
        assert(streamed === batch, s"query:\n$q")
      } finally {
        MatchRecognize.dropViews(spark, batchSql)
        MatchRecognize.dropViews(spark, streamSql)
      }
    }
  }

  test("cross-variable DEFINE: FIRST(S.col) bounds a falling run") {
    // Flink CEP's canonical shape: rows below the match's start value.
    // S is undefined (matches any row); D's predicate compares against
    // the running FIRST of S — constant once S is assigned.
    seq((1, 1, "x", 10), (1, 2, "x", 7), (1, 3, "x", 8), (1, 4, "x", 12),
      (1, 5, "x", 3))
    val out = run(
      """SELECT sv, nd FROM mr_in MATCH_RECOGNIZE (
        |  PARTITION BY k ORDER BY o
        |  MEASURES FIRST(S.v) AS sv, COUNT(D.*) AS nd
        |  AFTER MATCH SKIP PAST LAST ROW
        |  PATTERN (S D+)
        |  DEFINE D AS v < FIRST(S.v))""".stripMargin)
    // S@1(10): D takes 7, 8 (12 breaks); S@4(12): D takes 3
    assert(out.toSet === Set(Seq(10L, 2L), Seq(12L, 1L)))
  }

  test("cross-variable DEFINE: bare V.col means LAST; NULL until assigned") {
    // C compares against LAST(B.v) (bare B.v, per the standard); an
    // optional referenced variable that matched no row makes the
    // predicate unknown, so the referencing row cannot match
    seq((1, 1, "a", 3), (1, 2, "b", 5), (1, 3, "c", 7),
      (2, 1, "b", 9), (2, 2, "c", 7))
    val out = run(
      """SELECT k, cv FROM mr_in MATCH_RECOGNIZE (
        |  PARTITION BY k ORDER BY o
        |  MEASURES LAST(C.v) AS cv
        |  AFTER MATCH SKIP PAST LAST ROW
        |  PATTERN (A B C)
        |  DEFINE A AS t = 'a', B AS t = 'b', C AS v > B.v)""".stripMargin)
    // k=1: 7 > 5 matches; k=2 has no 'a' so no match at all
    assert(out.toSet === Set(Seq(1L, 7L)))
    // optional referenced variable: B AS v > A.v with A? absent -> NULL
    seq((1, 1, "b", 5), (2, 1, "a", 3), (2, 2, "b", 5))
    val opt = run(
      """SELECT k, bv FROM mr_in MATCH_RECOGNIZE (
        |  PARTITION BY k ORDER BY o
        |  MEASURES LAST(B.v) AS bv
        |  AFTER MATCH SKIP PAST LAST ROW
        |  PATTERN (A? B)
        |  DEFINE A AS t = 'a', B AS v > A.v)""".stripMargin)
    assert(opt.toSet === Set(Seq(2L, 5L)))
  }

  test("cross-variable DEFINE: non-cross conjuncts precompute upstream") {
    // t = 'd' stays a Catalyst boolean; only v < FIRST(S.v) evaluates
    // in the matcher — mirrors the streaming PREV conjunct split
    seq((1, 1, "s", 10), (1, 2, "d", 7), (1, 3, "x", 6), (1, 4, "d", 5))
    val out = run(
      """SELECT nd FROM mr_in MATCH_RECOGNIZE (
        |  PARTITION BY k ORDER BY o
        |  MEASURES COUNT(D.*) AS nd
        |  AFTER MATCH SKIP PAST LAST ROW
        |  PATTERN (S D+)
        |  DEFINE S AS t = 's', D AS t = 'd' AND v < FIRST(S.v))""".stripMargin)
    // the run breaks at o=3 (t='x') even though 6 < 10
    assert(out === Seq(Seq(1L)))
  }

  test("cross-variable DEFINE works under ALL ROWS and alternation") {
    seq((1, 1, "x", 10), (1, 2, "x", 7), (1, 3, "x", 12))
    val all = run(
      """SELECT o, cls FROM mr_in MATCH_RECOGNIZE (
        |  PARTITION BY k ORDER BY o
        |  MEASURES CLASSIFIER() AS cls
        |  ALL ROWS PER MATCH AFTER MATCH SKIP PAST LAST ROW
        |  PATTERN (S D | S U)
        |  DEFINE D AS v < FIRST(S.v), U AS v > FIRST(S.v))""".stripMargin)
    // S@1 D@2 (7<10); then S@3 alone cannot complete either branch
    assert(all.toSet === Set(Seq(1L, "S"), Seq(2L, "D")))
  }

  test("streaming cross-variable DEFINE equals batch, incl. mixed with PREV") {
    // the canonical falling-run (D below FIRST(S.v)) plus a define
    // combining a PREV conjunct and a cross conjunct — PREV bits
    // recompute per-row, cross conjuncts evaluate during matching
    import spark.implicits._
    val rnd = new scala.util.Random(31)
    val rows = (1 to 40).map { i =>
      (1L + i % 2, i.toLong, "x", rnd.nextInt(6).toLong)
    }
    rows.toDF("k", "o", "t", "v").createOrReplaceTempView("mr_cross_eq")
    val queries = Seq(
      """SELECT * FROM mr_cross_eq MATCH_RECOGNIZE (
        |  PARTITION BY k ORDER BY o
        |  MEASURES FIRST(S.v) AS sv, COUNT(D.*) AS nd, MATCH_NUMBER() AS mn
        |  AFTER MATCH SKIP PAST LAST ROW
        |  PATTERN (S D+)
        |  DEFINE D AS v < FIRST(S.v))""".stripMargin,
      """SELECT * FROM mr_cross_eq MATCH_RECOGNIZE (
        |  PARTITION BY k ORDER BY o
        |  MEASURES COUNT(R.*) AS nr, MATCH_NUMBER() AS mn
        |  AFTER MATCH SKIP PAST LAST ROW
        |  PATTERN (S R+)
        |  DEFINE R AS v > PREV(v) AND v > FIRST(S.v))""".stripMargin,
      // top-level OR: un-splittable, the whole predicate (current-row
      // conjunct included) moves tracker-side
      """SELECT * FROM mr_cross_eq MATCH_RECOGNIZE (
        |  PARTITION BY k ORDER BY o
        |  MEASURES COUNT(D.*) AS nd, MATCH_NUMBER() AS mn
        |  AFTER MATCH SKIP PAST LAST ROW
        |  PATTERN (S D+)
        |  DEFINE D AS v < FIRST(S.v) OR v = 5)""".stripMargin)
    for (q <- queries) {
      val batchSql = MatchRecognize.rewrite(spark, q)
      val streamSql = MatchRecognize.rewriteStreaming(spark, q,
        _ => Some(("o", "5 seconds")))
      try {
        val batch = spark.sql(batchSql).collect().map(_.toSeq).toSet
        val streamed = spark.sql(streamSql).collect().map(_.toSeq).toSet
        assert(streamed === batch, s"query:\n$q")
        assert(batch.nonEmpty, s"degenerate data for:\n$q")
      } finally {
        MatchRecognize.dropViews(spark, batchSql)
        MatchRecognize.dropViews(spark, streamSql)
      }
    }
  }

  test("streaming cross-variable DEFINE gates non-lossless columns") {
    import spark.implicits._
    Seq((1L, ts1(1), 2.5d)).toDF("k", "ts", "dv")
      .createOrReplaceTempView("mr_cross_dbl")
    val e = intercept[IllegalArgumentException](
      MatchRecognize.rewriteStreaming(spark,
        """SELECT * FROM mr_cross_dbl MATCH_RECOGNIZE (
          |  PARTITION BY k ORDER BY ts
          |  MEASURES COUNT(*) AS n
          |  PATTERN (A B)
          |  DEFINE B AS dv > FIRST(A.dv))""".stripMargin,
        _ => Some(("ts", "5 seconds"))))
    assert(e.getMessage.contains("round-trip"), s"message: ${e.getMessage}")
  }

  test("CLASSIFIER() names the matched branch; per-row under ALL ROWS") {
    // ONE ROW PER MATCH: the variable of the match's LAST row — under
    // alternation that is exactly which branch won
    seq((1, 1, "view", 0), (1, 2, "click", 0), (1, 3, "click", 0),
      (1, 4, "view", 0), (1, 5, "purchase", 0))
    val one = run(
      """SELECT k, cls, n FROM mr_in MATCH_RECOGNIZE (
        |  PARTITION BY k ORDER BY o
        |  MEASURES CLASSIFIER() AS cls, COUNT(*) AS n
        |  ONE ROW PER MATCH AFTER MATCH SKIP PAST LAST ROW
        |  PATTERN (V C+ | V P)
        |  DEFINE V AS t = 'view', C AS t = 'click', P AS t = 'purchase')""".stripMargin)
    assert(one.toSet === Set(Seq(1L, "C", 3L), Seq(1L, "P", 2L)))
    // ALL ROWS PER MATCH: running semantics — each output row carries
    // ITS OWN variable name
    val all = run(
      """SELECT o, cls FROM mr_in MATCH_RECOGNIZE (
        |  PARTITION BY k ORDER BY o
        |  MEASURES CLASSIFIER() AS cls
        |  ALL ROWS PER MATCH AFTER MATCH SKIP PAST LAST ROW
        |  PATTERN (V C+ | V P)
        |  DEFINE V AS t = 'view', C AS t = 'click', P AS t = 'purchase')""".stripMargin)
    assert(all.toSet === Set(Seq(1L, "V"), Seq(2L, "C"), Seq(3L, "C"),
      Seq(4L, "V"), Seq(5L, "P")))
  }

  test("streaming PREV sees predecessors consumed by an earlier match") {
    // physical navigation crosses match boundaries AND micro-batch
    // boundaries: the row matched (and consumed) in batch 1 is the
    // PREV context for the first row of batch 2 — without the retained
    // ctx payload the second match could not form
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sc = spark.sqlContext
    def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)
    val input = MemoryStream[(String, java.sql.Timestamp, Long)]
    input.toDF().toDF("k", "ts", "vm").createOrReplaceTempView("mr_prev_s")
    val q =
      """SELECT * FROM mr_prev_s MATCH_RECOGNIZE (
        |  PARTITION BY k ORDER BY ts
        |  MEASURES LAST(R.vm) AS rv, MATCH_NUMBER() AS mn
        |  AFTER MATCH SKIP PAST LAST ROW
        |  PATTERN (R)
        |  DEFINE R AS vm > PREV(vm))""".stripMargin
    val streamSql = MatchRecognize.rewriteStreaming(spark, q,
      _ => Some(("ts", "5 seconds")))
    val query = spark.sql(streamSql).writeStream.format("memory")
      .queryName("mr_prev_out").outputMode("append").start()
    try {
      // batch 1: vm 1 -> 3 rises at ts=20; the z key drives the
      // watermark to 22 s — past the rise, but NOT past batch 2's row
      // (a later-than-watermark arrival would be dropped as late). The
      // R@20 match is consumed, leaving only ctx := 3 behind.
      input.addData(("a", ts(10), 1L), ("a", ts(20), 3L), ("z", ts(27), 0L))
      query.processAllAvailable()
      // batch 2: vm=4 at ts=30 rises over the CONSUMED row's 3
      input.addData(("a", ts(30), 4L), ("z", ts(200), 0L))
      query.processAllAvailable()
      input.addData(("z", ts(900), 0L))
      query.processAllAvailable()
      val got = spark.table("mr_prev_out").collect()
        .filter(_.getString(0) == "a").map(r => (r.getLong(1), r.getLong(2)))
        .toSet
      assert(got === Set((3L, 1L), (4L, 2L)))
    } finally {
      query.stop()
      MatchRecognize.dropViews(spark, streamSql)
    }
  }

  test("streaming PREV ctx survives an all-no-match flush") {
    // rows finally passed over with NO match are still physical
    // predecessors: the state used to be removed outright when no
    // match had ever fired, dropping the ctx window and making the
    // next batch's PREV see NULL where batch semantics see a value
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sc = spark.sqlContext
    val input = MemoryStream[(String, java.sql.Timestamp, Long)]
    input.toDF().toDF("k", "ts", "vm").createOrReplaceTempView("mr_prev_flush")
    val q =
      """SELECT * FROM mr_prev_flush MATCH_RECOGNIZE (
        |  PARTITION BY k ORDER BY ts
        |  MEASURES LAST(R.vm) AS rv
        |  AFTER MATCH SKIP PAST LAST ROW
        |  PATTERN (R)
        |  DEFINE R AS vm > PREV(vm))""".stripMargin
    val streamSql = MatchRecognize.rewriteStreaming(spark, q,
      _ => Some(("ts", "5 seconds")))
    val query = spark.sql(streamSql).writeStream.format("memory")
      .queryName("mr_prev_flush_out").outputMode("append").start()
    try {
      // batch 1: 5 then 3 — both finally no-match (no PREV; 3 < 5);
      // every buffered row is consumed with zero matches fired
      input.addData(("a", ts1(10), 5L), ("a", ts1(20), 3L),
        ("z", ts1(27), 0L))
      query.processAllAvailable()
      // batch 2: 9 rises over the FLUSHED row's 3
      input.addData(("a", ts1(30), 9L), ("z", ts1(200), 0L))
      query.processAllAvailable()
      input.addData(("z", ts1(900), 0L))
      query.processAllAvailable()
      val got = spark.table("mr_prev_flush_out").collect()
        .filter(_.getString(0) == "a").map(_.getLong(1)).toSet
      assert(got === Set(9L))
    } finally {
      query.stop()
      MatchRecognize.dropViews(spark, streamSql)
    }
  }

  test("non-PREV conjuncts of a PREV define evaluate upstream, any type") {
    // DEFINE R AS score > 0.5 AND vm > PREV(vm): score is DOUBLE —
    // not JSON-lossless — but it never rides the tracker payload
    // because only the PREV-bearing conjunct moves tracker-side
    import spark.implicits._
    Seq((1L, 1L, 0.9d, 5L), (1L, 2L, 0.9d, 7L), (1L, 3L, 0.1d, 9L),
      (1L, 4L, 0.9d, 11L))
      .toDF("k", "o", "score", "vm").createOrReplaceTempView("mr_prev_mixed")
    val q =
      """SELECT * FROM mr_prev_mixed MATCH_RECOGNIZE (
        |  PARTITION BY k ORDER BY o
        |  MEASURES LAST(R.vm) AS rv, MATCH_NUMBER() AS mn
        |  AFTER MATCH SKIP PAST LAST ROW
        |  PATTERN (R)
        |  DEFINE R AS score > 0.5 AND vm > PREV(vm))""".stripMargin
    val batchSql = MatchRecognize.rewrite(spark, q)
    val streamSql = MatchRecognize.rewriteStreaming(spark, q,
      _ => Some(("o", "5 seconds")))
    try {
      val batch = spark.sql(batchSql).collect().map(_.toSeq).toSet
      val streamed = spark.sql(streamSql).collect().map(_.toSeq).toSet
      // o=2 rises with score ok; o=3 rises but score fails; o=4 rises
      // (over o=3's vm, physical PREV) with score ok
      assert(batch === Set(Seq(1L, 7L, 1L), Seq(1L, 11L, 2L)))
      assert(streamed === batch)
    } finally {
      MatchRecognize.dropViews(spark, batchSql)
      MatchRecognize.dropViews(spark, streamSql)
    }
  }

  test("oversized PREV offset fails with the contract, not a parse error") {
    seq((1, 1, "x", 1))
    val e = intercept[IllegalArgumentException](
      MatchRecognize.rewriteStreaming(spark,
        """SELECT * FROM mr_in MATCH_RECOGNIZE (
          |  PARTITION BY k ORDER BY o MEASURES COUNT(*) AS n
          |  PATTERN (A B) DEFINE B AS v > PREV(v, 99999999999))""".stripMargin,
        _ => Some(("o", "5 seconds"))))
    assert(e.getMessage.contains("maximum of 16"), s"message: ${e.getMessage}")
  }

  test("streaming PREV gates non-lossless column types") {
    import spark.implicits._
    Seq((1L, ts1(1), 2.5d)).toDF("k", "ts", "dv")
      .createOrReplaceTempView("mr_prev_dbl")
    val e = intercept[IllegalArgumentException](
      MatchRecognize.rewriteStreaming(spark,
        """SELECT * FROM mr_prev_dbl MATCH_RECOGNIZE (
          |  PARTITION BY k ORDER BY ts
          |  MEASURES COUNT(*) AS n
          |  PATTERN (R)
          |  DEFINE R AS dv > PREV(dv))""".stripMargin,
        _ => Some(("ts", "5 seconds"))))
    assert(e.getMessage.contains("round-trip"), s"message: ${e.getMessage}")
  }

  private def ts1(sec: Long) = new java.sql.Timestamp(sec * 1000L)

  test("final-mode alternation tries every branch past a boundary touch") {
    // regression: a trailing row satisfying BOTH the first branch's
    // head and the fallback branch — (A B) probes B at input end and
    // latches hitEnd; in final (bounded) mode the scan must still try
    // C and emit its match, exactly like the batch NFA
    import spark.implicits._
    Seq((1L, 1L, "x", 5L)).toDF("k", "o", "t", "v")
      .createOrReplaceTempView("mr_alt_final")
    val q =
      """SELECT * FROM mr_alt_final MATCH_RECOGNIZE (
        |  PARTITION BY k ORDER BY o
        |  MEASURES COUNT(A.*) AS na, COUNT(C.*) AS ncc
        |  PATTERN (A B | C)
        |  DEFINE A AS v > 0, B AS t = 'b', C AS v > 0)""".stripMargin
    val batchSql = MatchRecognize.rewrite(spark, q)
    val streamSql = MatchRecognize.rewriteStreaming(spark, q,
      _ => Some(("o", "5 seconds")))
    try {
      val batch = spark.sql(batchSql).collect().map(_.toSeq).toSet
      val streamed = spark.sql(streamSql).collect().map(_.toSeq).toSet
      assert(batch === Set(Seq(1L, 0L, 1L)))
      assert(streamed === batch)
    } finally {
      MatchRecognize.dropViews(spark, batchSql)
      MatchRecognize.dropViews(spark, streamSql)
    }
  }

  test("PREV() in DEFINE navigates the physical previous row") {
    // ascending runs: v rises at o=2,3 (run 1) and o=5 (run 2); the
    // partition's first row can never be R (PREV is NULL there)
    seq((1, 1, "x", 5), (1, 2, "x", 7), (1, 3, "x", 9), (1, 4, "x", 2),
      (1, 5, "x", 8), (2, 1, "x", 3))
    val out = run(
      """SELECT * FROM mr_in MATCH_RECOGNIZE (
        |  PARTITION BY k ORDER BY o
        |  MEASURES S.v AS sv, LAST(R.v) AS ev, COUNT(R.*) AS len
        |  ONE ROW PER MATCH AFTER MATCH SKIP PAST LAST ROW
        |  PATTERN (S R+)
        |  DEFINE R AS v > PREV(v))""".stripMargin)
    assert(out.toSet === Set(Seq(1L, 5L, 9L, 2L), Seq(1L, 2L, 8L, 1L)))
  }

  test("PREV(col, k) uses the k-back physical row") {
    // B requires v > the value TWO rows back: at o=3 (9 > 5) and o=4
    // (12 > 7); with SKIP PAST LAST ROW the o=3 match consumes rows 2-3,
    // then rows 4-5 would need A at o=4... A matches any row, B at o=5
    // compares 4 > 9 = false, so only one more match never forms
    seq((1, 1, "x", 5), (1, 2, "x", 7), (1, 3, "x", 9), (1, 4, "x", 12),
      (1, 5, "x", 4))
    val out = run(
      """SELECT * FROM mr_in MATCH_RECOGNIZE (
        |  PARTITION BY k ORDER BY o
        |  MEASURES B.o AS bo
        |  PATTERN (A B)
        |  DEFINE B AS v > PREV(v, 2))""".stripMargin)
    assert(out === Seq(Seq(1L, 3L)))
  }

  test("LAST over a NULL column value returns NULL, not another row's value") {
    import spark.implicits._
    // last C row carries v = NULL: SQL:2016 LAST(C.v) is that row's
    // NULL, never an earlier C row's non-null v
    Seq((1L, 1L, "view", Some(0L)), (1L, 2L, "click", Some(5L)),
      (1L, 3L, "click", None), (1L, 4L, "purchase", Some(0L)))
      .toDF("k", "o", "t", "v").createOrReplaceTempView("mr_in")
    val out = spark.sql(MatchRecognize.rewrite(spark,
      """SELECT lastc FROM mr_in MATCH_RECOGNIZE (
        |  PARTITION BY k ORDER BY o
        |  MEASURES LAST(C.v) AS lastc
        |  PATTERN (V C+ P)
        |  DEFINE V AS t = 'view', C AS t = 'click', P AS t = 'purchase')""".stripMargin))
      .collect().toSeq.map(_.toSeq)
    assert(out === Seq(Seq(null)))
  }

  test("string literals with commas and parens survive clause parsing") {
    seq((1, 1, "a,b", 0), (1, 2, ":)", 0))
    val out = run(
      """SELECT ao, bo FROM mr_in MATCH_RECOGNIZE (
        |  PARTITION BY k ORDER BY o
        |  MEASURES LAST(A.o) AS ao, LAST(B.o) AS bo
        |  PATTERN (A B)
        |  DEFINE A AS t = 'a,b', B AS t = ':)')""".stripMargin)
    assert(out === Seq(Seq(1L, 2L)))
  }

  test("WITHIN bounds the match to rows inside the duration window") {
    import spark.implicits._
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    // A B+ within 10 seconds: the 00:00:09 row is in (9 < 10), the
    // 00:00:10 row is out (strict bound) — greedy B+ stops at the
    // boundary and the match still completes
    Seq((1L, t("2024-01-01 00:00:00"), "a"),
      (1L, t("2024-01-01 00:00:05"), "b"),
      (1L, t("2024-01-01 00:00:09"), "b"),
      (1L, t("2024-01-01 00:00:10"), "b"))
      .toDF("k", "ts", "t").createOrReplaceTempView("mr_win")
    val out = spark.sql(MatchRecognize.rewrite(spark,
      """SELECT nb FROM mr_win MATCH_RECOGNIZE (
        |  PARTITION BY k ORDER BY ts
        |  MEASURES COUNT(B.*) AS nb
        |  PATTERN (A B+) WITHIN INTERVAL '10' SECOND
        |  DEFINE A AS t = 'a', B AS t = 'b')""".stripMargin))
      .collect().toSeq.map(_.toSeq)
    assert(out === Seq(Seq(2L)))
  }

  test("WITHIN requires a TIMESTAMP order column in batch") {
    seq((1, 1, "a", 0))
    val e = intercept[IllegalArgumentException](run(
      """SELECT * FROM mr_in MATCH_RECOGNIZE (
        |  PARTITION BY k ORDER BY o
        |  MEASURES COUNT(*) AS n
        |  PATTERN (A) WITHIN INTERVAL '1' MINUTE
        |  DEFINE A AS t = 'a')""".stripMargin))
    assert(e.getMessage.contains("TIMESTAMP"), s"message: ${e.getMessage}")
  }

  test("streaming WITHIN prunes matches on the event-time horizon") {
    // Flink CEP's duration bound in streaming mode: a greedy B* run is
    // cut at ts(first) + n, strict — identical to the batch matcher.
    // Rows 0..9 at 1 s apart, A at v=0, B elsewhere, horizon 5 s: the
    // match takes A plus the 4 rows strictly inside the bound.
    import spark.implicits._
    (0L to 9L).map(i => (1L, new java.sql.Timestamp(1000000000L + i * 1000L), i % 10))
      .toDF("k", "ts", "v")
      .createOrReplaceTempView("mr_within_s")
    val rewritten = MatchRecognize.rewriteStreaming(spark,
      """SELECT * FROM mr_within_s MATCH_RECOGNIZE (
        |  PARTITION BY k ORDER BY ts
        |  MEASURES COUNT(*) AS n, COUNT(B.*) AS nb
        |  AFTER MATCH SKIP PAST LAST ROW
        |  PATTERN (A B*) WITHIN INTERVAL '5' SECOND
        |  DEFINE A AS v = 0, B AS v > 0)""".stripMargin,
      _ => Some(("ts", "5 seconds")))
    try {
      val out = spark.sql(rewritten).collect().map(_.toSeq)
      assert(out.toSeq === Seq(Seq(1L, 5L, 4L)))
    } finally MatchRecognize.dropViews(spark, rewritten)
  }

  test("SKIP TO LAST resumes at that row, allowing chained matches") {
    // A B with B also satisfying A's predicate: SKIP TO LAST B makes
    // each match's B row start the next match — a chain of overlapping
    // pairs, where SKIP PAST LAST ROW would take disjoint pairs only
    seq((1, 1, "x", 0), (1, 2, "x", 0), (1, 3, "x", 0), (1, 4, "x", 0))
    val out = run(
      """SELECT ao, bo FROM mr_in MATCH_RECOGNIZE (
        |  PARTITION BY k ORDER BY o
        |  MEASURES LAST(A.o) AS ao, LAST(B.o) AS bo
        |  AFTER MATCH SKIP TO LAST B
        |  PATTERN (A B)
        |  DEFINE A AS t = 'x', B AS t = 'x')""".stripMargin)
    assert(out === Seq(Seq(1L, 2L), Seq(2L, 3L), Seq(3L, 4L)))
  }

  test("SKIP TO an unmatched or match-start variable throws like Flink") {
    seq((1, 1, "a", 0), (1, 2, "b", 0))
    // B? matches zero rows -> SKIP TO LAST B has no target row
    val noRow = intercept[Exception](run(
      """SELECT * FROM mr_in MATCH_RECOGNIZE (
        |  PARTITION BY k ORDER BY o
        |  MEASURES COUNT(*) AS n
        |  AFTER MATCH SKIP TO LAST B
        |  PATTERN (A B?)
        |  DEFINE A AS t = 'a', B AS t = 'zzz')""".stripMargin))
    assert(exceptionChain(noRow).exists(m =>
      Option(m.getMessage).exists(_.contains("matched no row"))),
      s"got: ${noRow.getMessage}")
    // SKIP TO FIRST A = the match start -> infinite loop, must throw
    val loop = intercept[Exception](run(
      """SELECT * FROM mr_in MATCH_RECOGNIZE (
        |  PARTITION BY k ORDER BY o
        |  MEASURES COUNT(*) AS n
        |  AFTER MATCH SKIP TO FIRST A
        |  PATTERN (A+ B)
        |  DEFINE A AS t = 'a', B AS t = 'b')""".stripMargin))
    assert(exceptionChain(loop).exists(m =>
      Option(m.getMessage).exists(_.contains("infinite loop"))),
      s"got: ${loop.getMessage}")
  }

  private def exceptionChain(e: Throwable): Seq[Throwable] =
    Iterator.iterate(e)(_.getCause).takeWhile(_ != null).take(10).toSeq

  test("no PARTITION BY runs the pattern over one global sequence") {
    seq((1, 1, "a", 0), (2, 2, "b", 0), (1, 3, "c", 0))
    val out = run(
      """SELECT * FROM mr_in MATCH_RECOGNIZE (
        |  ORDER BY o
        |  MEASURES COUNT(*) AS n
        |  PATTERN (A B C)
        |  DEFINE A AS t = 'a', B AS t = 'b', C AS t = 'c')""".stripMargin)
    assert(out === Seq(Seq(3L)))
  }

  test("e2e: MATCH_RECOGNIZE script runs through sql-submit in batch mode") {
    import spark.implicits._
    Seq((1L, 1L, "view"), (1L, 2L, "click"), (1L, 3L, "purchase"))
      .toDF("u", "o", "t").createOrReplaceTempView("mr_e2e_events")
    val script = Files.createTempFile("mr", ".sql")
    Files.writeString(script,
      """SET execution.runtime-mode = batch;
        |SELECT u, s, e FROM mr_e2e_events
        |MATCH_RECOGNIZE (
        |  PARTITION BY u ORDER BY o
        |  MEASURES FIRST(V.o) AS s, LAST(P.o) AS e
        |  PATTERN (V C P)
        |  DEFINE V AS t = 'view', C AS t = 'click', P AS t = 'purchase'
        |);
        |""".stripMargin)
    new SqlSubmitAction(script.toString, Map.empty, Some(spark)).run()
  }

  test("streaming mode needs a WATERMARK-declared source") {
    import spark.implicits._
    Seq((1L, 1L, "view")).toDF("u", "o", "t")
      .createOrReplaceTempView("mr_stream_events")
    val script = Files.createTempFile("mrs", ".sql")
    Files.writeString(script,
      """SET execution.runtime-mode = streaming;
        |SELECT u FROM mr_stream_events
        |MATCH_RECOGNIZE (
        |  PARTITION BY u ORDER BY o
        |  MEASURES FIRST(V.o) AS s
        |  PATTERN (V) DEFINE V AS t = 'view');
        |""".stripMargin)
    val e = intercept[Exception](
      new SqlSubmitAction(script.toString, Map.empty, Some(spark)).run())
    val msg = Option(e.getCause).map(_.getMessage).getOrElse(e.getMessage)
    assert(msg.contains("WATERMARK declaration"))
  }

  test("streaming PREV accepts columns and expressions, rejects nested PREV") {
    seq((1, 1, "x", 1))
    // bare-column and expression forms both rewrite cleanly
    MatchRecognize.dropViews(spark, MatchRecognize.rewriteStreaming(spark,
      """SELECT * FROM mr_in MATCH_RECOGNIZE (
        |  PARTITION BY k ORDER BY o MEASURES COUNT(*) AS n
        |  PATTERN (A B) DEFINE B AS v > PREV(v))""".stripMargin,
      _ => Some(("o", "5 seconds"))))
    MatchRecognize.dropViews(spark, MatchRecognize.rewriteStreaming(spark,
      """SELECT * FROM mr_in MATCH_RECOGNIZE (
        |  PARTITION BY k ORDER BY o MEASURES COUNT(*) AS n
        |  PATTERN (A B) DEFINE B AS v > PREV(v + 1, 2))""".stripMargin,
      _ => Some(("o", "5 seconds"))))
    // same-direction nesting flattens to summed offsets (r13) — the
    // tracker sees flat atoms
    assert(MatchRecognize.flattenSameDirNav("v > PREV(v + PREV(v))")
      == "v > (PREV(v, 1) + PREV(v, 2))")
    assert(MatchRecognize.flattenSameDirNav("v > PREV(v + PREV(v + PREV(v)))")
      == "v > (PREV(v, 1) + (PREV(v, 2) + PREV(v, 3)))")
    // scientific-notation literals pass through the distributor intact
    // — '1e3' must NOT split into digit-run '1' + spurious column 'e3'
    assert(MatchRecognize.flattenSameDirNav("PREV(v + PREV(v) * 1e3) > 0")
      == "(PREV(v, 1) + PREV(v, 2) * 1e3) > 0")
    assert(MatchRecognize.flattenSameDirNav("PREV(v - PREV(v) - 1.5E+2) > 0")
      == "(PREV(v, 1) - PREV(v, 2) - 1.5E+2) > 0")
    // a letter glued to a digit run is not a shape the distributor
    // understands — unchanged, so the named batch-only rejection fires
    val glued = "v > PREV(v + PREV(v) + 1x2)"
    assert(MatchRecognize.flattenSameDirNav(glued) == glued)
    MatchRecognize.dropViews(spark, MatchRecognize.rewriteStreaming(spark,
      """SELECT * FROM mr_in MATCH_RECOGNIZE (
        |  PARTITION BY k ORDER BY o MEASURES COUNT(*) AS n
        |  PATTERN (A B) DEFINE B AS v > PREV(PREV(v) + 1))""".stripMargin,
      _ => Some(("o", "5 seconds"))))
    // MIXED-direction nesting flattens to the net offset GATED on the
    // intermediate row's existence (r14): batch evaluates the inner
    // navigation on that row, so `NEXT(PREV(v))` at the last row is
    // NULL even though `v` exists — the synthetic `kw((true), k)` slot
    // reproduces exactly that gate
    assert(MatchRecognize.flattenSameDirNav("v = NEXT(PREV(v))")
      == "v = (CASE WHEN NEXT((true), 1) IS NOT NULL THEN ((v)) END)")
    assert(MatchRecognize.flattenSameDirNav("v > NEXT(PREV(v, 2))")
      == "v > (CASE WHEN NEXT((true), 1) IS NOT NULL " +
        "THEN (PREV(v, 1)) END)")
    assert(MatchRecognize.flattenSameDirNav("PREV(NEXT(v), 2) > 0")
      == "(CASE WHEN PREV((true), 2) IS NOT NULL " +
        "THEN (PREV(v, 1)) END) > 0")
    // navigation BELOW another navigation (r15): the synthetic gate is
    // itself a navigation atom, so the outer shift composes it to its
    // net offset — a net-0 gate is the current row and drops entirely
    assert(MatchRecognize.flattenSameDirNav("v = NEXT(PREV(NEXT(v)))")
      == "v = ((((NEXT(v, 1)))))")
    assert(MatchRecognize.flattenSameDirNav("PREV(NEXT(PREV(v)) + 1) > 0")
      == "((((PREV(v, 1)))) + 1) > 0")
    // a surviving composed gate: PREV(PREV(NEXT(v,2)),3) needs rows at
    // partial sums -3, -4, -2 — existence at the extreme -4 implies
    // -3, and the atom PREV(v,2) enforces -2, so ONE gate at -4 is
    // exact and the level's own -3 gate is elided as covered
    assert(MatchRecognize.flattenSameDirNav("PREV(PREV(NEXT(v, 2)), 3) > 0")
      == "(((CASE WHEN PREV((true), 4) IS NOT NULL " +
        "THEN (PREV(v, 2)) END))) > 0")
    assert(MatchRecognize.flattenSameDirNav("v > NEXT(NEXT(PREV(v, 3)))")
      == "v > (((CASE WHEN NEXT((true), 2) IS NOT NULL " +
        "THEN (PREV(v, 1)) END)))")
    // a user-written CASE inside a navigation (r16): non-strict, so
    // the distribution gates the WHOLE body at the outer offset
    // unconditionally — batch evaluates the staged expression AT that
    // row, and the gate reproduces exactly its missing-row NULL
    assert(MatchRecognize.flattenSameDirNav(
      "v > PREV(CASE WHEN v > 0 THEN v ELSE 0 END + PREV(v))")
      == "v > (CASE WHEN PREV((true), 1) IS NOT NULL THEN " +
        "(CASE WHEN PREV(v, 1) > 0 THEN PREV(v, 1) ELSE 0 END " +
        "+ PREV(v, 2)) END)")
    // whitelisted scalar calls (COALESCE & co) distribute through
    // their argument tokens under the same gate
    assert(MatchRecognize.flattenSameDirNav(
      "v > PREV(coalesce(v, 0) + PREV(v))")
      == "v > (CASE WHEN PREV((true), 1) IS NOT NULL THEN " +
        "(coalesce(PREV(v, 1), 0) + PREV(v, 2)) END)")
    // non-strict content voids the coverage shortcut: even though an
    // atom lands AT the outer offset, a COALESCE can absorb its NULL,
    // so the gate must stay
    assert(MatchRecognize.flattenSameDirNav(
      "v > NEXT(coalesce(PREV(v, 2), v))")
      == "v > (CASE WHEN NEXT((true), 1) IS NOT NULL THEN " +
        "(coalesce(PREV(v, 1), NEXT(v, 1))) END)")
    // non-row-local content (an IN subquery, SQL-standard SUBSTRING
    // FROM) bails unchanged — the named rejection, never distributed
    // tokens wrapped as spurious columns
    val sub = "v > PREV(x IN (SELECT 1 FROM t) AND PREV(v))"
    assert(MatchRecognize.flattenSameDirNav(sub) == sub)
    val sfrom = "v > PREV(SUBSTRING(s FROM 1 FOR 2) || PREV(s))"
    assert(MatchRecognize.flattenSameDirNav(sfrom) == sfrom)
    MatchRecognize.dropViews(spark, MatchRecognize.rewriteStreaming(spark,
      """SELECT * FROM mr_in MATCH_RECOGNIZE (
        |  PARTITION BY k ORDER BY o MEASURES COUNT(*) AS n
        |  PATTERN (A B) DEFINE B AS v = NEXT(PREV(v)))""".stripMargin,
      _ => Some(("o", "5 seconds"))))
    // an unknown function name inside the navigated expression still
    // bails to the named rejection (not row-local / not whitelisted)
    val f = intercept[IllegalArgumentException](
      MatchRecognize.rewriteStreaming(spark,
        """SELECT * FROM mr_in MATCH_RECOGNIZE (
          |  PARTITION BY k ORDER BY o MEASURES COUNT(*) AS n
          |  PATTERN (A B) DEFINE B AS v > PREV(my_udf(v) + PREV(v)))""".stripMargin,
        _ => Some(("o", "5 seconds"))))
    assert(f.getMessage.contains("nested PREV"), s"message: ${f.getMessage}")
    // a non-lossless PREV expression type still gates with the contract
    val g = intercept[IllegalArgumentException](
      MatchRecognize.rewriteStreaming(spark,
        """SELECT * FROM mr_in MATCH_RECOGNIZE (
          |  PARTITION BY k ORDER BY o MEASURES COUNT(*) AS n
          |  PATTERN (A B) DEFINE B AS v > PREV(v * 1.5))""".stripMargin,
        _ => Some(("o", "5 seconds"))))
    assert(g.getMessage.contains("round-trip"), s"message: ${g.getMessage}")
  }

  test("streaming nested PREV equals the batch staged-lag semantics") {
    // the batch nested test's data: v(i) > v(i-1) + v(i-2) matches only
    // the last row (10 > 4+3); rows 1-2 see NULL through the strict sum
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sc = spark.sqlContext
    def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)
    val input = MemoryStream[(String, java.sql.Timestamp, Long)]
    input.toDF().toDF("k", "ts", "vm").createOrReplaceTempView("mr_nest_s")
    val q =
      """SELECT * FROM mr_nest_s MATCH_RECOGNIZE (
        |  PARTITION BY k ORDER BY ts
        |  MEASURES LAST(A.vm) AS av
        |  AFTER MATCH SKIP TO NEXT ROW
        |  PATTERN (A)
        |  DEFINE A AS vm > PREV(vm + PREV(vm)))""".stripMargin
    val streamSql = MatchRecognize.rewriteStreaming(spark, q,
      _ => Some(("ts", "5 seconds")))
    val query = spark.sql(streamSql).writeStream.format("memory")
      .queryName("mr_nest_out").outputMode("append").start()
    try {
      input.addData(("a", ts(10), 1L), ("a", ts(20), 3L),
        ("a", ts(30), 4L), ("a", ts(40), 10L), ("z", ts(200), 0L))
      query.processAllAvailable()
      input.addData(("z", ts(900), 0L))
      query.processAllAvailable()
      val got = spark.table("mr_nest_out").collect()
        .filter(_.getString(0) == "a").map(_.getLong(1)).toSet
      assert(got === Set(10L))
      // batch twin on the same rows
      Seq((1, 1, "x", 1), (1, 2, "x", 3), (1, 3, "x", 4), (1, 4, "x", 10))
        .toDF("k", "o", "t", "v").createOrReplaceTempView("mr_in")
      val batch = run(
        """SELECT * FROM mr_in MATCH_RECOGNIZE (
          |  PARTITION BY k ORDER BY o
          |  MEASURES LAST(A.v) AS av
          |  AFTER MATCH SKIP TO NEXT ROW
          |  PATTERN (A)
          |  DEFINE A AS v > PREV(v + PREV(v)))""".stripMargin)
      assert(batch.map(_.last).toSet === got.map(x => x: Any))
    } finally {
      query.stop()
      MatchRecognize.dropViews(spark, streamSql)
    }
  }

  test("streaming non-strict navigated expressions equal batch (r16)") {
    // CASE / COALESCE inside a navigation: the distribution gates the
    // body at the outer offset. The COALESCE define is the acid test —
    // at the FIRST row the inner offset is missing and coalesce
    // absorbs the NULL into 0 (a match batch also produces), while at
    // the LAST row the OUTER row is missing and only the gate stops
    // coalesce from fabricating a match batch never sees.
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sc = spark.sqlContext
    def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)
    for ((define, defineBatch) <- Seq(
        ("vm > PREV(CASE WHEN vm > 2 THEN vm ELSE 0 END + PREV(vm))",
          "v > PREV(CASE WHEN v > 2 THEN v ELSE 0 END + PREV(v))"),
        ("vm > NEXT(coalesce(PREV(vm, 2), 0))",
          "v > NEXT(coalesce(PREV(v, 2), 0))"))) {
      val input = MemoryStream[(String, java.sql.Timestamp, Long)]
      val name = s"mr_ns_${System.nanoTime()}"
      input.toDF().toDF("k", "ts", "vm").createOrReplaceTempView(name)
      val streamSql = MatchRecognize.rewriteStreaming(spark,
        s"""SELECT * FROM $name MATCH_RECOGNIZE (
           |  PARTITION BY k ORDER BY ts
           |  MEASURES LAST(A.vm) AS av
           |  AFTER MATCH SKIP TO NEXT ROW
           |  PATTERN (A)
           |  DEFINE A AS $define)""".stripMargin,
        _ => Some(("ts", "5 seconds")))
      val qn = s"mr_ns_out_${System.nanoTime()}"
      val query = spark.sql(streamSql).writeStream.format("memory")
        .queryName(qn).outputMode("append").start()
      try {
        input.addData(("a", ts(10), 1L), ("a", ts(20), 3L),
          ("a", ts(30), 4L), ("a", ts(40), 10L), ("z", ts(900), 0L))
        query.processAllAvailable()
        val got = spark.table(qn).collect()
          .filter(_.getString(0) == "a").map(_.getLong(1)).toSet
        // batch twin on the same rows
        Seq((1, 1, "x", 1), (1, 2, "x", 3), (1, 3, "x", 4),
          (1, 4, "x", 10))
          .toDF("k", "o", "t", "v").createOrReplaceTempView("mr_in")
        val batch = run(
          s"""SELECT * FROM mr_in MATCH_RECOGNIZE (
             |  PARTITION BY k ORDER BY o
             |  MEASURES LAST(A.v) AS av
             |  AFTER MATCH SKIP TO NEXT ROW
             |  PATTERN (A)
             |  DEFINE A AS $defineBatch)""".stripMargin)
        assert(batch.map(_.last).toSet === got.map(x => x: Any), define)
        assert(got.nonEmpty, s"no matches at all for $define")
      } finally {
        query.stop()
        MatchRecognize.dropViews(spark, streamSql)
      }
    }
  }

  test("streaming mixed-direction nested nav equals batch, boundary gated") {
    // NEXT(PREV(vm, 2)) nets to PREV(vm, 1) gated on the successor's
    // existence: the last row of each key satisfies vm > previous but
    // has no successor, so batch's staged lead-of-lag is NULL there —
    // the streaming gate must reproduce that non-match exactly
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sc = spark.sqlContext
    def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)
    val input = MemoryStream[(String, java.sql.Timestamp, Long)]
    input.toDF().toDF("k", "ts", "vm").createOrReplaceTempView("mr_mix_s")
    val q =
      """SELECT * FROM mr_mix_s MATCH_RECOGNIZE (
        |  PARTITION BY k ORDER BY ts
        |  MEASURES LAST(A.vm) AS av
        |  AFTER MATCH SKIP TO NEXT ROW
        |  PATTERN (A)
        |  DEFINE A AS vm > NEXT(PREV(vm, 2)))""".stripMargin
    val streamSql = MatchRecognize.rewriteStreaming(spark, q,
      _ => Some(("ts", "5 seconds")))
    val query = spark.sql(streamSql).writeStream.format("memory")
      .queryName("mr_mix_out").outputMode("append").start()
    try {
      // rows 3 and 4 rise above their predecessor WITH a successor;
      // row 10 rises too but is last — batch NULL-gates it
      input.addData(("a", ts(10), 1L), ("a", ts(20), 3L),
        ("a", ts(30), 4L), ("a", ts(40), 10L), ("z", ts(200), 0L))
      query.processAllAvailable()
      input.addData(("z", ts(900), 0L))
      query.processAllAvailable()
      val got = spark.table("mr_mix_out").collect()
        .filter(_.getString(0) == "a").map(_.getLong(1)).toSet
      assert(got === Set(3L, 4L))
      // batch twin on the same rows through the staged-lag pipeline
      Seq((1, 1, "x", 1), (1, 2, "x", 3), (1, 3, "x", 4), (1, 4, "x", 10))
        .toDF("k", "o", "t", "v").createOrReplaceTempView("mr_in")
      val batch = run(
        """SELECT * FROM mr_in MATCH_RECOGNIZE (
          |  PARTITION BY k ORDER BY o
          |  MEASURES LAST(A.v) AS av
          |  AFTER MATCH SKIP TO NEXT ROW
          |  PATTERN (A)
          |  DEFINE A AS v > NEXT(PREV(v, 2)))""".stripMargin)
      assert(batch.map(_.last).toSet === got.map(x => x: Any))
    } finally {
      query.stop()
      MatchRecognize.dropViews(spark, streamSql)
    }
  }

  test("streaming two-level nested nav equals batch, composed gate") {
    // NEXT(NEXT(PREV(vm, 3))) nets to PREV(vm, 1) but batch's staged
    // lead-of-lag needs rows at partial sums +1, +2, -1 — contiguity
    // reduces that to ONE composed gate at +2 (the atom enforces -1);
    // a row that rises above its predecessor but sits within 2 of the
    // partition end must NOT match, exactly like batch
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sc = spark.sqlContext
    def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)
    val input = MemoryStream[(String, java.sql.Timestamp, Long)]
    input.toDF().toDF("k", "ts", "vm").createOrReplaceTempView("mr_deep_s")
    val q =
      """SELECT * FROM mr_deep_s MATCH_RECOGNIZE (
        |  PARTITION BY k ORDER BY ts
        |  MEASURES LAST(A.vm) AS av
        |  AFTER MATCH SKIP TO NEXT ROW
        |  PATTERN (A)
        |  DEFINE A AS vm > NEXT(NEXT(PREV(vm, 3))))""".stripMargin
    val streamSql = MatchRecognize.rewriteStreaming(spark, q,
      _ => Some(("ts", "5 seconds")))
    val query = spark.sql(streamSql).writeStream.format("memory")
      .queryName("mr_deep_out").outputMode("append").start()
    try {
      // vm = 1,3,2,4,5: rows 3 (vm=3) and 4 (vm=4) rise above their
      // predecessor; only vm=3 has two successors — batch NULL-gates
      // vm=4 (one successor) and vm=5 (none)
      input.addData(("a", ts(10), 1L), ("a", ts(20), 3L),
        ("a", ts(30), 2L), ("a", ts(40), 4L), ("a", ts(50), 5L),
        ("z", ts(200), 0L))
      query.processAllAvailable()
      input.addData(("z", ts(900), 0L))
      query.processAllAvailable()
      val got = spark.table("mr_deep_out").collect()
        .filter(_.getString(0) == "a").map(_.getLong(1)).toSet
      assert(got === Set(3L))
      // batch twin on the same rows through the staged-lag pipeline
      Seq((1, 1, "x", 1), (1, 2, "x", 3), (1, 3, "x", 2), (1, 4, "x", 4),
        (1, 5, "x", 5))
        .toDF("k", "o", "t", "v").createOrReplaceTempView("mr_in")
      val batch = run(
        """SELECT * FROM mr_in MATCH_RECOGNIZE (
          |  PARTITION BY k ORDER BY o
          |  MEASURES LAST(A.v) AS av
          |  AFTER MATCH SKIP TO NEXT ROW
          |  PATTERN (A)
          |  DEFINE A AS v > NEXT(NEXT(PREV(v, 3))))""".stripMargin)
      assert(batch.map(_.last).toSet === got.map(x => x: Any))
    } finally {
      query.stop()
      MatchRecognize.dropViews(spark, streamSql)
    }
  }

  test("streaming column measures carry values through the JSON payload") {
    // streaming measure parity: V.col / FIRST / LAST on string and
    // integer columns rides the per-row state payload (the tracker's
    // batch mode — a bounded input through the identical code path —
    // makes the results assertable synchronously)
    import spark.implicits._
    Seq((1L, 1L, "view", 10L), (1L, 2L, "click", 20L),
      (1L, 3L, "click", 30L), (1L, 4L, "purchase", 40L))
      .toDF("k", "o", "t", "v")
      .createOrReplaceTempView("mr_cm")
    val rewritten = MatchRecognize.rewriteStreaming(spark,
      """SELECT * FROM mr_cm MATCH_RECOGNIZE (
        |  PARTITION BY k ORDER BY o
        |  MEASURES FIRST(V.t) AS first_tag, LAST(C.v) AS last_click_v,
        |    B.v AS b_v, COUNT(C.*) AS nc
        |  PATTERN (V C+ P B?)
        |  DEFINE V AS t = 'view', C AS t = 'click',
        |    P AS t = 'purchase', B AS t = 'bonus')""".stripMargin,
      _ => Some(("o", "5 seconds")))
    try {
      val out = spark.sql(rewritten).collect().map(_.toSeq)
      // B? matched no row: its column measure must decode to SQL NULL
      assert(out.toSeq === Seq(Seq(1L, "view", 30L, null, 2L)))
    } finally MatchRecognize.dropViews(spark, rewritten)
    // nested/binary measure types (no exact carrier) still throw
    Seq((1L, 1L, Seq(1.5d))).toDF("k", "o", "arr")
      .createOrReplaceTempView("mr_cm_arr")
    val e = intercept[IllegalArgumentException](
      MatchRecognize.rewriteStreaming(spark,
        """SELECT * FROM mr_cm_arr MATCH_RECOGNIZE (
          |  PARTITION BY k ORDER BY o MEASURES LAST(A.arr) AS aa
          |  PATTERN (A) DEFINE A AS o > 0)""".stripMargin,
        _ => Some(("o", "5 seconds"))))
    assert(e.getMessage.contains("carrier"), s"message: ${e.getMessage}")
  }

  test("streaming column measures widen to double/timestamp/decimal " +
      "via the exact carrier") {
    // round 15: non-lossless SCALAR measure columns ride
    // StateFormat.carrierOf (doubles/floats/decimals/dates as exact
    // strings, timestamps as epoch micros) — batch equivalence through
    // the tracker's batch mode, NaN and a sub-millisecond timestamp
    // included to pin exactness
    import spark.implicits._
    import java.sql.{Date, Timestamp}
    val t1 = Timestamp.valueOf("2024-03-01 10:00:00.123456")
    val t2 = Timestamp.valueOf("2024-03-02 11:30:00.000001")
    Seq(
      (1L, 1L, 0.1d, t1, BigDecimal("12.34"), Date.valueOf("2024-01-05")),
      (1L, 2L, Double.NaN, t2, BigDecimal("-0.07"), Date.valueOf("2024-02-29")))
      .toDF("k", "o", "d", "ts", "dec", "dt")
      .withColumn("dec", org.apache.spark.sql.functions.col("dec")
        .cast("decimal(10,2)"))
      .createOrReplaceTempView("mr_cm_wide")
    val sql =
      """SELECT * FROM mr_cm_wide MATCH_RECOGNIZE (
        |  PARTITION BY k ORDER BY o
        |  MEASURES FIRST(A.d) AS d1, LAST(A.d) AS d2,
        |    FIRST(A.ts) AS ts1, LAST(A.ts) AS ts2,
        |    LAST(A.dec) AS dc, FIRST(A.dt) AS dt1
        |  PATTERN (A{2}) DEFINE A AS o > 0)""".stripMargin
    val rewritten = MatchRecognize.rewriteStreaming(spark, sql,
      _ => Some(("o", "5 seconds")))
    try {
      val out = spark.sql(rewritten).collect().map(_.toSeq)
      assert(out.length == 1)
      val row = out.head
      assert(row(0) == 1L)
      assert(row(1) == 0.1d)
      assert(row(2).asInstanceOf[Double].isNaN)
      assert(row(3) == t1 && row(4) == t2)
      assert(row(5) == new java.math.BigDecimal("-0.07"))
      assert(row(6) == Date.valueOf("2024-01-05"))
      // batch twin: identical rows through the batch NFA
      val b = spark.sql(MatchRecognize.rewrite(spark, sql))
        .collect().map(_.toSeq)
      assert(b.map(_.map {
        case d: Double if d.isNaN => "NaN"
        case x => x
      }).toSeq === out.map(_.map {
        case d: Double if d.isNaN => "NaN"
        case x => x
      }).toSeq)
    } finally MatchRecognize.dropViews(spark, rewritten)
  }

  test("streaming PARTITION BY keys must round-trip the JSON encoding") {
    // state grouping serializes the key tuple through to_json/from_json;
    // a double key could lose formatting fidelity on the way back, so
    // the contract rejects it up front
    import spark.implicits._
    Seq((1.5d, 1L, 1L)).toDF("dk", "o", "v")
      .createOrReplaceTempView("mr_dbl_key")
    val e = intercept[IllegalArgumentException](
      MatchRecognize.rewriteStreaming(spark,
        """SELECT * FROM mr_dbl_key MATCH_RECOGNIZE (
          |  PARTITION BY dk ORDER BY o MEASURES COUNT(*) AS n
          |  PATTERN (A) DEFINE A AS v > 0)""".stripMargin,
        _ => Some(("o", "5 seconds"))))
    assert(e.getMessage.contains("round-trip"), s"message: ${e.getMessage}")
  }

  test("a measure alias named like a clause keyword still parses") {
    // parseSpec scans clause keywords in grammar order and skips
    // alias/qualifier look-alikes, so `AS pattern` must not corrupt
    // the clause split
    seq((1, 1, "a", 0), (1, 2, "b", 0))
    val out = run(
      """SELECT * FROM mr_in MATCH_RECOGNIZE (
        |  PARTITION BY k ORDER BY o
        |  MEASURES COUNT(*) AS pattern, FIRST(A.o) AS define
        |  PATTERN (A B)
        |  DEFINE A AS t = 'a', B AS t = 'b')""".stripMargin)
    assert(out === Seq(Seq(1L, 2L, 1L)))
  }

  test("aggregate measures: SUM/AVG/MIN/MAX over a variable's rows") {
    seq((1, 1, "s", 10), (1, 2, "r", 7), (1, 3, "r", 9), (1, 4, "r", 2),
      (1, 5, "p", 0))
    val out = run(
      """SELECT * FROM mr_in MATCH_RECOGNIZE (
        |  PARTITION BY k ORDER BY o
        |  MEASURES SUM(R.v) AS sv, AVG(R.v) AS av, MIN(R.v) AS mv,
        |    MAX(R.v) AS xv, SUM(P.v) AS pv
        |  ONE ROW PER MATCH
        |  PATTERN (S R+ P?)
        |  DEFINE S AS t = 's', R AS t = 'r', P AS t = 'p')""".stripMargin)
    assert(out === Seq(Seq(1L, 18L, 6.0d, 2L, 9L, 0L)))
  }

  test("aggregate measures skip NULLs; unmatched variables aggregate to NULL") {
    import spark.implicits._
    Seq((1L, 1L, "a", Some(5L)), (1L, 2L, "a", None: Option[Long]),
      (1L, 3L, "a", Some(3L)))
      .toDF("k", "o", "t", "v").createOrReplaceTempView("mr_in")
    val out = run(
      """SELECT * FROM mr_in MATCH_RECOGNIZE (
        |  PARTITION BY k ORDER BY o
        |  MEASURES SUM(A.v) AS sv, AVG(A.v) AS av, MIN(B.v) AS bv
        |  PATTERN (A+ B?)
        |  DEFINE A AS t = 'a')""".stripMargin)
    assert(out === Seq(Seq(1L, 8L, 4.0d, null)))
  }

  test("aggregate measures run under ALL ROWS PER MATCH (running semantics)") {
    seq((1, 1, "a", 5), (1, 2, "a", 7), (1, 3, "b", 100))
    val out = run(
      """SELECT k, o, rs, mx FROM mr_in MATCH_RECOGNIZE (
        |  PARTITION BY k ORDER BY o
        |  MEASURES SUM(A.v) AS rs, MAX(A.v) AS mx
        |  ALL ROWS PER MATCH
        |  PATTERN (A+ B)
        |  DEFINE A AS t = 'a', B AS t = 'b')""".stripMargin)
    assert(out.toSet === Set(Seq(1L, 1L, 5L, 5L), Seq(1L, 2L, 12L, 7L),
      Seq(1L, 3L, 12L, 7L)))
  }

  test("aggregate measures over double columns accumulate double") {
    import spark.implicits._
    Seq((1L, 1L, "a", 1.5d), (1L, 2L, "a", 2.25d))
      .toDF("k", "o", "t", "d").createOrReplaceTempView("mr_dbl_agg")
    val rewritten = MatchRecognize.rewrite(spark,
      """SELECT * FROM mr_dbl_agg MATCH_RECOGNIZE (
        |  PARTITION BY k ORDER BY o
        |  MEASURES SUM(A.d) AS sd, AVG(A.d) AS ad, MIN(A.d) AS md
        |  PATTERN (A+)
        |  DEFINE A AS t = 'a')""".stripMargin)
    try {
      val out = spark.sql(rewritten).collect().map(_.toSeq)
      assert(out.toSeq === Seq(Seq(1L, 3.75d, 1.875d, 1.5d)))
    } finally MatchRecognize.dropViews(spark, rewritten)
  }

  test("aggregate measures: MIN/MAX compare non-numeric comparables; SUM rejects them") {
    seq((1, 1, "ab", 0), (1, 2, "cd", 0))
    val out = run(
      """SELECT * FROM mr_in MATCH_RECOGNIZE (
        |  PARTITION BY k ORDER BY o
        |  MEASURES MIN(A.t) AS mt, MAX(A.t) AS xt
        |  PATTERN (A+)
        |  DEFINE A AS v = 0)""".stripMargin)
    assert(out === Seq(Seq(1L, "ab", "cd")))
    val e = intercept[IllegalArgumentException](run(
      """SELECT * FROM mr_in MATCH_RECOGNIZE (
        |  PARTITION BY k ORDER BY o
        |  MEASURES SUM(A.t) AS st
        |  PATTERN (A+)
        |  DEFINE A AS v = 0)""".stripMargin))
    assert(e.getMessage.contains("integer or floating"), e.getMessage)
  }

  test("streaming aggregate measures gate non-integral columns") {
    import spark.implicits._
    Seq((1L, 1L, "a", 0.5d)).toDF("k", "o", "t", "d")
      .createOrReplaceTempView("mr_agg_dbl")
    val e = intercept[IllegalArgumentException](
      MatchRecognize.rewriteStreaming(spark,
        """SELECT * FROM mr_agg_dbl MATCH_RECOGNIZE (
          |  PARTITION BY k ORDER BY o MEASURES SUM(A.d) AS sd
          |  PATTERN (A) DEFINE A AS t = 'a')""".stripMargin,
        _ => Some(("o", "5 seconds"))))
    assert(e.getMessage.contains("only integer columns"), e.getMessage)
  }

  test("streaming aggregates in DEFINE match the batch matcher") {
    import spark.implicits._
    // budget stop-condition (running SUM incl. the candidate row),
    // cross-variable AVG bound, and a MIN spread — the three DEFINE
    // aggregate shapes — each compared batch vs streaming rewrite on
    // the same ordered data (no watermark → every decision final, the
    // batch semantics through the tracker code path)
    Seq(
      (1L, 1L, "s", 0L), (1L, 2L, "b", 4L), (1L, 3L, "b", 5L),
      (1L, 4L, "b", 3L), (1L, 5L, "b", 2L),
      (2L, 1L, "s", 0L), (2L, 2L, "b", 11L), (2L, 3L, "c", 9L),
      (3L, 1L, "a", 5L), (3L, 2L, "a", 7L), (3L, 3L, "c", 8L))
      .toDF("k", "o", "t", "v").createOrReplaceTempView("mr_agg_eq")
    val queries = Seq(
      """SELECT * FROM mr_agg_eq MATCH_RECOGNIZE (
        |  PARTITION BY k ORDER BY o
        |  MEASURES COUNT(B.*) AS nb, SUM(B.v) AS sb
        |  ONE ROW PER MATCH AFTER MATCH SKIP PAST LAST ROW
        |  PATTERN (S B*)
        |  DEFINE S AS t = 's', B AS t = 'b' AND SUM(B.v) <= 10)""".stripMargin,
      """SELECT * FROM mr_agg_eq MATCH_RECOGNIZE (
        |  PARTITION BY k ORDER BY o
        |  MEASURES C.v AS cv
        |  ONE ROW PER MATCH AFTER MATCH SKIP PAST LAST ROW
        |  PATTERN (A{2} C)
        |  DEFINE A AS t = 'a', C AS t = 'c' AND v > AVG(A.v))""".stripMargin,
      """SELECT * FROM mr_agg_eq MATCH_RECOGNIZE (
        |  PARTITION BY k ORDER BY o
        |  MEASURES COUNT(R.*) AS nr, MIN(R.v) AS lo
        |  ONE ROW PER MATCH AFTER MATCH SKIP PAST LAST ROW
        |  PATTERN (R+)
        |  DEFINE R AS MAX(R.v) - MIN(R.v) <= 2)""".stripMargin)
    for (q <- queries) {
      val batchSql = MatchRecognize.rewrite(spark, q)
      val streamSql = MatchRecognize.rewriteStreaming(spark, q,
        _ => Some(("o", "5 seconds")))
      try {
        val batch = spark.sql(batchSql).collect().map(_.toSeq).toSet
        val streamed = spark.sql(streamSql).collect().map(_.toSeq).toSet
        assert(streamed === batch, s"query:\n$q")
      } finally {
        MatchRecognize.dropViews(spark, batchSql)
        MatchRecognize.dropViews(spark, streamSql)
      }
    }
  }

  test("streaming DEFINE aggregate decides across micro-batch boundaries") {
    // the budget run's head arrives in batch 1 but stays undecided
    // (B* could extend); its tail and the deciding watermark advance
    // arrive later — the running SUM must evaluate over the buffered
    // rows exactly as batch does on the whole sequence
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sc = spark.sqlContext
    def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)
    val input = MemoryStream[(String, java.sql.Timestamp, String, Long)]
    input.toDF().toDF("k", "ts", "t", "vm").createOrReplaceTempView("mr_agg_s")
    val q =
      """SELECT * FROM mr_agg_s MATCH_RECOGNIZE (
        |  PARTITION BY k ORDER BY ts
        |  MEASURES COUNT(B.*) AS nb, SUM(B.vm) AS sb
        |  ONE ROW PER MATCH AFTER MATCH SKIP PAST LAST ROW
        |  PATTERN (S B*)
        |  DEFINE S AS t = 's', B AS t = 'b' AND SUM(B.vm) <= 10)""".stripMargin
    val streamSql = MatchRecognize.rewriteStreaming(spark, q,
      _ => Some(("ts", "5 seconds")))
    val query = spark.sql(streamSql).writeStream.format("memory")
      .queryName("mr_agg_out").outputMode("append").start()
    try {
      // batch 1: S and the first two B rows (sum 9, budget 10 not yet
      // breached — undecidable while B* could extend)
      input.addData(("a", ts(10), "s", 0L), ("a", ts(20), "b", 4L),
        ("a", ts(30), "b", 5L))
      query.processAllAvailable()
      // batch 2: the breaching B (4+5+3 > 10) and a watermark driver
      input.addData(("a", ts(40), "b", 3L), ("z", ts(300), "x", 0L))
      query.processAllAvailable()
      input.addData(("z", ts(900), "x", 0L))
      query.processAllAvailable()
      val got = spark.table("mr_agg_out").collect()
        .filter(_.getString(0) == "a").map(r => (r.getLong(1), r.getLong(2)))
        .toSet
      // greedy B* stops before the breach: 2 rows, sum 9 — the batch
      // matcher's exact answer for s b(4) b(5) b(3)
      assert(got === Set((2L, 9L)))
    } finally {
      query.stop()
      MatchRecognize.dropViews(spark, streamSql)
    }
  }

  test("streaming DEFINE aggregates gate non-integral columns") {
    import spark.implicits._
    Seq((1L, 1L, "a", 1.5)).toDF("k", "o", "t", "v")
      .createOrReplaceTempView("mr_agg_def_stream")
    val e = intercept[IllegalArgumentException](
      MatchRecognize.rewriteStreaming(spark,
        """SELECT * FROM mr_agg_def_stream MATCH_RECOGNIZE (
          |  PARTITION BY k ORDER BY o MEASURES COUNT(*) AS n
          |  PATTERN (A B*) DEFINE A AS t = 'a',
          |    B AS SUM(B.v) <= 10)""".stripMargin,
        _ => Some(("o", "5 seconds"))))
    assert(e.getMessage.contains("only integer columns"), e.getMessage)
  }

  test("SUBSET union variables in measures: FIRST/LAST/SUM/COUNT/AVG") {
    seq((1, 1, "a", 1), (1, 2, "b", 2), (1, 3, "b", 3), (1, 4, "c", 10))
    val out = run(
      """SELECT * FROM mr_in MATCH_RECOGNIZE (
        |  PARTITION BY k ORDER BY o
        |  MEASURES FIRST(U.v) AS uf, LAST(U.v) AS ul, SUM(U.v) AS us,
        |    COUNT(U.*) AS un, MIN(U.v) AS umin, MAX(U.v) AS umax,
        |    AVG(U.v) AS uavg, FIRST(U.v, 1) AS uf1
        |  PATTERN (A B+ C)
        |  SUBSET U = (B, C)
        |  DEFINE A AS t = 'a', B AS t = 'b', C AS t = 'c')""".stripMargin)
    // U's rows are the two b's and the c: first 2, last 10, sum 15,
    // count 3, min 2, max 10, avg 5.0, offset-1 first 3
    assert(out === Seq(Seq(1L, 2L, 10L, 15L, 3L, 2L, 10L, 5.0d, 3L)))
  }

  test("SUBSET in DEFINE: running aggregate and FIRST navigation over the union") {
    // U = (A, B) with B constrained by SUM(U.v) <= 6: classifying each
    // b includes the candidate row (running semantics through the
    // union), so b(2): 1+2=3 ok, b(3): 6 ok, b(4): 10 stops the run
    seq((1, 1, "a", 1), (1, 2, "b", 2), (1, 3, "b", 3), (1, 4, "b", 4))
    val out = run(
      """SELECT * FROM mr_in MATCH_RECOGNIZE (
        |  PARTITION BY k ORDER BY o
        |  MEASURES COUNT(B.*) AS nb, SUM(U.v) AS usum
        |  PATTERN (A B+)
        |  SUBSET U = (A, B)
        |  DEFINE A AS t = 'a', B AS t = 'b' AND SUM(U.v) <= 6)""".stripMargin)
    assert(out === Seq(Seq(1L, 2L, 6L)))
    // FIRST(W.v) over W = (A, B) resolves to the A row (q81's shape):
    // the c must beat the opening row's value
    seq((1, 1, "a", 5), (1, 2, "b", 1), (1, 3, "c", 6),
      (2, 1, "a", 5), (2, 2, "b", 1), (2, 3, "c", 4))
    val out2 = run(
      """SELECT * FROM mr_in MATCH_RECOGNIZE (
        |  PARTITION BY k ORDER BY o
        |  MEASURES C.v AS cv
        |  PATTERN (A B C)
        |  SUBSET W = (A, B)
        |  DEFINE A AS t = 'a', B AS t = 'b',
        |    C AS t = 'c' AND v > FIRST(W.v))""".stripMargin)
    assert(out2 === Seq(Seq(1L, 6L))) // k=2's c (4) fails v > 5
  }

  test("AFTER MATCH SKIP TO LAST over a SUBSET union resumes at that row") {
    // SKIP TO LAST U with U = (B, C) resumes at the C row, which can
    // open the next match (A admits 'c'): chained matches at 1 and 3
    seq((1, 1, "a", 0), (1, 2, "b", 0), (1, 3, "c", 0), (1, 4, "b", 0),
      (1, 5, "c", 0))
    val out = run(
      """SELECT * FROM mr_in MATCH_RECOGNIZE (
        |  PARTITION BY k ORDER BY o
        |  MEASURES FIRST(A.o) AS s, COUNT(*) AS n
        |  AFTER MATCH SKIP TO LAST U
        |  PATTERN (A B C)
        |  SUBSET U = (B, C)
        |  DEFINE A AS t IN ('a', 'c'), B AS t = 'b', C AS t = 'c')""".stripMargin)
    assert(out.toSet === Set(Seq(1L, 1L, 3L), Seq(1L, 3L, 3L)))
  }

  test("SUBSET union measures run under ALL ROWS PER MATCH") {
    seq((1, 1, "a", 1), (1, 2, "b", 2), (1, 3, "b", 3), (1, 4, "c", 4))
    val out = run(
      """SELECT o, un, us FROM mr_in MATCH_RECOGNIZE (
        |  PARTITION BY k ORDER BY o
        |  MEASURES COUNT(U.*) AS un, SUM(U.v) AS us
        |  ALL ROWS PER MATCH
        |  PATTERN (A B+ C)
        |  SUBSET U = (B, C)
        |  DEFINE A AS t = 'a', B AS t = 'b', C AS t = 'c')""".stripMargin)
    // running semantics: the a row sees no U rows yet (NULL sum)
    assert(out === Seq(Seq(1L, 0L, null), Seq(2L, 1L, 2L),
      Seq(3L, 2L, 5L), Seq(4L, 3L, 9L)))
  }

  test("SUBSET rejection contract") {
    seq((1, 1, "a", 0))
    def bad(mr: String): String =
      intercept[IllegalArgumentException](run(mr)).getMessage
    // name collides with a pattern variable
    assert(bad("""SELECT * FROM mr_in MATCH_RECOGNIZE (
      |  PARTITION BY k ORDER BY o MEASURES COUNT(*) AS n
      |  PATTERN (A B) SUBSET A = (B)
      |  DEFINE A AS t = 'a')""".stripMargin).contains("collides"))
    // member not in PATTERN
    assert(bad("""SELECT * FROM mr_in MATCH_RECOGNIZE (
      |  PARTITION BY k ORDER BY o MEASURES COUNT(*) AS n
      |  PATTERN (A B) SUBSET U = (A, Z)
      |  DEFINE A AS t = 'a')""".stripMargin).contains("not in PATTERN"))
    // defined twice
    assert(bad("""SELECT * FROM mr_in MATCH_RECOGNIZE (
      |  PARTITION BY k ORDER BY o MEASURES COUNT(*) AS n
      |  PATTERN (A B) SUBSET U = (A), U = (B)
      |  DEFINE A AS t = 'a')""".stripMargin).contains("defined twice"))
    // FIRST/LAST through a union containing the DEFINEd variable is
    // self navigation beyond the current row
    assert(bad("""SELECT * FROM mr_in MATCH_RECOGNIZE (
      |  PARTITION BY k ORDER BY o MEASURES COUNT(*) AS n
      |  PATTERN (A B) SUBSET U = (A, B)
      |  DEFINE A AS t = 'a', B AS v > FIRST(U.v))""".stripMargin)
      .contains("self navigation"))
    // a measure over an undeclared union name is still undefined
    assert(bad("""SELECT * FROM mr_in MATCH_RECOGNIZE (
      |  PARTITION BY k ORDER BY o MEASURES COUNT(U.*) AS n
      |  PATTERN (A B) SUBSET W = (A, B)
      |  DEFINE A AS t = 'a')""".stripMargin)
      .contains("undefined pattern variable"))
  }

  test("streaming SUBSET union variables match the batch matcher") {
    import spark.implicits._
    // union measures, union DEFINE navigation, union DEFINE aggregate,
    // and SKIP TO over a union — each compared batch vs streaming
    // rewrite on the same ordered data (no watermark → every decision
    // final, the batch semantics through the tracker code path)
    Seq(
      (1L, 1L, "a", 1L), (1L, 2L, "b", 2L), (1L, 3L, "b", 3L),
      (1L, 4L, "c", 10L),
      (2L, 1L, "a", 5L), (2L, 2L, "b", 1L), (2L, 3L, "c", 4L),
      (3L, 1L, "a", 1L), (3L, 2L, "b", 2L), (3L, 3L, "c", 9L),
      (3L, 4L, "b", 1L), (3L, 5L, "c", 8L))
      .toDF("k", "o", "t", "v").createOrReplaceTempView("mr_subset_eq")
    val queries = Seq(
      """SELECT * FROM mr_subset_eq MATCH_RECOGNIZE (
        |  PARTITION BY k ORDER BY o
        |  MEASURES FIRST(U.v) AS uf, LAST(U.v) AS ul, SUM(U.v) AS us,
        |    COUNT(U.*) AS un
        |  ONE ROW PER MATCH AFTER MATCH SKIP PAST LAST ROW
        |  PATTERN (A B+ C)
        |  SUBSET U = (B, C)
        |  DEFINE A AS t = 'a', B AS t = 'b', C AS t = 'c')""".stripMargin,
      """SELECT * FROM mr_subset_eq MATCH_RECOGNIZE (
        |  PARTITION BY k ORDER BY o
        |  MEASURES C.v AS cv
        |  ONE ROW PER MATCH AFTER MATCH SKIP PAST LAST ROW
        |  PATTERN (A B C)
        |  SUBSET W = (A, B)
        |  DEFINE A AS t = 'a', B AS t = 'b',
        |    C AS t = 'c' AND v > FIRST(W.v))""".stripMargin,
      """SELECT * FROM mr_subset_eq MATCH_RECOGNIZE (
        |  PARTITION BY k ORDER BY o
        |  MEASURES COUNT(B.*) AS nb, SUM(U.v) AS usum
        |  ONE ROW PER MATCH AFTER MATCH SKIP PAST LAST ROW
        |  PATTERN (A B+)
        |  SUBSET U = (A, B)
        |  DEFINE A AS t = 'a', B AS t = 'b' AND SUM(U.v) <= 6)""".stripMargin,
      """SELECT * FROM mr_subset_eq MATCH_RECOGNIZE (
        |  PARTITION BY k ORDER BY o
        |  MEASURES FIRST(A.v) AS s, COUNT(*) AS n
        |  ONE ROW PER MATCH AFTER MATCH SKIP TO LAST U
        |  PATTERN (A B C)
        |  SUBSET U = (B, C)
        |  DEFINE A AS t IN ('a', 'c'), B AS t = 'b',
        |    C AS t = 'c')""".stripMargin)
    for (q <- queries) {
      val batchSql = MatchRecognize.rewrite(spark, q)
      val streamSql = MatchRecognize.rewriteStreaming(spark, q,
        _ => Some(("o", "5 seconds")))
      try {
        val batch = spark.sql(batchSql).collect().map(_.toSeq).toSet
        val streamed = spark.sql(streamSql).collect().map(_.toSeq).toSet
        assert(streamed === batch, s"query:\n$q")
      } finally {
        MatchRecognize.dropViews(spark, batchSql)
        MatchRecognize.dropViews(spark, streamSql)
      }
    }
  }

  test("streaming SUBSET decides across micro-batch boundaries") {
    // the union budget run's head arrives in batch 1 and stays
    // undecided (B* could extend); the breaching tail arrives later —
    // the running SUM over U = (S, B) must evaluate over the buffered
    // rows exactly as batch does on the whole sequence
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sc = spark.sqlContext
    def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)
    val input = MemoryStream[(String, java.sql.Timestamp, String, Long)]
    input.toDF().toDF("k", "ts", "t", "vm")
      .createOrReplaceTempView("mr_subset_s")
    val q =
      """SELECT * FROM mr_subset_s MATCH_RECOGNIZE (
        |  PARTITION BY k ORDER BY ts
        |  MEASURES COUNT(B.*) AS nb, SUM(U.vm) AS su
        |  ONE ROW PER MATCH AFTER MATCH SKIP PAST LAST ROW
        |  PATTERN (S B*)
        |  SUBSET U = (S, B)
        |  DEFINE S AS t = 's', B AS t = 'b' AND SUM(U.vm) <= 10)""".stripMargin
    val streamSql = MatchRecognize.rewriteStreaming(spark, q,
      _ => Some(("ts", "5 seconds")))
    val query = spark.sql(streamSql).writeStream.format("memory")
      .queryName("mr_subset_out").outputMode("append").start()
    try {
      // batch 1: s(2) and the first b(4) — running U-sum 6, budget 10
      // not breached, undecidable while B* could extend
      input.addData(("a", ts(10), "s", 2L), ("a", ts(20), "b", 4L))
      query.processAllAvailable()
      // batch 2: b(3) keeps it at 9; b(5) breaches (14 > 10)
      input.addData(("a", ts(30), "b", 3L), ("a", ts(40), "b", 5L),
        ("z", ts(300), "x", 0L))
      query.processAllAvailable()
      input.addData(("z", ts(900), "x", 0L))
      query.processAllAvailable()
      val got = spark.table("mr_subset_out").collect()
        .filter(_.getString(0) == "a").map(r => (r.getLong(1), r.getLong(2)))
        .toSet
      // greedy B* stops before the breach: 2 b-rows, U-sum 2+4+3 = 9
      assert(got === Set((2L, 9L)))
    } finally {
      query.stop()
      MatchRecognize.dropViews(spark, streamSql)
    }
  }

  test("expression measures: scalar expressions over navigation atoms") {
    seq((1, 1, "a", 1), (1, 2, "b", 2), (1, 3, "b", 3), (1, 4, "c", 10))
    val out = run(
      """SELECT * FROM mr_in MATCH_RECOGNIZE (
        |  PARTITION BY k ORDER BY o
        |  MEASURES
        |    LAST(C.v) - FIRST(B.v) AS delta,
        |    CASE WHEN COUNT(B.*) > 1 THEN 'long' ELSE 'short' END AS label,
        |    SUM(B.v) * 2 + COUNT(*) AS mixed,
        |    B.v AS last_b,
        |    MATCH_NUMBER() * 100 AS mn100
        |  PATTERN (A B+ C)
        |  DEFINE A AS t = 'a', B AS t = 'b', C AS t = 'c')""".stripMargin)
    // delta = 10 - 2 = 8; two b's -> 'long'; mixed = 5*2 + 4 = 14;
    // bare B.v = LAST(B.v) = 3; mn100 = 100
    assert(out === Seq(Seq(1L, 8L, "long", 14L, 3L, 100L)))
    // duplicate atoms share one slot; partition columns are readable
    // in the expression (they pass through the matcher output)
    val out2 = run(
      """SELECT * FROM mr_in MATCH_RECOGNIZE (
        |  PARTITION BY k ORDER BY o
        |  MEASURES FIRST(B.v) + FIRST(B.v) + k AS s
        |  PATTERN (A B+ C)
        |  DEFINE A AS t = 'a', B AS t = 'b', C AS t = 'c')""".stripMargin)
    assert(out2 === Seq(Seq(1L, 5L)))
  }

  test("expression measures run under ALL ROWS PER MATCH with RUNNING semantics") {
    seq((1, 1, "a", 1), (1, 2, "b", 2), (1, 3, "b", 3), (1, 4, "c", 4))
    val out = run(
      """SELECT o, d FROM mr_in MATCH_RECOGNIZE (
        |  PARTITION BY k ORDER BY o
        |  MEASURES COUNT(*) - COUNT(B.*) AS d
        |  ALL ROWS PER MATCH
        |  PATTERN (A B+ C)
        |  DEFINE A AS t = 'a', B AS t = 'b', C AS t = 'c')""".stripMargin)
    // running: rows seen minus b's seen -> 1, 1, 1, 2
    assert(out === Seq(Seq(1L, 1L), Seq(2L, 1L), Seq(3L, 1L), Seq(4L, 2L)))
  }

  test("streaming expression measures match the batch matcher") {
    import spark.implicits._
    Seq(
      (1L, 1L, "a", 1L), (1L, 2L, "b", 2L), (1L, 3L, "b", 3L),
      (1L, 4L, "c", 10L),
      (2L, 1L, "a", 5L), (2L, 2L, "b", 1L), (2L, 3L, "c", 4L))
      .toDF("k", "o", "t", "v").createOrReplaceTempView("mr_exprm_eq")
    val q =
      """SELECT * FROM mr_exprm_eq MATCH_RECOGNIZE (
        |  PARTITION BY k ORDER BY o
        |  MEASURES LAST(C.v) - FIRST(B.v) AS delta,
        |    CASE WHEN COUNT(B.*) > 1 THEN 'long' ELSE 'short' END AS label,
        |    SUM(U.v) + k AS su
        |  ONE ROW PER MATCH AFTER MATCH SKIP PAST LAST ROW
        |  PATTERN (A B+ C)
        |  SUBSET U = (B, C)
        |  DEFINE A AS t = 'a', B AS t = 'b', C AS t = 'c')""".stripMargin
    val batchSql = MatchRecognize.rewrite(spark, q)
    val streamSql = MatchRecognize.rewriteStreaming(spark, q,
      _ => Some(("o", "5 seconds")))
    try {
      val batch = spark.sql(batchSql).collect().map(_.toSeq).toSet
      val streamed = spark.sql(streamSql).collect().map(_.toSeq).toSet
      assert(streamed === batch)
      assert(batch.nonEmpty)
    } finally {
      MatchRecognize.dropViews(spark, batchSql)
      MatchRecognize.dropViews(spark, streamSql)
    }
  }

  test("expression measure rejections") {
    seq((1, 1, "a", 0))
    def bad(mr: String): String =
      intercept[IllegalArgumentException](run(mr)).getMessage
    // navigation over an expression is not an atom
    assert(bad("""SELECT * FROM mr_in MATCH_RECOGNIZE (
      |  PARTITION BY k ORDER BY o MEASURES FIRST(A.v + 1) AS x
      |  PATTERN (A) DEFINE A AS t = 'a')""".stripMargin)
      .contains("unsupported FIRST() form in measure"))
    // qualified reference to a non-readable name
    assert(bad("""SELECT * FROM mr_in MATCH_RECOGNIZE (
      |  PARTITION BY k ORDER BY o MEASURES X.v + 1 AS x
      |  PATTERN (A) DEFINE A AS t = 'a')""".stripMargin)
      .contains("not a pattern variable"))
    // PREV/NEXT are DEFINE-only navigation, not measure atoms
    assert(bad("""SELECT * FROM mr_in MATCH_RECOGNIZE (
      |  PARTITION BY k ORDER BY o MEASURES PREV(A.v) AS x
      |  PATTERN (A) DEFINE A AS t = 'a')""".stripMargin)
      .contains("unsupported PREV() form in measure"))
  }

  test("ORDER BY DESC walks the pattern in descending key order") {
    seq((1, 1, "b", 1), (1, 2, "a", 2))
    // descending walk sees o=2 (a) then o=1 (b)
    val out = run(
      """SELECT * FROM mr_in MATCH_RECOGNIZE (
        |  PARTITION BY k ORDER BY o DESC
        |  MEASURES FIRST(A.o) AS ao, LAST(B.o) AS bo
        |  PATTERN (A B)
        |  DEFINE A AS t = 'a', B AS t = 'b')""".stripMargin)
    assert(out === Seq(Seq(1L, 2L, 1L)))
    // PREV follows the walk direction: under DESC the previous row is
    // the one with the LARGER key — v decreasing in o reads as rising
    seq((1, 1, "x", 3), (1, 2, "x", 2), (1, 3, "x", 1))
    val out2 = run(
      """SELECT * FROM mr_in MATCH_RECOGNIZE (
        |  PARTITION BY k ORDER BY o DESC
        |  MEASURES LAST(R.v) AS rv
        |  AFTER MATCH SKIP TO NEXT ROW
        |  PATTERN (R)
        |  DEFINE R AS v > PREV(v))""".stripMargin)
    assert(out2.map(_(1)).toSet === Set(2L, 3L))
  }

  test("ORDER BY DESC rejections: WITHIN and streaming") {
    seq((1, 1, "a", 0))
    val e = intercept[IllegalArgumentException](run(
      """SELECT * FROM mr_in MATCH_RECOGNIZE (
        |  PARTITION BY k ORDER BY o DESC
        |  MEASURES COUNT(*) AS n
        |  PATTERN (A) WITHIN INTERVAL '5' SECOND
        |  DEFINE A AS t = 'a')""".stripMargin))
    assert(e.getMessage.contains("ascending"), e.getMessage)
    val e2 = intercept[IllegalArgumentException](
      MatchRecognize.rewriteStreaming(spark,
        """SELECT * FROM mr_in MATCH_RECOGNIZE (
          |  PARTITION BY k ORDER BY o DESC
          |  MEASURES COUNT(*) AS n
          |  PATTERN (A) DEFINE A AS t = 'a')""".stripMargin,
        _ => Some(("o", "5 seconds"))))
    assert(e2.getMessage.contains("ASCENDING"), e2.getMessage)
  }

  test("MATCH_ROWTIME() measures the match's last event time; batch " +
      "and streaming agree (r18)") {
    import spark.implicits._
    def t(sec: Long) = new java.sql.Timestamp(sec * 1000L)
    Seq((1L, t(10), "a"), (1L, t(20), "a"), (1L, t(30), "b"),
      (2L, t(5), "a"), (2L, t(15), "b"))
      .toDF("k", "ts", "t").createOrReplaceTempView("mr_rt")
    val q =
      """SELECT * FROM mr_rt MATCH_RECOGNIZE (
        |  PARTITION BY k ORDER BY ts
        |  MEASURES MATCH_ROWTIME() AS mrt, COUNT(A.*) AS na
        |  ONE ROW PER MATCH AFTER MATCH SKIP PAST LAST ROW
        |  PATTERN (A+ B)
        |  DEFINE A AS t = 'a', B AS t = 'b')""".stripMargin
    val batchSql = MatchRecognize.rewrite(spark, q)
    val streamSql = MatchRecognize.rewriteStreaming(spark, q,
      tb => if (tb.equalsIgnoreCase("mr_rt")) Some(("ts", "5 seconds"))
        else None)
    try {
      val batch = spark.sql(batchSql).collect().map(_.toSeq).toSet
      // the measure is the time of the match's LAST row (B's row)
      assert(batch === Set(Seq(1L, t(30), 2L), Seq(2L, t(15), 1L)))
      assert(spark.sql(streamSql).collect().map(_.toSeq).toSet === batch)
    } finally {
      MatchRecognize.dropViews(spark, batchSql)
      MatchRecognize.dropViews(spark, streamSql)
    }
  }

  test("MATCH_ROWTIME() composes inside an expression measure") {
    import spark.implicits._
    def t(sec: Long) = new java.sql.Timestamp(sec * 1000L)
    Seq((1L, t(10), "a"), (1L, t(25), "b"))
      .toDF("k", "ts", "t").createOrReplaceTempView("mr_rtx")
    val batchSql = MatchRecognize.rewrite(spark,
      """SELECT * FROM mr_rtx MATCH_RECOGNIZE (
        |  PARTITION BY k ORDER BY ts
        |  MEASURES unix_millis(MATCH_ROWTIME()) -
        |    unix_millis(FIRST(A.ts)) AS span_ms
        |  PATTERN (A B) DEFINE A AS t = 'a', B AS t = 'b')""".stripMargin)
    try assert(spark.sql(batchSql).collect().map(_.toSeq).toSet ===
      Set(Seq(1L, 15000L)))
    finally MatchRecognize.dropViews(spark, batchSql)
  }

  test("rowtimeMeasureOf finds the source and alias for the registry; " +
      "backticked sources resolve unquoted") {
    val q = (src: String) =>
      s"""select * from $src match_recognize (
         |  partition by k order by ts
         |  measures match_rowtime() as mrt
         |  pattern (a) define a as t = 'a')""".stripMargin
    assert(MatchRecognize.rowtimeMeasureOf(q("pat_src"))
      .contains(("pat_src", "mrt")))
    assert(MatchRecognize.rowtimeMeasureOf(q("`pat_src`"))
      .contains(("pat_src", "mrt")))
    // a QUALIFIED source resolves as a whole chain (never mis-spliced
    // at its last segment) — the registry keys on the bare table name
    assert(MatchRecognize.rowtimeMeasureOf(q("`db`.`pat_src`"))
      .contains(("pat_src", "mrt")))
    assert(MatchRecognize.rowtimeMeasureOf(q("db.pat_src"))
      .contains(("pat_src", "mrt")))
    // a TICKED name is never the FROM keyword — same law as the
    // rewrites
    assert(MatchRecognize.rowtimeMeasureOf(q("`FROM`"))
      .contains(("FROM", "mrt")))
    // no MATCH_ROWTIME measure -> no registration
    assert(MatchRecognize.rowtimeMeasureOf(
      q("pat_src").replace("match_rowtime()", "count(a.*)")).isEmpty)
    // the REWRITES accept the backticked source too (one shared law)
    import SparkFixture.spark.implicits._
    Seq((1L, new java.sql.Timestamp(10000L), "a"))
      .toDF("k", "ts", "t").createOrReplaceTempView("pat_src")
    val batchSql = MatchRecognize.rewrite(SparkFixture.spark, q("`pat_src`"))
    try assert(SparkFixture.spark.sql(batchSql).count() == 1L)
    finally MatchRecognize.dropViews(SparkFixture.spark, batchSql)
    // two regions -> unregistered (no single propagated attribute)
    assert(MatchRecognize.rowtimeMeasureOf(
      q("pat_src") + " union all " + q("pat_src")).isEmpty)
  }

  test("MATCH_ROWTIME() contract: needs an ascending TIMESTAMP head") {
    seq((1, 1, "a", 0)) // ORDER BY o is a LONG
    val base =
      """SELECT * FROM mr_in MATCH_RECOGNIZE (
        |  PARTITION BY k ORDER BY o %s
        |  MEASURES MATCH_ROWTIME() AS mrt
        |  PATTERN (A) DEFINE A AS t = 'a')""".stripMargin
    val e = intercept[IllegalArgumentException](
      spark.sql(MatchRecognize.rewrite(spark, base.format(""))).collect())
    assert(e.getMessage.contains("TIMESTAMP"), e.getMessage)
    val e2 = intercept[IllegalArgumentException](
      spark.sql(MatchRecognize.rewrite(spark, base.format("DESC")))
        .collect())
    assert(e2.getMessage.contains("ascending"), e2.getMessage)
  }

  test("rewrite temp views are dropped after the statement executes") {
    seq((1, 1, "a", 0))
    val before = spark.catalog.listTables().collect()
      .count(_.name.startsWith("graft_mr_"))
    val rewritten = MatchRecognize.rewrite(spark,
      """SELECT * FROM mr_in MATCH_RECOGNIZE (
        |  PARTITION BY k ORDER BY o MEASURES COUNT(*) AS n
        |  PATTERN (A) DEFINE A AS t = 'a')""".stripMargin)
    val df = spark.sql(rewritten)
    assert(df.collect().length == 1)
    MatchRecognize.dropViews(spark, rewritten)
    val after = spark.catalog.listTables().collect()
      .count(_.name.startsWith("graft_mr_"))
    assert(after <= before, s"temp views leaked: $before -> $after")
  }
}
