package graft.operators

import graft.{SparkEntry, SparkFixture}
import org.scalatest.funsuite.AnyFunSuite

/** Plan-quality regression net over the whole query registry: every
  * query must analyze + plan at sf0.001, and no plan may contain an
  * unpartitioned CartesianProduct (the cross-join shapes we do use are
  * broadcast nested-loop with a tiny broadcast side, which is fine; a
  * CartesianProduct of two big sides would be a scale bug).
  */
class PlanAuditSpec extends AnyFunSuite {

  test("all registered queries plan cleanly, without CartesianProduct") {
    val spark = SparkFixture.spark
    val sf = "/root/testdata/sf0.001"
    val offenders = SparkEntry.registry.flatMap { q =>
      val plan = q.fn(spark, sf).queryExecution.executedPlan.toString
      if (plan.contains("CartesianProduct")) Some(q.name -> "CartesianProduct")
      else None
    }
    assert(offenders.isEmpty, s"plan offenders: $offenders")
  }

  test("flagship entry returns rows at sf0.001 (driver smoke contract)") {
    assert(SparkEntry.entry(SparkFixture.spark).count() > 0)
  }

  test("band-recall truth pass stays df-capped (ObjectHashAggregate present)") {
    // the truth expansion must keep running through the bounded
    // CappedPostings aggregate — an edit that reverts it to a posting
    // self-join would reintroduce the quadratic hot-shingle shape
    val spark = SparkFixture.spark
    val plan = SparkEntry.queries("ext_band_recall")(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"),
      s"capped postings aggregate missing from:\n$plan")
    assert(plan.contains("graft_doc_pairs"),
      s"grouped pair expansion missing from:\n$plan")
  }

  test("temporal join plans as a key-partitioned join, not a nested loop") {
    // the LATERAL top-1 form decorrelated into a domain
    // BroadcastNestedLoopJoin (distinct times x version table) and
    // timed out at sf0.1; the interval-ized rewrite must never plan one
    val spark = SparkFixture.spark
    val plan = SparkEntry.queries("q56_temporal")(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), s"nested loop in:\n$plan")
  }

  test("schema'd JSON query parses props exactly once (single JsonToStructs)") {
    val spark = SparkFixture.spark
    val plan = SparkEntry.queries("q57_json_schema")(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    val parses = "from_json".r.findAllIn(plan).size
    assert(parses == 1, s"expected one from_json in:\n$plan")
  }

  test("rerank ANN broadcasts the query side and trims windows pre-shuffle") {
    // the coarse scan must never shuffle the corpus side: queries are
    // broadcast, and both top-k windows trim per partition first
    // (WindowGroupLimit) so only candidate rows cross the wire
    val spark = SparkFixture.spark
    val plan = SparkEntry.queries("ext_ann_rerank")(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastHashJoin"),
      s"query side not broadcast in:\n$plan")
    assert(plan.contains("WindowGroupLimit"), s"no pre-shuffle top-k trim in:\n$plan")
  }

  test("co-occurrence lift broadcasts the df table, shuffles pairs once") {
    val spark = SparkFixture.spark
    val plan = SparkEntry.queries("ext_cooccur")(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    assert("BroadcastHashJoin".r.findAllIn(plan).size >= 2,
      s"df lookups not broadcast in:\n$plan")
  }

  test("INTERSECT/EXCEPT plan as semi/anti join over one distinct exchange") {
    // the shape to keep: map-side partial distinct, ONE narrow hash
    // exchange on the key, and a planner-chosen (broadcast at this SF)
    // semi/anti join — a regression to join-then-global-distinct or a
    // shuffled join on the tiny side would show up here
    val spark = SparkFixture.spark
    for ((q, joinKind) <- Seq("q24_intersect" -> "LeftSemi",
                              "q25_except" -> "LeftAnti")) {
      val plan = SparkEntry.queries(q)(spark, "/root/testdata/sf0.001")
        .queryExecution.executedPlan.toString
      assert(plan.contains(joinKind), s"$q lost its $joinKind join:\n$plan")
      val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
      assert(exchanges == 1,
        s"$q: expected one distinct exchange, found $exchanges in:\n$plan")
    }
  }

  test("vocabulary-table joins are planner-chosen, not hint-forced") {
    // the distinct-token df table is unbounded at web scale (typos,
    // URLs, IDs): a forced broadcast hint removes the planner's ability
    // to fall back to a shuffled join and OOMs at 100x. Only the 1-row
    // corpus-count scalar may carry a hint; the df joins must be
    // planner-chosen (broadcast at this SF is fine — the HINT must go).
    val spark = SparkFixture.spark
    for (q <- Seq("ext_tfidf_top", "ext_cooccur")) {
      val analyzed = SparkEntry.queries(q)(spark, "/root/testdata/sf0.001")
        .queryExecution.analyzed.toString
      val hints = "ResolvedHint".r.findAllIn(analyzed).size
      assert(hints == 1,
        s"$q: expected exactly the scalar-count hint, found $hints in:\n$analyzed")
    }
  }

  test("PQ ANN broadcasts the codebook/LUT and assigns codes without a sort") {
    // the 16-codeword-per-subspace codebook and the query LUT are tiny
    // and must broadcast; the per-subspace argmin runs as a hash agg on
    // the integer (distance, cid) key — a sort-window over the full
    // vector × codeword distance table would not survive a corpus scan
    val spark = SparkFixture.spark
    val plan = SparkEntry.queries("ext_ann_pq")(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    // codebook joins (encode + LUT build) AND the ADC scoring join must
    // all broadcast the tiny side — the scoring join in particular would
    // otherwise shuffle every code row on (j, cid), 128 distinct keys
    assert("BroadcastHashJoin".r.findAllIn(plan).size >= 3,
      s"codebook/LUT/scoring joins not broadcast in:\n$plan")
    // exactly one window: the final per-query top-5 (WindowGroupLimit-
    // trimmed); a second one would mean code assignment regressed from
    // the integer-argmin hash agg to a sort-window
    assert("Window \\[".r.findAllIn(plan).size == 1,
      s"code assignment fell back to a sort-window in:\n$plan")
    assert(plan.contains("WindowGroupLimit"),
      s"top-k not trimmed pre-shuffle in:\n$plan")
  }

  test("theta join broadcasts the dim side; scalar subquery stays subquery-shaped") {
    // q15/q17 were flagged as round-5 bench outliers with untouched code;
    // the A/B attributed the delta to ambient contention (README). Pin the
    // shapes so a future real regression is distinguishable from variance.
    val spark = SparkFixture.spark
    val theta = SparkEntry.queries("q15_theta_join")(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    assert(theta.contains("BroadcastNestedLoopJoin"),
      s"q15 theta join lost its broadcast nested loop:\n$theta")
    val scalar = SparkEntry.queries("q17_scalar_subquery")(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    assert(scalar.contains("Subquery"),
      s"q17 lost its scalar-subquery shape:\n$scalar")
    assert(!scalar.contains("Join"),
      s"q17 decorrelated into a join:\n$scalar")
  }

  test("window top-N trims per partition before the rank shuffle") {
    // q93 partitions the rank on the window column: the N=3 cutoff must
    // push below the sort (WindowGroupLimit) so per window only the
    // candidate head crosses the exchange — the property that keeps
    // per-window top-N linear when windows hold millions of rows
    val spark = SparkFixture.spark
    val plan = SparkEntry.queries("q93_window_topn")(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      s"no pre-shuffle top-N trim in:\n$plan")
  }

  test("window join plans as an equi-join on (user, window), not a nested loop") {
    // the window column is part of the join key, so Catalyst must pick a
    // hash-based equi-join; a nested-loop over time ranges would be
    // quadratic per user at scale
    val spark = SparkFixture.spark
    val plan = SparkEntry.queries("q92_window_join")(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    assert(plan.contains("HashJoin") || plan.contains("SortMergeJoin"),
      s"window join not an equi-join:\n$plan")
    assert(!plan.contains("NestedLoop") && !plan.contains("CartesianProduct"),
      s"window join degenerated to a nested loop:\n$plan")
  }

  test("multiset set-ops aggregate counts instead of joining row-by-row") {
    // INTERSECT ALL / EXCEPT ALL must plan as Catalyst's counted
    // rewrite (per-key multiplicity agg + Generate replay), never a
    // join that pairs duplicate rows multiplicatively
    val spark = SparkFixture.spark
    for (q <- Seq("q88_intersect_all", "q89_except_all")) {
      val plan = SparkEntry.queries(q)(spark, "/root/testdata/sf0.001")
        .queryExecution.executedPlan.toString
      assert(plan.contains("Generate replicaterows"),
        s"$q lost the counted multiset rewrite:\n$plan")
    }
  }

  test("PII redaction is map-only: no exchange anywhere in the plan") {
    // three regex passes inside one projection — at corpus scale this
    // must pipeline with the scan; any shuffle here is a planning bug
    val spark = SparkFixture.spark
    val plan = SparkEntry.queries("ext_pii_redact")(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle in:\n$plan")
  }

  test("knn graph pre-trims to k map-side: partial heap aggregate before the exchange") {
    // the size-k heap aggregate must run in partial mode below the
    // node_id exchange — at scale only k rows per node per partition
    // cross the shuffle, never a hot bucket's full candidate list
    val spark = SparkFixture.spark
    val plan = SparkEntry.queries("ext_knn_graph")(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    assert(plan.contains("partial_graft_topk_by_score"),
      s"no map-side heap partial aggregation in:\n$plan")
  }

  test("legacy HOP join keeps one equi-join and a row-local window fan-out") {
    // the inline lateral-view escalation must not add a second join or
    // shuffle for the window: one equi-join on user/custkey, the
    // covering windows explode per joined row
    val spark = SparkFixture.spark
    val plan = SparkEntry.queries("q102_legacy_hop_join")(
      spark, "/root/testdata/sf0.001").queryExecution.executedPlan.toString
    assert(plan.contains("Generate explode(sequence"),
      s"no row-local window fan-out in:\n$plan")
    assert(!plan.contains("NestedLoop") && !plan.contains("CartesianProduct"),
      s"hop join degenerated to a nested loop:\n$plan")
  }

  test("source overlap broadcasts the per-source totals") {
    // the source-id dim is #sources rows — every join onto it must be
    // a broadcast, never a shuffle of the pair matrix; and the pair
    // expansion must run through the df-capped grouped-posting
    // aggregate (r14), not a posting self-join quadratic in the
    // number of sources sharing a boilerplate shingle
    val spark = SparkFixture.spark
    val plan = SparkEntry.queries("ext_source_overlap")(
      spark, "/root/testdata/sf0.001").queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"per-source dim not broadcast in:\n$plan")
    assert(plan.contains("ObjectHashAggregate"),
      s"no capped posting-list aggregate in:\n$plan")
    assert(plan.contains("graft_doc_pairs"),
      s"pairs not expanded from grouped postings in:\n$plan")
  }

  test("unimax allocation aggregates to one row per language before " +
      "any window") {
    // the windows (prefix sums, row numbers) must run over the
    // language LIST, never the corpus: in the top-down plan the Window
    // operators sit strictly above the lang aggregate, and the scan
    // prunes to the two columns the aggregate reads (no text column)
    val spark = SparkFixture.spark
    val qe = SparkEntry.queries("ext_unimax_alloc")(
      spark, "/root/testdata/sf0.001").queryExecution
    val plan = qe.executedPlan.toString
    val win = plan.indexOf("Window")
    val agg = plan.indexOf("HashAggregate")
    assert(win >= 0 && agg >= 0 && win < agg,
      s"expected Window above the lang aggregate in:\n$plan")
    val scan = plan.linesIterator.find(_.contains("ReadSchema"))
      .getOrElse(fail(s"no scan in:\n$plan"))
    assert(scan.contains("lang") && scan.contains("n_chars") &&
      !scan.contains("text"),
      s"scan not pruned to (lang, n_chars): $scan")
  }

  test("left unnest-with-ordinality plans as an outer generate, no join") {
    // the LEFT JOIN LATERAL posexplode form must collapse to an OUTER
    // Generate — a correlated-join execution would re-scan per row
    val spark = SparkFixture.spark
    val plan = SparkEntry.queries("q105_left_unnest_ord")(
      spark, "/root/testdata/sf0.001").queryExecution.executedPlan.toString
    assert(plan.contains("Generate") && plan.contains("posexplode"),
      s"no generate in:\n$plan")
    assert(!plan.contains("NestedLoop") && !plan.contains("CartesianProduct"),
      s"left unnest degenerated to a join:\n$plan")
  }

  test("bloom screen: partial fixed-width mask aggregation, mask broadcast") {
    // the mask must build through ObjectHashAggregate (ScalaAggregator
    // partials: each partition ORs its own bits/64-long buffer before
    // the single-row shuffle) and reach the probes as a broadcast —
    // never a shuffle keyed on anything corpus-sized
    val spark = SparkFixture.spark
    val plan = SparkEntry.queries("ext_bloom_screen")(
      spark, "/root/testdata/sf0.001").queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"),
      s"mask not built via partial object aggregation in:\n$plan")
    assert(plan.contains("BroadcastNestedLoopJoin") ||
      plan.contains("BroadcastHashJoin"),
      s"mask/fingerprint sides not broadcast in:\n$plan")
  }

  test("dsir weights: the 256-bucket ratio table joins as a broadcast") {
    // the bucket table is fixed-width (256 rows) at any corpus size —
    // the occurrence stream must never shuffle for the lookup
    val spark = SparkFixture.spark
    val plan = SparkEntry.queries("ext_dsir_weights")(
      spark, "/root/testdata/sf0.001").queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"bucket ratio table not broadcast in:\n$plan")
  }
}
