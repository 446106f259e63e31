package graft.operators

import org.apache.spark.sql.functions._

/** Deterministic sampling operators for training-data pipelines: at
  * 100 TB, sampling must be reproducible across reruns and machines, so
  * it keys on a content hash, never on `rand()`. Both queries are pure
  * row-local filters — no shuffle, fully pushdown-friendly — and the
  * hash arithmetic is the shared polynomial fold, so the DuckDB oracle
  * reproduces the selection bit-for-bit.
  */
object Sampling {

  /** 5% reproducible corpus sample keyed on the document fingerprint:
    * the same document is always in or out, regardless of partitioning,
    * cluster size, or rerun.
    */
  val extHashSample: Q = Q(
    "ext_hash_sample",
    """SELECT doc_id, lang,
      |  list_reduce(list_prepend(CAST(0 AS BIGINT),
      |    [CAST(ascii(c) AS BIGINT) for c in string_split(text, '')]),
      |    (a, b) -> (a * 31 + b) % 1000000007) % 100 AS bucket
      |FROM documents
      |WHERE list_reduce(list_prepend(CAST(0 AS BIGINT),
      |    [CAST(ascii(c) AS BIGINT) for c in string_split(text, '')]),
      |    (a, b) -> (a * 31 + b) % 1000000007) % 100 < 5""".stripMargin) { (s, dir) =>
    graft.functions.GraftFunctions.register(s)
    Tables.load(s, dir, "documents")
      .select(col("doc_id"), col("lang"),
        (expr("graft_poly_hash(text)") % 100).as("bucket"))
      .filter(col("bucket") < 5)
  }

  /** Source-mixing weights: sample each source at its own rate (here:
    * even sources 40%, odd sources 10%) to rebalance a corpus toward a
    * target distribution — the per-domain mixing step of pre-training
    * data curation. Still a row-local deterministic filter.
    */
  val extMixSample: Q = Q(
    "ext_mix_sample",
    """WITH h AS (
      |  SELECT doc_id, source,
      |    list_reduce(list_prepend(CAST(0 AS BIGINT),
      |      [CAST(ascii(c) AS BIGINT) for c in string_split(text, '')]),
      |      (a, b) -> (a * 31 + b) % 1000000007) % 100 AS bucket,
      |    CAST(SUBSTRING(source, 4) AS BIGINT) % 2 AS src_par
      |  FROM documents)
      |SELECT source, COUNT(*) AS n_kept
      |FROM h
      |WHERE (src_par = 0 AND bucket < 40) OR (src_par = 1 AND bucket < 10)
      |GROUP BY source""".stripMargin) { (s, dir) =>
    graft.functions.GraftFunctions.register(s)
    Tables.load(s, dir, "documents")
      .select(col("source"),
        (expr("graft_poly_hash(text)") % 100).as("bucket"),
        (substring(col("source"), 4, 100).cast("long") % 2).as("src_par"))
      .filter((col("src_par") === 0 && col("bucket") < 40) ||
        (col("src_par") === 1 && col("bucket") < 10))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_kept"))
  }

  /** Stratified exact-k sample: the k docs with the smallest content
    * hash per language stratum. Hash-ordering makes it a uniform random
    * sample that is reproducible across reruns and cluster layouts, and
    * "smallest k per stratum" means Spark's WindowGroupLimit keeps only
    * k rows per partition *before* the shuffle — each executor ships k
    * candidates per stratum, never its whole slice, so the cost at
    * 100 TB is k·strata, not corpus size.
    */
  val extStratifiedSample: Q = Q(
    "ext_stratified_sample",
    """WITH h AS (
      |  SELECT doc_id, lang,
      |    list_reduce(list_prepend(CAST(0 AS BIGINT),
      |      [CAST(ascii(c) AS BIGINT) for c in string_split(text, '')]),
      |      (a, b) -> (a * 31 + b) % 1000000007) AS h
      |  FROM documents),
      |r AS (
      |  SELECT doc_id, lang, h,
      |    ROW_NUMBER() OVER (PARTITION BY lang ORDER BY h, doc_id) AS rn
      |  FROM h)
      |SELECT lang, doc_id, h, rn FROM r WHERE rn <= 20""".stripMargin) { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    graft.functions.GraftFunctions.register(s)
    val w = Window.partitionBy(col("lang")).orderBy(col("h"), col("doc_id"))
    Tables.load(s, dir, "documents")
      .select(col("lang"), col("doc_id"), expr("graft_poly_hash(text)").as("h"))
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= 20)
  }

  /** Weighted priority sampling: smallest-k per source by the priority
    * key `u / w`, where `u` is the content-hash uniform and `w` the
    * document's weight (n_chars here — a real pipeline plugs in a
    * quality score). Higher weight → smaller expected key → more likely
    * sampled, reproducibly (same corpus, same sample). The key uses one
    * IEEE division only — bit-identical in every engine, unlike the
    * exponential-key (pow/log) variants whose libm rounding differs —
    * so the oracle checks the exact selection.
    *
    * Scale shape: one window per source stratum with a pre-shuffle
    * WindowGroupLimit trim — only ~k rows per partition cross the wire.
    */
  val extWeightedSample: Q = Q(
    "ext_weighted_sample",
    """WITH h AS (
      |  SELECT doc_id, source, n_chars,
      |    list_reduce(list_prepend(CAST(0 AS BIGINT),
      |      [CAST(ascii(c) AS BIGINT) for c in string_split(text, '')]),
      |      (a, b) -> (a * 31 + b) % 1000000007) AS u
      |  FROM documents),
      |r AS (
      |  SELECT doc_id, source, u, n_chars,
      |    ROW_NUMBER() OVER (PARTITION BY source
      |      ORDER BY CAST(u AS DOUBLE) / n_chars, doc_id) AS rn
      |  FROM h)
      |SELECT source, doc_id, u, n_chars, rn FROM r WHERE rn <= 10""".stripMargin) { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    graft.functions.GraftFunctions.register(s)
    val w = Window.partitionBy(col("source"))
      .orderBy((col("u").cast("double") / col("n_chars")).asc, col("doc_id"))
    Tables.load(s, dir, "documents")
      .select(col("source"), col("doc_id"), col("n_chars"),
        expr("graft_poly_hash(text)").as("u"))
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= 10)
      .select(col("source"), col("doc_id"), col("u"), col("n_chars"), col("rn"))
  }

  /** Temperature-based mixing allocation (multilingual-corpus
    * resampling, alpha = 0.5): per-source budget targets proportional
    * to `n_docs^alpha`, apportioned by largest remainder so the
    * targets sum to the budget EXACTLY. Cross-engine determinism:
    * IEEE sqrt is correctly rounded (so the micro-quantized weights
    * match bit-for-bit), and everything after is integer arithmetic —
    * integer division for the base share, remainder-rank for the
    * leftover units, ties to the lexicographically first source. The
    * whole operator aggregates to one row per source before any
    * window, so the windowed apportionment runs over the source list,
    * not the corpus.
    */
  val extMixTemperature: Q = Q(
    "ext_mix_temperature",
    """WITH c AS (SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY source),
      |w AS (SELECT source, n_docs,
      |  CAST(FLOOR(SQRT(n_docs) * 1000000 + 0.5) AS BIGINT) AS w_micros FROM c),
      |t AS (SELECT source, n_docs, w_micros, SUM(w_micros) OVER () AS tot FROM w),
      |b AS (SELECT source, n_docs, w_micros,
      |  (CAST(10000 AS BIGINT) * w_micros) // tot AS base,
      |  (CAST(10000 AS BIGINT) * w_micros) % tot AS rem FROM t),
      |r AS (SELECT *, ROW_NUMBER() OVER (ORDER BY rem DESC, source) AS rk,
      |  10000 - SUM(base) OVER () AS leftover FROM b)
      |SELECT source, n_docs, w_micros,
      |  CAST(base + CASE WHEN rk <= leftover THEN 1 ELSE 0 END AS BIGINT) AS target
      |FROM r""".stripMargin) { (s, dir) =>
    Tables.load(s, dir, "documents").createOrReplaceTempView("mixt_docs")
    s.sql(
      """WITH c AS (SELECT source, COUNT(*) AS n_docs FROM mixt_docs GROUP BY source),
        |w AS (SELECT source, n_docs,
        |  CAST(FLOOR(SQRT(n_docs) * 1000000 + 0.5) AS BIGINT) AS w_micros FROM c),
        |t AS (SELECT source, n_docs, w_micros, SUM(w_micros) OVER () AS tot FROM w),
        |b AS (SELECT source, n_docs, w_micros,
        |  (CAST(10000 AS BIGINT) * w_micros) DIV tot AS base,
        |  (CAST(10000 AS BIGINT) * w_micros) % tot AS rem FROM t),
        |r AS (SELECT *, ROW_NUMBER() OVER (ORDER BY rem DESC, source) AS rk,
        |  10000 - SUM(base) OVER () AS leftover FROM b)
        |SELECT source, n_docs, w_micros,
        |  CAST(base + CASE WHEN rk <= leftover THEN 1 ELSE 0 END AS BIGINT) AS target
        |FROM r""".stripMargin)
  }

  /** DSIR-style hashed n-gram importance weights (Xie et al. 2023,
    * "Data Selection for Language Models via Importance Resampling"):
    * score every raw document by how target-like its hashed bigram
    * feature distribution is, the selection signal importance
    * resampling then draws against. Features are word-bigram hashes
    * folded into 256 buckets; the target distribution is the `en`
    * slice, the raw distribution the whole corpus. Per-bucket
    * importance ratio is integer-quantized BEFORE summation —
    * `lr_micros(b) = ((n_target+1)·1e6) div (n_raw+1)`, one exact
    * integer division per bucket (add-1 smoothed) — so the per-doc sum
    * is exact int64 arithmetic and the oracle cannot drift on float
    * accumulation order (the house lm_score pattern; the published
    * method sums log-ratios — same ordering signal, different curve).
    *
    * Scale shape: the bucket table is 256 rows no matter the corpus
    * size — it broadcasts to a map-side join — and the only wide
    * shuffles are the bucket-count aggregation and the per-doc rollup,
    * both over (id, small-int) rows, never text. A sub-2-token doc
    * degrades to its whole-text hash bucket on both dialects
    * (shingle-hash contract).
    */
  val extDsirWeights: Q = Q(
    "ext_dsir_weights", {
      val hs = graft.functions.TextHash
        .shingleHashesDuck("string_split(text, ' ')", 2)
      s"""WITH t AS (
         |  SELECT doc_id, lang,
         |    [h % 256 for h in $hs] AS bs
         |  FROM documents),
         |occ AS (SELECT doc_id, lang, UNNEST(bs) AS b FROM t),
         |cnt AS (
         |  SELECT b, COUNT(*) AS nr,
         |    CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT)
         |      AS nt
         |  FROM occ GROUP BY b),
         |lr AS (SELECT b, ((nt + 1) * 1000000) // (nr + 1) AS lr_micros
         |  FROM cnt)
         |SELECT occ.doc_id, CAST(COUNT(*) AS BIGINT) AS n_feats,
         |  CAST(SUM(lr.lr_micros) AS BIGINT) AS dsir_micros,
         |  CAST(SUM(lr.lr_micros) // COUNT(*) AS BIGINT)
         |    AS per_feat_micros
         |FROM occ JOIN lr ON lr.b = occ.b
         |GROUP BY occ.doc_id""".stripMargin
    }) { (s, dir) =>
    graft.functions.GraftFunctions.register(s)
    val shingles = graft.functions.TextHash
      .shingleHashesSpark("split(text, ' ')", 2)
    val occ = Tables.load(s, dir, "documents")
      .select(col("doc_id"), col("lang"),
        explode(expr(s"transform($shingles, h -> h % 256L)")).as("b"))
      // feeds both the bucket counts and the per-doc rollup; the
      // checkpoint is lazy so blocks free with the result frame
      .localCheckpoint(false)
    val lr = occ.groupBy(col("b"))
      .agg(count(lit(1)).as("nr"),
        sum(when(col("lang") === "en", 1L).otherwise(0L)).as("nt"))
      .withColumn("lr_micros", expr("((nt + 1L) * 1000000L) div (nr + 1L)"))
      .select(col("b"), col("lr_micros"))
    occ.join(broadcast(lr), "b")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).cast("long").as("n_feats"),
        sum(col("lr_micros")).cast("long").as("dsir_micros"))
      .select(col("doc_id"), col("n_feats"), col("dsir_micros"),
        expr("CAST(dsir_micros div n_feats AS BIGINT)").as("per_feat_micros"))
  }

  /** UniMax-style epoch-capped language budget allocation (Chung et
    * al. 2023, "UniMax: Fairer and More Effective Language Sampling
    * for Large-Scale Multilingual Pretraining"): distribute a total
    * character budget uniformly across languages, except no language
    * may exceed its epoch cap (N epochs × its corpus size) — low-
    * resource languages hit the cap, the head languages split what
    * remains. The sequential water-filling has a closed form because
    * caps sort ascending: `f(j) = cap_j·(L-j+1) + Σ_{i<j} cap_i` is
    * nondecreasing in j (the increment is `(L-j)·(cap_{j+1}-cap_j)`),
    * so the capped set is exactly the prefix with `f(j) ≤ budget` —
    * one window pass, no recursion. The uncapped languages split the
    * remaining budget by exact integer division, the remainder going
    * one unit each to the first uncapped languages in (capacity, lang)
    * order — largest-remainder determinism, the house apportionment
    * rule. Two parameterizations run side by side so both branches are
    * always exercised whatever the corpus mix: A = budget total/2 at
    * 2 epochs (nothing caps on this corpus → pure uniform split +
    * remainder), B = budget 3·total/4 at 1 epoch (every tail language
    * caps, the head splits the rest). All arithmetic is int64 — the
    * oracle cannot drift.
    *
    * Scale shape: the corpus collapses to one row per language FIRST
    * (a map-side-combined aggregation); every window below runs over
    * the language list — a handful of rows at any corpus size, the
    * same design as [[extMixTemperature]].
    */
  val extUnimaxAlloc: Q = {
    // identical text in both dialects except integer division
    def sql(div: String): String =
      s"""WITH c AS (
         |  SELECT lang, COUNT(*) AS n_docs,
         |    CAST(SUM(n_chars) AS BIGINT) AS chars
         |  FROM __TBL__ GROUP BY lang),
         |t AS (SELECT lang, n_docs, chars,
         |  SUM(chars) OVER () AS total,
         |  COUNT(*) OVER () AS nl,
         |  ROW_NUMBER() OVER (ORDER BY chars, lang) AS i,
         |  SUM(chars) OVER (ORDER BY chars, lang
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - chars
         |    AS pre
         |  FROM c),
         |f AS (SELECT *,
         |  total $div 2 AS bud_a, (3 * total) $div 4 AS bud_b,
         |  CASE WHEN 2 * chars * (nl - i + 1) + 2 * pre <= total $div 2
         |       THEN 1 ELSE 0 END AS cf_a,
         |  CASE WHEN chars * (nl - i + 1) + pre <= (3 * total) $div 4
         |       THEN 1 ELSE 0 END AS cf_b
         |  FROM t),
         |g AS (SELECT *,
         |  SUM(cf_a) OVER () AS k_a, SUM(cf_a * 2 * chars) OVER () AS sk_a,
         |  SUM(cf_b) OVER () AS k_b, SUM(cf_b * chars) OVER () AS sk_b
         |  FROM f)
         |SELECT lang, n_docs, chars,
         |  CAST(CASE WHEN cf_a = 1 THEN 2 * chars
         |    ELSE (bud_a - sk_a) $div (nl - k_a) +
         |      CASE WHEN i - k_a <= (bud_a - sk_a) % (nl - k_a)
         |           THEN 1 ELSE 0 END END AS BIGINT) AS alloc_a,
         |  CAST(CASE WHEN cf_b = 1 THEN chars
         |    ELSE (bud_b - sk_b) $div (nl - k_b) +
         |      CASE WHEN i - k_b <= (bud_b - sk_b) % (nl - k_b)
         |           THEN 1 ELSE 0 END END AS BIGINT) AS alloc_b,
         |  CAST((CASE WHEN cf_a = 1 THEN 2 * chars
         |    ELSE (bud_a - sk_a) $div (nl - k_a) +
         |      CASE WHEN i - k_a <= (bud_a - sk_a) % (nl - k_a)
         |           THEN 1 ELSE 0 END END * 1000000) $div chars AS BIGINT)
         |    AS epochs_micros_a
         |FROM g""".stripMargin
    Q("ext_unimax_alloc", sql("//").replace("__TBL__", "documents")) { (s, dir) =>
      Tables.load(s, dir, "documents")
        .createOrReplaceTempView("unimax_docs")
      s.sql(sql("DIV").replace("__TBL__", "unimax_docs"))
    }
  }

  def all: Seq[Q] = Seq(
    extHashSample, extMixSample, extStratifiedSample, extWeightedSample,
    extMixTemperature, extDsirWeights, extUnimaxAlloc)
}
