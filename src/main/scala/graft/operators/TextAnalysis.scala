package graft.operators

import org.apache.spark.sql.functions._

/** Text-analysis operators over the `documents` table (north-star
  * extension set, SURVEY.md §2.C [ext] + §7 step 7): token counting,
  * language-ID heuristic, quality scoring, document fingerprinting,
  * n-gram statistics.
  *
  * All operators are per-row projections plus one hash aggregation —
  * embarrassingly parallel, no shuffle except the final groupBy, so they
  * scale linearly with input size. Everything stays inside Catalyst
  * higher-order functions (transform/filter/aggregate) — codegen'd, no
  * UDF serialization overhead.
  *
  * Ratios are quantized to integer thousandths (floor(x*1000+0.5)) so
  * results hash-match DuckDB bit-for-bit (see [[Det]]).
  */
object TextAnalysis {

  /** Whitespace token count + char length. */
  val extTokenCount: Q = Q(
    "ext_token_count",
    """SELECT doc_id,
      |  LENGTH(text) AS n_chars_actual,
      |  LEN(string_split(text, ' ')) AS n_tokens
      |FROM documents""".stripMargin) { (s, dir) =>
    Tables.load(s, dir, "documents")
      .select(col("doc_id"),
        length(col("text")).cast("long").as("n_chars_actual"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"))
  }

  /** Stopword-ratio language heuristic: fraction of determiner tokens
    * ('the'/'a'); >= 5% → 'en', else 'unknown'. Compared against the
    * labeled lang column.
    */
  val extLangId: Q = Q(
    "ext_lang_id",
    """WITH t AS (
      |  SELECT doc_id, lang, string_split(text, ' ') AS toks FROM documents)
      |SELECT doc_id, lang,
      |  CAST(FLOOR((LEN(list_filter(toks, t -> t IN ('the', 'a'))) * 1.0 / LEN(toks)) * 1000 + 0.5) AS BIGINT) AS stop_ratio_mils,
      |  CASE WHEN LEN(list_filter(toks, t -> t IN ('the', 'a'))) * 1.0 / LEN(toks) >= 0.05
      |    THEN 'en' ELSE 'unknown' END AS pred_lang
      |FROM t""".stripMargin) { (s, dir) =>
    val toks = split(col("text"), " ")
    val nStop = size(expr("filter(split(text, ' '), t -> t IN ('the', 'a'))"))
    val ratio = nStop * lit(1.0d) / size(toks)
    Tables.load(s, dir, "documents")
      .select(col("doc_id"), col("lang"),
        floor(ratio * 1000d + 0.5d).cast("long").as("stop_ratio_mils"),
        when(ratio >= 0.05d, "en").otherwise("unknown").as("pred_lang"))
  }

  /** Composite quality score: token count, mean token length,
    * type-token ratio (vocabulary diversity), stopword ratio — the
    * standard cheap pre-training quality signals.
    */
  val extQualityScore: Q = Q(
    "ext_quality_score",
    """WITH t AS (
      |  SELECT doc_id, LENGTH(text) AS n_chars_actual,
      |    string_split(text, ' ') AS toks
      |  FROM documents)
      |SELECT doc_id,
      |  LEN(toks) AS n_tokens,
      |  CAST(FLOOR(((n_chars_actual - LEN(toks) + 1) * 1.0 / LEN(toks)) * 1000 + 0.5) AS BIGINT) AS mean_tok_len_mils,
      |  CAST(FLOOR((LEN(list_distinct(toks)) * 1.0 / LEN(toks)) * 1000 + 0.5) AS BIGINT) AS ttr_mils,
      |  CASE WHEN LEN(toks) >= 20
      |        AND LEN(list_distinct(toks)) * 1.0 / LEN(toks) >= 0.2
      |    THEN 1 ELSE 0 END AS quality_pass
      |FROM t""".stripMargin) { (s, dir) =>
    val toks = split(col("text"), " ")
    val nToks = size(toks)
    val meanTokLen =
      (length(col("text")) - nToks + 1) * lit(1.0d) / nToks
    val ttr = size(array_distinct(toks)) * lit(1.0d) / nToks
    Tables.load(s, dir, "documents")
      .select(col("doc_id"),
        nToks.cast("long").as("n_tokens"),
        floor(meanTokLen * 1000d + 0.5d).cast("long").as("mean_tok_len_mils"),
        floor(ttr * 1000d + 0.5d).cast("long").as("ttr_mils"),
        when(nToks >= 20 && ttr >= 0.2d, 1).otherwise(0).as("quality_pass"))
  }

  /** Polynomial rolling-hash fingerprint over the character stream
    * (h = h*31 + code mod 1e9+7), plus duplicate-cluster size per
    * fingerprint. Identical fold both engines: sequential left fold over
    * chars, intermediate values < 3.2e10 so no int64 overflow.
    */
  val extFingerprint: Q = Q(
    "ext_fingerprint",
    """WITH f AS (
      |  SELECT doc_id,
      |    list_reduce(
      |      list_prepend(CAST(0 AS BIGINT),
      |        [CAST(ascii(c) AS BIGINT) for c in string_split(text, '')]),
      |      (a, b) -> (a * 31 + b) % 1000000007) AS fp
      |  FROM documents)
      |SELECT doc_id, fp,
      |  COUNT(*) OVER (PARTITION BY fp) AS cluster_size
      |FROM f""".stripMargin) { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    graft.functions.GraftFunctions.register(s)
    Tables.load(s, dir, "documents")
      .select(col("doc_id"), expr("graft_poly_hash(text)").as("fp"))
      .withColumn("cluster_size", count(lit(1)).over(Window.partitionBy(col("fp"))))
  }

  /** Global top-20 word bigrams (n-gram statistics): per-doc bigram
    * generation is a projection; one count shuffle; TakeOrdered top-k.
    */
  val extNgramTop: Q = Q(
    "ext_ngram_top",
    """WITH t AS (SELECT string_split(text, ' ') AS toks FROM documents),
      |b AS (
      |  SELECT UNNEST([toks[i] || ' ' || toks[i+1]
      |                 for i in generate_series(1, LEN(toks)-1)]) AS bigram
      |  FROM t)
      |SELECT bigram, COUNT(*) AS cnt
      |FROM b GROUP BY bigram
      |ORDER BY cnt DESC, bigram LIMIT 20""".stripMargin) { (s, dir) =>
    graft.functions.GraftFunctions.register(s)
    Tables.load(s, dir, "documents")
      .select(split(col("text"), " ").as("toks"))
      .select(expr("explode(graft_word_ngrams(toks, 2))").as("bigram"))
      .groupBy(col("bigram"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("bigram"))
      .limit(20)
  }

  /** Exact per-language length quantiles (p25/p50/p75/p90) via domain
    * compression: group to (lang, n_chars) counts first, then a
    * cumulative sum over the *compressed* domain picks each order
    * statistic. At 100 TB this is the only exact-quantile shape that
    * works — the window sort runs over |distinct lengths| rows per
    * language (thousands), never over the corpus; a per-row
    * ROW_NUMBER would sort billions. Rank arithmetic stays in integers
    * (ceil(q·n) = (n·q% + 99) div 100) so both engines agree exactly.
    */
  val extQuantiles: Q = Q(
    "ext_quantiles", {
      def pick(p: Int) =
        s"MIN(CASE WHEN cum >= (n * $p + 99) // 100 THEN n_chars END) AS p$p"
      s"""WITH c AS (
         |  SELECT lang, n_chars, COUNT(*) AS cnt
         |  FROM documents GROUP BY lang, n_chars),
         |cum AS (
         |  SELECT lang, n_chars,
         |    CAST(SUM(cnt) OVER (PARTITION BY lang ORDER BY n_chars) AS BIGINT) AS cum,
         |    CAST(SUM(cnt) OVER (PARTITION BY lang) AS BIGINT) AS n
         |  FROM c)
         |SELECT lang, MAX(n) AS n_docs,
         |  ${Seq(25, 50, 75, 90).map(pick).mkString(",\n  ")}
         |FROM cum GROUP BY lang""".stripMargin
    }) { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    val wCum = Window.partitionBy(col("lang")).orderBy(col("n_chars"))
    val wAll = Window.partitionBy(col("lang"))
    def pick(p: Int) =
      min(when(col("cum") >= expr(s"(n * $p + 99) div 100"), col("n_chars")))
        .as(s"p$p")
    Tables.load(s, dir, "documents")
      .groupBy(col("lang"), col("n_chars"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("cum", sum(col("cnt")).over(wCum))
      .withColumn("n", sum(col("cnt")).over(wAll))
      .groupBy(col("lang"))
      .agg(max(col("n")).as("n_docs"),
        pick(25), pick(50), pick(75), pick(90))
  }

  /** Within-doc repetition ratio: share of word-trigram shingles that
    * are repeats of an earlier shingle in the same doc — the standard
    * cheap boilerplate/spam signal. Pure per-row projection on the
    * shared shingle-hash primitive; no shuffle at all.
    */
  val extRepetition: Q = Q(
    "ext_repetition", {
      val hs = graft.functions.TextHash.shingleHashesDuck("string_split(text, ' ')")
      s"""WITH t AS (SELECT doc_id, $hs AS hs FROM documents)
         |SELECT doc_id,
         |  LEN(hs) AS total_ngrams,
         |  LEN(list_distinct(hs)) AS uniq_ngrams,
         |  CAST(FLOOR((1.0 - LEN(list_distinct(hs)) * 1.0 / LEN(hs)) * 1000 + 0.5) AS BIGINT) AS rep_mils
         |FROM t""".stripMargin
    }) { (s, dir) =>
    graft.functions.GraftFunctions.register(s)
    val hs = expr(graft.functions.TextHash.shingleHashesSpark("split(text, ' ')"))
    val rep = lit(1.0d) - size(array_distinct(col("hs"))) * lit(1.0d) / size(col("hs"))
    Tables.load(s, dir, "documents")
      .select(col("doc_id"), hs.as("hs"))
      .select(col("doc_id"),
        size(col("hs")).cast("long").as("total_ngrams"),
        size(array_distinct(col("hs"))).cast("long").as("uniq_ngrams"),
        floor(rep * 1000d + 0.5d).cast("long").as("rep_mils"))
  }

  /** BPE-ish token estimate: regex pre-tokenization (letter runs /
    * digit runs / punctuation runs — the GPT-2 pre-tokenizer shape on
    * this corpus's alphabet) and the ~4-chars-per-token budget
    * ceil(len/4) per piece. The per-piece arithmetic runs columnar
    * after a codegen'd generator explode — one shuffle back to doc
    * grain, no interpreted per-element lambdas.
    */
  val extTokenBpe: Q = Q(
    "ext_token_bpe",
    """WITH p AS (
      |  SELECT doc_id, n_chars,
      |    UNNEST(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]+')) AS tok
      |  FROM documents)
      |SELECT doc_id,
      |  COUNT(*) AS n_pieces,
      |  CAST(SUM((LENGTH(tok) + 3) // 4) AS BIGINT) AS est_bpe_tokens,
      |  CAST(FLOOR((MIN(n_chars) * 1.0 / SUM((LENGTH(tok) + 3) // 4)) * 1000 + 0.5) AS BIGINT) AS chars_per_tok_mils
      |FROM p GROUP BY doc_id""".stripMargin) { (s, dir) =>
    val pieces = Tables.load(s, dir, "documents")
      .select(col("doc_id"), col("n_chars"),
        explode(regexp_extract_all(col("text"),
          lit("[a-z]+|[0-9]+|[^a-z0-9 ]+"), lit(0))).as("tok"))
    val est = sum(expr("(length(tok) + 3) div 4"))
    pieces.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_pieces"),
        est.cast("long").as("est_bpe_tokens"),
        floor(min(col("n_chars")) * lit(1.0d) / est * 1000d + 0.5d)
          .cast("long").as("chars_per_tok_mils"))
  }

  /** Quality filter funnel: per source, docs surviving each stage of
    * the standard curation chain (length → vocabulary diversity →
    * stopword signal). One hash aggregation over row-local predicates —
    * the shape of every corpus-triage report at scale.
    */
  val extQualityFunnel: Q = Q(
    "ext_quality_funnel",
    """WITH t AS (
      |  SELECT source,
      |    LEN(string_split(text, ' ')) AS n_tok,
      |    LEN(list_distinct(string_split(text, ' '))) * 1.0
      |      / LEN(string_split(text, ' ')) AS ttr,
      |    LEN(list_filter(string_split(text, ' '), x -> x IN ('the', 'a'))) * 1.0
      |      / LEN(string_split(text, ' ')) AS stop_ratio
      |  FROM documents),
      |f AS (
      |  SELECT source,
      |    CASE WHEN n_tok >= 20 THEN 1 ELSE 0 END AS s1,
      |    CASE WHEN n_tok >= 20 AND ttr >= 0.2 THEN 1 ELSE 0 END AS s2,
      |    CASE WHEN n_tok >= 20 AND ttr >= 0.2 AND stop_ratio >= 0.05
      |      THEN 1 ELSE 0 END AS s3
      |  FROM t)
      |SELECT source, COUNT(*) AS n_docs,
      |  CAST(SUM(s1) AS BIGINT) AS pass_len,
      |  CAST(SUM(s2) AS BIGINT) AS pass_ttr,
      |  CAST(SUM(s3) AS BIGINT) AS pass_stop
      |FROM f GROUP BY source""".stripMargin) { (s, dir) =>
    // tokenize once into a column; all three stats derive from it
    val nTok = size(col("toks"))
    val ttr = size(array_distinct(col("toks"))) * lit(1.0d) / nTok
    val stopRatio =
      size(expr("filter(toks, x -> x IN ('the', 'a'))")) * lit(1.0d) / nTok
    val s1 = when(nTok >= 20, 1).otherwise(0)
    val s2 = when(nTok >= 20 && ttr >= 0.2d, 1).otherwise(0)
    val s3 = when(nTok >= 20 && ttr >= 0.2d && stopRatio >= 0.05d, 1).otherwise(0)
    Tables.load(s, dir, "documents")
      .select(col("source"), split(col("text"), " ").as("toks"))
      .select(col("source"), s1.as("s1"), s2.as("s2"), s3.as("s3"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("s1")).cast("long").as("pass_len"),
        sum(col("s2")).cast("long").as("pass_ttr"),
        sum(col("s3")).cast("long").as("pass_stop"))
  }

  /** Per-language corpus vocabulary statistics: document count, token
    * volume, distinct vocabulary, and hapax legomena (tokens seen once
    * — the Zipf tail a tokenizer/quality pipeline watches). Scale
    * shape: one (lang, token) hash aggregation with map-side partials,
    * then a per-lang rollup of the (tiny) frequency table.
    */
  val extVocabStats: Q = Q(
    "ext_vocab_stats",
    """WITH tf AS (
      |  SELECT lang, UNNEST(string_split(text, ' ')) AS tok FROM documents),
      |freq AS (SELECT lang, tok, COUNT(*) AS c FROM tf GROUP BY 1, 2),
      |ls AS (
      |  SELECT lang, SUM(c) AS n_tokens, COUNT(*) AS n_distinct,
      |    SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS n_hapax
      |  FROM freq GROUP BY lang),
      |d AS (SELECT lang, COUNT(*) AS n_docs FROM documents GROUP BY lang)
      |SELECT d.lang, d.n_docs, CAST(ls.n_tokens AS BIGINT) AS n_tokens,
      |  ls.n_distinct, CAST(ls.n_hapax AS BIGINT) AS n_hapax
      |FROM d JOIN ls ON d.lang = ls.lang""".stripMargin) { (s, dir) =>
    val docs = Tables.load(s, dir, "documents")
    val freq = docs
      .select(col("lang"), explode(split(col("text"), " ")).as("tok"))
      .groupBy(col("lang"), col("tok"))
      .agg(count(lit(1)).as("c"))
    val ls = freq.groupBy(col("lang"))
      .agg(sum(col("c")).cast("long").as("n_tokens"),
        count(lit(1)).as("n_distinct"),
        sum(when(col("c") === 1, 1L).otherwise(0L)).cast("long").as("n_hapax"))
    docs.groupBy(col("lang")).agg(count(lit(1)).as("n_docs"))
      .join(ls, "lang")
  }

  /** Top-3 TF-IDF-proxy terms per document: rarity-weighted term
    * frequency `tf · N / df` (integer-safe: multiply/divide only, no
    * transcendental log whose libm rounding could split the engines).
    * Scale shape: (doc, token) and (token) hash aggregations, a
    * broadcast of the 1-row corpus-size scalar, an UNHINTED join of the
    * vocabulary-sized df table (planner-chosen: broadcast while it
    * fits, token-keyed shuffle join past broadcast limits), then a
    * per-doc top-k window — Spark keeps k rows per partition before
    * the shuffle (WindowGroupLimit).
    */
  val extTfidfTop: Q = Q(
    "ext_tfidf_top",
    """WITH tf AS (
      |  SELECT doc_id, tok, COUNT(*) AS tf FROM (
      |    SELECT doc_id, UNNEST(string_split(text, ' ')) AS tok
      |    FROM documents)
      |  GROUP BY 1, 2),
      |df AS (SELECT tok, COUNT(*) AS df FROM tf GROUP BY tok),
      |n AS (SELECT COUNT(*) AS n_docs FROM documents),
      |scored AS (
      |  SELECT tf.doc_id, tf.tok,
      |    CAST(FLOOR(tf.tf * 1000.0 * n.n_docs / df.df + 0.5) AS BIGINT)
      |      AS score_milli
      |  FROM tf JOIN df ON tf.tok = df.tok CROSS JOIN n),
      |ranked AS (
      |  SELECT doc_id, tok, score_milli, ROW_NUMBER() OVER (
      |    PARTITION BY doc_id ORDER BY score_milli DESC, tok) AS rn
      |  FROM scored)
      |SELECT doc_id, tok, score_milli, rn FROM ranked WHERE rn <= 3""".stripMargin) { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    // fingerprint-first (exact): tf is a function of the text alone and
    // df/n are sums of text multiplicities, so scoring and ranking run
    // once per DISTINCT text and doc_ids join back on the fingerprint —
    // duplicated corpora tokenize, score, and rank each text once
    val raw = Tables.load(s, dir, "documents")
    val ids = raw.select(col("doc_id"), xxhash64(col("text")).as("fp"))
    val canon = raw
      .groupBy(xxhash64(col("text")).as("fp"))
      .agg(count(lit(1)).as("m"), min(col("text")).as("text"))
    val tf = canon
      .select(col("fp"), col("m"), explode(split(col("text"), " ")).as("tok"))
      .groupBy(col("fp"), col("m"), col("tok"))
      .agg(count(lit(1)).as("tf"))
      // tf feeds both the df aggregation and the scoring join: without
      // this the tokenize+aggregate subtree runs twice (lazy checkpoint,
      // blocks reclaimed with the result frame — measured faster than
      // recompute at 1x and 30x)
      .localCheckpoint(false)
    val dfTbl = tf.groupBy(col("tok")).agg(sum(col("m")).as("df"))
    val n = raw.agg(count(lit(1)).as("n_docs"))
    val w = Window.partitionBy(col("fp"))
      .orderBy(col("score_milli").desc, col("tok"))
    // df is vocabulary-sized (unbounded at web scale: typos, URLs, IDs)
    // so the join is deliberately unhinted — the planner broadcasts it
    // while it fits and AQE falls back to a token-keyed shuffle join
    // when the vocabulary outgrows broadcast limits. Only the 1-row
    // corpus-count scalar keeps a forced broadcast.
    val ranked = tf.join(dfTbl, "tok")
      .crossJoin(broadcast(n))
      // same left-to-right double arithmetic as the oracle: products
      // stay exact in double (< 2^53), one rounded division each side
      .select(col("fp"), col("tok"),
        floor(col("tf") * lit(1000.0d) * col("n_docs") / col("df") + lit(0.5d))
          .cast("long").as("score_milli"))
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= 3)
    ids.join(ranked, "fp")
      .select(col("doc_id"), col("tok"), col("score_milli"), col("rn"))
  }

  /** Top-20 word-pair co-occurrence lift: for word pairs appearing
    * together in ≥ 50 documents, `lift = P(a,b) / (P(a)·P(b))`
    * expressed in integer-safe arithmetic (`df_ab · N / (df_a · df_b)`,
    * one rounded division) — the association-mining primitive behind
    * collocation extraction and topic seeding.
    *
    * Scale design: pairs expand MAP-SIDE from each doc's sorted
    * distinct-token array (tok_a < tok_b by construction) — no doc-
    * keyed self-join, no shuffle before the pair aggregation, and
    * partial aggregation collapses the expansion to ≤ vocab²/2 groups
    * per partition. Cost is bounded by the per-doc vocabulary squared,
    * never corpus². At 100 TB the same plan gates the token arrays on
    * a broadcast top-K vocabulary first; the synthetic vocabulary is
    * already tiny, so the gate here is the df_ab ≥ 50 support floor.
    */
  val extCooccur: Q = Q(
    "ext_cooccur",
    """WITH w AS (
      |  SELECT DISTINCT doc_id, tok FROM (
      |    SELECT doc_id, UNNEST(string_split(text, ' ')) AS tok
      |    FROM documents)),
      |df AS (SELECT tok, COUNT(*) AS df FROM w GROUP BY tok),
      |n AS (SELECT COUNT(DISTINCT doc_id) AS n_docs FROM w),
      |pairs AS (
      |  SELECT a.tok AS tok_a, b.tok AS tok_b, COUNT(*) AS df_ab
      |  FROM w a JOIN w b ON a.doc_id = b.doc_id AND a.tok < b.tok
      |  GROUP BY 1, 2),
      |lift AS (
      |  SELECT p.tok_a, p.tok_b, p.df_ab,
      |    CAST(FLOOR(p.df_ab * 1000.0 * n.n_docs / (da.df * db.df) + 0.5)
      |      AS BIGINT) AS lift_mils
      |  FROM pairs p
      |  JOIN df da ON da.tok = p.tok_a
      |  JOIN df db ON db.tok = p.tok_b
      |  CROSS JOIN n
      |  WHERE p.df_ab >= 50)
      |SELECT tok_a, tok_b, df_ab, lift_mils
      |FROM lift ORDER BY lift_mils DESC, tok_a, tok_b LIMIT 20""".stripMargin) { (s, dir) =>
    // pairs generate MAP-SIDE from each doc's sorted distinct token
    // array (tok_a < tok_b by construction), so no doc-keyed self-join
    // exists at all — the only shuffles are the two tiny aggregations,
    // both collapsed to ~vocab²/2 (resp. vocab) groups by partial agg.
    // (Measured: dictionary-encoding tokens to int pair keys LOSES here
    // — broadcast materializations cost more than string keys save.)
    // Fingerprint-first: documents collapse to (distinct text,
    // multiplicity) BEFORE tokenization; df / df_ab / n_docs are sums
    // of multiplicities — exactly the per-doc counts, so the oracle is
    // untouched, and duplicated corpora pay for each text once.
    // NULL-text rows produce zero tokens in the oracle's UNNEST and so
    // drop out of its n_docs/df counts — filter identically here (the
    // fixture has none; this pins the dirty-data semantics). doc_id is
    // the table's key, so per-row distinct == per-doc distinct.
    val docs = Tables.load(s, dir, "documents")
      .groupBy(xxhash64(col("text")).as("fp"))
      .agg(count(lit(1)).as("m"), min(col("text")).as("text"))
      .select(col("m"),
        expr("array_sort(array_distinct(split(text, ' ')))").as("toks"))
      .filter(col("toks").isNotNull && size(col("toks")) > 0)
      // lazy localCheckpoint: materialized by the query's own action,
      // shared by the three consumers, and its blocks are reclaimed by
      // the ContextCleaner once the result frame drops (a bare persist
      // here leaked across a 117-query session)
      .localCheckpoint(false)
    // checkpointed (vocab-sized): dfTbl broadcasts into both the tok_a
    // and tok_b joins, and each broadcast otherwise re-ran the token
    // explode + aggregation over the corpus (r21)
    val dfTbl = docs.select(explode(col("toks")).as("tok"), col("m"))
      .groupBy(col("tok")).agg(sum(col("m")).as("df"))
      .localCheckpoint(false)
    val n = docs.agg(sum(col("m")).as("n_docs"))
    // native single-pass pair expansion (graft_token_pairs) instead of
    // nested interpreted transform lambdas — the lambda form burned
    // ~0.8 s of single-task CPU per execution (r21 stage trace);
    // identical (i < j ⇔ tok_a < tok_b) pairs over the sorted array
    graft.functions.GraftFunctions.register(s)
    docs.select(explode(expr("graft_token_pairs(toks)")).as("p"), col("m"))
      .groupBy(col("p.tok_a").as("tok_a"), col("p.tok_b").as("tok_b"))
      .agg(sum(col("m")).as("df_ab"))
      .filter(col("df_ab") >= 50L)
      // df is vocabulary-sized — unhinted like the LM scorer, so the
      // planner may fall back to a shuffle join past broadcast limits
      .join(dfTbl.select(col("tok").as("tok_a"), col("df").as("df_a")), "tok_a")
      .join(dfTbl.select(col("tok").as("tok_b"), col("df").as("df_b")), "tok_b")
      .crossJoin(broadcast(n))
      // same left-to-right double arithmetic as the oracle (products
      // exact in double below 2^53, one rounded division)
      .select(col("tok_a"), col("tok_b"), col("df_ab"),
        floor(col("df_ab") * lit(1000.0d) * col("n_docs")
          / (col("df_a") * col("df_b")) + lit(0.5d))
          .cast("long").as("lift_mils"))
      .orderBy(col("lift_mils").desc, col("tok_a"), col("tok_b"))
      .limit(20)
  }

  /** One BPE-training merge iteration: corpus-weighted counts of
    * adjacent character pairs, ranked — the statistic a byte-pair
    * tokenizer trainer recomputes every merge round.
    *
    * Scale design, three multipliers stacked:
    *  - fingerprint-first: documents collapse to (distinct text,
    *    multiplicity) BEFORE tokenization, so replicated/boilerplate
    *    docs tokenize once and weight by count — mathematically exact
    *    for every downstream sum (same trick as the near-dup pipeline);
    *  - pair extraction runs over the DISTINCT-word frequency table,
    *    not the raw token stream (Zipf: distinct words are orders of
    *    magnitude fewer than tokens);
    *  - a frequency floor (freq ≥ 2, mirrored in the oracle) prunes
    *    hapax words before the pair expansion — on web-scale text
    *    hapax legomena are roughly half the distinct vocabulary
    *    (typos, URLs, IDs) and BPE trainers conventionally threshold
    *    them; pruning halves the pair-shuffle input while the top-20
    *    merge ranks are unaffected in practice.
    *
    * NOTE the floor is part of this operator's DEFINITION, not an
    * approximation knob: engine and oracle both apply it, so the gate
    * is honest, but the emitted counts exclude hapax-word pairs — they
    * are floored merge statistics, not full-corpus pair counts. Remove
    * the HAVING floor (both sides) to get the unfloored statistic.
    */
  val extBpeMerge: Q = Q(
    "ext_bpe_merge",
    """WITH wf AS (
      |  SELECT tok, CAST(COUNT(*) AS BIGINT) AS freq FROM (
      |    SELECT UNNEST(string_split(text, ' ')) AS tok FROM documents)
      |  GROUP BY tok HAVING LENGTH(tok) >= 2 AND COUNT(*) >= 2),
      |pr AS (
      |  SELECT UNNEST([substring(tok, i, 2)
      |    for i in generate_series(1, LENGTH(tok) - 1)]) AS pair, freq
      |  FROM wf)
      |SELECT pair, CAST(SUM(freq) AS BIGINT) AS n
      |FROM pr GROUP BY pair
      |ORDER BY n DESC, pair LIMIT 20""".stripMargin) { (s, dir) =>
    // min(text), not first(text): all texts under one fingerprint are
    // identical modulo a 64-bit collision, and min keeps even that
    // pathological case deterministic
    val canon = Tables.load(s, dir, "documents")
      .select(xxhash64(col("text")).as("fp"), col("text"))
      .groupBy(col("fp"))
      .agg(count(lit(1)).as("m"), min(col("text")).as("text"))
    canon
      .select(explode(split(col("text"), " ")).as("tok"), col("m"))
      .groupBy(col("tok")).agg(sum(col("m")).as("freq"))
      .filter(length(col("tok")) >= 2 && col("freq") >= 2L)
      .select(explode(expr(
        "transform(sequence(1, length(tok) - 1), i -> substring(tok, i, 2))"))
        .as("pair"), col("freq"))
      .groupBy(col("pair")).agg(sum(col("freq")).cast("long").as("n"))
      .orderBy(col("n").desc, col("pair")).limit(20)
  }

  /** Corpus-bigram LM scoring (the KenLM-filter shape): train bigram /
    * unigram-prefix counts over the corpus, then score each document by
    * its mean bigram conditional probability. Probabilities quantize to
    * integer micros PER BIGRAM via integer division — `(c2 * 1e6) div
    * c1` — so the per-doc sum is an order-free BIGINT add, identical in
    * any engine (a float log-prob sum would be summation-order
    * dependent and libm-divergent).
    *
    * Scale design: the model (distinct bigrams of the corpus, Zipf-
    * bounded) joins unhinted — the planner broadcasts it while it fits
    * and AQE falls back to a bigram-keyed shuffle join when a corpus
    * vocabulary outgrows broadcast limits; one per-doc aggregation
    * after. The same shape serves a real KenLM scorer with the
    * probability table as the model side. Fingerprint-first: bigram
    * extraction, model counts (weighted by text multiplicity — exact),
    * and scoring all run per DISTINCT text; doc_ids join back on the
    * fingerprint at the end, so duplicated corpora tokenize and score
    * each text once.
    */
  val extLmScore: Q = Q(
    "ext_lm_score",
    """WITH t AS (
      |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
      |bg AS (
      |  SELECT doc_id,
      |    UNNEST([toks[i] || ' ' || toks[i+1]
      |      for i in generate_series(1, LEN(toks) - 1)]) AS bigram
      |  FROM t WHERE LEN(toks) >= 2),
      |c2 AS (SELECT bigram, COUNT(*) AS c2 FROM bg GROUP BY bigram),
      |c1 AS (
      |  SELECT string_split(bigram, ' ')[1] AS pfx,
      |    CAST(SUM(c2) AS BIGINT) AS c1
      |  FROM c2 GROUP BY 1),
      |scored AS (
      |  SELECT b.doc_id,
      |    (m.c2 * 1000000) // p.c1 AS p_micros
      |  FROM bg b
      |  JOIN c2 m ON m.bigram = b.bigram
      |  JOIN c1 p ON p.pfx = string_split(b.bigram, ' ')[1])
      |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
      |  CAST(SUM(p_micros) // COUNT(*) AS BIGINT) AS lm_micros
      |FROM scored GROUP BY doc_id""".stripMargin) { (s, dir) =>
    val raw = Tables.load(s, dir, "documents")
    // doc_id → text fingerprint, for the final join back
    val ids = raw.select(col("doc_id"), xxhash64(col("text")).as("fp"))
    val bg = raw
      .groupBy(xxhash64(col("text")).as("fp"))
      .agg(count(lit(1)).as("m"), min(col("text")).as("text"))
      .select(col("fp"), col("m"), split(col("text"), " ").as("toks"))
      // sequence(1, 0) is DESCENDING in Spark, not empty — guard the
      // single-token doc explicitly (the oracle filters identically)
      .filter(size(col("toks")) >= 2)
      .select(col("fp"), col("m"), explode(expr(
        "transform(sequence(1, size(toks) - 1), " +
          "i -> concat(toks[i - 1], ' ', toks[i]))")).as("bigram"))
      // lazy localCheckpoint (not persist): blocks reclaimed when the
      // result frame is dropped, instead of leaking across the session
      .localCheckpoint(false)
    // corpus occurrence counts = per-distinct-text occurrences × the
    // text's multiplicity — exactly the oracle's per-doc counts.
    // Checkpointed (vocab-sized): c2 feeds both the prefix rollup and
    // the score join, and each broadcast otherwise re-ran the full
    // bigram aggregation over bg (r21)
    val c2 = bg.groupBy(col("bigram")).agg(sum(col("m")).as("c2"))
      .localCheckpoint(false)
    val c1 = c2
      .groupBy(expr("split(bigram, ' ')[0]").as("pfx"))
      .agg(sum(col("c2")).cast("long").as("c1"))
    // deliberately unhinted: at this SF the planner broadcasts the
    // counts; a corpus-scale bigram table may exceed broadcast limits,
    // where AQE correctly falls back to a shuffle join on the bigram
    val scoredFp = bg.join(c2, "bigram")
      .join(c1, expr("split(bigram, ' ')[0]") === col("pfx"))
      .select(col("fp"),
        expr("(c2 * 1000000L) div c1").as("p_micros"))
      .groupBy(col("fp"))
      .agg(count(lit(1)).cast("long").as("n_bigrams"),
        expr("CAST(SUM(p_micros) div COUNT(1) AS BIGINT)").as("lm_micros"))
    // expand the per-text scores back to every doc (inner join drops
    // sub-2-token docs, matching the oracle's filter)
    ids.join(scoredFp, "fp")
      .select(col("doc_id"), col("n_bigrams"), col("lm_micros"))
  }

  /** Gopher-style document quality rules (Rae et al. 2021, §A1.1):
    * word-count bounds, mean-word-length bounds, symbol-to-word ratio,
    * alphabetic-word ratio, and a minimum stop-word hit count — the
    * classic pre-training heuristic filter. Every THRESHOLD compares
    * in pure integer arithmetic (mean len in [3,10] ⇔ `3n ≤ chars-n+1
    * ≤ 10n`, alpha ratio ≥ 0.8 ⇔ `5·alpha ≥ 4n`, symbol ratio ≤ 0.1 ⇔
    * `10·sym ≤ n`), so the pass flag cannot diverge on float
    * rounding; the reported mils ratios use the house FLOOR(x·1000 +
    * 0.5) quantization. Map-only: one projection over the scan, no
    * shuffle.
    */
  val extGopherRules: Q = Q(
    "ext_gopher_rules",
    """WITH t AS (
      |  SELECT doc_id, LENGTH(text) AS nc, string_split(text, ' ') AS toks
      |  FROM documents),
      |m AS (
      |  SELECT doc_id, nc, LEN(toks) AS nw,
      |    LEN(list_filter(toks, t -> regexp_matches(t, '[A-Za-z]'))) AS alpha_w,
      |    LEN(list_filter(toks, t -> instr(t, '#') > 0 OR instr(t, '...') > 0)) AS sym_w,
      |    LEN(list_filter(toks, t -> lower(t) IN
      |      ('the', 'a', 'of', 'to', 'and', 'in', 'is', 'that'))) AS stop_hits
      |  FROM t)
      |SELECT doc_id, nw AS n_words,
      |  CAST(FLOOR(((nc - nw + 1) * 1.0 / nw) * 1000 + 0.5) AS BIGINT) AS mean_word_len_mils,
      |  CAST(FLOOR((alpha_w * 1.0 / nw) * 1000 + 0.5) AS BIGINT) AS alpha_ratio_mils,
      |  CAST(FLOOR((sym_w * 1.0 / nw) * 1000 + 0.5) AS BIGINT) AS symbol_ratio_mils,
      |  stop_hits,
      |  CASE WHEN nw BETWEEN 50 AND 100000
      |        AND (nc - nw + 1) >= 3 * nw AND (nc - nw + 1) <= 10 * nw
      |        AND 5 * alpha_w >= 4 * nw
      |        AND 10 * sym_w <= nw
      |        AND stop_hits >= 2
      |    THEN 1 ELSE 0 END AS gopher_pass
      |FROM m""".stripMargin) { (s, dir) =>
    val nc = length(col("text"))
    val toks = split(col("text"), " ")
    val nw = size(toks)
    val alphaW = size(expr("filter(split(text, ' '), t -> t rlike '[A-Za-z]')"))
    val symW = size(expr(
      "filter(split(text, ' '), t -> instr(t, '#') > 0 OR instr(t, '...') > 0)"))
    val stopHits = size(expr("filter(split(text, ' '), t -> lower(t) IN " +
      "('the', 'a', 'of', 'to', 'and', 'in', 'is', 'that'))"))
    val adjChars = nc - nw + 1
    Tables.load(s, dir, "documents")
      .select(col("doc_id"), nw.cast("long").as("n_words"),
        floor(adjChars * lit(1.0d) / nw * 1000d + 0.5d).cast("long")
          .as("mean_word_len_mils"),
        floor(alphaW * lit(1.0d) / nw * 1000d + 0.5d).cast("long")
          .as("alpha_ratio_mils"),
        floor(symW * lit(1.0d) / nw * 1000d + 0.5d).cast("long")
          .as("symbol_ratio_mils"),
        stopHits.cast("long").as("stop_hits"),
        when(nw.between(50, 100000) &&
            adjChars >= nw * 3 && adjChars <= nw * 10 &&
            alphaW * 5 >= nw * 4 &&
            symW * 10 <= nw &&
            stopHits >= 2, 1).otherwise(0).as("gopher_pass"))
  }

  /** Templated-opener detection: groups of documents sharing their
    * first 8 tokens — the cheap boilerplate signal (scraped template
    * headers, license preambles) a curation pipeline cuts or
    * down-weights before any near-dup pass. One map-side polynomial
    * hash of the 8-token prefix (identical fold in the oracle) plus
    * one 8-byte-key aggregation; docs shorter than the prefix width
    * drop, like the shingle paths.
    */
  val extTemplateOpeners: Q = Q(
    "ext_template_openers",
    s"""WITH t AS (
       |  SELECT doc_id, source, string_split(text, ' ') AS toks
       |  FROM documents),
       |h AS (
       |  SELECT doc_id, source,
       |    ${graft.functions.TextHash.polyHashDuck("array_to_string(toks[1:8], ' ')")} AS opener_hash
       |  FROM t WHERE LEN(toks) >= 8)
       |SELECT opener_hash, COUNT(*) AS n_docs,
       |  CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources,
       |  MIN(doc_id) AS min_doc_id
       |FROM h GROUP BY opener_hash
       |HAVING COUNT(*) > 1""".stripMargin) { (s, dir) =>
    graft.functions.GraftFunctions.register(s)
    Tables.load(s, dir, "documents")
      .select(col("doc_id"), col("source"), split(col("text"), " ").as("toks"))
      .filter(size(col("toks")) >= 8)
      .select(col("doc_id"), col("source"),
        expr("graft_poly_hash(concat_ws(' ', slice(toks, 1, 8)))")
          .as("opener_hash"))
      .groupBy(col("opener_hash"))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("source")).as("n_sources"),
        min(col("doc_id")).as("min_doc_id"))
      .filter(col("n_docs") > 1L)
  }

  def all: Seq[Q] = Seq(
    extTokenCount, extLangId, extQualityScore, extFingerprint, extNgramTop,
    extQuantiles, extRepetition, extTokenBpe, extQualityFunnel,
    extVocabStats, extTfidfTop, extCooccur, extBpeMerge, extLmScore,
    extGopherRules, extTemplateOpeners)
}
