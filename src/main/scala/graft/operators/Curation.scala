package graft.operators

import graft.functions.TextHash
import org.apache.spark.sql.functions._

/** Corpus-curation operators (north-star extension set): the membership
  * checks a training-data pipeline runs between ingestion and packing —
  * benchmark decontamination and incremental (batch-vs-corpus) dedup.
  *
  * Scale design: both are membership joins against a much smaller
  * reference side. Decontamination broadcasts the benchmark shingle set
  * (eval suites are MBs against a 100 TB corpus — never shuffle the
  * corpus for them); incremental dedup anti-joins 64-bit fingerprints,
  * one shuffle keyed on the fingerprint, no text movement at all.
  */
object Curation {

  /** Benchmark decontamination: flag corpus docs sharing ≥1 word-5-gram
    * shingle hash with the benchmark set (source `src0` stands in for
    * the eval suite). Output is per corpus doc with the count of
    * distinct shared shingles.
    */
  val extDecontaminate: Q = Q(
    "ext_decontaminate", {
      val hs = TextHash.shingleHashesDuck("string_split(text, ' ')", 5)
      s"""WITH sh AS (
         |  SELECT doc_id, source, list_distinct($hs) AS hs FROM documents),
         |bench AS (
         |  SELECT DISTINCT UNNEST(hs) AS gh FROM sh WHERE source = 'src0'),
         |corpus AS (
         |  SELECT doc_id, UNNEST(hs) AS gh FROM sh WHERE source <> 'src0'),
         |hits AS (
         |  SELECT c.doc_id, COUNT(DISTINCT c.gh) AS n_shared
         |  FROM corpus c JOIN bench b ON c.gh = b.gh
         |  GROUP BY c.doc_id)
         |SELECT s.doc_id,
         |  COALESCE(h.n_shared, 0) AS n_shared,
         |  CASE WHEN h.doc_id IS NULL THEN 0 ELSE 1 END AS contaminated
         |FROM sh s LEFT JOIN hits h ON s.doc_id = h.doc_id
         |WHERE s.source <> 'src0'""".stripMargin
    }) { (s, dir) =>
    graft.functions.GraftFunctions.register(s)
    val hs = expr(s"array_distinct(${TextHash.shingleHashesSpark("split(text, ' ')", 5)})")
    // lazily checkpointed: the shingle pass feeds the broadcast bench
    // set, the corpus explode, and the final map — one hash pass over
    // the corpus instead of three (r21)
    val sh = Tables.load(s, dir, "documents")
      .select(col("doc_id"), col("source"), hs.as("hs"))
      .localCheckpoint(false)
    val bench = sh.filter(col("source") === "src0")
      .select(explode(col("hs")).as("gh")).distinct()
    val corpus = sh.filter(col("source") =!= "src0")
    val hits = corpus
      .select(col("doc_id"), explode(col("hs")).as("gh"))
      .join(broadcast(bench), "gh")
      .groupBy(col("doc_id"))
      .agg(countDistinct(col("gh")).as("n_shared"))
    corpus.select(col("doc_id"))
      .join(hits.withColumnRenamed("doc_id", "hit_id"),
        col("doc_id") === col("hit_id"), "left_outer")
      .select(col("doc_id"),
        coalesce(col("n_shared"), lit(0L)).as("n_shared"),
        when(col("hit_id").isNull, 0).otherwise(1).as("contaminated"))
  }

  /** Contamination scoring: the graded companion to ext_decontaminate —
    * per corpus doc, the FRACTION of its distinct word-5-gram shingles
    * that appear in the benchmark set (integer per-mille, exact integer
    * division so both engines agree bit-for-bit), not just a binary
    * flag. This is the score pipelines threshold-tune on: drop at
    * ≥80% overlap, audit 20-80%, keep <20%. Same scale shape as the
    * binary check: the benchmark shingle set broadcasts (eval suites
    * are MBs against the corpus), the corpus side explodes once and
    * aggregates on doc_id — no corpus-side shuffle beyond that one
    * count.
    */
  val extContaminationScore: Q = Q(
    "ext_contamination_score", {
      val hs = TextHash.shingleHashesDuck("string_split(text, ' ')", 5)
      s"""WITH sh AS (
         |  SELECT doc_id, source, list_distinct($hs) AS hs FROM documents),
         |bench AS (
         |  SELECT DISTINCT UNNEST(hs) AS gh FROM sh WHERE source = 'src0'),
         |corpus AS (
         |  SELECT doc_id, UNNEST(hs) AS gh FROM sh WHERE source <> 'src0'),
         |hits AS (
         |  SELECT c.doc_id, COUNT(DISTINCT c.gh) AS n_shared
         |  FROM corpus c JOIN bench b ON c.gh = b.gh
         |  GROUP BY c.doc_id)
         |SELECT s.doc_id,
         |  CAST(len(s.hs) AS BIGINT) AS n_shingles,
         |  COALESCE(h.n_shared, 0) AS n_shared,
         |  CASE WHEN len(s.hs) = 0 THEN 0
         |       ELSE (COALESCE(h.n_shared, 0) * 1000) // CAST(len(s.hs) AS BIGINT)
         |  END AS contam_mils
         |FROM sh s LEFT JOIN hits h ON s.doc_id = h.doc_id
         |WHERE s.source <> 'src0'""".stripMargin
    }) { (s, dir) =>
    graft.functions.GraftFunctions.register(s)
    val hs = expr(s"array_distinct(${TextHash.shingleHashesSpark("split(text, ' ')", 5)})")
    // lazily checkpointed: the shingle pass feeds the broadcast bench
    // set, the corpus explode, and the final map — one hash pass over
    // the corpus instead of three (r21)
    val sh = Tables.load(s, dir, "documents")
      .select(col("doc_id"), col("source"), hs.as("hs"))
      .localCheckpoint(false)
    val bench = sh.filter(col("source") === "src0")
      .select(explode(col("hs")).as("gh")).distinct()
    val corpus = sh.filter(col("source") =!= "src0")
      .select(col("doc_id"), size(col("hs")).cast("long").as("n_shingles"),
        col("hs"))
    val hits = corpus
      .select(col("doc_id"), explode(col("hs")).as("gh"))
      .join(broadcast(bench), "gh")
      .groupBy(col("doc_id"))
      .agg(countDistinct(col("gh")).as("n_shared"))
    corpus.drop("hs")
      .join(hits.withColumnRenamed("doc_id", "hit_id"),
        col("doc_id") === col("hit_id"), "left_outer")
      .select(col("doc_id"), col("n_shingles"),
        coalesce(col("n_shared"), lit(0L)).as("n_shared"),
        when(col("n_shingles") === 0, lit(0L))
          .otherwise(expr("coalesce(n_shared, 0L) * 1000 div n_shingles"))
          .as("contam_mils"))
  }

  /** Incremental dedup: an incoming batch (odd-numbered sources) is
    * anti-joined on content fingerprint against the existing corpus
    * (even-numbered sources); survivors are the genuinely new docs.
    */
  val extIncrementalDedup: Q = Q(
    "ext_incremental_dedup",
    """WITH f AS (
      |  SELECT doc_id,
      |    list_reduce(list_prepend(CAST(0 AS BIGINT),
      |      [CAST(ascii(c) AS BIGINT) for c in string_split(text, '')]),
      |      (a, b) -> (a * 31 + b) % 1000000007) AS fp,
      |    CAST(SUBSTRING(source, 4) AS BIGINT) % 2 AS src_par
      |  FROM documents)
      |SELECT doc_id, fp FROM f
      |WHERE src_par = 1
      |  AND NOT EXISTS (
      |    SELECT 1 FROM f f2 WHERE f2.src_par = 0 AND f2.fp = f.fp)""".stripMargin) { (s, dir) =>
    graft.functions.GraftFunctions.register(s)
    val f = Tables.load(s, dir, "documents")
      .select(col("doc_id"), expr("graft_poly_hash(text)").as("fp"),
        (substring(col("source"), 4, 100).cast("long") % 2).as("src_par"))
    val existing = f.filter(col("src_par") === 0)
      .select(col("fp").as("old_fp")).distinct()
    f.filter(col("src_par") === 1)
      .join(existing, col("fp") === col("old_fp"), "left_anti")
      .select(col("doc_id"), col("fp"))
  }

  /** Bloom-filter width/hash-count for [[extBloomScreen]]: 1024 bits ×
    * 3 hashes is deliberately TIGHT for the oracle corpus (~250 corpus
    * fingerprints → ~52% bit load → ~14% false-positive rate), so the
    * false-positive path is exercised by every correctness run — a
    * production deployment sizes ~10 bits/key for ~1% FPR; the
    * arithmetic is identical, only the constants change.
    */
  private val BloomBits = 1024L
  private val BloomK = 3

  /** Bloom-screen incremental dedup: the bounded-memory variant of
    * [[extIncrementalDedup]]. The exact anti-join shuffles the corpus
    * fingerprint set on every incoming batch; at 100 TB the corpus
    * side IS the cost. A Bloom mask is `bits/64` longs regardless of
    * corpus size ([[graft.functions.BloomMask]] — partial aggregation
    * ORs fixed-width partition masks), broadcasts once, and screens
    * each incoming document with three map-side bit tests; only the
    * (few) Bloom hits need the exact confirmation join. The screen
    * probes EVERY document — corpus members included — labeling each
    * with its decision AND the exact truth, so one oracle run checks
    * both Bloom laws: members must always hit (no false negatives —
    * the corpus rows, exact_dup = 1) and non-members may only
    * collide at the measured rate (the incoming rows' false_pos set).
    * The mask is deterministic (OR is order-free), so the FPR is a
    * checkable value, not a property.
    *
    * The k bit positions come from the house affine family
    * `(a_j·fp + b_j) mod P` over the full-text polynomial fingerprint,
    * mod the mask width — the same constants on both dialects, where
    * the DuckDB mirror models the mask as its set of set bits
    * (identical membership predicate, no bit ops needed).
    */
  val extBloomScreen: Q = Q(
    "ext_bloom_screen", {
      val ps = (0 until BloomK).map(j =>
        s"((${TextHash.a(j)} * fp + ${TextHash.b(j)}) % ${TextHash.P}) " +
          s"% $BloomBits").mkString("[", ", ", "]")
      s"""WITH f AS (
         |  SELECT doc_id,
         |    ${TextHash.polyHashDuck("text")} AS fp,
         |    CAST(SUBSTRING(source, 4) AS BIGINT) % 2 AS src_par
         |  FROM documents),
         |p AS (SELECT doc_id, fp, src_par, $ps AS ps FROM f),
         |cpos AS (
         |  SELECT DISTINCT UNNEST(ps) AS pos FROM p WHERE src_par = 0),
         |cfp AS (SELECT DISTINCT fp FROM p WHERE src_par = 0),
         |probe AS (SELECT doc_id, fp, UNNEST(ps) AS pos FROM p),
         |hits AS (
         |  SELECT probe.doc_id, probe.fp,
         |    CAST(SUM(CASE WHEN c.pos IS NOT NULL THEN 1 ELSE 0 END)
         |      AS BIGINT) AS nset
         |  FROM probe LEFT JOIN cpos c ON c.pos = probe.pos
         |  GROUP BY probe.doc_id, probe.fp)
         |SELECT h.doc_id,
         |  CAST(CASE WHEN h.nset = $BloomK THEN 1 ELSE 0 END AS BIGINT)
         |    AS bloom_hit,
         |  CAST(CASE WHEN cf.fp IS NOT NULL THEN 1 ELSE 0 END AS BIGINT)
         |    AS exact_dup,
         |  CAST(CASE WHEN h.nset = $BloomK AND cf.fp IS NULL
         |    THEN 1 ELSE 0 END AS BIGINT) AS false_pos
         |FROM hits h LEFT JOIN cfp cf ON cf.fp = h.fp""".stripMargin
    }) { (s, dir) =>
    graft.functions.GraftFunctions.register(s)
    val bloomAgg = udaf(new graft.functions.BloomMask(BloomBits.toInt),
      org.apache.spark.sql.Encoders.scalaLong)
    val posArr =
      graft.functions.BloomMask.positionsExpr("fp", BloomBits, BloomK)
    val f = Tables.load(s, dir, "documents")
      .select(col("doc_id"), expr("graft_poly_hash(text)").as("fp"),
        (substring(col("source"), 4, 100).cast("long") % 2).as("src_par"))
      .withColumn("ps", expr(posArr))
    val corpus = f.filter(col("src_par") === 0)
    val mask = corpus.select(explode(col("ps")).as("pos"))
      .agg(bloomAgg(col("pos")).as("bw"))
    // the exact side exists to MEASURE the screen (exact_dup /
    // false_pos); a production pipeline only confirms the bloom hits.
    // Deliberately unhinted: the planner broadcasts the fingerprint
    // set at this SF; a corpus-scale set correctly falls back to a
    // fingerprint-keyed shuffle join under AQE.
    val corpusFps = corpus.select(col("fp").as("cfp")).distinct()
    val bitTest = (0 until BloomK).map(j =>
      s"((shiftright(element_at(bw.words, CAST(ps[$j] div 64 AS INT) + 1), " +
        s"CAST(ps[$j] % 64 AS INT)) & 1L) = 1L)").mkString(" AND ")
    f.crossJoin(broadcast(mask))
      .join(corpusFps, col("fp") === col("cfp"), "left")
      .select(col("doc_id"),
        expr(s"CAST(CASE WHEN $bitTest THEN 1 ELSE 0 END AS BIGINT)")
          .as("bloom_hit"),
        expr("CAST(CASE WHEN cfp IS NOT NULL THEN 1 ELSE 0 END AS BIGINT)")
          .as("exact_dup"),
        expr(s"CAST(CASE WHEN ($bitTest) AND cfp IS NULL THEN 1 ELSE 0 END " +
          "AS BIGINT)").as("false_pos"))
  }

  /** Sequence packing: concatenate docs (per source, in doc_id order)
    * into fixed 512-token training sequences; each doc reports the
    * sequence it starts in and its token offset there. One running sum
    * per source stratum — the window runs over a single shuffle, and at
    * corpus scale packing runs within partition-local chunks instead of
    * one global order (the seq ids just gain a chunk prefix).
    */
  val extPackSequences: Q = Q(
    "ext_pack_sequences",
    """WITH t AS (
      |  SELECT doc_id, source,
      |    LEN(string_split(text, ' ')) AS n_tok
      |  FROM documents),
      |c AS (
      |  SELECT doc_id, source, n_tok,
      |    CAST(SUM(n_tok) OVER (PARTITION BY source ORDER BY doc_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) - n_tok AS start_tok
      |  FROM t)
      |SELECT doc_id, source, n_tok,
      |  start_tok // 512 AS seq_id,
      |  start_tok % 512 AS seq_offset
      |FROM c""".stripMargin) { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("source")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.load(s, dir, "documents")
      .select(col("doc_id"), col("source"),
        size(split(col("text"), " ")).cast("long").as("n_tok"))
      .withColumn("start_tok", sum(col("n_tok")).over(w) - col("n_tok"))
      .select(col("doc_id"), col("source"), col("n_tok"),
        expr("start_tok div 512").as("seq_id"),
        (col("start_tok") % 512).as("seq_offset"))
  }

  /** End-to-end curation pipeline as ONE composed query — the shape a
    * real training-data run chains: quality gate (length + token
    * floor) → exact dedup (fingerprint canonicalization, text never a
    * key) → reproducible 50% content-hash sample → per-source volume
    * accounting. Every stage is a narrow projection/aggregation; the
    * only shuffles are the dedup groupBy on the 2×30-bit fingerprint
    * and the final per-source rollup, so the composition inherits each
    * stage's scale shape instead of adding new ones.
    */
  val extCurationPipeline: Q = Q(
    "ext_curation_pipeline", {
      val fp = TextHash.polyHashDuck("text")
      val fp2 = TextHash.polyHashDuck("text", 131L)
      s"""WITH q AS (
         |  SELECT doc_id, source, LEN(string_split(text, ' ')) AS toks,
         |    $fp AS fp, $fp2 AS fp2
         |  FROM documents
         |  WHERE n_chars >= 150 AND LEN(string_split(text, ' ')) >= 25),
         |canon AS (
         |  SELECT fp, arg_min(source, doc_id) AS source,
         |    arg_min(toks, doc_id) AS toks
         |  FROM q GROUP BY fp, fp2)
         |SELECT source, COUNT(*) AS n_docs,
         |  CAST(SUM(toks) AS BIGINT) AS n_tokens
         |FROM canon WHERE fp % 100 < 50 GROUP BY source""".stripMargin
    }) { (s, dir) =>
    graft.functions.GraftFunctions.register(s)
    Tables.load(s, dir, "documents")
      .filter(col("n_chars") >= 150)
      .select(col("doc_id"), col("source"),
        size(split(col("text"), " ")).cast("long").as("toks"),
        expr("graft_poly_hash(text)").as("fp"),
        expr("graft_poly_hash2(text)").as("fp2"))
      .filter(col("toks") >= 25)
      // one-shuffle canonicalization (Dedup.canonicalDocs pattern):
      // carry the representative's payload with min_by, no join back
      .groupBy(col("fp"), col("fp2"))
      .agg(min_by(col("source"), col("doc_id")).as("source"),
        min_by(col("toks"), col("doc_id")).as("toks"))
      .filter(col("fp") % 100 < 50)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("toks")).cast("long").as("n_tokens"))
  }

  /** Per-source duplication accounting: how much of each source is an
    * exact copy of an earlier document (by doc_id order) — the health
    * dashboard a curation pipeline keys crawl-priority and source-mix
    * decisions on.
    *
    * Scale design: the "earlier copy exists" test runs on the 2×30-bit
    * content fingerprint (the [[graft.operators.Dedup.canonicalDocs]]
    * discipline — text is never a shuffle key), one window over the
    * fingerprint partition, then a per-source rollup. Two shuffles on
    * narrow keys.
    */
  val extDupAccounting: Q = Q(
    "ext_dup_accounting", {
      val fp = TextHash.polyHashDuck("text")
      val fp2 = TextHash.polyHashDuck("text", 131L)
      s"""WITH f AS (
         |  SELECT doc_id, source, $fp AS fp, $fp2 AS fp2 FROM documents),
         |d AS (
         |  SELECT source,
         |    CASE WHEN doc_id > MIN(doc_id) OVER (PARTITION BY fp, fp2)
         |      THEN 1 ELSE 0 END AS is_dup
         |  FROM f)
         |SELECT source, COUNT(*) AS n_docs,
         |  CAST(SUM(is_dup) AS BIGINT) AS n_dupes,
         |  CAST(FLOOR(SUM(is_dup) * 1000.0 / COUNT(*) + 0.5) AS BIGINT)
         |    AS dup_mils
         |FROM d GROUP BY source""".stripMargin
    }) { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    graft.functions.GraftFunctions.register(s)
    val w = Window.partitionBy(col("fp"), col("fp2"))
    Tables.load(s, dir, "documents")
      .select(col("doc_id"), col("source"),
        expr("graft_poly_hash(text)").as("fp"),
        expr("graft_poly_hash2(text)").as("fp2"))
      .withColumn("is_dup",
        when(col("doc_id") > min(col("doc_id")).over(w), 1L).otherwise(0L))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("is_dup")).cast("long").as("n_dupes"),
        floor(sum(col("is_dup")) * 1000.0d / count(lit(1)) + 0.5d)
          .cast("long").as("dup_mils"))
  }

  /** PII scan + redaction: e-mail / US-phone / IPv4 match counts and a
    * digest of the globally-redacted text, per document. The synthetic
    * corpus carries no natural PII, so the query first plants
    * deterministic doc_id-derived tokens (every 3rd doc an e-mail, every
    * 5th a phone, every 7th an IP); the oracle mirrors the identical
    * construction, so the regex scan, the global replace, and the digest
    * are all value-checked end to end.
    *
    * Scale design: pure map-side work — three regex passes per row
    * inside one projection, no shuffle, no UDF; at corpus scale this
    * pipelines with the parquet scan and the redacted text never leaves
    * the executor (only counts and a 128-bit digest come back).
    */
  val extPiiRedact: Q = Q(
    "ext_pii_redact", {
      val email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
      val phone = "\\b\\d{3}-\\d{3}-\\d{4}\\b"
      val ip = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
      s"""WITH t AS (
         |  SELECT doc_id,
         |    text ||
         |    CASE WHEN doc_id % 3 = 0 THEN ' contact user' ||
         |      CAST(doc_id AS VARCHAR) || '@mail.example.com now'
         |      ELSE '' END ||
         |    CASE WHEN doc_id % 5 = 0 THEN ' call 415-555-' ||
         |      lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
         |      ELSE '' END ||
         |    CASE WHEN doc_id % 7 = 0 THEN ' from 10.' ||
         |      CAST(doc_id % 256 AS VARCHAR) || '.' ||
         |      CAST((doc_id * 7) % 256 AS VARCHAR) || '.' ||
         |      CAST((doc_id * 13) % 256 AS VARCHAR)
         |      ELSE '' END AS t
         |  FROM documents)
         |SELECT doc_id,
         |  CAST(len(regexp_extract_all(t, '$email')) AS BIGINT) AS n_emails,
         |  CAST(len(regexp_extract_all(t, '$phone')) AS BIGINT) AS n_phones,
         |  CAST(len(regexp_extract_all(t, '$ip')) AS BIGINT) AS n_ips,
         |  md5(regexp_replace(regexp_replace(regexp_replace(t,
         |    '$email', '<EMAIL>', 'g'),
         |    '$phone', '<PHONE>', 'g'),
         |    '$ip', '<IP>', 'g')) AS red_md5
         |FROM t""".stripMargin
    }) { (s, dir) =>
    val email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
    val phone = "\\b\\d{3}-\\d{3}-\\d{4}\\b"
    val ip = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
    val t = concat(
      col("text"),
      when(col("doc_id") % 3 === 0,
        concat(lit(" contact user"), col("doc_id").cast("string"),
          lit("@mail.example.com now"))).otherwise(lit("")),
      when(col("doc_id") % 5 === 0,
        concat(lit(" call 415-555-"),
          lpad((col("doc_id") % 10000).cast("string"), 4, "0")))
        .otherwise(lit("")),
      when(col("doc_id") % 7 === 0,
        concat(lit(" from 10."), (col("doc_id") % 256).cast("string"),
          lit("."), ((col("doc_id") * 7) % 256).cast("string"),
          lit("."), ((col("doc_id") * 13) % 256).cast("string")))
        .otherwise(lit("")))
    Tables.load(s, dir, "documents")
      .select(col("doc_id"), t.as("t"))
      .select(col("doc_id"),
        size(regexp_extract_all(col("t"), lit(email), lit(0)))
          .cast("long").as("n_emails"),
        size(regexp_extract_all(col("t"), lit(phone), lit(0)))
          .cast("long").as("n_phones"),
        size(regexp_extract_all(col("t"), lit(ip), lit(0)))
          .cast("long").as("n_ips"),
        md5(regexp_replace(regexp_replace(regexp_replace(col("t"),
          lit(email), lit("<EMAIL>")),
          lit(phone), lit("<PHONE>")),
          lit(ip), lit("<IP>")).cast("binary")).as("red_md5"))
  }

  /** Overlapping-window document chunking (the RAG / embedding-prep
    * shape): 64-token chunks on a 48-token stride, each with its token
    * extent and a content fingerprint of the re-joined chunk text (the
    * key a downstream embedding store dedups and joins on).
    *
    * Scale design: pure map-side fan-out — one `sequence` explode per
    * doc, array slicing, one codegen'd hash per chunk; no shuffle, so
    * at corpus scale chunking pipelines with the scan exactly like the
    * PII pass.
    */
  val extChunkDocs: Q = Q(
    "ext_chunk_docs", {
      val fp = TextHash.polyHashDuck(
        "array_to_string(toks[(start_tok + 1):(start_tok + 64)], ' ')")
      s"""WITH t AS (
         |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
         |c AS (
         |  SELECT doc_id, toks, UNNEST(generate_series(0, LEN(toks) - 1, 48))
         |    AS start_tok
         |  FROM t)
         |SELECT doc_id,
         |  start_tok // 48 AS chunk_idx,
         |  CAST(start_tok AS BIGINT) AS start_tok,
         |  CAST(LEN(toks[(start_tok + 1):(start_tok + 64)]) AS BIGINT) AS n_tok,
         |  $fp AS chunk_fp
         |FROM c""".stripMargin
    }) { (s, dir) =>
    graft.functions.GraftFunctions.register(s)
    Tables.load(s, dir, "documents")
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .select(col("doc_id"), col("toks"),
        explode(expr("sequence(0, size(toks) - 1, 48)")).as("start_tok"))
      .select(col("doc_id"),
        expr("CAST(start_tok div 48 AS BIGINT)").as("chunk_idx"),
        col("start_tok").cast("long").as("start_tok"),
        expr("CAST(size(slice(toks, start_tok + 1, 64)) AS BIGINT)").as("n_tok"),
        expr("graft_poly_hash(array_join(slice(toks, start_tok + 1, 64), ' '))")
          .as("chunk_fp"))
  }

  def all: Seq[Q] = Seq(
    extDecontaminate, extContaminationScore, extIncrementalDedup,
    extBloomScreen, extPackSequences, extCurationPipeline, extDupAccounting,
    extPiiRedact, extChunkDocs)
}
