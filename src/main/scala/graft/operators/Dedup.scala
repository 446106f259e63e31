package graft.operators

import graft.functions.TextHash
import graft.functions.TextHash._
import org.apache.spark.sql.functions._

/** Deduplication operators over `documents` (north-star extension set):
  * exact, n-gram Jaccard, MinHash+LSH, SimHash.
  *
  * Scale design (the 100 TB story):
  *  - exact dedup = one hash aggregation on the full text (or its
  *    fingerprint) — single shuffle;
  *  - Jaccard near-dup avoids the O(n²) cross join with a posting-list
  *    self-join: explode distinct bigrams, join docs that SHARE a bigram
  *    (inverted index), then verify. Shuffle is bounded by posting-list
  *    sizes, and the join key includes `lang` as a blocking key;
  *  - MinHash+LSH replaces the full signature compare with a band-bucket
  *    join: docs collide only if one of 4 bands matches exactly, so the
  *    candidate set is tiny and the exact-verify join stays narrow;
  *  - SimHash packs a doc into 30 bits; near-dup candidates come from
  *    10-bit chunk equality (pigeonhole: hamming ≤ 2 ⇒ some chunk equal).
  */
object Dedup {

  /** Exact dedup: one row per distinct text with canonical id + copies. */
  val extDedupExact: Q = Q(
    "ext_dedup_exact",
    """SELECT MIN(doc_id) AS canonical_id, COUNT(*) AS n_copies,
      |  MIN(n_chars) AS n_chars
      |FROM documents GROUP BY text""".stripMargin) { (s, dir) =>
    Tables.load(s, dir, "documents")
      .groupBy(col("text"))
      .agg(min(col("doc_id")).as("canonical_id"),
        count(lit(1)).as("n_copies"),
        min(col("n_chars")).as("n_chars"))
      .drop("text")
  }

  /** Word-bigram Jaccard near-dup via inverted-index join (no cross
    * join): docs sharing ≥1 bigram (same lang block) are candidates;
    * exact Jaccard ≥ 0.6 confirms.
    */
  val extJaccardPairs: Q = Q(
    "ext_jaccard_pairs",
    """WITH d AS (
      |  SELECT doc_id, lang,
      |    list_distinct([toks[i] || ' ' || toks[i+1]
      |      for i in generate_series(1, LEN(toks)-1)]) AS grams
      |  FROM (SELECT doc_id, lang, string_split(text, ' ') AS toks FROM documents)),
      |post AS (SELECT doc_id, lang, LEN(grams) AS sz, UNNEST(grams) AS gram FROM d),
      |cand AS (
      |  SELECT p1.doc_id AS doc_a, p2.doc_id AS doc_b,
      |    p1.sz AS sz_a, p2.sz AS sz_b, COUNT(*) AS inter
      |  FROM post p1 JOIN post p2
      |    ON p1.gram = p2.gram AND p1.lang = p2.lang AND p1.doc_id < p2.doc_id
      |  GROUP BY 1, 2, 3, 4)
      |SELECT doc_a, doc_b,
      |  CAST(FLOOR((inter * 1.0 / (sz_a + sz_b - inter)) * 1000 + 0.5) AS BIGINT) AS jaccard_mils
      |FROM cand
      |WHERE inter * 1.0 / (sz_a + sz_b - inter) >= 0.6""".stripMargin) { (s, dir) =>
    val d = Tables.load(s, dir, "documents")
      .select(col("doc_id"), col("lang"),
        expr("array_distinct(transform(sequence(0, size(split(text, ' ')) - 2), " +
          "i -> concat(split(text, ' ')[i], ' ', split(text, ' ')[i+1])))").as("grams"))
    val post = d.select(col("doc_id"), col("lang"),
      size(col("grams")).as("sz"), explode(col("grams")).as("gram"))
    val p1 = post.select(col("doc_id").as("doc_a"), col("lang").as("lang_a"),
      col("sz").as("sz_a"), col("gram").as("gram_a"))
    val p2 = post.select(col("doc_id").as("doc_b"), col("lang").as("lang_b"),
      col("sz").as("sz_b"), col("gram").as("gram_b"))
    val jac = col("inter") * lit(1.0d) / (col("sz_a") + col("sz_b") - col("inter"))
    p1.join(p2,
        col("gram_a") === col("gram_b") && col("lang_a") === col("lang_b") &&
          col("doc_a") < col("doc_b"))
      .groupBy(col("doc_a"), col("doc_b"), col("sz_a"), col("sz_b"))
      .agg(count(lit(1)).as("inter"))
      .filter(jac >= 0.6d)
      .select(col("doc_a"), col("doc_b"),
        floor(jac * 1000d + 0.5d).cast("long").as("jaccard_mils"))
  }

  private def sigSelectSpark: String = {
    val tokhs = tokenHashesSpark("text")
    (0 until K).map(i => s"${minhashSpark("tokhs", i)} AS sig_$i")
      .mkString(s"SELECT doc_id, lang, tokhs, ", ", ",
        s" FROM (SELECT doc_id, lang, $tokhs AS tokhs FROM documents)")
  }

  private def sigSelectDuck: String = {
    val tokhs = tokenHashesDuck("text")
    (0 until K).map(i => s"${minhashDuck("tokhs", i)} AS sig_$i")
      .mkString(s"SELECT doc_id, lang, tokhs, ", ", ",
        s" FROM (SELECT doc_id, lang, $tokhs AS tokhs FROM documents)")
  }

  /** MinHash signatures (16 permutations over word-token hashes). */
  val extMinhashSig: Q = Q(
    "ext_minhash_sig",
    s"""WITH s AS ($sigSelectDuck)
       |SELECT doc_id, ${(0 until K).map(i => s"sig_$i").mkString(", ")}
       |FROM s""".stripMargin) { (s, dir) =>
    Tables.registerAll(s, dir)
    s.sql(s"""WITH s AS ($sigSelectSpark)
             |SELECT doc_id, ${(0 until K).map(i => s"sig_$i").mkString(", ")}
             |FROM s""".stripMargin)
  }

  /** MinHash+LSH near-dup pairs: 4-band bucket join proposes candidates;
    * exact signature agreement (≥ 8 of 16 minhashes, i.e. estimated
    * Jaccard ≥ 0.5) confirms.
    */
  val extMinhashPairs: Q = Q(
    "ext_minhash_pairs", {
      val bandRows = (0 until Bands).map(bd =>
        s"SELECT doc_id, ${(0 until K).map(i => s"sig_$i").mkString(", ")}, " +
          s"${bandKeyDuck(i => s"sig_$i", bd)} AS band_key FROM s").mkString(" UNION ALL ")
      val agree = (0 until K)
        .map(i => s"(CASE WHEN a.sig_$i = b.sig_$i THEN 1 ELSE 0 END)")
        .mkString(" + ")
      s"""WITH s AS ($sigSelectDuck),
         |banded AS ($bandRows),
         |cand AS (
         |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b, $agree AS n_agree
         |  FROM banded a JOIN banded b
         |    ON a.band_key = b.band_key AND a.doc_id < b.doc_id)
         |SELECT doc_a, doc_b, n_agree FROM cand WHERE n_agree >= 8""".stripMargin
    }) { (s, dir) =>
    Tables.registerAll(s, dir)
    val bandRows = (0 until Bands).map(bd =>
      s"SELECT doc_id, ${(0 until K).map(i => s"sig_$i").mkString(", ")}, " +
        s"${bandKeySpark(i => s"sig_$i", bd)} AS band_key FROM s").mkString(" UNION ALL ")
    val agree = (0 until K)
      .map(i => s"(CASE WHEN a.sig_$i = b.sig_$i THEN 1 ELSE 0 END)")
      .mkString(" + ")
    s.sql(
      s"""WITH s AS ($sigSelectSpark),
         |banded AS ($bandRows),
         |cand AS (
         |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b, $agree AS n_agree
         |  FROM banded a JOIN banded b
         |    ON a.band_key = b.band_key AND a.doc_id < b.doc_id)
         |SELECT doc_a, doc_b, n_agree FROM cand WHERE n_agree >= 8""".stripMargin)
  }

  /** SimHash: 30-bit signature from per-token hash bit votes (token
    * frequency weighted). Emitted per doc with its 3×10-bit chunks for
    * banding.
    */
  val extSimhash: Q = Q(
    "ext_simhash", {
      val bits = (0 until SimBits).map(j =>
        s"(CASE WHEN SUM(2 * ((th >> $j) & 1) - 1) > 0 THEN ${1L << j} ELSE 0 END)")
        .mkString(" + ")
      s"""WITH t AS (
         |  SELECT doc_id, UNNEST(${tokenHashesDuck("text")}) AS th FROM documents)
         |SELECT doc_id, $bits AS simhash
         |FROM t GROUP BY doc_id""".stripMargin
    }) { (s, dir) =>
    Tables.registerAll(s, dir)
    val bits = (0 until SimBits).map(j =>
      s"(CASE WHEN SUM(2 * ((th >> $j) & 1) - 1) > 0 THEN ${1L << j}L ELSE 0L END)")
      .mkString(" + ")
    s.sql(
      s"""SELECT doc_id, $bits AS simhash
         |FROM (SELECT doc_id, explode(${tokenHashesSpark("text")}) AS th FROM documents)
         |GROUP BY doc_id""".stripMargin)
  }

  def all: Seq[Q] = Seq(
    extDedupExact, extJaccardPairs, extMinhashSig, extMinhashPairs, extSimhash)
}
