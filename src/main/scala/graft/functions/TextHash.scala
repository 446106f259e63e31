package graft.functions

/** Deterministic text-hashing primitives shared by the dedup operators
  * (MinHash / SimHash / fingerprinting) AND their DuckDB oracles.
  *
  * Both engines evaluate the exact same integer arithmetic: a polynomial
  * left-fold over characters for token hashes (mod P), then affine
  * permutations `(a*x + b) mod P` for MinHash. All intermediates stay
  * under 2^63 (a,x < P ≈ 2^30 ⇒ a*x < 2^60), so int64 semantics are
  * identical everywhere. Constants are generated here and injected into
  * both dialects, so the oracle can never drift from the implementation.
  */
object TextHash {
  val P: Long = 1000000007L
  /** Number of MinHash permutations and LSH banding layout (4 bands × 4 rows). */
  val K: Int = 16
  val Bands: Int = 4
  val RowsPerBand: Int = K / Bands

  def a(i: Int): Long = ((i.toLong + 1L) * 2654435761L + 1000003L) % P
  def b(i: Int): Long = ((i.toLong + 1L) * 40503L + 987654321L) % P

  /** Hoisted permutation constants for the hot MinHash loop. */
  val A: Array[Long] = Array.tabulate(K)(a)
  val B: Array[Long] = Array.tabulate(K)(b)

  /** Spark SQL: array of token hashes for a text column tokenized on ' '
    * (requires [[GraftFunctions.register]]; the native expression is the
    * same fold as the DuckDB spelling below).
    */
  def tokenHashesSpark(textCol: String): String =
    s"graft_shingle_hashes(split($textCol, ' '), 1)"

  /** Spark SQL: word-trigram shingle hashes (MinHash input). Trigrams,
    * not unigrams: with a small vocabulary, unigram min-hashes collide
    * for nearly every document and LSH degenerates to all-pairs; the
    * trigram universe is |V|³ so signatures discriminate.
    */
  def shingleHashesSpark(toksCol: String, n: Int = 3): String =
    s"graft_shingle_hashes($toksCol, $n)"

  /** DuckDB: identical word-n-gram shingle hashes; docs shorter than
    * the shingle width degrade to one whole-doc shingle, matching the
    * native expression.
    */
  def shingleHashesDuck(toksCol: String, n: Int = 3): String = {
    val fold = s"list_reduce(list_prepend(CAST(0 AS BIGINT), " +
      s"[CAST(ascii(c) AS BIGINT) for c in string_split(g, '')]), " +
      s"(a, b) -> (a * 31 + b) % $P)"
    val gram = (0 until n).map(j => s"$toksCol[i+$j]").mkString(" || ' ' || ")
    s"(CASE WHEN LEN($toksCol) >= $n THEN " +
      s"[$fold for g in [$gram " +
      s"for i in generate_series(1, LEN($toksCol) - ${n - 1})]] " +
      s"ELSE [$fold for g in [array_to_string($toksCol, ' ')]] END)"
  }

  /** DuckDB: full-text polynomial fingerprint — the `graft_poly_hash`
    * (mult=31) / `graft_poly_hash2` (mult=131) fold, same arithmetic.
    */
  def polyHashDuck(textCol: String, mult: Long = 31L): String =
    s"list_reduce(list_prepend(CAST(0 AS BIGINT), " +
      s"[CAST(ascii(c) AS BIGINT) for c in string_split($textCol, '')]), " +
      s"(a, b) -> (a * $mult + b) % $P)"

  /** DuckDB: same token-hash list. */
  def tokenHashesDuck(textCol: String): String =
    s"[list_reduce(list_prepend(CAST(0 AS BIGINT), " +
      s"[CAST(ascii(c) AS BIGINT) for c in string_split(t, '')]), " +
      s"(a, b) -> (a * 31 + b) % $P) for t in string_split($textCol, ' ')]"

  /** Spark SQL: MinHash signature element i over a token-hash array expr. */
  def minhashSpark(tokhs: String, i: Int): String =
    s"array_min(transform($tokhs, th -> (${a(i)} * th + ${b(i)}) % $P))"

  /** DuckDB: MinHash signature element i. */
  def minhashDuck(tokhs: String, i: Int): String =
    s"list_min([(${a(i)} * th + ${b(i)}) % $P for th in $tokhs])"

  /** SimHash bit count — 30 bits (token hashes are < P ≈ 2^30). */
  val SimBits: Int = 30

  /** Band key for LSH: rows of band `bd` joined with '-', prefixed by the
    * band index so keys from different bands never collide.
    */
  def bandKeySpark(sigCols: Int => String, bd: Int): String = {
    val rows = (0 until RowsPerBand).map(r => sigCols(bd * RowsPerBand + r))
    s"concat_ws('-', '$bd', ${rows.mkString(", ")})"
  }

  def bandKeyDuck(sigCols: Int => String, bd: Int): String = {
    val rows = (0 until RowsPerBand)
      .map(r => s"CAST(${sigCols(bd * RowsPerBand + r)} AS VARCHAR)")
    s"'$bd' || '-' || ${rows.mkString(" || '-' || ")}"
  }
}
