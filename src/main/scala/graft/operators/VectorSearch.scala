package graft.operators

import org.apache.spark.sql.functions._

/** Vector similarity search over the `embeddings` table (north-star
  * extension set): brute-force cosine top-k as the exactness baseline,
  * and a random-hyperplane LSH-bucketed variant as the scale path.
  *
  * Determinism: dot products are sequential left-folds over the 64
  * float dims, cast to double element-wise — bit-identical in Spark
  * (`aggregate`/`zip_with`) and DuckDB (`list_reduce` over a
  * comprehension); sqrt and division are IEEE correctly-rounded; the
  * final cosine is quantized to millionths before ranking so ordering
  * ties break identically.
  *
  * Scale design: brute-force is O(Q·N) with the Q query vectors
  * broadcast — no shuffle of the big side, linear scan, fine when Q is
  * small. The LSH variant buckets both sides on an 8-bit hyperplane
  * signature first, so the per-query candidate set shrinks ~256× and the
  * join is an equi-join on bucket id — the shape that survives 100 TB.
  */
object VectorSearch {
  private val Dim = 64

  /** Spark SQL: sequential-fold dot product of two array<double> exprs. */
  private def dotSpark(a: String, b: String): String =
    s"aggregate(zip_with($a, $b, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), " +
      s"CAST(0 AS DOUBLE), (acc, v) -> acc + v)"

  /** DuckDB: the same sequential fold (list_sum's order is unspecified,
    * so fold explicitly).
    */
  private def dotDuck(a: String, b: String): String =
    s"list_reduce(list_prepend(CAST(0 AS DOUBLE), " +
      s"[CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE) for i in generate_series(1, $Dim)]), " +
      s"(acc, v) -> acc + v)"

  /** Per-vector L2 norm (quantized) + per-label norm statistics. */
  val extEmbeddingStats: Q = Q(
    "ext_embedding_stats",
    s"""WITH n AS (
       |  SELECT label, SQRT(${dotDuck("embedding", "embedding")}) AS nrm
       |  FROM embeddings)
       |SELECT label, COUNT(*) AS n_vecs,
       |  SUM(CAST(FLOOR((nrm) * 100 + 0.5) AS BIGINT)) / 100.0 / COUNT(*) AS mean_norm,
       |  CAST(FLOOR((MIN(nrm)) * 1000000 + 0.5) AS BIGINT) AS min_norm_micros,
       |  CAST(FLOOR((MAX(nrm)) * 1000000 + 0.5) AS BIGINT) AS max_norm_micros
       |FROM n GROUP BY label""".stripMargin) { (s, dir) =>
    Tables.load(s, dir, "embeddings")
      .select(col("label"),
        sqrt(expr(dotSpark("embedding", "embedding"))).as("nrm"))
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n_vecs"),
        Det.davg(col("nrm")).as("mean_norm"),
        floor(min(col("nrm")) * 1e6d + 0.5d).cast("long").as("min_norm_micros"),
        floor(max(col("nrm")) * 1e6d + 0.5d).cast("long").as("max_norm_micros"))
  }

  /** Brute-force cosine top-5 per query vector (query set: vec_id < 8),
    * self-match excluded. Exactness baseline for ANN.
    */
  val extAnnBrute: Q = Q(
    "ext_ann_brute",
    s"""WITH q AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings WHERE vec_id < 8),
       |scored AS (
       |  SELECT q.qid, e.vec_id,
       |    CAST(FLOOR((${dotDuck("q.qv", "e.embedding")}
       |      / (SQRT(${dotDuck("q.qv", "q.qv")}) * SQRT(${dotDuck("e.embedding", "e.embedding")}))) * 1000000 + 0.5) AS BIGINT) AS cos_micros
       |  FROM q, embeddings e WHERE e.vec_id <> q.qid),
       |ranked AS (
       |  SELECT qid, vec_id, cos_micros,
       |    ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos_micros DESC, vec_id) AS rn
       |  FROM scored)
       |SELECT qid, vec_id, cos_micros, rn FROM ranked WHERE rn <= 5""".stripMargin) { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    val emb = Tables.load(s, dir, "embeddings")
    val q = emb.filter(col("vec_id") < 8)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val cos = expr(dotSpark("qv", "embedding")) /
      (sqrt(expr(dotSpark("qv", "qv"))) * sqrt(expr(dotSpark("embedding", "embedding"))))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("cos_micros").desc, col("vec_id"))
    broadcast(q).join(emb, col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"),
        floor(cos * 1e6d + 0.5d).cast("long").as("cos_micros"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 5)
  }

  /** Deterministic pseudo-random hyperplane component (j-th plane, i-th
    * dim), integer in [-9, 9] — embedded identically in both dialects.
    */
  private def w(j: Int, i: Int): Int = ((j * 131 + i * 31 + 7) % 19) - 9

  private val Planes = 8

  private def planeSparkArray(j: Int): String =
    (0 until Dim).map(i => s"CAST(${w(j, i)} AS DOUBLE)").mkString("array(", ", ", ")")

  private def planeDuckList(j: Int): String =
    (0 until Dim).map(i => s"CAST(${w(j, i)} AS DOUBLE)").mkString("[", ", ", "]")

  private def bucketSpark(v: String): String =
    (0 until Planes).map { j =>
      s"(CASE WHEN ${dotSpark(v, planeSparkArray(j))} > 0 THEN ${1 << j} ELSE 0 END)"
    }.mkString(" + ")

  private def bucketDuck(v: String): String =
    (0 until Planes).map { j =>
      val dot = s"list_reduce(list_prepend(CAST(0 AS DOUBLE), " +
        s"[CAST($v[i] AS DOUBLE) * ${planeDuckList(j)}[i] for i in generate_series(1, $Dim)]), " +
        s"(acc, vv) -> acc + vv)"
      s"(CASE WHEN $dot > 0 THEN ${1 << j} ELSE 0 END)"
    }.mkString(" + ")

  /** LSH-bucketed ANN: sign-random-projection into 8-bit buckets, then
    * cosine top-3 within the query's bucket only (equi-join on bucket).
    */
  val extAnnLsh: Q = Q(
    "ext_ann_lsh",
    s"""WITH b AS (
       |  SELECT vec_id, embedding, ${bucketDuck("embedding")} AS bucket
       |  FROM embeddings),
       |q AS (SELECT vec_id AS qid, embedding AS qv, bucket FROM b WHERE vec_id < 32),
       |scored AS (
       |  SELECT q.qid, e.vec_id,
       |    CAST(FLOOR((${dotDuck("q.qv", "e.embedding")}
       |      / (SQRT(${dotDuck("q.qv", "q.qv")}) * SQRT(${dotDuck("e.embedding", "e.embedding")}))) * 1000000 + 0.5) AS BIGINT) AS cos_micros
       |  FROM q JOIN b e ON q.bucket = e.bucket AND e.vec_id <> q.qid),
       |ranked AS (
       |  SELECT qid, vec_id, cos_micros,
       |    ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos_micros DESC, vec_id) AS rn
       |  FROM scored)
       |SELECT qid, vec_id, cos_micros, rn FROM ranked WHERE rn <= 3""".stripMargin) { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    val b = Tables.load(s, dir, "embeddings")
      .withColumn("bucket", expr(bucketSpark("embedding")))
    val q = b.filter(col("vec_id") < 32)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"), col("bucket"))
    val cos = expr(dotSpark("qv", "embedding")) /
      (sqrt(expr(dotSpark("qv", "qv"))) * sqrt(expr(dotSpark("embedding", "embedding"))))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("cos_micros").desc, col("vec_id"))
    broadcast(q).join(b,
        q("bucket") === b("bucket") && col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"),
        floor(cos * 1e6d + 0.5d).cast("long").as("cos_micros"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
  }

  def all: Seq[Q] = Seq(extEmbeddingStats, extAnnBrute, extAnnLsh)
}
