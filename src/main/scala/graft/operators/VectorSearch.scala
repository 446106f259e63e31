package graft.operators

import org.apache.spark.sql.functions._

/** Vector similarity search over the `embeddings` table (north-star
  * extension set): brute-force cosine top-k as the exactness baseline,
  * and a random-hyperplane LSH-bucketed variant as the scale path.
  *
  * Determinism: vectors are L2-normalized once (sequential-fold norm,
  * element-wise divide), after which cosine = a single sequential-fold
  * dot product — the exact same IEEE operation order in Spark
  * (`aggregate`/`zip_with`) and DuckDB (`list_reduce` over a
  * comprehension). Scores are quantized to millionths before ranking so
  * ordering ties break identically.
  *
  * Scale design: normalization is a one-pass projection (computed once
  * per vector, not per pair). Brute-force is O(Q·N) with the Q query
  * vectors broadcast — no shuffle of the big side. The LSH variant
  * buckets both sides on an 8-bit hyperplane signature, shrinking the
  * candidate set ~256× and turning the pair search into an equi-join on
  * bucket id — the shape that survives 100 TB.
  */
object VectorSearch {
  private val Dim = 64

  /** Spark SQL: native sequential-order dot product
    * ([[graft.functions.DotProduct]] — IEEE-identical to the oracle's
    * explicit fold, but one codegen'd loop instead of per-element
    * lambda dispatch).
    */
  private def dotSpark(a: String, b: String): String =
    s"graft_dot($a, $b)"

  /** DuckDB: the same sequential fold (list_sum's order is unspecified,
    * so fold explicitly).
    */
  private def dotDuck(a: String, b: String): String =
    s"list_reduce(list_prepend(CAST(0 AS DOUBLE), " +
      s"[$a[i] * $b[i] for i in generate_series(1, $Dim)]), " +
      s"(acc, v) -> acc + v)"

  /** Spark: float array → L2-normalized double array, one codegen'd pass
    * ([[graft.functions.L2Normalize]] — IEEE-identical to the composed
    * cast/dot/sqrt/divide the oracle spells out, without interpreted
    * lambda dispatch per element).
    */
  private def normalizedSpark(df: org.apache.spark.sql.DataFrame) =
    df.select(col("vec_id"), expr("graft_l2_normalize(embedding)").as("nv"))

  /** DuckDB: identical two-step normalization as a CTE body. */
  private val normDuckCte: String = {
    val asD = "[CAST(x AS DOUBLE) for x in embedding]"
    s"""dv AS (SELECT vec_id, $asD AS dv FROM embeddings),
       |nrmed AS (SELECT vec_id, SQRT(${dotDuck("dv", "dv")}) AS nrm, dv FROM dv),
       |nv AS (SELECT vec_id, [x / nrm for x in dv] AS nv FROM nrmed)""".stripMargin
  }

  /** Per-vector L2 norm (quantized) + per-label norm statistics. */
  val extEmbeddingStats: Q = Q(
    "ext_embedding_stats",
    s"""WITH n AS (
       |  SELECT label, SQRT(${dotDuck("[CAST(x AS DOUBLE) for x in embedding]",
                                       "[CAST(x AS DOUBLE) for x in embedding]")}) AS nrm
       |  FROM embeddings)
       |SELECT label, COUNT(*) AS n_vecs,
       |  SUM(CAST(FLOOR((nrm) * 100 + 0.5) AS BIGINT)) / 100.0 / COUNT(*) AS mean_norm,
       |  CAST(FLOOR((MIN(nrm)) * 1000000 + 0.5) AS BIGINT) AS min_norm_micros,
       |  CAST(FLOOR((MAX(nrm)) * 1000000 + 0.5) AS BIGINT) AS max_norm_micros
       |FROM n GROUP BY label""".stripMargin) { (s, dir) =>
    graft.functions.GraftFunctions.register(s)
    val asD = "transform(embedding, x -> CAST(x AS DOUBLE))"
    Tables.load(s, dir, "embeddings")
      .select(col("label"), sqrt(expr(dotSpark(asD, asD))).as("nrm"))
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
    s"""WITH $normDuckCte,
       |q AS (SELECT vec_id AS qid, nv AS qv FROM nv WHERE vec_id < 8),
       |scored AS (
       |  SELECT q.qid, e.vec_id,
       |    CAST(FLOOR((${dotDuck("q.qv", "e.nv")}) * 1000000 + 0.5) AS BIGINT) AS cos_micros
       |  FROM q, nv e WHERE e.vec_id <> q.qid),
       |ranked AS (
       |  SELECT qid, vec_id, cos_micros,
       |    ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos_micros DESC, vec_id) AS rn
       |  FROM scored)
       |SELECT qid, vec_id, cos_micros, rn FROM ranked WHERE rn <= 5""".stripMargin) { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    graft.functions.GraftFunctions.register(s)
    val nv = normalizedSpark(Tables.load(s, dir, "embeddings"))
    val q = nv.filter(col("vec_id") < 8)
      .select(col("vec_id").as("qid"), col("nv").as("qv"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("cos_micros").desc, col("vec_id"))
    broadcast(q).join(nv, col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"),
        floor(expr(dotSpark("qv", "nv")) * 1e6d + 0.5d).cast("long").as("cos_micros"))
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= 5)
  }

  /** Deterministic pseudo-random hyperplane component (j-th plane, i-th
    * dim), integer in [-9, 9] — the single source of truth lives in the
    * native expression ([[graft.functions.LshBucket.w]]); the oracle's
    * literal plane lists below are generated from it, so engine and
    * oracle cannot drift.
    */
  private def w(j: Int, i: Int): Int = graft.functions.LshBucket.w(j, i)

  private val Planes = graft.functions.LshBucket.Planes

  private def planeDuckList(j: Int): String =
    (0 until Dim).map(i => s"CAST(${w(j, i)} AS DOUBLE)").mkString("[", ", ", "]")

  /** Native one-pass form ([[graft.functions.LshBucket]]) — IEEE-identical
    * to folding the 8 literal plane arrays with `graft_dot`, without the
    * 8×64 literal expression nodes per query plan.
    */
  private def bucketSpark(v: String): String = s"graft_lsh_bucket($v)"

  private def bucketDuck(v: String): String =
    (0 until Planes).map { j =>
      val dot = s"list_reduce(list_prepend(CAST(0 AS DOUBLE), " +
        s"[$v[i] * ${planeDuckList(j)}[i] for i in generate_series(1, $Dim)]), " +
        s"(acc, vv) -> acc + vv)"
      s"(CASE WHEN $dot > 0 THEN ${1 << j} ELSE 0 END)"
    }.mkString(" + ")

  /** LSH-bucketed ANN: sign-random-projection into 8-bit buckets, then
    * cosine top-3 within the query's bucket only (equi-join on bucket).
    */
  val extAnnLsh: Q = Q(
    "ext_ann_lsh",
    s"""WITH $normDuckCte,
       |b AS (SELECT vec_id, nv, ${bucketDuck("nv")} AS bucket FROM nv),
       |q AS (SELECT vec_id AS qid, nv AS qv, bucket AS qbucket FROM b WHERE vec_id < 32),
       |scored AS (
       |  SELECT q.qid, e.vec_id,
       |    CAST(FLOOR((${dotDuck("q.qv", "e.nv")}) * 1000000 + 0.5) AS BIGINT) AS cos_micros
       |  FROM q JOIN b e ON q.qbucket = e.bucket AND e.vec_id <> q.qid),
       |ranked AS (
       |  SELECT qid, vec_id, cos_micros,
       |    ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos_micros DESC, vec_id) AS rn
       |  FROM scored)
       |SELECT qid, vec_id, cos_micros, rn FROM ranked WHERE rn <= 3""".stripMargin) { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    graft.functions.GraftFunctions.register(s)
    // lazily checkpointed: b feeds both the broadcast query side and
    // the probe stream side — without it the normalize+bucket pass ran
    // once per consumer (r21); materializing the bucketed table is what
    // a real LSH index build does
    val b = normalizedSpark(Tables.load(s, dir, "embeddings"))
      .withColumn("bucket", expr(bucketSpark("nv")))
      .localCheckpoint(false)
    val q = b.filter(col("vec_id") < 32)
      .select(col("vec_id").as("qid"), col("nv").as("qv"),
        col("bucket").as("qbucket"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("cos_micros").desc, col("vec_id"))
    broadcast(q).join(b,
        col("qbucket") === col("bucket") && col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"),
        floor(expr(dotSpark("qv", "nv")) * 1e6d + 0.5d).cast("long").as("cos_micros"))
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= 3)
  }

  /** IVF-style ANN: a coarse quantizer assigns every vector to its
    * nearest of 16 fixed centroids (deterministic "training" stub: the
    * first 16 vectors), queries probe only their own centroid's list.
    * The assignment is a 16-dot argmax projection; the probe is an
    * equi-join on centroid id — at scale the lists become partitions
    * and each query touches 1/16th of the data.
    */
  val extAnnIvf: Q = Q(
    "ext_ann_ivf", {
      s"""WITH $normDuckCte,
         |cent AS (SELECT vec_id AS cid, nv AS cv FROM nv WHERE vec_id < 16),
         |scoredc AS (
         |  SELECT nv.vec_id, nv.nv, cent.cid,
         |    CAST(FLOOR((${dotDuck("nv.nv", "cent.cv")}) * 1000000 + 0.5) AS BIGINT) AS cdot
         |  FROM nv, cent),
         |assign AS (
         |  SELECT vec_id, nv, cid, cdot,
         |    ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cdot DESC, cid) AS crn
         |  FROM scoredc),
         |bucketed AS (SELECT vec_id, nv, cid FROM assign WHERE crn = 1),
         |q AS (SELECT vec_id AS qid, nv AS qv, cid FROM bucketed WHERE vec_id < 32),
         |scored AS (
         |  SELECT q.qid, e.vec_id,
         |    CAST(FLOOR((${dotDuck("q.qv", "e.nv")}) * 1000000 + 0.5) AS BIGINT) AS cos_micros
         |  FROM q JOIN bucketed e ON q.cid = e.cid AND e.vec_id <> q.qid),
         |ranked AS (
         |  SELECT qid, vec_id, cos_micros,
         |    ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos_micros DESC, vec_id) AS rn
         |  FROM scored)
         |SELECT qid, vec_id, cos_micros, rn FROM ranked WHERE rn <= 3""".stripMargin
    }) { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    graft.functions.GraftFunctions.register(s)
    val nv = normalizedSpark(Tables.load(s, dir, "embeddings"))
    val cent = nv.filter(col("vec_id") < 16)
      .select(col("vec_id").as("cid"), col("nv").as("cv"))
    // argmax as a hash aggregation (max of (cdot, -cid) picks highest dot,
    // ties to the smallest cid — the oracle's ROW_NUMBER order) instead of
    // a sort-window: partial aggregation collapses the 16 candidate rows
    // per vector map-side, so nothing fans out through the shuffle
    val bucketed = nv.crossJoin(broadcast(cent))
      .select(col("vec_id"), col("nv"), col("cid"),
        floor(expr(dotSpark("nv", "cv")) * 1e6d + 0.5d).cast("long").as("cdot"))
      .groupBy(col("vec_id"))
      .agg(max(struct(col("cdot"), (-col("cid")).as("negcid"),
        col("cid"), col("nv"))).as("m"))
      .select(col("vec_id"), col("m.nv").as("nv"), col("m.cid").as("cid"))
      // lazily checkpointed: the assignment feeds both the broadcast
      // query side and the probed lists — materializing it once is
      // exactly what building the IVF index means (r21)
      .localCheckpoint(false)
    val q = bucketed.filter(col("vec_id") < 32)
      .select(col("vec_id").as("qid"), col("nv").as("qv"), col("cid").as("qcid"))
    val rn = Window.partitionBy(col("qid"))
      .orderBy(col("cos_micros").desc, col("vec_id"))
    broadcast(q).join(bucketed,
        col("qcid") === col("cid") && col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"),
        floor(expr(dotSpark("qv", "nv")) * 1e6d + 0.5d).cast("long").as("cos_micros"))
      .withColumn("rn", row_number().over(rn).cast("long"))
      .filter(col("rn") <= 3)
  }

  /** Embedding-cosine near-duplicate pairs: all pairs with cosine ≥ 0.99,
    * found inside LSH buckets only (candidate generation is the 8-bit
    * sign-projection equi-join; truly near-identical vectors agree on
    * every hyperplane sign with overwhelming probability). The dedup-by-
    * embedding counterpart of the text near-dup operators.
    */
  val extEmbedNeardup: Q = Q(
    "ext_embed_neardup",
    s"""WITH $normDuckCte,
       |b AS (SELECT vec_id, nv, ${bucketDuck("nv")} AS bucket FROM nv),
       |pairs AS (
       |  SELECT a.vec_id AS vec_a, e.vec_id AS vec_b,
       |    CAST(FLOOR((${dotDuck("a.nv", "e.nv")}) * 1000000 + 0.5) AS BIGINT) AS cos_micros
       |  FROM b a JOIN b e ON a.bucket = e.bucket AND a.vec_id < e.vec_id)
       |SELECT vec_a, vec_b, cos_micros FROM pairs WHERE cos_micros >= 990000""".stripMargin) { (s, dir) =>
    graft.functions.GraftFunctions.register(s)
    // lazily checkpointed: both sides of the bucket self-join read the
    // same normalize+bucket pass (r21)
    val b = normalizedSpark(Tables.load(s, dir, "embeddings"))
      .withColumn("bucket", expr(bucketSpark("nv")))
      .localCheckpoint(false)
    val a = b.select(col("vec_id").as("vec_a"), col("nv").as("nv_a"),
      col("bucket").as("bucket_a"))
    val e = b.select(col("vec_id").as("vec_b"), col("nv").as("nv_b"),
      col("bucket").as("bucket_b"))
    a.join(e, col("bucket_a") === col("bucket_b") && col("vec_a") < col("vec_b"))
      .select(col("vec_a"), col("vec_b"),
        floor(expr(dotSpark("nv_a", "nv_b")) * 1e6d + 0.5d).cast("long").as("cos_micros"))
      .filter(col("cos_micros") >= 990000L)
  }

  /** Embedding-cluster statistics: assign every vector to its nearest
    * centroid (same coarse quantizer as IVF), then report per-cluster
    * population and cohesion (mean member-to-centroid cosine). The
    * curation signal behind semantic-dedup/cluster-balancing of
    * training corpora; one broadcast argmax projection + one hash agg.
    */
  val extClusterStats: Q = Q(
    "ext_cluster_stats",
    s"""WITH $normDuckCte,
       |cent AS (SELECT vec_id AS cid, nv AS cv FROM nv WHERE vec_id < 16),
       |scoredc AS (
       |  SELECT nv.vec_id, cent.cid,
       |    CAST(FLOOR((${dotDuck("nv.nv", "cent.cv")}) * 1000000 + 0.5) AS BIGINT) AS cdot
       |  FROM nv, cent),
       |assign AS (
       |  SELECT vec_id, cid, cdot,
       |    ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cdot DESC, cid) AS crn
       |  FROM scoredc)
       |SELECT cid, COUNT(*) AS n_members,
       |  CAST(SUM(cdot) AS BIGINT) / COUNT(*) AS mean_cohesion_micros
       |FROM assign WHERE crn = 1
       |GROUP BY cid""".stripMargin) { (s, dir) =>
    graft.functions.GraftFunctions.register(s)
    val nv = normalizedSpark(Tables.load(s, dir, "embeddings"))
    val cent = nv.filter(col("vec_id") < 16)
      .select(col("vec_id").as("cid"), col("nv").as("cv"))
    // hash-agg argmax (see extAnnIvf): max(cdot, -cid) ≡ the oracle's
    // ROW_NUMBER(ORDER BY cdot DESC, cid) = 1, without the sort-window
    nv.crossJoin(broadcast(cent))
      .select(col("vec_id"), col("cid"),
        floor(expr(dotSpark("nv", "cv")) * 1e6d + 0.5d).cast("long").as("cdot"))
      .groupBy(col("vec_id"))
      .agg(max(struct(col("cdot"), (-col("cid")).as("negcid"), col("cid"))).as("m"))
      .select(col("m.cid").as("cid"), col("m.cdot").as("cdot"))
      .groupBy(col("cid"))
      .agg(count(lit(1)).as("n_members"),
        (sum(col("cdot")) / count(lit(1))).as("mean_cohesion_micros"))
  }

  /** One spherical k-means (Lloyd) refinement iteration, end-to-end on
    * the engine: assign to the 16 seed centroids, re-estimate each
    * centroid as the (renormalized) element-wise mean of its members,
    * reassign, and report the refined cluster populations.
    *
    * Determinism across engines: member means quantize each element to
    * micros before the integer SUM (order-free), and the rebuilt
    * centroid arrays are ordered by element position. Scale shape: two
    * broadcast argmax projections + one (cluster, dim) hash aggregation
    * — the same iteration structure a full distributed k-means loops.
    */
  val extKmeansRefine: Q = Q(
    "ext_kmeans_refine",
    s"""WITH $normDuckCte,
       |cent AS (SELECT vec_id AS cid, nv AS cv FROM nv WHERE vec_id < 16),
       |a0 AS (
       |  SELECT vec_id, cid,
       |    ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY
       |      CAST(FLOOR((${dotDuck("nv.nv", "cent.cv")}) * 1000000 + 0.5) AS BIGINT) DESC, cid) AS crn
       |  FROM nv, cent),
       |member AS (
       |  SELECT a0.cid, UNNEST(nv.nv) AS val,
       |    UNNEST(generate_series(1, LEN(nv.nv))) AS pos
       |  FROM a0 JOIN nv ON a0.vec_id = nv.vec_id AND a0.crn = 1),
       |mean_el AS (
       |  SELECT cid, pos,
       |    SUM(CAST(FLOOR((val) * 1000000 + 0.5) AS BIGINT)) / COUNT(*) / 1000000.0 AS mval
       |  FROM member GROUP BY cid, pos),
       |cent1raw AS (
       |  SELECT cid, LIST(mval ORDER BY pos) AS mv FROM mean_el GROUP BY cid),
       |cent1 AS (
       |  SELECT cid, [x / SQRT(${dotDuck("mv", "mv")}) for x in mv] AS cv
       |  FROM cent1raw),
       |a1 AS (
       |  SELECT nv.vec_id, cent1.cid,
       |    ROW_NUMBER() OVER (PARTITION BY nv.vec_id ORDER BY
       |      CAST(FLOOR((${dotDuck("nv.nv", "cent1.cv")}) * 1000000 + 0.5) AS BIGINT) DESC, cid) AS crn
       |  FROM nv, cent1)
       |SELECT cid, COUNT(*) AS n_members
       |FROM a1 WHERE crn = 1 GROUP BY cid""".stripMargin) { (s, dir) =>
    graft.functions.GraftFunctions.register(s)
    // lazily checkpointed: nv feeds the seed centroids, both argmax
    // assignment passes, and (via a0) the centroid re-estimation —
    // normalize once instead of once per consumer (r21)
    val nv = normalizedSpark(Tables.load(s, dir, "embeddings"))
      .localCheckpoint(false)
    val cent0 = nv.filter(col("vec_id") < 16)
      .select(col("vec_id").as("cid"), col("nv").as("cv"))
    // hash-agg argmax (see extAnnIvf): max(cdot, -cid) ≡ the oracle's
    // ROW_NUMBER(ORDER BY cdot DESC, cid) = 1, without the sort-window
    def argmaxAssign(vecs: org.apache.spark.sql.DataFrame,
        cents: org.apache.spark.sql.DataFrame) =
      vecs.crossJoin(broadcast(cents))
        .select(col("vec_id"), col("nv"), col("cid"),
          floor(expr(dotSpark("nv", "cv")) * 1e6d + 0.5d).cast("long").as("cdot"))
        .groupBy(col("vec_id"))
        .agg(max(struct(col("cdot"), (-col("cid")).as("negcid"),
          col("cid"), col("nv"))).as("m"))
        .select(col("vec_id"), col("m.nv").as("nv"), col("m.cid").as("cid"))
    val a0 = argmaxAssign(nv, cent0)
    val cent1 = a0
      .select(col("cid"), posexplode(col("nv")).as(Seq("pos", "val")))
      .groupBy(col("cid"), col("pos"))
      .agg((sum(floor(col("val") * 1e6d + 0.5d).cast("long")) /
        count(lit(1)) / 1e6d).as("mval"))
      .groupBy(col("cid"))
      .agg(expr("transform(array_sort(collect_list(struct(pos, mval))), x -> x.mval)")
        .as("mv"))
      // hoist the norm out of the lambda: inside `transform` the dot
      // would re-evaluate per element — O(dim²) per centroid
      .select(col("cid"), col("mv"),
        sqrt(expr(dotSpark("mv", "mv"))).as("cnorm"))
      .select(col("cid"),
        expr("transform(mv, x -> x / cnorm)").as("cv"))
    argmaxAssign(nv, cent1)
      .groupBy(col("cid"))
      .agg(count(lit(1)).as("n_members"))
  }

  /** Semantic clustering: connected components over the LSH-blocked
    * cosine-similarity graph (threshold 0.40 — the semantic-dedup /
    * cluster-balancing grouping, looser than the 0.99 near-dup cut).
    * Same scale shape as [[Dedup.extDedupCluster]]: candidate pairs
    * only within an LSH bucket, label propagation only over vertices
    * with an edge, everything else joins back as its own singleton.
    */
  val extEmbedCluster: Q = Q(
    "ext_embed_cluster",
    s"""WITH RECURSIVE $normDuckCte,
       |b AS (SELECT vec_id, nv, ${bucketDuck("nv")} AS bucket FROM nv),
       |pairs AS (
       |  SELECT a.vec_id AS vec_a, e.vec_id AS vec_b
       |  FROM b a JOIN b e ON a.bucket = e.bucket AND a.vec_id < e.vec_id
       |  WHERE CAST(FLOOR((${dotDuck("a.nv", "e.nv")}) * 1000000 + 0.5) AS BIGINT) >= 400000),
       |edges AS (
       |  SELECT vec_a AS src, vec_b AS dst FROM pairs
       |  UNION ALL SELECT vec_b, vec_a FROM pairs),
       |reach(v, lbl) AS (
       |  SELECT vec_id, vec_id FROM embeddings
       |  UNION
       |  SELECT e.dst, r.lbl FROM reach r JOIN edges e ON e.src = r.v),
       |cc AS (SELECT v, MIN(lbl) AS cluster_id FROM reach GROUP BY v)
       |SELECT v AS vec_id, cluster_id,
       |  COUNT(*) OVER (PARTITION BY cluster_id) AS cluster_sz
       |FROM cc""".stripMargin) { (s, dir) =>
    graft.functions.GraftFunctions.register(s)
    // lazily checkpointed: both sides of the bucket self-join read the
    // same normalize+bucket pass (r21)
    val b = normalizedSpark(Tables.load(s, dir, "embeddings"))
      .withColumn("bucket", expr(bucketSpark("nv")))
      .localCheckpoint(false)
    val a = b.select(col("vec_id").as("vec_a"), col("nv").as("nv_a"),
      col("bucket").as("bucket_a"))
    val e = b.select(col("vec_id").as("vec_b"), col("nv").as("nv_b"),
      col("bucket").as("bucket_b"))
    val pairs = a
      .join(e, col("bucket_a") === col("bucket_b") && col("vec_a") < col("vec_b"))
      .filter(floor(expr(dotSpark("nv_a", "nv_b")) * 1e6d + 0.5d)
        .cast("long") >= 400000L)
      .select(col("vec_a"), col("vec_b"))
    val cc = Graph.connectedComponents(pairs.toDF("src", "dst"))
      .select(col("v").as("cc_key"), col("component").as("cc_id"))
    Tables.load(s, dir, "embeddings").select(col("vec_id"))
      .join(cc, col("vec_id") === col("cc_key"), "left_outer")
      .select(col("vec_id"),
        coalesce(col("cc_id"), col("vec_id")).as("cluster_id"))
      .withColumn("cluster_sz", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("cluster_id"))))
  }

  /** Norm-scaled int8 quantization: q_j = round(nv_j · 127) over the
    * L2-normalized vector (|q_j| ≤ 127 by construction) — the storage-
    * compression step of an embedding pipeline. Pure codegen'd per-row
    * projection (native normalize + element picks), no shuffle.
    */
  val extEmbedQuantize: Q = Q(
    "ext_embed_quantize", {
      def qd(j: Int) =
        s"CAST(FLOOR(nv[${j + 1}] * 127 + 0.5) AS BIGINT) AS q_$j"
      s"""WITH $normDuckCte
         |SELECT vec_id,
         |  CAST(FLOOR(nrm * 1000000 + 0.5) AS BIGINT) AS norm_micros,
         |  ${Seq(0, 15, 31, 63).map(qd).mkString(",\n  ")}
         |FROM (SELECT n.vec_id, n.nrm, v.nv
         |      FROM nrmed n JOIN nv v ON n.vec_id = v.vec_id)""".stripMargin
    }) { (s, dir) =>
    graft.functions.GraftFunctions.register(s)
    val asD = "transform(embedding, x -> CAST(x AS DOUBLE))"
    def qd(j: Int) =
      floor(expr(s"nv[$j]") * 127d + 0.5d).cast("long").as(s"q_$j")
    Tables.load(s, dir, "embeddings")
      .select(col("vec_id"),
        sqrt(expr(dotSpark(asD, asD))).as("nrm"),
        expr("graft_l2_normalize(embedding)").as("nv"))
      .select(col("vec_id") +:
        floor(col("nrm") * 1e6d + 0.5d).cast("long").as("norm_micros") +:
        Seq(0, 15, 31, 63).map(qd): _*)
  }

  /** Multi-probe IVF (nprobe = 2): each query searches its TWO nearest
    * centroid lists instead of one — the standard recall knob of an IVF
    * index. Data vectors stay in exactly one list (disjoint candidate
    * sets, no dedup needed); the probe fan-out multiplies only the
    * query side, so cost scales with queries · nprobe · list size while
    * recall approaches brute force.
    */
  val extAnnProbe: Q = Q(
    "ext_ann_probe", {
      s"""WITH $normDuckCte,
         |cent AS (SELECT vec_id AS cid, nv AS cv FROM nv WHERE vec_id < 16),
         |scoredc AS (
         |  SELECT nv.vec_id, nv.nv, cent.cid,
         |    CAST(FLOOR((${dotDuck("nv.nv", "cent.cv")}) * 1000000 + 0.5) AS BIGINT) AS cdot
         |  FROM nv, cent),
         |assign AS (
         |  SELECT vec_id, nv, cid, cdot,
         |    ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cdot DESC, cid) AS crn
         |  FROM scoredc),
         |bucketed AS (SELECT vec_id, nv, cid FROM assign WHERE crn = 1),
         |q AS (SELECT vec_id AS qid, nv AS qv, cid FROM assign
         |      WHERE crn <= 2 AND vec_id < 32),
         |scored AS (
         |  SELECT q.qid, e.vec_id,
         |    CAST(FLOOR((${dotDuck("q.qv", "e.nv")}) * 1000000 + 0.5) AS BIGINT) AS cos_micros
         |  FROM q JOIN bucketed e ON q.cid = e.cid AND e.vec_id <> q.qid),
         |ranked AS (
         |  SELECT qid, vec_id, cos_micros,
         |    ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos_micros DESC, vec_id) AS rn
         |  FROM scored)
         |SELECT qid, vec_id, cos_micros, rn FROM ranked WHERE rn <= 3""".stripMargin
    }) { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    graft.functions.GraftFunctions.register(s)
    val nv = normalizedSpark(Tables.load(s, dir, "embeddings"))
    val cent = nv.filter(col("vec_id") < 16)
      .select(col("vec_id").as("cid"), col("nv").as("cv"))
    val crn = Window.partitionBy(col("vec_id"))
      .orderBy(col("cdot").desc, col("cid"))
    // K (=16) candidate rows per vector: the rank window runs over a
    // constant-size group, and WindowGroupLimit trims pre-shuffle
    val assign = nv.crossJoin(broadcast(cent))
      .select(col("vec_id"), col("nv"), col("cid"),
        floor(expr(dotSpark("nv", "cv")) * 1e6d + 0.5d).cast("long").as("cdot"))
      .withColumn("crn", row_number().over(crn))
      // lazily checkpointed: assign feeds the probed lists AND the
      // broadcast query fan-out — one quantization pass, as building
      // the index implies (r21)
      .localCheckpoint(false)
    val bucketed = assign.filter(col("crn") === 1)
      .select(col("vec_id"), col("nv"), col("cid"))
    val q = assign.filter(col("crn") <= 2 && col("vec_id") < 32)
      .select(col("vec_id").as("qid"), col("nv").as("qv"), col("cid").as("qcid"))
    val rn = Window.partitionBy(col("qid"))
      .orderBy(col("cos_micros").desc, col("vec_id"))
    broadcast(q).join(bucketed,
        col("qcid") === col("cid") && col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"),
        floor(expr(dotSpark("qv", "nv")) * 1e6d + 0.5d).cast("long").as("cos_micros"))
      .withColumn("rn", row_number().over(rn).cast("long"))
      .filter(col("rn") <= 3)
  }

  /** DuckDB: integer dot product of two BIGINT lists — order-free (exact
    * integer adds), unlike the float fold.
    */
  private def intDotDuck(a: String, b: String): String =
    s"list_reduce(list_prepend(CAST(0 AS BIGINT), " +
      s"[$a[i] * $b[i] for i in generate_series(1, $Dim)]), " +
      s"(acc, v) -> acc + v)"

  /** Spark SQL: the same integer dot product. */
  private def intDotSpark(a: String, b: String): String =
    s"aggregate(zip_with($a, $b, (x, y) -> x * y), CAST(0 AS BIGINT), " +
      "(acc, v) -> acc + v)"

  /** Two-stage retrieve-then-rerank ANN: an int8-quantized coarse pass
    * (integer dot product over `round(nv·127)` codes — the compressed
    * representation a 100 TB index actually stores and scans) proposes
    * the top-30 candidates per query; an exact float cosine pass
    * reranks just those to the final top-5.
    *
    * Scale design: the coarse scan reads 8-bit codes (8× smaller than
    * float64 — bandwidth, not FLOPs, bounds a full-corpus scan) with
    * the query side broadcast, and exact scoring touches only
    * Q·30 vectors. Integer coarse scores are order-free (no IEEE
    * reassociation concerns); the float rerank reuses the sequential
    * fold shared with the oracle.
    */
  val extAnnRerank: Q = Q(
    "ext_ann_rerank", {
      val int8 = "[CAST(FLOOR(x * 127 + 0.5) AS BIGINT) for x in nv]"
      s"""WITH $normDuckCte,
         |q8 AS (SELECT vec_id, nv, $int8 AS v8 FROM nv),
         |q AS (SELECT vec_id AS qid, nv AS qv, v8 AS qv8 FROM q8 WHERE vec_id < 8),
         |coarse AS (
         |  SELECT q.qid, e.vec_id, q.qv, e.nv,
         |    ${intDotDuck("q.qv8", "e.v8")} AS coarse_dot
         |  FROM q, q8 e WHERE e.vec_id <> q.qid),
         |cranked AS (
         |  SELECT qid, vec_id, qv, nv, coarse_dot,
         |    ROW_NUMBER() OVER (PARTITION BY qid ORDER BY coarse_dot DESC, vec_id) AS crn
         |  FROM coarse),
         |rer AS (
         |  SELECT qid, vec_id, coarse_dot,
         |    CAST(FLOOR((${dotDuck("qv", "nv")}) * 1000000 + 0.5) AS BIGINT) AS cos_micros
         |  FROM cranked WHERE crn <= 30),
         |ranked AS (
         |  SELECT qid, vec_id, coarse_dot, cos_micros,
         |    ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos_micros DESC, vec_id) AS rn
         |  FROM rer)
         |SELECT qid, vec_id, coarse_dot, cos_micros, rn
         |FROM ranked WHERE rn <= 5""".stripMargin
    }) { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    graft.functions.GraftFunctions.register(s)
    val int8 = "transform(nv, x -> CAST(FLOOR(x * 127 + 0.5) AS BIGINT))"
    val q8 = normalizedSpark(Tables.load(s, dir, "embeddings"))
      .select(col("vec_id"), col("nv"), expr(int8).as("v8"))
    val q = q8.filter(col("vec_id") < 8)
      .select(col("vec_id").as("qid"), col("nv").as("qv"), col("v8").as("qv8"))
    val crn = Window.partitionBy(col("qid"))
      .orderBy(col("coarse_dot").desc, col("vec_id"))
    val rn = Window.partitionBy(col("qid"))
      .orderBy(col("cos_micros").desc, col("vec_id"))
    broadcast(q).join(q8, col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"), col("qv"), col("nv"),
        expr(intDotSpark("qv8", "v8")).as("coarse_dot"))
      .withColumn("crn", row_number().over(crn))
      .filter(col("crn") <= 30)
      .select(col("qid"), col("vec_id"), col("coarse_dot"),
        floor(expr(dotSpark("qv", "nv")) * 1e6d + 0.5d).cast("long").as("cos_micros"))
      .withColumn("rn", row_number().over(rn).cast("long"))
      .filter(col("rn") <= 5)
  }

  /** Product-quantization ANN (PQ encode + ADC scan): vectors split
    * into 8 subvectors of 8 dims; each subspace's codebook is the
    * corresponding subvectors of the first 16 vectors (deterministic
    * "training" — production would k-means them); a vector's code is
    * its per-subspace nearest codeword (L2, ties to the smaller id);
    * queries score candidates by Asymmetric Distance Computation — the
    * per-subspace query·codeword lookup table, summed over subspaces —
    * and take top-5.
    *
    * Scale design: the 8 B codes replace 256 B of floats (32× storage
    * compression — what a corpus-scale index actually scans); codebook
    * and LUT are tiny broadcasts; encoding is map-side (per row × 128
    * codeword distances), with the per-subspace argmin as a hash agg on
    * the integer key d*16+cid (exact (distance, cid) tie-break, no
    * sort-window); the only shuffle is the per-(query, candidate)
    * integer sum. LUT entries quantize to micros BEFORE the sum, so
    * scores are order-free integer adds in both engines.
    */
  val extAnnPq: Q = Q(
    "ext_ann_pq", {
      // squared L2 via the three-dot identity, each dot the sequential
      // 8-element fold — the Spark side computes the IDENTICAL doubles
      // with its codegen'd graft_dot (same order, same formula), so the
      // micros quantization below cannot diverge
      def dot8(a: String, b: String) =
        "list_reduce(list_prepend(CAST(0 AS DOUBLE), " +
          s"[$a[i] * $b[i] for i in generate_series(1, 8)]), " +
          "(a, v) -> a + v)"
      val distDuck = s"((${dot8("s.sv", "s.sv")}) " +
        s"- 2 * (${dot8("s.sv", "c.cv")})) + (${dot8("c.cv", "c.cv")})"
      val dotDuck8 = dot8("q.sv", "c.cv")
      s"""WITH $normDuckCte,
         |sub AS (
         |  SELECT vec_id, js.j, nv[(js.j*8+1):(js.j*8+8)] AS sv
         |  FROM nv CROSS JOIN (SELECT UNNEST(generate_series(0, 7)) AS j) js),
         |cb AS (SELECT vec_id AS cid, j, sv AS cv FROM sub WHERE vec_id < 16),
         |dist AS (
         |  SELECT s.vec_id, s.j, c.cid,
         |    CAST(FLOOR(($distDuck) * 1000000 + 0.5) AS BIGINT) AS d
         |  FROM sub s JOIN cb c ON c.j = s.j),
         |code AS (
         |  SELECT vec_id, j, MIN(d * 16 + cid) % 16 AS cid
         |  FROM dist GROUP BY vec_id, j),
         |q AS (SELECT vec_id AS qid, j, sv FROM sub WHERE vec_id < 8),
         |lut AS (
         |  SELECT q.qid, q.j, c.cid,
         |    CAST(FLOOR(($dotDuck8) * 1000000 + 0.5) AS BIGINT) AS dm
         |  FROM q JOIN cb c ON c.j = q.j),
         |scored AS (
         |  SELECT l.qid, v.vec_id, CAST(SUM(l.dm) AS BIGINT) AS adc_micros
         |  FROM code v JOIN lut l ON l.j = v.j AND l.cid = v.cid
         |  WHERE v.vec_id <> l.qid
         |  GROUP BY l.qid, v.vec_id),
         |ranked AS (
         |  SELECT qid, vec_id, adc_micros,
         |    ROW_NUMBER() OVER (PARTITION BY qid ORDER BY adc_micros DESC, vec_id) AS rn
         |  FROM scored)
         |SELECT qid, vec_id, adc_micros, rn FROM ranked WHERE rn <= 5""".stripMargin
    }) { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    graft.functions.GraftFunctions.register(s)
    // three-dot squared-L2 identity on the codegen'd graft_dot — same
    // sequential fold, same formula as the oracle (no interpreted
    // zip_with/aggregate lambdas in the N × 128 encode hot path)
    val distSpark = "(graft_dot(s.sv, s.sv) " +
      "- 2 * graft_dot(s.sv, c.cv)) + graft_dot(c.cv, c.cv)"
    val dotSpark8 = "graft_dot(q.sv, c.cv)"
    // DataFrame pipeline over ONE lazily checkpointed subvector
    // relation: the former single-SQL form inlined the `sub` CTE into
    // cb, dist and q, re-running the normalize+slice+explode pass
    // three times per execution (r21). Expressions are identical.
    val sub = Tables.load(s, dir, "embeddings")
      .select(col("vec_id"), expr("graft_l2_normalize(embedding)").as("nv"))
      .select(col("vec_id"), explode(expr("sequence(0, 7)")).as("j"), col("nv"))
      .select(col("vec_id"), col("j"), expr("slice(nv, j*8+1, 8)").as("sv"))
      .localCheckpoint(false)
    val cb = sub.filter(col("vec_id") < 16)
      .select(col("vec_id").as("cid"), col("j"), col("sv").as("cv"))
    val dist = sub.as("s").join(broadcast(cb.as("c")), expr("c.j = s.j"))
      .select(col("s.vec_id").as("vec_id"), col("s.j").as("j"),
        col("c.cid").as("cid"),
        expr(s"CAST(FLOOR(($distSpark) * 1000000D + 0.5D) AS BIGINT)").as("d"))
    val code = dist.groupBy(col("vec_id"), col("j"))
      .agg(expr("MIN(d * 16 + cid) % 16").as("cid"))
    val q = sub.filter(col("vec_id") < 8)
      .select(col("vec_id").as("qid"), col("j"), col("sv"))
    val lut = q.as("q").join(broadcast(cb.as("c")), expr("c.j = q.j"))
      .select(col("q.qid").as("qid"), col("q.j").as("j"),
        col("c.cid").as("cid"),
        expr(s"CAST(FLOOR(($dotSpark8) * 1000000D + 0.5D) AS BIGINT)").as("dm"))
    val scored = code
      .join(broadcast(lut.select(col("qid"), col("j").as("lj"),
        col("cid").as("lcid"), col("dm"))),
        col("lj") === col("j") && col("lcid") === col("cid") &&
          col("vec_id") =!= col("qid"))
      .groupBy(col("qid"), col("vec_id"))
      .agg(sum(col("dm")).cast("long").as("adc_micros"))
    scored
      .withColumn("rn", row_number().over(Window.partitionBy(col("qid"))
        .orderBy(col("adc_micros").desc, col("vec_id"))).cast("long"))
      .filter(col("rn") <= 5)
  }

  /** SemDeDup-style semantic deduplication decision: assign vectors to
    * coarse clusters (the IVF quantizer), then inside each cluster mark
    * a vector REMOVED when any lower-id member sits above the cosine
    * threshold, recording which member shadows it. This is the
    * parallel-safe variant of the keep-first policy — the shadow test
    * is against every lower-id neighbor, not the surviving ones, so
    * each vector's decision is independent (no sequential scan to
    * distribute). Pair generation is cluster-bounded: the O(n²) scan
    * shrinks by the cluster count, and at scale the same shape runs on
    * real k-means cells ([[extKmeansRefine]] is the iteration).
    * Threshold 0.30: the corpus's semantic-overlap band (its near-dup
    * band at 0.99 is handled by [[extEmbedNeardup]]).
    */
  val extSemDedup: Q = Q(
    "ext_semdedup",
    s"""WITH $normDuckCte,
       |cent AS (SELECT vec_id AS cid, nv AS cv FROM nv WHERE vec_id < 16),
       |scoredc AS (
       |  SELECT nv.vec_id, nv.nv, cent.cid,
       |    CAST(FLOOR((${dotDuck("nv.nv", "cent.cv")}) * 1000000 + 0.5) AS BIGINT) AS cdot
       |  FROM nv, cent),
       |assign AS (
       |  SELECT vec_id, nv, cid,
       |    ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cdot DESC, cid) AS crn
       |  FROM scoredc),
       |b AS (SELECT vec_id, nv, cid FROM assign WHERE crn = 1),
       |sh AS (
       |  SELECT x.vec_id, MIN(y.vec_id) AS shadowed_by
       |  FROM b x JOIN b y ON x.cid = y.cid AND y.vec_id < x.vec_id
       |  WHERE CAST(FLOOR((${dotDuck("x.nv", "y.nv")}) * 1000000 + 0.5) AS BIGINT) >= 300000
       |  GROUP BY x.vec_id)
       |SELECT b.vec_id, b.cid,
       |  CASE WHEN sh.shadowed_by IS NULL THEN 0 ELSE 1 END AS removed,
       |  sh.shadowed_by
       |FROM b LEFT JOIN sh ON b.vec_id = sh.vec_id""".stripMargin) { (s, dir) =>
    graft.functions.GraftFunctions.register(s)
    val nv = normalizedSpark(Tables.load(s, dir, "embeddings"))
    val cent = nv.filter(col("vec_id") < 16)
      .select(col("vec_id").as("cid"), col("nv").as("cv"))
    // hash-agg argmax (see extAnnIvf): max(cdot, -cid) ≡ the oracle's
    // ROW_NUMBER(ORDER BY cdot DESC, cid) = 1, without the sort-window
    val b = nv.crossJoin(broadcast(cent))
      .select(col("vec_id"), col("nv"), col("cid"),
        floor(expr(dotSpark("nv", "cv")) * 1e6d + 0.5d).cast("long").as("cdot"))
      .groupBy(col("vec_id"))
      .agg(max(struct(col("cdot"), (-col("cid")).as("negcid"),
        col("cid"), col("nv"))).as("m"))
      .select(col("vec_id"), col("m.nv").as("nv"), col("m.cid").as("cid"))
      // lazily checkpointed: the assignment feeds both shadow-join
      // sides and the final map-back — one quantization pass (r21)
      .localCheckpoint(false)
    val x = b.select(col("vec_id"), col("nv").as("nv_x"), col("cid"))
    val y = b.select(col("vec_id").as("yid"), col("nv").as("nv_y"),
      col("cid").as("ycid"))
    val sh = x.join(y, col("cid") === col("ycid") && col("yid") < col("vec_id"))
      .filter(floor(expr(dotSpark("nv_x", "nv_y")) * 1e6d + 0.5d)
        .cast("long") >= 300000L)
      .groupBy(col("vec_id")).agg(min(col("yid")).as("shadowed_by"))
    b.select(col("vec_id"), col("cid"))
      .join(sh, Seq("vec_id"), "left")
      .select(col("vec_id"), col("cid"),
        when(col("shadowed_by").isNull, 0).otherwise(1).as("removed"),
        col("shadowed_by"))
  }

  /** k-NN graph construction (top-3 neighbors for EVERY vector,
    * LSH-block candidates): the adjacency input for graph-based
    * semantic dedup / cluster balancing. Candidates come from the
    * 8-bit sign-projection bucket (same blocking as ext_ann_lsh);
    * the per-node top-k runs through the typed size-k heap aggregate
    * ([[graft.functions.TopKByScore]]) instead of a rank window, so
    * aggregation state is bounded by k per node — partitions pre-trim
    * to k before the shuffle, and a hot bucket never materializes a
    * full sorted candidate list. Per-bucket pair generation is the
    * usual LSH-graph quadratic-within-block cost: bucket width is
    * corpus/256 here and shrinks with more projection bits at scale.
    */
  val extKnnGraph: Q = Q(
    "ext_knn_graph",
    s"""WITH $normDuckCte,
       |b AS (SELECT vec_id, nv, ${bucketDuck("nv")} AS bucket FROM nv),
       |scored AS (
       |  SELECT a.vec_id AS node_id, e.vec_id AS neighbor_id,
       |    CAST(FLOOR((${dotDuck("a.nv", "e.nv")}) * 1000000 + 0.5) AS BIGINT) AS cos_micros
       |  FROM b a JOIN b e ON a.bucket = e.bucket AND e.vec_id <> a.vec_id),
       |ranked AS (
       |  SELECT node_id, neighbor_id, cos_micros,
       |    ROW_NUMBER() OVER (PARTITION BY node_id ORDER BY cos_micros DESC, neighbor_id) AS rn
       |  FROM scored)
       |SELECT node_id, neighbor_id, cos_micros, rn
       |FROM ranked WHERE rn <= 3""".stripMargin) { (s, dir) =>
    knnGraphEdges(s, dir, graft.functions.LshBucket.Planes, 3)
  }

  /** The k-NN-graph pipeline extKnnGraph registers (oracle at the
    * 8-plane / k=3 defaults); planes and k are parameterized so scale
    * dry-runs (`KnnPlanesDryRun`) measure EXACTLY the shipped shape.
    */
  private[graft] def knnGraphEdges(
      s: org.apache.spark.sql.SparkSession, dir: String,
      planes: Int, k: Int): org.apache.spark.sql.DataFrame = {
    graft.functions.GraftFunctions.register(s)
    // lazily checkpointed: both sides of the bucket self-join read the
    // same normalize+bucket pass (r21)
    val b = normalizedSpark(Tables.load(s, dir, "embeddings"))
      .withColumn("bucket", expr(s"graft_lsh_bucket(nv, $planes)"))
      .localCheckpoint(false)
    val e = b.select(col("vec_id").as("e_id"), col("nv").as("env"),
      col("bucket").as("e_bucket"))
    b.join(e, col("bucket") === col("e_bucket") && col("e_id") =!= col("vec_id"))
      .select(col("vec_id").as("node_id"), col("e_id"),
        floor(expr(dotSpark("nv", "env")) * 1e6d + 0.5d).cast("long")
          .as("cos_micros"))
      .groupBy(col("node_id"))
      // native size-k heap aggregate (no per-row encoder — see
      // TopKByScoreAgg)
      .agg(expr(s"graft_topk_by_score(cos_micros, e_id, $k)").as("tk"))
      .select(col("node_id"), posexplode(col("tk.top")).as(Seq("pos", "t")))
      .select(col("node_id"), col("t.corpus_id").as("neighbor_id"),
        col("t.cos_micros").as("cos_micros"), (col("pos") + 1L).as("rn"))
  }

  /** IVF recall@10 against brute-force truth, per probe count — the
    * vector-side twin of ext_band_recall's knob verification: before
    * anyone trusts an IVF index at corpus scale, measure what share of
    * the true top-k each nprobe setting retrieves. Truth is exact
    * brute-force cosine over a bounded QUERY SAMPLE (16 queries here;
    * a production run samples queries the same way — the corpus side
    * is never quadratic), candidates come from the same 16-centroid
    * assignment as ext_ann_ivf/ext_ann_probe, and candidate scores
    * reuse the truth pass's dot products (one scoring pass total).
    */
  val extAnnRecall: Q = Q(
    "ext_ann_recall",
    s"""WITH $normDuckCte,
       |cent AS (SELECT vec_id AS cid, nv AS cv FROM nv WHERE vec_id < 16),
       |scoredc AS (
       |  SELECT nv.vec_id, nv.nv, cent.cid,
       |    CAST(FLOOR((${dotDuck("nv.nv", "cent.cv")}) * 1000000 + 0.5) AS BIGINT) AS cdot
       |  FROM nv, cent),
       |assign AS (
       |  SELECT vec_id, nv, cid, cdot,
       |    ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cdot DESC, cid) AS crn
       |  FROM scoredc),
       |bucketed AS (SELECT vec_id, cid FROM assign WHERE crn = 1),
       |q AS (SELECT vec_id AS qid, nv AS qv FROM nv WHERE vec_id < 16),
       |bscore AS (
       |  SELECT q.qid, e.vec_id,
       |    CAST(FLOOR((${dotDuck("q.qv", "e.nv")}) * 1000000 + 0.5) AS BIGINT) AS cm
       |  FROM q, nv e WHERE e.vec_id <> q.qid),
       |truth AS (
       |  SELECT qid, vec_id FROM (
       |    SELECT qid, vec_id,
       |      ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cm DESC, vec_id) AS rn
       |    FROM bscore) WHERE rn <= 10),
       |pr AS (SELECT UNNEST([1, 2]) AS probes),
       |cand AS (
       |  SELECT pr.probes, a.vec_id AS qid, e.vec_id
       |  FROM pr, assign a JOIN bucketed e
       |    ON a.cid = e.cid AND e.vec_id <> a.vec_id
       |  WHERE a.vec_id < 16 AND a.crn <= pr.probes),
       |approx AS (
       |  SELECT probes, qid, vec_id FROM (
       |    SELECT c.probes, c.qid, c.vec_id,
       |      ROW_NUMBER() OVER (PARTITION BY c.probes, c.qid
       |        ORDER BY b.cm DESC, c.vec_id) AS rn
       |    FROM cand c JOIN bscore b ON b.qid = c.qid AND b.vec_id = c.vec_id)
       |  WHERE rn <= 10)
       |SELECT pr.probes AS probes, t.qid, COUNT(*) AS n_truth,
       |  CAST(SUM(CASE WHEN a.vec_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hit,
       |  CAST(FLOOR(SUM(CASE WHEN a.vec_id IS NOT NULL THEN 1 ELSE 0 END)
       |    * 1000.0 / COUNT(*) + 0.5) AS BIGINT) AS recall_mils
       |FROM pr CROSS JOIN truth t
       |LEFT JOIN approx a
       |  ON a.probes = pr.probes AND a.qid = t.qid AND a.vec_id = t.vec_id
       |GROUP BY pr.probes, t.qid""".stripMargin) { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    graft.functions.GraftFunctions.register(s)
    val nv = normalizedSpark(Tables.load(s, dir, "embeddings"))
    val cent = nv.filter(col("vec_id") < 16)
      .select(col("vec_id").as("cid"), col("nv").as("cv"))
    val crn = Window.partitionBy(col("vec_id"))
      .orderBy(col("cdot").desc, col("cid"))
    val assign = nv.crossJoin(broadcast(cent))
      .select(col("vec_id"), col("nv"), col("cid"),
        floor(expr(dotSpark("nv", "cv")) * 1e6d + 0.5d).cast("long").as("cdot"))
      .withColumn("crn", row_number().over(crn))
      // lazily checkpointed: assign feeds the probed lists AND the
      // broadcast query fan-out — one quantization pass, as building
      // the index implies (r21)
      .localCheckpoint(false)
    val bucketed = assign.filter(col("crn") === 1)
      .select(col("vec_id"), col("cid"))
    val q = nv.filter(col("vec_id") < 16)
      .select(col("vec_id").as("qid"), col("nv").as("qv"))
    val bscore = broadcast(q).join(nv, col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"),
        floor(expr(dotSpark("qv", "nv")) * 1e6d + 0.5d).cast("long").as("cm"))
      .localCheckpoint(false) // one scoring pass feeds truth AND approx
    val trn = Window.partitionBy(col("qid"))
      .orderBy(col("cm").desc, col("vec_id"))
    val truth = bscore.withColumn("rn", row_number().over(trn))
      .filter(col("rn") <= 10).select(col("qid"), col("vec_id"))
    val pr = s.sql("SELECT explode(array(1, 2)) AS probes")
    val cand = broadcast(pr)
      .crossJoin(assign.filter(col("vec_id") < 16)
        .select(col("vec_id").as("qid"), col("cid").as("qcid"), col("crn")))
      .filter(col("crn") <= col("probes"))
      .join(bucketed.withColumnRenamed("cid", "ecid"),
        col("qcid") === col("ecid") && col("vec_id") =!= col("qid"))
      .select(col("probes"), col("qid"), col("vec_id"))
    val arn = Window.partitionBy(col("probes"), col("qid"))
      .orderBy(col("cm").desc, col("vec_id"))
    val approx = cand.join(bscore, Seq("qid", "vec_id"))
      .withColumn("rn", row_number().over(arn))
      .filter(col("rn") <= 10)
      .select(col("probes"), col("qid"), col("vec_id"), lit(1).as("hit"))
    broadcast(pr).crossJoin(truth)
      .join(approx, Seq("probes", "qid", "vec_id"), "left_outer")
      .groupBy(col("probes"), col("qid"))
      .agg(count(lit(1)).as("n_truth"),
        sum(when(col("hit").isNotNull, 1L).otherwise(0L)).as("n_hit"))
      .withColumn("recall_mils",
        floor(col("n_hit") * lit(1000.0d) / col("n_truth") + 0.5d)
          .cast("long"))
  }

  def all: Seq[Q] = Seq(
    extEmbeddingStats, extAnnBrute, extAnnLsh, extAnnIvf, extEmbedNeardup,
    extClusterStats, extKmeansRefine, extEmbedCluster, extEmbedQuantize,
    extAnnProbe, extAnnRerank, extAnnPq, extSemDedup, extKnnGraph,
    extAnnRecall)
}
