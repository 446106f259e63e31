package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed graph primitives used by the dedup-clustering pipeline.
  *
  * Kept as a standalone operator so callers can cluster any pair
  * relation (near-dup edges, citation links, co-occurrence graphs)
  * without going through the document pipeline.
  */
object Graph {

  /** Connected components by distributed min-label propagation.
    *
    * @param edges one row per edge with columns (src, dst), either
    *              orientation; both orientations are derived internally.
    * @return (v, component) for every vertex that appears in `edges`,
    *         where `component` is the minimum vertex id reachable from
    *         `v`. Vertices with no edges are the caller's concern (they
    *         are trivially their own component and must not pay for the
    *         iteration — see [[Dedup.extDedupCluster]]).
    *
    * Each round is one shuffle join (edges ⋈ labels) plus one
    * min-aggregation; a lazy `localCheckpoint` truncates lineage and the
    * convergence probe (the monotonically decreasing label sum reaching
    * a fixpoint) materializes it in the same action. Rounds = graph
    * diameter — right for the small-diameter cluster graphs dedup
    * produces; a corpus with adversarial chain-shaped components would
    * swap in alternating large-star/small-star contraction (O(log n)
    * rounds) behind this same signature.
    */
  def connectedComponents(edges0: DataFrame): DataFrame = {
    val fwd = edges0.select(col("src").cast("long"), col("dst").cast("long"))
    val edges = fwd.union(fwd.select(col("dst").as("src"), col("src").as("dst")))
      .persist()
    var labels = edges
      .select(col("src").as("v")).distinct()
      .select(col("v"), col("v").as("lbl"))
      .localCheckpoint(false) // lazy: the sum action below materializes it
    var lblSum = Option(labels.agg(sum(col("lbl"))).head.get(0))
      .map(_.asInstanceOf[Long])
    var converged = lblSum.isEmpty
    while (!converged) {
      val prop = edges
        .join(labels, col("src") === col("v"))
        .select(col("dst").as("v"), col("lbl"))
      val next = labels.union(prop)
        .groupBy(col("v")).agg(min(col("lbl")).as("lbl"))
        .localCheckpoint(false) // one job per round: checkpoint + sum together
      val nextSum = Option(next.agg(sum(col("lbl"))).head.get(0))
        .map(_.asInstanceOf[Long])
      if (nextSum == lblSum) converged = true
      // superseded rounds' checkpoint blocks are reclaimed by the
      // ContextCleaner once the old `labels` reference drops here (no
      // public API frees localCheckpoint blocks eagerly)
      else { lblSum = nextSum; labels = next }
    }
    edges.unpersist()
    labels.select(col("v"), col("lbl").as("component"))
  }
}
