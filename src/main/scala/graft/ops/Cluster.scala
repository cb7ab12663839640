package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Near-duplicate *clustering*: the pair lists the dedup family emits
  * ([[Dedup.minhashPairs]], [[Similarity.bandedNearDupPairs]]) tell you who
  * matches whom; keeping one representative per duplicate *group* needs the
  * transitive closure — connected components over the pair graph.
  *
  * Algorithm: iterative min-label propagation with pointer doubling: every
  * node starts labeled with its own id; each round takes the minimum label
  * over the closed neighborhood (one equi-join + aggregation over the
  * *pair* table — tiny relative to the corpus), then follows the new label
  * one more hop (label-of-label), which halves label-chain lengths so
  * convergence is O(log diameter) rounds instead of O(diameter) — 2–3
  * rounds for the dense little cliques near-dup graphs form, and ~20
  * rounds covers diameters up to ~2^20 even for degenerate path graphs.
  * Every round is materialized via `localCheckpoint` to cut the
  * exponential lineage an iterative join would otherwise build up.
  */
object Cluster {

  /** Connected components of the undirected graph given by (aCol, bCol)
    * pairs → (id, cluster) rows, cluster = min id in the component. Only
    * ids that appear in some pair are returned (singletons are the corpus
    * minus the pair ids — no need to drag them through the iteration). */
  def connectedComponents(
      pairs: DataFrame,
      aCol: String,
      bCol: String,
      maxIter: Int = 20): DataFrame = {
    val e0 = pairs.select(col(aCol).as("src"), col(bCol).as("dst"))
    // symmetrize + self-loops: min over the *closed* neighborhood
    val edges = e0
      .union(e0.select(col("dst").as("src"), col("src").as("dst")))
      .union(e0.select(col("src"), col("src").as("dst")))
      .distinct()
      .localCheckpoint(true)

    var labels = edges.select(col("src").as("id")).distinct()
      .withColumn("label", col("id"))
      .localCheckpoint(true)
    var changed = 1L
    var i = 0
    while (changed > 0 && i < maxIter) {
      // neighborhood-min step — materialized once: the pointer-doubling
      // self-join below references it twice, and an un-checkpointed plan
      // would recompute the join+aggregation for each side
      val prop = edges
        .join(labels.select(col("id").as("src"), col("label")), "src")
        .groupBy(col("dst").as("id"))
        .agg(min(col("label")).as("nl"))
        .localCheckpoint(true)
      // pointer-doubling step: follow the fresh label one more hop
      // (label-of-label) — labels only ever decrease, so this is safe and
      // halves the distance to the component minimum each round
      val hop = prop.as("x")
        .join(prop.select(col("id").as("lid"), col("nl").as("ll")).as("y"),
          col("x.nl") === col("y.lid"), "left")
        .select(col("x.id").as("id"),
          least(col("x.nl"), coalesce(col("y.ll"), col("x.nl"))).as("cand"))
      val next = hop
        .join(labels.select(col("id"), col("label").as("prev")), "id")
        .select(col("id"),
          least(col("cand"), col("prev")).as("label"),
          (col("cand") < col("prev")).as("moved"))
        .localCheckpoint(true)
      changed = next.filter(col("moved")).count()
      // release superseded rounds: localCheckpoint blocks are
      // non-recomputable executor storage — without the unpersist, a
      // 10-round run pins ~2 node-scale relations PER round until eviction
      // kills the job with a missing-checkpoint error instead of degrading
      labels.unpersist()
      prop.unpersist()
      labels = next.drop("moved")
      i += 1
    }
    edges.unpersist()
    labels.withColumnRenamed("label", "cluster")
  }

  /** Dedup policy over components: keep the representative (minimum id) of
    * every cluster, i.e. the kept-set of a corpus after near-dup removal is
    * (all ids not in any pair) ∪ (cluster representatives). */
  def representatives(components: DataFrame): DataFrame =
    components.filter(col("id") === col("cluster")).select("id")
}
