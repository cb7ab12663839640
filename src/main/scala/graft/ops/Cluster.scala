package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.Cached._

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
  * Every round is materialized through a [[Lineage]] cut to stop the
  * exponential lineage an iterative join would otherwise build up —
  * non-replicated `localCheckpoint` blocks by default, or (when the
  * session has `sc.setCheckpointDir` configured) the durable
  * persist-with-lineage + periodic reliable checkpoint mode, so a long
  * 100 TB clustering run survives executor loss like the other iterated
  * ops (Graph, Bpe).
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
    // Cut the pair list BEFORE the three-way symmetrize union: each union
    // branch is an independent plan subtree, so an uncut `pairs` — often a
    // full candidate-generation pipeline (MinHash banding over every
    // document body for q54/q145) — would compute three times just to be
    // re-projected. The cut stores only (src, dst) id pairs.
    val e0 =
      pairs.select(col(aCol).as("src"), col(bCol).as("dst")).cachedView
    // symmetrize + self-loops: min over the *closed* neighborhood
    val edges = e0
      .union(e0.select(col("dst").as("src"), col("src").as("dst")))
      .union(e0.select(col("src"), col("src").as("dst")))
      .distinct()
    val lin = new Lineage(pairs.sparkSession)
    val edgesCut = lin.invariant(edges)

    var labels = lin.state(
      edgesCut.select(col("src").as("id")).distinct()
        .withColumn("label", col("id")),
      eager = true)
    var changed = 1L
    var i = 0
    while (changed > 0 && i < maxIter) {
      // neighborhood-min step — materialized once: the pointer-doubling
      // self-join below references it twice, and an un-checkpointed plan
      // would recompute the join+aggregation for each side
      val prop = lin.state(
        edgesCut
          .join(labels.select(col("id").as("src"), col("label")), "src")
          .groupBy(col("dst").as("id"))
          .agg(min(col("label")).as("nl")),
        eager = true)
      // pointer-doubling step: follow the fresh label one more hop
      // (label-of-label) — labels only ever decrease, so this is safe and
      // halves the distance to the component minimum each round
      val hop = prop.as("x")
        .join(prop.select(col("id").as("lid"), col("nl").as("ll")).as("y"),
          col("x.nl") === col("y.lid"), "left")
        .select(col("x.id").as("id"),
          least(col("x.nl"), coalesce(col("y.ll"), col("x.nl"))).as("cand"))
      val next = lin.state(
        hop
          .join(labels.select(col("id"), col("label").as("prev")), "id")
          .select(col("id"),
            least(col("cand"), col("prev")).as("label"),
            (col("cand") < col("prev")).as("moved")),
        eager = true)
      changed = next.filter(col("moved")).count()
      // release superseded rounds: in default mode localCheckpoint blocks
      // are non-recomputable executor storage — without the unpersist, a
      // 10-round run pins ~2 node-scale relations PER round until eviction
      // kills the job with a missing-checkpoint error instead of degrading.
      // (In durable mode these are recomputable cached rounds / no-op on
      // reliable-checkpointed ones — releasing early is equally safe.)
      labels.unpersist()
      prop.unpersist()
      labels = next.drop("moved")
      i += 1
    }
    edgesCut.unpersist()
    labels.withColumnRenamed("label", "cluster")
  }

  /** Dedup policy over components: keep the representative (minimum id) of
    * every cluster, i.e. the kept-set of a corpus after near-dup removal is
    * (all ids not in any pair) ∪ (cluster representatives). */
  def representatives(components: DataFrame): DataFrame =
    components.filter(col("id") === col("cluster")).select("id")
}
