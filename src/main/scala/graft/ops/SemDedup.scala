package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.Cached._

/** Semantic deduplication (the SemDeDup recipe, Abbas et al. 2023):
  * cluster the embeddings, then find near-identical vectors WITHIN each
  * cluster only — the clustering is what makes the quadratic comparison
  * feasible at corpus scale (all-pairs is n², within-cluster is
  * Σ|cluster|², bounded by sizing k so clusters stay comparable-sized;
  * the price is the standard SemDeDup miss: a near-pair split across a
  * cluster boundary is not examined). Keep-lowest-id wins, matching the
  * keep-first policy of the text dedup family.
  *
  * Built on [[KMeans]], so everything — assignment, tie-breaks, the
  * squared-L2 near-duplicate predicate — is exact integer arithmetic on
  * quantized vectors and reproduces bit-for-bit in a SQL oracle. */
object SemDedup {

  /** Flag near-duplicate vectors: `(idCol, qv)` in, `(idCol, cid,
    * dropped)` out — `dropped` is true when a same-cluster vector with a
    * smaller id sits within `maxSqDist` (squared L2 on the quantized
    * ints). `k`/`iters` size the clustering. */
  def dropNearVectors(
      vecs: DataFrame,
      k: Int,
      iters: Int,
      maxSqDist: Long,
      idCol: String = "vec_id"): DataFrame = {
    require(maxSqDist >= 0, s"maxSqDist must be >= 0: $maxSqDist")
    // localCheckpoint: this subtree feeds BOTH self-join sides and the
    // final left join — unpinned, the k-means assignment (k·dim work per
    // row) and the id join would re-execute up to 3× in one action
    val assigned = KMeans.fit(vecs, k, iters, idCol = idCol)
      .select(col(idCol), col("cid"))
      .join(vecs.select(col(idCol), col("qv")), idCol)
      .cachedView // corpus-sized (every vector); recoverable cache
    val a = assigned.select(col("cid"), col(idCol).as("__i"), col("qv").as("__qa"))
    val b = assigned.select(col("cid"), col(idCol).as("__j"), col("qv").as("__qb"))
    val droppedIds = a.join(b,
        a("cid") === b("cid") && col("__i") < col("__j") &&
          KMeans.sqDist(col("__qa"), col("__qb")) <= maxSqDist)
      .select(col("__j").as(idCol)).distinct()
      .withColumn("__dropped", lit(true))
    assigned.select(col(idCol), col("cid"))
      .join(droppedIds, Seq(idCol), "left")
      .select(col(idCol), col("cid"),
        coalesce(col("__dropped"), lit(false)).as("dropped"))
  }
}
