package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Hard-negative mining for contrastive embedding training: for each probe
  * vector, the most similar vectors that do NOT share its cluster — close
  * enough to be confusable, guaranteed non-positive by the cluster
  * boundary. The standard retrieval-training data op (dense retrievers,
  * CLIP-style dual encoders) computed in-engine.
  *
  * Integer-exact end to end: clustering is [[KMeans]] (fixed-point
  * vectors, deterministic ties), candidate cells are the `nCells` nearest
  * FOREIGN centroids per probe — a zero-shuffle row-local expression over
  * the driver-held centroid literal, the same trick as the assignment
  * step — and final scoring is exact integer squared L2 with
  * `(dist, cand_id)` ranking, so a SQL oracle reproduces every row.
  *
  * Scale shape: the quadratic is bounded by cells, never all-pairs —
  * candidates come from an equi-join on cid (probes × their chosen
  * cells), so cost is |probes| · (nCells/k) · n, and the per-probe top-k
  * is a keyed window over high-cardinality probe ids (no single-task
  * sort, no global exchange). */
object HardNegatives {

  /** Mine `topK` hard negatives per probe. `vecs` = `(vec_id, qv:
    * array<long>)` quantized vectors, `probes` = `(vec_id)` subset.
    * Returns `(probe_id, cand_id, dist, rn)` with rn = 1..topK by
    * ascending distance (ties → cand_id). */
  def mine(
      vecs: DataFrame,
      probes: DataFrame,
      k: Int,
      iters: Int,
      nCells: Int,
      topK: Int): DataFrame = {
    require(nCells >= 1 && nCells < k, s"need 1 <= nCells < k: $nCells/$k")
    import graft.ops.Cached._
    // One materialization shared by everything here: the clustering
    // (which KMeans detects as already-cut and does not re-store), the
    // probe-side vector fetch and the candidate-side vector fetch — all
    // scan-rooted consumers of the same quantize pipeline.
    val vecsM = vecs.cachedView
    val (assigned0, centroids) = KMeans.fitFull(vecsM, k, iters)
    // the final assignment feeds both the probes' own-cluster lookup and
    // the candidate join; it is the slim (id, cid, dist) relation, and
    // recomputing it means re-running the k x dim distance fold per row
    val assigned = assigned0.cachedView
    val carr = array(centroids.map { case (cid, v) =>
      struct(lit(cid).as("cid"), typedLit(v).as("cv"))
    }: _*)
    // the ONE distance definition (KMeans.sqDist) — cell choice and final
    // scoring must use exactly the metric the assignment used
    val sq = (a: Column, b: Column) => KMeans.sqDist(a, b)
    // nearest foreign cells: row-local sort of a k-element literal
    val probeCells = vecsM.join(probes.select("vec_id"), "vec_id")
      .join(assigned.select(col("vec_id"), col("cid").as("own_cid")), "vec_id")
      .withColumn("cells", slice(
        transform(
          array_sort(transform(
            filter(carr, c => c.getField("cid") =!= col("own_cid")),
            c => struct(sq(col("qv"), c.getField("cv")).as("d"),
              c.getField("cid").as("cid")))),
          s => s.getField("cid")),
        1, nCells))
      .select(col("vec_id").as("probe_id"), col("qv").as("pqv"),
        explode(col("cells")).as("cid"))
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("probe_id").orderBy(col("dist"), col("cand_id"))
    probeCells
      .join(assigned.select(col("vec_id").as("cand_id"), col("cid")), "cid")
      .join(vecsM.select(col("vec_id").as("cand_id"), col("qv").as("cqv")),
        "cand_id")
      .withColumn("dist", sq(col("pqv"), col("cqv")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= topK)
      .select("probe_id", "cand_id", "dist", "rn")
  }
}
