package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Greedy k-center coreset selection (Gonzalez 1985) over quantized
  * embeddings — the "pick k maximally-spread exemplars" step of corpus
  * curation: seed points for diverse-subset sampling, cluster init that
  * provably 2-approximates the optimal covering radius, and the usual
  * first move of facility-location / coverage-driven data selection.
  *
  * All arithmetic is on the same non-negative fixed-point longs as
  * [[KMeans]] ([[KMeans.quantize]]), every argmax is tie-broken
  * deterministically (largest distance, then LOWEST id), so an unrolled
  * SQL oracle reproduces center choice and assignment bit-for-bit.
  *
  * Scale shape: centers live on the driver (k·dim longs — bounded and
  * tiny), broadcast into row-local expressions each round, so every round
  * is a zero-shuffle map over the points followed by ONE 1-row `max`
  * aggregate (map-side combined; k−1 rounds total) plus one id-equality
  * lookup for the winner's vector. No join, no explode, no all-pairs
  * anything: k passes over the data, each embarrassingly parallel. The
  * final assignment/summary is one more zero-shuffle map + a k-group
  * aggregation. The input is `localCheckpoint`ed once so the k+1 passes
  * don't recompute upstream lineage.
  *
  * The argmax is encoded into one long — `minDist · idCap + (idCap−1−id)`
  * — so a plain `max` both picks the farthest point and breaks ties
  * toward the lowest id (mirrors the `MIN(dist·k+cid)` argmin trick the
  * k-means oracle uses; `idCap` must exceed every id and
  * `maxDist · idCap` must fit a long — 64·2048² · 2^20 ≈ 2.8e14 here).
  *
  * Assumes k ≤ the number of distinct vectors; with fewer distinct points
  * than k the greedy argmax degenerates to re-picking covered points.
  */
object Coreset {

  /** One row's exact min squared-L2 distance to the current center set. */
  private def minDist(v: Column, centers: Seq[Seq[Long]]): Column =
    aggregate(
      array(centers.map(cv => KMeans.sqDist(v, typedLit(cv))): _*),
      lit(Long.MaxValue), (acc, d) => least(acc, d))

  /** Greedy k-center over `(idCol, vecCol: array<long>)` rows. Center 0 is
    * the vector of the smallest id; each subsequent center is the point
    * farthest from the chosen set (ties to the lowest id). Returns
    * (summary, centers):
    *
    *  - summary: one row per center — `(cid, center_id, n_pts, radius,
    *    sum_dist)` where every point is assigned to its nearest center
    *    (ties to the lowest cid), `radius` is the max and `sum_dist` the
    *    sum of exact squared distances within the cell.
    *  - centers: `(cid, id, distAtSelection)` in selection order; the
    *    selection distances are non-increasing and upper-bound the final
    *    covering radius (the classic 2-approximation certificate).
    */
  def selectFull(
      vecs: DataFrame,
      k: Int,
      idCol: String = "vec_id",
      vecCol: String = "qv",
      idCap: Long = 1L << 20): (DataFrame, Seq[(Long, Long, Long)]) = {
    require(k >= 1, s"k must be >= 1: $k")
    val pts = vecs
      .select(col(idCol).cast("long").as("id"), col(vecCol).as("v"))
      .localCheckpoint() // k+1 passes; rows × dim longs, no lineage replay

    val first = pts.orderBy(col("id")).limit(1).collect()(0)
    var centers = Vector(
      (0L, first.getLong(0), 0L, first.getSeq[Long](1).toIndexedSeq: Seq[Long]))

    for (r <- 1 until k) {
      val md = minDist(col("v"), centers.map(_._4))
      val enc = pts
        .select(max(md * idCap + (lit(idCap - 1) - col("id"))).as("enc"))
        .collect()(0).getLong(0)
      val (dist, id) = (enc / idCap, idCap - 1 - enc % idCap)
      val vec = pts.filter(col("id") === id)
        .select("v").collect()(0).getSeq[Long](0).toIndexedSeq
      centers :+= ((r.toLong, id, dist, vec: Seq[Long]))
    }

    // nearest-center assignment: min over (dist·k + cid) — zero shuffle
    val carr = array(centers.map { case (cid, _, _, v) =>
      struct(lit(cid).as("cid"), typedLit(v).as("cv"))
    }: _*)
    val mkey = aggregate(
      transform(carr, c => KMeans.sqDist(col("v"), c("cv")) * k + c("cid")),
      lit(Long.MaxValue), (acc, x) => least(acc, x))
    val centerId = element_at(
      map(centers.flatMap { case (cid, id, _, _) =>
        Seq(lit(cid), lit(id)) }: _*),
      col("cid"))
    val summary = pts
      .select((mkey % k).as("cid"), (mkey.divide(k)).cast("long").as("d"))
      .groupBy(col("cid"))
      .agg(count(lit(1)).as("n_pts"), max(col("d")).as("radius"),
        sum(col("d")).as("sum_dist"))
      .withColumn("center_id", centerId)
      .select("cid", "center_id", "n_pts", "radius", "sum_dist")
    (summary, centers.map { case (cid, id, d, _) => (cid, id, d) })
  }
}
