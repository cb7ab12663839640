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
  * aggregation. The input gets one [[Lineage]] invariant cut so the k+1 passes
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
    val lin = new Lineage(vecs.sparkSession)
    val pts = lin.invariant(vecs
      .select(col(idCol).cast("long").as("id"), col(vecCol).as("v")))
    // ^ k+1 passes; rows × dim longs, no lineage replay — durable when the
    //   session has a checkpoint dir (the iterated-op Lineage discipline)

    // the encoding precondition is load-bearing: an id outside [0, idCap)
    // borrows from the distance field and silently decodes a WRONG center
    val bounds = pts.agg(min(col("id")), max(col("id"))).collect()(0)
    // empty input would otherwise surface as an opaque
    // ArrayIndexOutOfBoundsException on the first-center collect below —
    // the module's convention is a named up-front failure
    require(!bounds.isNullAt(0),
      "coreset: empty input — no points to select centers from")
    require(
      bounds.getLong(0) >= 0 && bounds.getLong(1) < idCap,
      s"ids must be in [0, $idCap): found [${bounds.getLong(0)}, ${bounds.getLong(1)}]")

    val first = pts.orderBy(col("id")).limit(1).collect()(0)
    var centers = Vector(
      (0L, first.getLong(0), 0L, first.getSeq[Long](1).toIndexedSeq: Seq[Long]))

    // carry the running min-dist per point (the oracle's d_r CTE): each
    // round evaluates ONE new sqDist, so total distance work is O(k·n·dim),
    // not the O(k²·n·dim) of re-minimizing over all chosen centers
    var cur = lin.state(pts
      .withColumn("md", KMeans.sqDist(col("v"), typedLit(centers(0)._4))),
      eager = true)

    // the `maxDist·idCap < 2^63` precondition was only a Scaladoc comment —
    // violating it silently selects WRONG centers. One cheap 1-row aggregate
    // after the first distance map certifies the whole run: every later
    // distance is bounded by 4·mdMax (||x−c||² ≤ 2||x−c0||² + 2||c−c0||²
    // with both terms ≤ mdMax), and both encodings (selection argmax ·idCap,
    // assignment argmin ·k) must fit a long
    val mdMax = cur.agg(max(col("md"))).collect()(0).getLong(0)
    require(mdMax <= Long.MaxValue / math.max(idCap, k.toLong) / 4,
      s"coreset: max squared distance $mdMax overflows the encoded argmax " +
        s"(needs 4·maxDist·max(idCap=$idCap, k=$k) < 2^63); quantize more " +
        "coarsely or lower idCap")

    for (r <- 1 until k) {
      val enc = cur
        .select(max(col("md") * idCap + (lit(idCap - 1) - col("id"))).as("enc"))
        .collect()(0).getLong(0)
      val (dist, id) = (enc / idCap, idCap - 1 - enc % idCap)
      val vec = cur.filter(col("id") === id)
        .select("v").collect()(0).getSeq[Long](0).toIndexedSeq
      centers :+= ((r.toLong, id, dist, vec: Seq[Long]))
      if (r < k - 1) cur = lin.state(cur
        .withColumn("md",
          least(col("md"), KMeans.sqDist(col("v"), typedLit(vec)))),
        eager = true)
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
      // integer DIV, not .divide (double division): encoded keys can
      // exceed 2^53 inside the line-87 guard's envelope, where the
      // double quotient rounds and the truncated d drifts from the exact
      // integer selection distances — breaking SQL-oracle bit-parity
      .withColumn("__mkey", mkey)
      .select((col("__mkey") % k).as("cid"),
        expr(s"__mkey DIV ${k}L").as("d"))
      .groupBy(col("cid"))
      .agg(count(lit(1)).as("n_pts"), max(col("d")).as("radius"),
        sum(col("d")).as("sum_dist"))
      .withColumn("center_id", centerId)
      .select("cid", "center_id", "n_pts", "radius", "sum_dist")
    (summary, centers.map { case (cid, id, d, _) => (cid, id, d) })
  }
}
