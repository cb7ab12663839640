package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Integer-exact k-means (Lloyd) over quantized embeddings — the
  * clustering step of corpus curation (cluster-balanced sampling, topic
  * discovery, near-dup group analysis) made engine-agnostic: all
  * arithmetic is on fixed-point longs with deterministic round-half-up
  * averaging and lexicographic `(distance, cid)` tie-breaks, so a SQL
  * oracle (unrolled CTEs, one per iteration) reproduces every assignment
  * and centroid bit-for-bit — no float drift, no seed dependence.
  *
  * Scale shape (the Spark MLlib layout): centroids live on the driver —
  * k·dim longs, broadcast into the row-local assignment expression each
  * round — so assignment is a zero-shuffle map (`aggregate` over a
  * k-element literal array of centroid structs; no join, no explode).
  * The update step is one `groupBy(cid, pos)` over the posexploded
  * vectors: n·dim long rows shuffle per iteration, the same class as any
  * aggregation over the input, with map-side partial sums. Driver traffic
  * is k·dim rows per round — bounded and tiny at any corpus size.
  */
object KMeans {

  /** Quantize a float/double embedding array to NON-NEGATIVE fixed-point
    * longs: `floor(x · scale) + offset`. Multiplying a float by a
    * power-of-two scale is exact in double arithmetic, so Spark and any
    * SQL engine produce identical longs from identical input bits.
    * Non-negativity (pick `offset` ≥ scale · |min value|) is what makes
    * integer-division rounding portable: Spark's `DIV` truncates toward
    * zero while DuckDB's `//` floors — they only agree on non-negative
    * operands. Distances are shift-invariant, so the offset never affects
    * clustering. */
  def quantize(emb: Column, scale: Int = 1024, offset: Int = 1024): Column =
    transform(emb, x => floor(x.cast("double") * scale).cast("long") + offset)

  /** Exact integer squared L2 distance of two array<long> columns. */
  private[ops] def sqDist(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)),
      lit(0L), (acc, d) => acc + d)

  /** Run `iters` Lloyd rounds on `(idCol, vecCol: array<long>)` rows with
    * the vectors of the k smallest ids as initial centroids. Returns the
    * final assignment `(idCol, cid, dist)` — every row keeps its nearest
    * final-round centroid (ties to the lowest cid) and the exact squared
    * distance to it. A cluster that loses all members mid-run is dropped
    * (subsequent rounds assign over the survivors), matching the unrolled
    * SQL oracle's semantics. */
  def fit(
      vecs: DataFrame,
      k: Int,
      iters: Int,
      idCol: String = "vec_id",
      vecCol: String = "qv"): DataFrame =
    fitFull(vecs, k, iters, idCol, vecCol)._1

  /** [[fit]] plus the final-round centroids `(cid, vector)` — consumers
    * like hard-negative mining need the cells themselves, not just the
    * assignment. Centroids are driver-held by design (k·dim longs). */
  def fitFull(
      vecs: DataFrame,
      k: Int,
      iters: Int,
      idCol: String = "vec_id",
      vecCol: String = "qv"): (DataFrame, Seq[(Long, Seq[Long])]) = {
    require(k >= 1 && iters >= 1, s"k and iters must be >= 1: k=$k iters=$iters")
    val spark = vecs.sparkSession

    // Pin the input ONCE: every Lloyd round's assignment (plus the init
    // take and the final assignment) is an independent plan subtree over
    // `vecs`, and the typical caller feeds a parquet scan + quantize
    // pipeline — scan-rooted, so AQE's exchange reuse cannot deduplicate
    // it and each round would re-decode the whole corpus. The cut stores
    // the (id, quantized-vector) rows; `iters + 2` full scans collapse
    // to one. Skipped when the caller already handed us a materialized
    // relation (its plan is a bare RDD scan) — re-storing it would hold
    // two copies of the corpus for nothing.
    val alreadyCut = vecs.queryExecution.analyzed
      .isInstanceOf[org.apache.spark.sql.execution.LogicalRDD]
    val pinned =
      if (alreadyCut) vecs else { import Cached._; vecs.cachedView }

    // a null vector would sail through the assignment min-fold unchanged
    // and emit (cid = -1, dist = Long.MaxValue) — an INVENTED cluster that
    // downstream group-bys (and HardNegatives' cell filter) treat as real;
    // a ragged-length vector nulls its distances and ranks unpredictably.
    // Both are corrupt input: fail loudly in-plan.
    val nonNull = pinned.withColumn(vecCol,
      when(col(vecCol).isNull,
        raise_error(concat(lit(s"KMeans: null $vecCol for "),
          col(idCol).cast("string")))).otherwise(col(vecCol)))

    // deterministic init: vectors of the k smallest ids, cid = 0..k-1 in
    // id order (TakeOrderedAndProject — per-partition k, no full sort)
    var centroids: Seq[(Long, Seq[Long])] = nonNull
      .orderBy(col(idCol)).limit(k)
      .select(col(idCol).cast("long"), col(vecCol)).collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1).toIndexedSeq: Seq[Long]))
      .sortBy(_._1).zipWithIndex
      .map { case ((_, v), i) => (i.toLong, v) }.toSeq
    val dim = centroids.headOption.map(_._2.size).getOrElse(0)
    val vecs2 = nonNull.withColumn(vecCol,
      when(size(col(vecCol)) =!= dim,
        raise_error(concat(lit(s"KMeans: $vecCol length != $dim for "),
          col(idCol).cast("string")))).otherwise(col(vecCol)))

    // keepVec: the update step needs (cid, vector) — emitting the vector
    // the row ALREADY holds keeps assignment a zero-shuffle map; a
    // re-join of the assignment back to vecs per round would add an
    // n-row hash join per iteration for a column that never left the row
    def assign(keepVec: Boolean = false): DataFrame = {
      val carr = array(centroids.map { case (cid, v) =>
        struct(lit(cid).as("cid"), typedLit(v).as("cv"))
      }: _*)
      val base = vecs2.withColumn("__best",
        aggregate(carr,
          struct(lit(Long.MaxValue).as("d"), lit(-1L).as("cid")),
          (acc, c) => {
            val d = sqDist(col(vecCol), c.getField("cv"))
            when(d < acc.getField("d"), struct(d.as("d"), c.getField("cid").as("cid")))
              .otherwise(acc)
          }))
      val core = Seq(col(idCol), col("__best.cid").as("cid"),
        col("__best.d").as("dist"))
      val out = if (keepVec) core :+ col(vecCol) else core
      base.select(out: _*)
    }

    for (_ <- 1 to iters) {
      val next = assign(keepVec = true)
        .select(col("cid"), posexplode(col(vecCol)).as(Seq("pos", "v")))
        .groupBy("cid", "pos")
        .agg(expr("(2 * sum(v) + count(1)) DIV (2 * count(1))").as("avg"))
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
      centroids = next.groupBy(_._1).toSeq.sortBy(_._1).map {
        case (cid, comps) =>
          (cid, comps.sortBy(_._2).map(_._3).toIndexedSeq: Seq[Long])
      }
    }
    (assign(), centroids)
  }
}
