package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Embedding similarity-search operators.
  *
  * Scale design: brute force is the correctness baseline (probe side
  * broadcast, scan side streamed — never a shuffled cross join); the LSH
  * path buckets vectors by random-hyperplane sign bits so candidate
  * generation becomes an equi-join on the bucket id. Hyperplane components
  * are derived from a closed-form integer formula (no RNG state), so any
  * engine — and the DuckDB oracle — derives the identical planes.
  */
object Similarity {

  /** In-order double-precision dot product of two array<double> columns. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column =
    sqrt(aggregate(a, lit(0.0), (acc, x) => acc + x * x))

  /** Codegen'd cosine — bit-identical to `dot(a,b)/(norm(a)*norm(b))`
    * (independent in-order folds) but ~50× faster on wide fan-outs because
    * Spark's higher-order functions are CodegenFallback. */
  def cosine(a: Column, b: Column): Column = graft.functions.CosineSim.of(a, b)

  /** Sign-bit LSH bucket id over `bits` pseudo-random hyperplanes for a
    * `dim`-dimensional array<double> column named `vCol`. Plane j component i
    * is `(1103515245*(j*dim+i) + 12345) % 2001 - 1000` — engine-agnostic
    * integer arithmetic (cf. ExtQueries oracle SQL). */
  def lshBucket(vCol: String, bits: Int = 8, dim: Int = 64): Column =
    graft.functions.LshBucket.of(col(vCol), bits, dim)

  /** Brute-force top-k cosine neighbors for a (small) probe set. Similarity
    * is rounded to 6dp before ranking so rank order is engine-stable. */
  def bruteTopK(vectors: DataFrame, probes: DataFrame, k: Int): DataFrame = {
    val scored = vectors
      .join(broadcast(probes), col("vec_id") =!= col("query_id"))
      .withColumn("sim", round(cosine(col("q"), col("v")), 6))
    val w = Window.partitionBy("query_id").orderBy(col("sim").desc, col("vec_id"))
    scored.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select("query_id", "vec_id", "sim", "rn")
  }

  /** LSH-bucketed top-k: probes only compare against vectors in their own
    * sign-bit bucket. Recall < 1 by construction; at scale this turns a
    * full scan per probe into a bucket-local one (multi-probe or fewer bits
    * widen recall). */
  def lshTopK(vectors: DataFrame, probeIds: Column, k: Int,
      bits: Int = 8, dim: Int = 64): DataFrame = {
    val bucketed = vectors
      .withColumn("bucket", lshBucket("v", bits, dim))
    val probes = bucketed.filter(probeIds)
      .select(col("vec_id").as("query_id"), col("v").as("q"), col("bucket"))
    val scored = bucketed.join(probes, "bucket")
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("sim", round(cosine(col("q"), col("v")), 6))
    val w = Window.partitionBy("query_id").orderBy(col("sim").desc, col("vec_id"))
    scored.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select("query_id", "vec_id", "sim", "rn")
  }

  /** Closed-form IVF coarse-quantizer centroids: centroid j component i is
    * `((1103515245*(j*dim+i) + 12345) % 2001 - 1000) / 1000.0` — fixed
    * random directions, derivable identically by any engine (the DuckDB
    * oracle regenerates them from the same formula). A data-adaptive
    * refinement (k-means step via [[graft.functions.CentroidAgg]]) can
    * replace these engine-side; the fixed form is the oracle-checked path. */
  def ivfCentroids(spark: org.apache.spark.sql.SparkSession,
      nlist: Int = 16, dim: Int = 64): DataFrame = {
    val rows = (0 until nlist).map { j =>
      (j.toLong, (0 until dim).map(i =>
        ((1103515245L * (j * dim + i) + 12345L) % 2001L - 1000L) / 1000.0))
    }
    spark.createDataFrame(rows).toDF("cid", "c")
  }

  /** Cell assignment: argmax cosine over the centroid set (rounded, tie on
    * cid — the engine-stable rank pattern). Returns top-`nprobe` cells. */
  private def nearestCells(vectors: DataFrame, cents: DataFrame,
      vCol: String, nprobe: Int): DataFrame = {
    val scored = vectors.crossJoin(broadcast(cents))
      .withColumn("csim", round(cosine(col(vCol), col("c")), 6))
    val w = Window.partitionBy(col("vec_id")).orderBy(col("csim").desc, col("cid"))
    scored.withColumn("crn", row_number().over(w))
      .filter(col("crn") <= nprobe)
      .drop("c", "csim", "crn")
  }

  /** One Lloyd refinement step over the closed-form centroids: assign every
    * vector to its nearest fixed centroid, then recompute each cell's mean
    * with the typed [[graft.functions.CentroidAgg]] (map-side combined).
    * Engine-side path — the oracle-checked q26 keeps the closed-form
    * centroids; refined centroids are for recall, not for parity. */
  def refineCentroids(vectors: DataFrame,
      nlist: Int = 16, dim: Int = 64): DataFrame = {
    import vectors.sparkSession.implicits._
    val cents = ivfCentroids(vectors.sparkSession, nlist, dim)
    val assigned = nearestCells(vectors, cents, "v", 1)
      .select(col("cid"), col("v").cast("array<double>"))
      .as[(Long, Seq[Double])]
    assigned.groupByKey(_._1).mapValues(_._2)
      .agg(new graft.functions.CentroidAgg(dim).toColumn.name("c"))
      .toDF("cid", "c")
  }

  /** IVF top-k: vectors live in their nearest centroid cell; probes search
    * their `nprobe` nearest cells. At scale the index side is partitioned by
    * cell (one shuffle at build), probes touch nprobe/nlist of the data. */
  def ivfTopK(vectors: DataFrame, probeIds: Column, k: Int,
      nlist: Int = 16, nprobe: Int = 2, dim: Int = 64): DataFrame = {
    val cents = ivfCentroids(vectors.sparkSession, nlist, dim)
    val indexed = nearestCells(vectors, cents, "v", 1)
      .withColumnRenamed("cid", "cell")
    val probes = nearestCells(
      vectors.filter(probeIds)
        .select(col("vec_id"), col("v")), cents, "v", nprobe)
      .select(col("vec_id").as("query_id"), col("v").as("q"),
        col("cid").as("cell"))
    val scored = indexed.join(probes, "cell")
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("sim", round(cosine(col("q"), col("v")), 6))
    val w = Window.partitionBy("query_id").orderBy(col("sim").desc, col("vec_id"))
    scored
      .select(col("query_id"), col("vec_id"), col("sim"))
      .distinct() // a candidate may appear via both probed cells
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
  }

  /** Near-duplicate vector pairs above a cosine threshold (brute pairwise —
    * the LSH bucket join is the scale path, this is the oracle-checked
    * reference form). */
  def nearDupPairs(vectors: DataFrame, minCos: Double): DataFrame = {
    // Precompute each vector's norm once — per-pair work drops to one dot
    // product; sqrt(Σx²) is the same fold as in cosine(), so results are
    // bit-identical to the naive per-pair form.
    import graft.functions.Dot
    val withNorm = vectors.withColumn("nrm", sqrt(Dot.of(col("v"), col("v"))))
    val a = withNorm.select(
      col("vec_id").as("id_a"), col("v").as("va"), col("nrm").as("na"))
    val b = withNorm.select(
      col("vec_id").as("id_b"), col("v").as("vb"), col("nrm").as("nb"))
    a.join(b, col("id_a") < col("id_b"))
      .withColumn("sim",
        round(Dot.of(col("va"), col("vb")) / (col("na") * col("nb")), 6))
      .filter(col("sim") >= minCos)
      .select("id_a", "id_b", "sim")
  }
}
