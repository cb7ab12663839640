package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** ANN recall at SCALED corpus size: the recall specs pin floors at 2,000
  * vectors; this drill measures recall@k of every index structure against
  * [[graft.ops.Similarity.bruteTopK]] on a `mult`× corpus (64k vectors at
  * the default 32×) — catching QUALITY degradation at scale, not just
  * wall-time ([[ScaleDrill]]'s job). Two numbers per method:
  *
  *  - `recall`  — recall@k over the full brute top-k. The testdata
  *    embeddings are near-random, so most true neighbors are
  *    near-orthogonal — structurally hard for ANY angular index; this
  *    number tracks relative degradation across scales.
  *  - `planted` — recall over PLANTED near-duplicates (per-probe perturbed
  *    copies at cos ≈ 0.97–0.999, the dedup/similarity payload these
  *    indexes exist to retrieve). This is the number with a meaningful
  *    floor, asserted in AnnRecallScaleSpec.
  *
  * Run: `SPARK_GRAFT_SCALE=32 sbt "runMain graft.AnnRecallDrill"` — one
  * JSON line `{"metric":"ann_recall","n":…,"k":…,"methods":{…}}`.
  */
object AnnRecallDrill {

  /** `mult`× scrambled corpus plus, for each probe id < `nProbes`, five
    * planted perturbations of the probe vector (component r bumped by
    * 0.05·(r+1) — cosines ≈ 0.999 down to ≈ 0.97) at ids
    * `2·10^15 + probe·100 + r`. */
  def corpusWithPlants(spark: SparkSession, sfDir: String, mult: Int,
      nProbes: Int): DataFrame = {
    val emb = Tables.load(spark, sfDir, "embeddings")
    val scaled = ScaleDrill.scrambledEmbeddings(emb, mult)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val plants = scaled.filter(col("vec_id") < nProbes)
      .crossJoin(broadcast(
        spark.range(5).select(col("id").cast("int").as("r"))))
      .select(
        (lit(2000000000000000L) + col("vec_id") * 100 + col("r")).as("vec_id"),
        transform(col("v"), (x, j) =>
          when(j === col("r"), x + lit(0.05) * (col("r") + 1)).otherwise(x))
          .as("v"))
    scaled.unionByName(plants)
  }

  /** recall@k and planted-recall of `got` vs the brute `truth`, both
    * (query_id, vec_id) sets. */
  def recallOf(truth: Set[(Long, Long)], got: Set[(Long, Long)]): (Double, Double) = {
    val hit = truth.intersect(got).size.toDouble / truth.size
    val planted = truth.filter(_._2 >= 2000000000000000L)
    val pHit =
      if (planted.isEmpty) 1.0
      else planted.intersect(got).size.toDouble / planted.size
    (hit, pHit)
  }

  def measure(spark: SparkSession, sfDir: String, mult: Int,
      nProbes: Int = 20, k: Int = 10): Map[String, (Double, Double)] = {
    import graft.ops.Similarity
    val vs = corpusWithPlants(spark, sfDir, mult, nProbes)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val probeIds = col("vec_id") < nProbes
    def pairs(df: DataFrame): Set[(Long, Long)] =
      df.select("query_id", "vec_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val probes = vs.filter(probeIds)
      .select(col("vec_id").as("query_id"), col("v").as("q"))
    val truth = pairs(Similarity.bruteTopK(vs, probes, k))
    val methods = Seq[(String, () => DataFrame)](
      "lsh" -> (() => Similarity.lshTopK(vs, probeIds, k)),
      "lsh_multiprobe" -> (() => Similarity.lshTopKMultiProbe(vs, probeIds, k)),
      "ivf" -> (() => Similarity.ivfTopK(vs, probeIds, k)),
      "pq" -> (() => Similarity.pqTopK(vs, probeIds, k)),
      "ivf_pq" -> (() => Similarity.ivfPqTopK(vs, probeIds, k)),
      "quantized" -> (() => Similarity.quantizedTopK(vs, probeIds, k)))
    val out = methods.map { case (name, fn) =>
      name -> recallOf(truth, pairs(fn()))
    }.toMap
    vs.unpersist()
    out
  }

  /** Planted-PAIR recall of [[graft.ops.Similarity.bandedNearDupPairs]] at
    * scaled corpus size — the measured-recall companion to its measured
    * wall ratio (ScaleDrill `banded_neardup`). Unlike the top-k indexes
    * above, the banded op's payload is PAIRS, so truth here is the exact
    * pair set within the planted family (probes ∪ their perturbed copies)
    * whose true cosine ≥ `minCos` — computed by brute force over the
    * ~120-vector family — and recall is the fraction of those pairs the
    * banded op (run over the FULL scaled corpus, where the band-width
    * adaptation actually kicks in) emits. This is exactly the number the
    * count-adaptive band sizing could silently trade away: wider bands cut
    * candidate volume AND borderline-pair recall; the spec floor pins it.
    * Returns (recall, truthPairs). */
  def measureBandedPairs(spark: SparkSession, sfDir: String, mult: Int,
      nProbes: Int = 20, minCos: Double = 0.95): (Double, Long) = {
    import graft.functions.Dot
    import graft.ops.Similarity
    val vs = corpusWithPlants(spark, sfDir, mult, nProbes)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val famPred = col("vec_id") < nProbes ||
      col("vec_id") >= 2000000000000000L
    val fam = vs.filter(famPred)
    val withNorm = fam.withColumn("nrm", sqrt(Dot.of(col("v"), col("v"))))
    // ~120 × 120 brute pairs — the exact truth, same rounding as the op
    val truth = withNorm.select(col("vec_id").as("id_a"), col("v").as("va"),
        col("nrm").as("na"))
      .crossJoin(withNorm.select(col("vec_id").as("id_b"), col("v").as("vb"),
        col("nrm").as("nb")))
      .filter(col("id_a") < col("id_b"))
      .withColumn("sim",
        round(Dot.of(col("va"), col("vb")) / (col("na") * col("nb")), 6))
      .filter(col("sim") >= minCos)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val gotPairs = Similarity.bandedNearDupPairs(vs, minCos)
      .filter((col("id_a") < nProbes || col("id_a") >= 2000000000000000L) &&
        (col("id_b") < nProbes || col("id_b") >= 2000000000000000L))
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    vs.unpersist()
    val recall =
      if (truth.isEmpty) 1.0
      else truth.intersect(gotPairs).size.toDouble / truth.size
    (recall, truth.size.toLong)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val mult = sys.env.getOrElse("SPARK_GRAFT_SCALE", "32").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // the measured corpus includes the planted near-dups (20 probes × 5)
    val n = Tables.load(spark, sfDir, "embeddings").count() * mult + 20 * 5
    val rec = measure(spark, sfDir, mult)
    val (bRec, bTruth) = measureBandedPairs(spark, sfDir, mult)
    val json = rec.toSeq.sortBy(_._1).map { case (m, (r, p)) =>
      f""""$m":{"recall":$r%.3f,"planted":$p%.3f}"""
    }.mkString(",")
    println(s"""{"metric":"ann_recall","n":$n,"planted":100,"k":10,"methods":{$json},""" +
      f""""banded_pairs":{"recall":$bRec%.3f,"truth_pairs":$bTruth}}""")
    spark.stop()
  }
}
