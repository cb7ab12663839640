package graft.ops

import graft.SparkSpec
import graft.functions.{PqEncode, PqLut, PqScore}
import org.apache.spark.sql.functions._

/** Product-quantization ANN: encode/LUT/score primitives and end-to-end
  * recall against the brute-force baseline. */
class PqSpec extends SparkSpec {

  private def vecs = {
    import spark.implicits._
    spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
  }

  test("PqScore(codes, lut) == sum of per-block centroid dots") {
    import spark.implicits._
    // 2 blocks × 2 codes × 2 dims — hand-checkable
    val books = Seq(
      Seq(Seq(1.0, 0.0), Seq(0.0, 1.0)),
      Seq(Seq(2.0, 0.0), Seq(0.0, 2.0)))
    val df = Seq((Seq(0.9, 0.1, 0.2, 1.8), Seq(1.0, 1.0, 1.0, 1.0)))
      .toDF("v", "q")
      .select(
        PqEncode.of(col("v"), books).as("codes"),
        PqLut.of(col("q"), books).as("lut"))
      .withColumn("score", PqScore.of(col("codes"), col("lut"), ks = 2))
    val row = df.collect().head
    // block 0 of v = (0.9, 0.1) → nearest (1,0) = code 0; block 1 = (0.2,
    // 1.8) → nearest (0,2) = code 1. LUT for q=(1,1,1,1): block 0 dots =
    // (1, 1); block 1 dots = (2, 2). score = lut[0*2+0] + lut[1*2+1] = 3.
    assert(row.getSeq[Long](0) == Seq(0L, 1L))
    assert(row.getDouble(2) == 3.0)
  }

  test("encode is deterministic and ties break to the lower code") {
    import spark.implicits._
    val books = Seq(Seq(Seq(1.0), Seq(-1.0))) // 1 block, 1-dim: tie at 0.0
    val out = Seq(Seq(0.0), Seq(0.5), Seq(-0.5)).toDF("v")
      .select(PqEncode.of(col("v"), books).as("c"))
      .collect().map(_.getSeq[Long](0).head)
    assert(out.toSeq == Seq(0L, 0L, 1L))
  }

  test("trained codebooks reconstruct better than the closed-form seeds") {
    val unit = vecs
      .withColumn("nrm", sqrt(graft.functions.Dot.of(col("v"), col("v"))))
      .filter(col("nrm") > 0.0)
      .withColumn("vn", transform(col("v"), x => x / col("nrm")))
    def mse(books: Seq[Seq[Seq[Double]]]): Double = {
      // exact reconstruction error via the LUT trick: for unit v,
      // ||v - c(v)||² = 1 - 2·dot(v, c(v)) + ||c(v)||², where ||c(v)||² is
      // a per-block lookup of centroid self-dots
      val selfDots = books.flatten.map(c => c.map(x => x * x).sum)
      val selfLut = array(selfDots.map(lit): _*)
      unit.select(
          (lit(1.0)
            - lit(2.0) * PqScore.of(
                PqEncode.of(col("vn"), books),
                PqLut.of(col("vn"), books), ks = 16)
            + PqScore.of(PqEncode.of(col("vn"), books), selfLut, ks = 16))
            .as("err"))
        .agg(avg(col("err"))).collect().head.getDouble(0)
    }
    val seed = mse(Similarity.pqSeedBooks(8, 16, 8))
    val trained = mse(Similarity.pqTrain(unit, vCol = "vn"))
    assert(trained < seed,
      s"training must lower reconstruction error: seed=$seed trained=$trained")
  }

  test("IVF+PQ: equi-join-only plan, codes-only scan, decent recall vs brute") {
    val probes = vecs.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("v").as("q"))
    val brute = Similarity.bruteTopK(vecs, probes, k = 5).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val df = Similarity.ivfPqTopK(vecs, col("vec_id") < 5, k = 5,
      nprobe = 8, refineFactor = 16)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"),
      s"IVF+PQ must be equi-joins only:\n$plan")
    val got = df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (brute & got).size.toDouble / brute.size
    assert(recall >= 0.5,
      s"IVF+PQ recall $recall below 0.5 (cells+PQ truncate twice)")
  }

  test("PQ top-k with exact refine reaches >= 0.6 recall vs brute force") {
    val probes = vecs.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("v").as("q"))
    val brute = Similarity.bruteTopK(vecs, probes, k = 5).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val pq = Similarity.pqTopK(vecs, col("vec_id") < 5, k = 5, refineFactor = 16)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (brute & pq).size.toDouble / brute.size
    assert(recall >= 0.6, s"PQ recall $recall below 0.6 (|brute|=${brute.size})")
  }
}
