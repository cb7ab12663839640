package graft.functions

import graft.SparkSpec
import graft.ops.Similarity
import org.apache.spark.sql.functions._

class CentroidAggSpec extends SparkSpec {

  test("typed centroid aggregator computes per-label element-wise means") {
    import spark.implicits._
    val vecs = Seq(
      (0, Seq(1.0, 2.0)), (0, Seq(3.0, 4.0)), (1, Seq(10.0, 20.0)))
      .toDF("label", "v").as[(Int, Seq[Double])]
    val agg = new CentroidAgg(2).toColumn
    val out = vecs.groupByKey(_._1).mapValues(_._2).agg(agg)
      .collect().toMap
    assert(out(0) == Seq(2.0, 3.0))
    assert(out(1) == Seq(10.0, 20.0))
  }

  test("centroids of the embedding labels differ across clusters") {
    import spark.implicits._
    val emb = graft.Tables.load(spark, sfDir, "embeddings")
      .select(col("label"), col("embedding").cast("array<double>").as("v"))
      .as[(Int, Seq[Double])]
    val cents = emb.groupByKey(_._1).mapValues(_._2)
      .agg(new CentroidAgg(64).toColumn).collect().toMap
    assert(cents.size == 10)
    val c0 = cents(0); val c1 = cents(1)
    val dist = math.sqrt(c0.zip(c1).map { case (a, b) => (a - b) * (a - b) }.sum)
    assert(dist > 0.01, s"label centroids unexpectedly identical (d=$dist)")
  }

  test("Lloyd-refined centroids reduce mean assignment distance") {
    import spark.implicits._
    val vecs = graft.Tables.load(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val fixed = Similarity.ivfCentroids(spark, 16, 64).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val refined = Similarity.refineCentroids(vecs).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(refined.nonEmpty && refined.keySet.subsetOf(fixed.keySet))

    def cos(a: Seq[Double], b: Seq[Double]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    val sample = vecs.limit(100).collect()
      .map(r => r.getSeq[Double](1))
    def meanBestSim(cents: Map[Long, Seq[Double]]): Double =
      sample.map(v => cents.values.map(c => cos(v, c)).max).sum / sample.length
    // the refined centroids sit inside the data; fixed ones are random
    assert(meanBestSim(refined) > meanBestSim(fixed))
  }

  test("IVF top-k returns ranked candidates from probed cells only") {
    val vecs = graft.Tables.load(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val out = Similarity.ivfTopK(vecs, col("vec_id") < 10, k = 3).collect()
    assert(out.nonEmpty)
    out.groupBy(_.getLong(0)).values.foreach { g =>
      assert(g.length <= 3)
      val sorted = g.sortBy(_.getInt(3))
      assert(sorted.map(_.getInt(3)).sameElements(1 to g.length))
    }
  }
}
