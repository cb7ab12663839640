package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PcaSpec extends SparkSpec {

  test("distributed moments equal the exact driver-side computation, any partitioning") {
    import spark.implicits._
    val dim = 8
    val rnd = new scala.util.Random(7L)
    val vecs = Seq.fill(400)(Vector.fill(dim)(rnd.nextDouble() - 0.5))
    for (parts <- Seq(1, 16)) {
      val df = vecs.toDF("v").repartition(parts)
      val m = Pca.moments(df, "v", dim)
      assert(m.n == 400)
      // exact expectations from the same doubles, driver-side
      val sum = Array.fill(dim)(0.0)
      val gram = Array.fill(dim * (dim + 1) / 2)(0.0)
      vecs.foreach { v =>
        var i = 0; var k = 0
        while (i < dim) {
          sum(i) += v(i)
          var j = i
          while (j < dim) { gram(k) += v(i) * v(j); j += 1; k += 1 }
          i += 1
        }
      }
      sum.indices.foreach(i => assert(math.abs(m.sum(i) - sum(i)) < 1e-9))
      gram.indices.foreach(k => assert(math.abs(m.gram(k) - gram(k)) < 1e-9))
    }
  }

  test("null vectors are skipped; null elements read as 0 (padding rule)") {
    import spark.implicits._
    val rows = Seq(
      Some(Seq[java.lang.Double](1.0, 2.0)),
      None, // whole vector null: skipped like a SQL aggregate would
      Some(Seq[java.lang.Double](3.0, null))) // null element → 0.0
    val m = Pca.moments(rows.toDF("v"), "v", 2)
    assert(m.n == 2, s"null vector must not count: ${m.n}")
    assert(m.sum == Vector(4.0, 2.0), s"${m.sum}")
    assert(m.gram == Vector(1.0 + 9.0, 2.0, 4.0), s"${m.gram}")
  }

  test("power iteration recovers a planted dominant direction") {
    import spark.implicits._
    val dim = 16
    val rnd = new scala.util.Random(11L)
    // unit direction u; points = t*u + small isotropic noise
    val u0 = Array.fill(dim)(rnd.nextDouble() - 0.5)
    val n0 = math.sqrt(u0.map(x => x * x).sum)
    val u = u0.map(_ / n0)
    val vecs = Seq.fill(600) {
      val t = 4.0 * (rnd.nextDouble() - 0.5)
      Vector.tabulate(dim)(i => t * u(i) + 0.05 * (rnd.nextDouble() - 0.5))
    }
    val (v, lambda) = Pca.principalComponent(vecs.toDF("v"), "v", dim)
    val cos = math.abs(v.zip(u).map { case (a, b) => a * b }.sum)
    assert(cos > 0.99, s"|cos(v, planted)| = $cos")
    // eigenvalue ~ Var(t) = (4^2)/12 ≈ 1.33 plus noise
    assert(lambda > 1.0 && lambda < 2.0, s"lambda = $lambda")
  }

  test("embeddings corpus: top PC explains more variance than any single axis") {
    val df = graft.Tables.load(spark, sfDir, "embeddings")
    val (_, lambda) = Pca.principalComponent(df, "embedding", 64)
    val m = Pca.moments(df, "embedding", 64)
    val c = Pca.covariance(m, 64)
    val maxAxisVar = (0 until 64).map(i => c(i)(i)).max
    assert(lambda >= maxAxisVar - 1e-12,
      s"lambda $lambda < max axis variance $maxAxisVar")
  }
}
