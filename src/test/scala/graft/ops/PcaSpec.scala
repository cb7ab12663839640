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

  test("deflated top-k: orthogonal components, non-increasing eigenvalues, planted pair") {
    import spark.implicits._
    val dim = 8
    val rnd = new scala.util.Random(13L)
    // two planted orthogonal directions with distinct spreads
    val a = Array.tabulate(dim)(i => if (i == 0) 1.0 else 0.0)
    val b = Array.tabulate(dim)(i => if (i == 1) 1.0 else 0.0)
    val vecs = Seq.fill(800) {
      val t = 6.0 * (rnd.nextDouble() - 0.5)   // Var ≈ 3.0 along a
      val s = 2.0 * (rnd.nextDouble() - 0.5)   // Var ≈ 0.33 along b
      Vector.tabulate(dim)(i =>
        t * a(i) + s * b(i) + 0.01 * (rnd.nextDouble() - 0.5))
    }
    val (m, comps) = Pca.topComponents(vecs.toDF("v"), "v", dim, 3)
    assert(m.n == 800)
    val lambdas = comps.map(_._2)
    assert(lambdas == lambdas.sortBy(-_), s"eigenvalues not sorted: $lambdas")
    def cos(x: Array[Double], y: Array[Double]) =
      math.abs(x.zip(y).map { case (p, q) => p * q }.sum)
    assert(cos(comps(0)._1, a) > 0.99, "PC1 must align with the wide axis")
    assert(cos(comps(1)._1, b) > 0.99, "PC2 must align with the narrow axis")
    assert(cos(comps(0)._1, comps(1)._1) < 1e-6, "components must be orthogonal")
    assert(lambdas(2) < 0.01, "PC3 is noise-floor only")
  }

  test("deflation past the matrix rank returns lambda 0, not a crash") {
    import spark.implicits._
    // rank-1 covariance that deflation zeroes EXACTLY: +-1 on axis 0
    val vecs = Seq(Seq(1.0, 0.0), Seq(-1.0, 0.0))
    val (_, comps) = Pca.topComponents(vecs.toDF("v"), "v", dim = 2, k = 2)
    assert(math.abs(comps(0)._2 - 2.0) < 1e-12, s"lambda1: ${comps(0)._2}")
    assert(comps(1)._2 == 0.0, s"beyond-rank eigenvalue must be 0: ${comps(1)._2}")
    // an all-constant corpus (zero covariance outright) also solves
    val const = Seq(Seq(3.0, 3.0), Seq(3.0, 3.0))
    val (_, c2) = Pca.topComponents(const.toDF("v"), "v", dim = 2, k = 1)
    assert(c2(0)._2 == 0.0, s"zero-variance corpus: ${c2(0)._2}")
  }

  test("project: mean-centered scores match the driver-side computation") {
    import spark.implicits._
    val dim = 4
    val rnd = new scala.util.Random(17L)
    val vecs = Seq.fill(200)(Vector.fill(dim)(rnd.nextDouble() * 3.0))
    val df = vecs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("id", "v")
    val (m, comps) = Pca.topComponents(df, "v", dim, 2)
    val mean = m.sum.map(_ / m.n)
    val out = Pca.project(df, "v", mean, comps.map(_._1))
      .select("id", "pc1", "pc2").collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    vecs.zipWithIndex.foreach { case (v, i) =>
      val centered = v.zip(mean).map { case (x, mu) => x - mu }
      val e1 = centered.zip(comps(0)._1).map { case (x, w) => x * w }.sum
      val e2 = centered.zip(comps(1)._1).map { case (x, w) => x * w }.sum
      val (g1, g2) = out(i.toLong)
      assert(math.abs(g1 - e1) < 1e-9 && math.abs(g2 - e2) < 1e-9,
        s"row $i: got ($g1, $g2), want ($e1, $e2)")
    }
    // sample variance of the pc1 scores equals the eigenvalue (that IS
    // what "explained variance" means — ties the projection to the solve)
    val scores = out.values.map(_._1).toSeq
    val mu = scores.sum / scores.size
    val varr = scores.map(x => (x - mu) * (x - mu)).sum / (scores.size - 1)
    assert(math.abs(varr - comps(0)._2) < 1e-6,
      s"Var(pc1) $varr != lambda1 ${comps(0)._2}")
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
