package graft.ops

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{DataFrame, Encoder}
import org.apache.spark.sql.functions._

/** Distributed PCA building blocks with the classic n×d → d² split: the
  * cluster reduces the corpus to second moments (count, per-dim sums, and
  * the upper-triangular Gram matrix Σ v·vᵀ) in ONE pass with map-side
  * combine — O(d²) state per partition, one O(d²) row to the driver — and
  * the driver eigensolves the tiny d×d covariance (power iteration).
  * For d = 64 the shipped state is 2 KB of sums + 16 KB of Gram per
  * partition; the input size n never appears anywhere after the scan.
  */
object Pca {

  /** Second-moment summary: `sum` has d entries, `gram` is the upper
    * triangle (d·(d+1)/2 entries, row-major: (i,j) with j ≥ i at index
    * i·d − i·(i−1)/2 + (j − i)). */
  case class Moments(n: Long, sum: Seq[Double], gram: Seq[Double])

  /** Internal MUTABLE aggregation buffer for [[MomentsAgg]]: array-backed
    * so reduce/merge update in place instead of copying O(d²) immutable
    * vectors per input row (the standard Aggregator idiom). */
  case class MomentsBuf(var n: Long, sum: Array[Double], gram: Array[Double])

  /** Merge-associative moments fold (the map-side-combine shape). Vectors
    * shorter than `dim` are zero-padded; longer ones truncated. */
  class MomentsAgg(dim: Int) extends Aggregator[Seq[Double], MomentsBuf, Moments] {
    private val gramLen = dim * (dim + 1) / 2

    override def zero: MomentsBuf =
      MomentsBuf(0L, new Array[Double](dim), new Array[Double](gramLen))

    override def reduce(b: MomentsBuf, v: Seq[Double]): MomentsBuf = {
      val s = b.sum
      val g = b.gram
      val x = new Array[Double](dim)
      var i = 0
      while (i < dim && i < v.length) { x(i) = v(i); i += 1 }
      i = 0
      var k = 0
      while (i < dim) {
        s(i) += x(i)
        var j = i
        while (j < dim) { g(k) += x(i) * x(j); j += 1; k += 1 }
        i += 1
      }
      b.n += 1
      b
    }

    override def merge(a: MomentsBuf, b: MomentsBuf): MomentsBuf = {
      var i = 0
      while (i < dim) { a.sum(i) += b.sum(i); i += 1 }
      i = 0
      while (i < gramLen) { a.gram(i) += b.gram(i); i += 1 }
      a.n += b.n
      a
    }

    override def finish(m: MomentsBuf): Moments =
      Moments(m.n, m.sum.toVector, m.gram.toVector)
    override def bufferEncoder: Encoder[MomentsBuf] = ExpressionEncoder[MomentsBuf]()
    override def outputEncoder: Encoder[Moments] = ExpressionEncoder[Moments]()
  }

  /** One distributed pass over `vecCol` (array<double>-castable) → moments.
    * NULL vectors are skipped (SQL-aggregate convention: no information,
    * not a crash) and NULL elements read as 0.0 — the zero-padding rule
    * already applied to short vectors. */
  def moments(df: DataFrame, vecCol: String, dim: Int): Moments = {
    import df.sparkSession.implicits._
    cleanVecs(df, vecCol, "__v")
      .select("__v")
      .as[Seq[Double]]
      .select(new MomentsAgg(dim).toColumn)
      .head()
  }

  /** THE vector-prep contract, in one place: cast to array<double>, drop
    * whole-null vectors (SQL-aggregate convention), read null ELEMENTS as
    * 0.0 (the zero-padding rule). Other columns ride through untouched.
    * [[moments]] and the streaming [[graft.streaming.EmbedDrift]] both go
    * through here so batch reference and windowed stream can never
    * disagree on null handling. */
  private[graft] def cleanVecs(
      df: DataFrame, vecCol: String, outCol: String): DataFrame =
    df.withColumn(outCol, col(vecCol).cast("array<double>"))
      .filter(col(outCol).isNotNull)
      .withColumn(outCol, transform(col(outCol), x => coalesce(x, lit(0.0))))

  /** Dense d×d sample covariance from the moments (driver-side, O(d²)). */
  def covariance(m: Moments, dim: Int): Array[Array[Double]] = {
    require(m.n >= 2, s"need n >= 2, got ${m.n}")
    val c = Array.ofDim[Double](dim, dim)
    val n = m.n.toDouble
    var i = 0
    var k = 0
    while (i < dim) {
      var j = i
      while (j < dim) {
        val cov = (m.gram(k) - m.sum(i) * m.sum(j) / n) / (n - 1)
        c(i)(j) = cov
        c(j)(i) = cov
        j += 1; k += 1
      }
      i += 1
    }
    c
  }

  /** Top principal component of `vecCol` by power iteration on the
    * driver-side covariance: returns (unit eigenvector, eigenvalue).
    * Deterministic start (axis of largest variance), so results are
    * reproducible run to run. */
  def principalComponent(
      df: DataFrame, vecCol: String, dim: Int, iters: Int = 50)
      : (Array[Double], Double) =
    powerIterate(covariance(moments(df, vecCol, dim), dim), dim, iters)

  /** Power iteration on a symmetric PSD matrix with the deterministic
    * largest-diagonal start (never orthogonal to the top eigenvector
    * unless that axis has exactly zero loading). */
  private def powerIterate(c: Array[Array[Double]], dim: Int, iters: Int)
      : (Array[Double], Double) = {
    var v = new Array[Double](dim)
    var best = 0
    var i = 1
    while (i < dim) { if (c(i)(i) > c(best)(best)) best = i; i += 1 }
    v(best) = 1.0
    var lambda = 0.0
    var it = 0
    while (it < iters) {
      val w = new Array[Double](dim)
      i = 0
      while (i < dim) {
        var j = 0
        var acc = 0.0
        while (j < dim) { acc += c(i)(j) * v(j); j += 1 }
        w(i) = acc
        i += 1
      }
      val norm = math.sqrt(w.map(x => x * x).sum)
      // an (exactly) zero matrix — deflation past the rank, or an
      // all-constant input — has no direction to find: return the
      // deterministic start axis with eigenvalue 0 instead of aborting
      // the whole solve (the documented beyond-rank contract)
      if (norm == 0.0) return (v, 0.0)
      i = 0
      while (i < dim) { w(i) /= norm; i += 1 }
      lambda = norm
      v = w
      it += 1
    }
    (v, lambda)
  }

  /** Top-k principal components by Hotelling deflation: power-iterate,
    * subtract `λ·v·vᵀ`, repeat — the standard driver-side eigensolve for
    * the k≪d regime (k·iters·d² flops on a d×d matrix that already fits
    * in one cache line row; the corpus was touched exactly once, by
    * [[moments]]). Returns components with non-increasing eigenvalues.
    * Requires k ≤ dim; components beyond the matrix rank come back with
    * eigenvalue ≈ 0 and an arbitrary (but deterministic) direction. */
  def topComponents(
      df: DataFrame, vecCol: String, dim: Int, k: Int, iters: Int = 100)
      : (Moments, Seq[(Array[Double], Double)]) = {
    require(k >= 1 && k <= dim, s"k must be in [1, $dim]: $k")
    val m = moments(df, vecCol, dim)
    val c = covariance(m, dim)
    val out = Seq.newBuilder[(Array[Double], Double)]
    var r = 0
    while (r < k) {
      val (v, lambda) = powerIterate(c, dim, iters)
      out += ((v, lambda))
      var i = 0
      while (i < dim) {
        var j = 0
        while (j < dim) { c(i)(j) -= lambda * v(i) * v(j); j += 1 }
        i += 1
      }
      r += 1
    }
    (m, out.result())
  }

  /** Project `vecCol` onto `components`, mean-centered: appends
    * `pc1..pck` columns where `pcᵢ = (v − μ)·wᵢ = v·wᵢ − μ·wᵢ` — the
    * μ·wᵢ term is a driver-side scalar, so each projection is ONE
    * codegen'd [[graft.functions.Dot]] against a broadcast literal
    * vector riding the scan: zero shuffle, zero UDF, corpus touched
    * once however many components are kept. This is the
    * dimensionality-reduction / whitening front half of embedding
    * pipelines (visualization, cheap pre-filters ahead of exact ANN). */
  def project(
      df: DataFrame,
      vecCol: String,
      mean: Seq[Double],
      components: Seq[Array[Double]],
      prefix: String = "pc"): DataFrame = {
    val v = col(vecCol).cast("array<double>")
    components.zipWithIndex.foldLeft(df) { case (d, (w, i)) =>
      val meanDot = mean.zip(w).map { case (a, b) => a * b }.sum
      d.withColumn(s"$prefix${i + 1}",
        graft.functions.Dot.of(v, typedLit(w.toSeq)) - lit(meanDot))
    }
  }
}
