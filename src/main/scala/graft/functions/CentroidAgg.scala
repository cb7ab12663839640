package graft.functions

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.Encoder

/** Typed Aggregator computing the element-wise mean of array<double>
  * vectors (a cluster centroid) — the §2.9 custom-UDAF slot and the
  * refinement step of an IVF similarity index.
  *
  * Merge-associative partial aggregation: each partition folds locally
  * (sum + count), partials merge pairwise — the standard map-side-combine
  * shape that scales to any partition count.
  */
class CentroidAgg(dim: Int)
    extends Aggregator[Seq[Double], CentroidAgg.Buf, Seq[Double]] {
  import CentroidAgg.Buf

  override def zero: Buf = Buf(Vector.fill(dim)(0.0), 0L)

  override def reduce(b: Buf, v: Seq[Double]): Buf = {
    // a null vector would NPE opaquely; a short vector would contribute
    // zeros for its missing components while still counting toward n,
    // silently biasing the centroid toward the origin — both are corrupt
    // input for a fixed-dim aggregate, so fail with the dimensions named
    require(v != null && v.length == dim,
      s"CentroidAgg(dim=$dim): input vector is " +
        (if (v == null) "null" else s"length ${v.length}"))
    val s = b.sum.toArray
    var i = 0
    while (i < dim) { s(i) += v(i); i += 1 }
    Buf(s.toVector, b.n + 1)
  }

  override def merge(a: Buf, b: Buf): Buf = {
    val s = a.sum.toArray
    var i = 0
    while (i < dim) { s(i) += b.sum(i); i += 1 }
    Buf(s.toVector, a.n + b.n)
  }

  override def finish(b: Buf): Seq[Double] =
    if (b.n == 0) b.sum else b.sum.map(_ / b.n)

  override def bufferEncoder: Encoder[Buf] = ExpressionEncoder[Buf]()
  override def outputEncoder: Encoder[Seq[Double]] =
    ExpressionEncoder[Seq[Double]]()
}

object CentroidAgg {
  case class Buf(sum: Seq[Double], n: Long)
}
