package graft.functions

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.Encoder

/** Typed Aggregator computing the element-wise mean of array<double>
  * vectors (a cluster centroid) — the §2.9 custom-UDAF slot, the
  * refinement step of an IVF similarity index, and (via
  * `functions.udaf`) the per-group pooling aggregate of
  * [[graft.ops.Similarity.pooledQuantizedCentroids]].
  *
  * Merge-associative partial aggregation: each partition folds locally
  * (sum + count), partials merge pairwise — the standard map-side-combine
  * shape that scales to any partition count.
  *
  * The buffer is a raw `Array[Double]` mutated IN PLACE by reduce/merge
  * (allowed by the Aggregator contract — the engine owns each buffer
  * instance exclusively between serialization points). The previous
  * immutable-`Vector` buffer allocated two persistent collections per
  * input ROW, which dominated the aggregate's cost at corpus scale;
  * `zero` must allocate a fresh array per group for the same reason
  * mutation is legal.
  */
class CentroidAgg(dim: Int)
    extends Aggregator[Seq[Double], CentroidAgg.Buf, Seq[Double]] {
  import CentroidAgg.Buf

  override def zero: Buf = Buf(new Array[Double](dim), 0L)

  override def reduce(b: Buf, v: Seq[Double]): Buf = {
    // a null vector would NPE opaquely; a short vector would contribute
    // zeros for its missing components while still counting toward n,
    // silently biasing the centroid toward the origin — both are corrupt
    // input for a fixed-dim aggregate, so fail with the dimensions named
    require(v != null && v.length == dim,
      s"CentroidAgg(dim=$dim): input vector is " +
        (if (v == null) "null" else s"length ${v.length}"))
    val s = b.sum
    var i = 0
    while (i < dim) { s(i) += v(i); i += 1 }
    Buf(s, b.n + 1)
  }

  override def merge(a: Buf, b: Buf): Buf = {
    val s = a.sum
    var i = 0
    while (i < dim) { s(i) += b.sum(i); i += 1 }
    Buf(s, a.n + b.n)
  }

  override def finish(b: Buf): Seq[Double] =
    if (b.n == 0) b.sum.toIndexedSeq else b.sum.map(_ / b.n).toIndexedSeq

  override def bufferEncoder: Encoder[Buf] = ExpressionEncoder[Buf]()
  override def outputEncoder: Encoder[Seq[Double]] =
    ExpressionEncoder[Seq[Double]]()
}

object CentroidAgg {
  case class Buf(sum: Array[Double], n: Long)
}
