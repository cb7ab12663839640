package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Product-quantization primitives (Jégou, Douze, Schmid: "Product
  * Quantization for Nearest Neighbor Search", TPAMI 2011 — public method).
  *
  * A `dim`-dimensional vector is split into `m` contiguous sub-blocks of
  * `dim/m` components; each block is quantized independently to one of `ks`
  * codebook centroids (min-L2, ties to the lower code). A vector compresses
  * to `m` small codes (m bytes at ks ≤ 256 — 64× smaller than the raw
  * doubles); approximate dot products against a probe need only `m` table
  * lookups via the probe's per-block lookup table ([[PqLut]] / [[PqScore]]),
  * not `dim` multiplies.
  *
  * All three expressions are codegen'd scalar ops over plan-time codebooks —
  * the same zero-join, zero-shuffle shape as [[NearestCells]].
  */
case class PqEncode(child: Expression, books: Seq[Seq[Seq[Double]]])
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "pq_encode"

  @transient private lazy val m: Int = books.size
  @transient private lazy val ks: Int = books.head.size
  @transient private lazy val subDim: Int = books.head.head.size
  // flattened row-major: component i of centroid j of block b is
  // flat(((b*ks + j) * subDim) + i)
  @transient private lazy val flat: Array[Double] =
    books.flatten.flatten.toArray

  override def nullSafeEval(v: Any): Any =
    PqUtil.encode(v.asInstanceOf[ArrayData], flat, m, ks, subDim)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val util = PqUtil.getClass.getName.stripSuffix("$")
    val flatRef = ctx.addReferenceObj("pqBooks", flat, "double[]")
    defineCodeGen(ctx, ev, v => s"$util.encode($v, $flatRef, $m, $ks, $subDim)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Probe-side lookup table: `lut[b*ks + j] = dot(q_block_b, centroid_bj)` —
  * computed once per probe, then every candidate scores in `m` adds. */
case class PqLut(child: Expression, books: Seq[Seq[Seq[Double]]])
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "pq_lut"

  @transient private lazy val m: Int = books.size
  @transient private lazy val ks: Int = books.head.size
  @transient private lazy val subDim: Int = books.head.head.size
  @transient private lazy val flat: Array[Double] =
    books.flatten.flatten.toArray

  override def nullSafeEval(v: Any): Any =
    PqUtil.lut(v.asInstanceOf[ArrayData], flat, m, ks, subDim)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val util = PqUtil.getClass.getName.stripSuffix("$")
    val flatRef = ctx.addReferenceObj("pqBooks", flat, "double[]")
    defineCodeGen(ctx, ev, v => s"$util.lut($v, $flatRef, $m, $ks, $subDim)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Asymmetric-distance score: `Σ_b lut[b*ks + codes[b]]` — the approximate
  * dot product of the probe (via its LUT) with a PQ-encoded vector. */
case class PqScore(left: Expression, right: Expression, ks: Int)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "pq_score"

  override def nullSafeEval(codes: Any, lut: Any): Any =
    PqUtil.score(codes.asInstanceOf[ArrayData], lut.asInstanceOf[ArrayData], ks)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val util = PqUtil.getClass.getName.stripSuffix("$")
    defineCodeGen(ctx, ev, (c, l) => s"$util.score($c, $l, $ks)")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object PqUtil {

  /** Min-L2 code per block; ties resolve to the lower code (strict <).
    * Vectors shorter than m·subDim quantize their truncated prefix — the
    * missing components contribute the centroid's own energy identically
    * for every code, so the argmin is still well-defined. */
  def encode(v: ArrayData, flat: Array[Double], m: Int, ks: Int,
      subDim: Int): ArrayData = {
    val n = v.numElements()
    val out = new Array[Long](m)
    var b = 0
    while (b < m) {
      var best = 0
      var bestD = Double.MaxValue
      var j = 0
      while (j < ks) {
        var d = 0.0
        var i = 0
        val base = (b * ks + j) * subDim
        val off = b * subDim
        while (i < subDim) {
          val x = if (off + i < n) v.getDouble(off + i) else 0.0
          val diff = x - flat(base + i)
          d += diff * diff
          i += 1
        }
        if (d < bestD) { bestD = d; best = j }
        j += 1
      }
      out(b) = best.toLong
      b += 1
    }
    new GenericArrayData(out)
  }

  def lut(q: ArrayData, flat: Array[Double], m: Int, ks: Int,
      subDim: Int): ArrayData = {
    val n = q.numElements()
    val out = new Array[Double](m * ks)
    var b = 0
    while (b < m) {
      var j = 0
      while (j < ks) {
        var dot = 0.0
        var i = 0
        val base = (b * ks + j) * subDim
        val off = b * subDim
        while (i < subDim) {
          val x = if (off + i < n) q.getDouble(off + i) else 0.0
          dot += x * flat(base + i)
          i += 1
        }
        out(b * ks + j) = dot
        j += 1
      }
      b += 1
    }
    new GenericArrayData(out)
  }

  def score(codes: ArrayData, lut: ArrayData, ks: Int): Double = {
    val m = codes.numElements()
    // a code outside [0, ks) means the codes and LUT were built with
    // DIFFERENT ks: small indices would silently read another block's LUT
    // entry (plausible-but-wrong rankings), larger ones AIOOBE mid-job —
    // name the mismatch instead
    var acc = 0.0
    var b = 0
    while (b < m) {
      val c = codes.getLong(b).toInt
      require(c >= 0 && c < ks,
        s"pq_score: code $c at block $b outside [0, $ks) — codes and LUT " +
          "built with different ks")
      acc += lut.getDouble(b * ks + c)
      b += 1
    }
    acc
  }
}

object PqEncode {
  def of(v: Column, books: Seq[Seq[Seq[Double]]]): Column =
    ColumnBridge.column(PqEncode(ColumnBridge.expression(v), books))
}

object PqLut {
  def of(q: Column, books: Seq[Seq[Seq[Double]]]): Column =
    ColumnBridge.column(PqLut(ColumnBridge.expression(q), books))
}

object PqScore {
  def of(codes: Column, lut: Column, ks: Int): Column =
    ColumnBridge.column(
      PqScore(ColumnBridge.expression(codes), ColumnBridge.expression(lut), ks))
}
