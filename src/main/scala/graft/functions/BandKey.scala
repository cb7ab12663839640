package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Sign-bit LSH band key over HASHED pseudo-random hyperplanes — the
  * many-plane companion to [[LshBucket]].
  *
  * Why a second plane family: [[LshBucket]]'s affine stream
  * `(1103515245*k + 12345) % 2001` has period 667 in the component index k
  * (1764·667 ≡ 0 mod 2001), so planes beyond index ~10 are shifted windows
  * of earlier planes — harmless at ≤ 8 bits (k < 640), but a banded caller
  * drawing 96+ planes gets heavily correlated sign bits: measured pair
  * collisions at 12 bits ran 13.5× the uniform expectation on the testdata
  * embeddings, flattening toward a floor at ~0.7×/bit instead of 0.5×/bit
  * and turning the banded near-dup candidate volume quadratic. Band b of a
  * banded caller uses planes `planeOffset = b*bits`, so bands draw disjoint
  * plane families.
  *
  * Plane component k = (planeOffset+j)*dim + i runs through a SplitMix-style
  * avalanche (add-multiply-xor-shift twice, all mod 2^31 so every
  * intermediate fits a 63-bit signed integer in ANY engine — the DuckDB
  * oracle in ExtQueries.q18Sql replicates it operator-for-operator):
  * measured collisions drop to ~1.4× uniform and halve per added bit, the
  * premise the count-adaptive band sizing relies on. Bit j of the key is
  * set when plane j's dot product with the vector is positive; fold order
  * is in-order over components, identical to the oracle's list_sum.
  */
case class BandKey(child: Expression, bits: Int, dim: Int, planeOffset: Int)
    extends UnaryExpression
    with org.apache.spark.sql.graft.GraftInputTypes {

  // validated HERE, not only in the builder: a direct construction (e.g. a
  // future SQL registration) must not bypass the hash's safe range —
  // beyond it coef's first multiply wraps negative and band keys silently
  // correlate (the exact defect this plane family replaced)
  require(planeOffset >= 0 && bits >= 1 && dim >= 1 &&
    (planeOffset.toLong + bits) * dim < 200000000L,
    s"band_key: plane index out of the hash's safe range: " +
      s"offset=$planeOffset bits=$bits dim=$dim")

  override def graftInputTypes: Seq[DataType] =
    Seq(ArrayType(DoubleType))

  override def dataType: DataType = LongType
  override def prettyName: String = "band_key"

  override def nullSafeEval(v: Any): Any =
    BandKeyUtil.key(v.asInstanceOf[ArrayData], bits, dim, planeOffset)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val util = BandKeyUtil.getClass.getName.stripSuffix("$")
    defineCodeGen(ctx, ev, v => s"$util.key($v, $bits, $dim, $planeOffset)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BandKeyUtil {
  /** Hashed plane coefficient in [-1000, 1000]. Largest intermediate is
    * (k + 2654435761) * 3214471129 — safe for k up to ~2·10^8, far above
    * any (planeOffset + bits) * dim a banded caller can reach. */
  def coef(k: Long): Double = {
    val t1 = k + 2654435761L
    val t2 = (t1 * 3214471129L) % 2147483648L
    val t3 = t2 ^ (t2 >> 15)
    val t4 = (t3 * 2497366283L) % 2147483648L
    val t5 = t4 ^ (t4 >> 13)
    (t5 % 2001L - 1000L).toDouble
  }

  def key(v: ArrayData, bits: Int, dim: Int, planeOffset: Int): Long = {
    val n = math.min(dim, v.numElements())
    var acc = 0L
    var j = 0
    while (j < bits) {
      var dot = 0.0
      var i = 0
      while (i < n) {
        dot += coef((planeOffset + j).toLong * dim + i) * v.getDouble(i)
        i += 1
      }
      if (dot > 0.0) acc += (1L << j)
      j += 1
    }
    acc
  }
}

object BandKey {
  def of(v: Column, bits: Int, dim: Int, planeOffset: Int): Column =
    ColumnBridge.column(
      BandKey(ColumnBridge.expression(v), bits, dim, planeOffset))
}
