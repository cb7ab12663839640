package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Sign-bit LSH bucket id over closed-form pseudo-random hyperplanes for an
  * array<double> vector.
  *
  * Plane j component i = `(1103515245*(j*dim+i) + 12345) % 2001 - 1000`;
  * bit j of the bucket is set when plane j's dot product with the vector is
  * positive — identical arithmetic (and fold order) to the declarative
  * aggregate/sequence form and to the DuckDB oracle SQL in ExtQueries.q19Sql.
  *
  * Plane-count limit: the affine component stream has period 667 in the
  * index (1764·667 ≡ 0 mod 2001), so planes beyond ~10 (at dim 64) repeat
  * earlier planes' components shifted — fine for the ≤ 8-bit bucket ids
  * this family serves, but a caller needing MANY planes (banding) must use
  * [[BandKey]]'s hashed plane family instead.
  */
case class LshBucket(child: Expression, bits: Int, dim: Int)
    extends UnaryExpression with org.apache.spark.sql.graft.GraftInputTypes {

  override def graftInputTypes: Seq[DataType] = Seq(ArrayType(DoubleType))

  override def dataType: DataType = LongType
  override def prettyName: String = "lsh_bucket"

  override def nullSafeEval(v: Any): Any =
    LshBucketUtil.bucket(v.asInstanceOf[ArrayData], bits, dim)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val util = LshBucketUtil.getClass.getName.stripSuffix("$")
    defineCodeGen(ctx, ev, v => s"$util.bucket($v, $bits, $dim)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object LshBucketUtil {
  def bucket(v: ArrayData, bits: Int, dim: Int): Long = {
    val n = math.min(dim, v.numElements())
    var acc = 0L
    var j = 0
    while (j < bits) {
      var dot = 0.0
      var i = 0
      while (i < n) {
        val c = ((1103515245L * (j * dim + i) + 12345L) % 2001L - 1000L).toDouble
        dot += c * v.getDouble(i)
        i += 1
      }
      if (dot > 0.0) acc += (1L << j)
      j += 1
    }
    acc
  }
}

object LshBucket {
  def of(v: Column, bits: Int, dim: Int): Column =
    ColumnBridge.column(LshBucket(ColumnBridge.expression(v), bits, dim))
}
