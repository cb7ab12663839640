package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** k-permutation MinHash signature over an array<long> of (already hashed)
  * shingles — one base hash per shingle, k affine re-permutations:
  *
  *   h_i(x) = ((2i+1)·(x mod 4294967291) + i·12345) mod 1000000007,  i ∈ 1..k
  *
  * All intermediates stay below 2^38, so the identical BIGINT arithmetic runs
  * overflow-free in DuckDB (which errors on overflow) and Spark (which would
  * wrap silently) — the oracle in ExtQueries.q15Sql is this exact formula.
  * One md5 per shingle (via [[NgramHashes]]) replaces the k-salted-digest
  * variant: same banding behavior, 16× less hashing.
  */
case class MinHashSig(child: Expression, k: Int) extends UnaryExpression
    with org.apache.spark.sql.graft.GraftInputTypes {

  override def graftInputTypes: Seq[DataType] = Seq(ArrayType(LongType))
  // validated HERE, not only in a builder: the SQL registration constructs
  // the case class directly, and k = -1 would otherwise throw
  // NegativeArraySizeException per row at execution
  require(k >= 1, s"minhash_sig: k must be >= 1, got $k")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  override def nullSafeEval(hs: Any): Any =
    MinHashSigUtil.sig(hs.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val util = MinHashSigUtil.getClass.getName.stripSuffix("$")
    defineCodeGen(ctx, ev, s => s"$util.sig($s, $k)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHashSigUtil {
  final val P32 = 4294967291L // largest 32-bit prime
  final val P = 1000000007L

  def sig(hashes: ArrayData, k: Int): ArrayData = {
    val n = hashes.numElements()
    val mins = Array.fill(k)(Long.MaxValue)
    var j = 0
    while (j < n) {
      val x32 = hashes.getLong(j) % P32
      var i = 1
      while (i <= k) {
        val v = ((2L * i + 1L) * x32 + i * 12345L) % P
        if (v < mins(i - 1)) mins(i - 1) = v
        i += 1
      }
      j += 1
    }
    new GenericArrayData(mins)
  }
}

object MinHashSig {
  def of(hashedShingles: Column, k: Int): Column =
    ColumnBridge.column(MinHashSig(ColumnBridge.expression(hashedShingles), k))
}
