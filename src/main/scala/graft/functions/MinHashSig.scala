package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** One-pass k-permutation MinHash signature over an array<string> of
  * shingles.
  *
  * Value-identical to the declarative
  * `transform(sequence(1,k), i -> array_min(transform(sh, s -> h60(i||':'||s))))`
  * (the salted digest consumes the identical `"i:shingle"` byte stream), but
  * computes all k minima in a single pass per row with a reused MessageDigest
  * and no per-salt string allocation — the nested-HOF form interprets
  * k×|shingles| lambda closures per row and fences whole-stage codegen.
  */
case class MinHashSig(child: Expression, k: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  override def nullSafeEval(sh: Any): Any =
    MinHashSigUtil.sig(sh.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val util = MinHashSigUtil.getClass.getName.stripSuffix("$")
    defineCodeGen(ctx, ev, s => s"$util.sig($s, $k)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHashSigUtil {
  private val digests = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest =
      MessageDigest.getInstance("MD5")
  }

  def sig(shingles: ArrayData, k: Int): ArrayData = {
    val md = digests.get()
    val n = shingles.numElements()
    val mins = Array.fill(k)(Long.MaxValue)
    val salts = Array.tabulate(k)(i => s"${i + 1}:".getBytes("UTF-8"))
    var j = 0
    while (j < n) {
      val sBytes = shingles.getUTF8String(j).getBytes
      var i = 0
      while (i < k) {
        md.reset()
        md.update(salts(i))
        md.update(sBytes)
        val d = md.digest()
        var v = 0L
        var b = 0
        while (b < 7) { v = (v << 8) | (d(b) & 0xffL); b += 1 }
        v = (v << 4) | ((d(7) >> 4) & 0xfL)
        if (v < mins(i)) mins(i) = v
        i += 1
      }
      j += 1
    }
    new GenericArrayData(mins)
  }
}

object MinHashSig {
  def of(shingles: Column, k: Int): Column =
    ColumnBridge.column(MinHashSig(ColumnBridge.expression(shingles), k))
}
