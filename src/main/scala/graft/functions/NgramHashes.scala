package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** h60 hashes of the word n-grams of a token array, in one native pass.
  *
  * Value-identical to
  * `transform(shingles_n(toks), s -> h60(s))` with
  * `shingles_n = transform(sequence(0,size-n), i -> concat_ws(" ", t[i..i+n-1]))`
  * — the digest consumes the same space-joined byte stream — but builds no
  * intermediate shingle strings and stays inside whole-stage codegen.
  */
case class NgramHashes(child: Expression, n: Int) extends UnaryExpression
    with org.apache.spark.sql.graft.GraftInputTypes {

  override def graftInputTypes: Seq[DataType] = Seq(ArrayType(StringType))

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "ngram_hashes"

  override def nullSafeEval(toks: Any): Any =
    NgramHashesUtil.hashes(toks.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val util = NgramHashesUtil.getClass.getName.stripSuffix("$")
    defineCodeGen(ctx, ev, s => s"$util.hashes($s, $n)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NgramHashesUtil {
  private val digests = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest =
      MessageDigest.getInstance("MD5")
  }
  private val Space = " ".getBytes("UTF-8")

  def hashes(toks: ArrayData, n: Int): ArrayData = {
    val md = digests.get()
    val total = toks.numElements()
    val count = math.max(total - n + 1, 0)
    val out = new Array[Long](count)
    // token bytes fetched once, reused across the n windows containing them
    val bytes = Array.tabulate(total)(i => toks.getUTF8String(i).getBytes)
    var i = 0
    while (i < count) {
      md.reset()
      var j = 0
      while (j < n) {
        if (j > 0) md.update(Space)
        md.update(bytes(i + j))
        j += 1
      }
      val d = md.digest()
      var v = 0L
      var b = 0
      while (b < 7) { v = (v << 8) | (d(b) & 0xffL); b += 1 }
      out(i) = (v << 4) | ((d(7) >> 4) & 0xfL)
      i += 1
    }
    new GenericArrayData(out)
  }
}

object NgramHashes {
  def of(toks: Column, n: Int): Column =
    ColumnBridge.column(NgramHashes(ColumnBridge.expression(toks), n))
}
