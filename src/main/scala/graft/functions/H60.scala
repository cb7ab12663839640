package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The engine-agnostic 60-bit md5 hash, computed digest-direct.
  *
  * Value-identical to `conv(substring(md5(s),1,15),16,10)::long` — i.e. the
  * first 15 hex chars of the md5 = the first 7 digest bytes plus the high
  * nibble of byte 7 — but skips the hex-string render and radix re-parse, and
  * participates in whole-stage codegen. The DuckDB oracle equivalent stays
  * `('0x'||substr(md5(s),1,15))::BIGINT`.
  */
case class H60(child: Expression) extends UnaryExpression
    with org.apache.spark.sql.graft.GraftInputTypes {

  override def graftInputTypes: Seq[DataType] = Seq(StringType)

  override def dataType: DataType = LongType
  override def prettyName: String = "h60"

  override def nullSafeEval(s: Any): Any =
    H60Util.hash(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val util = H60Util.getClass.getName.stripSuffix("$")
    defineCodeGen(ctx, ev, s => s"$util.hash($s)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object H60Util {
  private val digests = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest =
      MessageDigest.getInstance("MD5")
  }

  def hash(s: UTF8String): Long = {
    val md = digests.get()
    md.reset()
    val d = md.digest(s.getBytes)
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    (v << 4) | ((d(7) >> 4) & 0xfL)
  }
}

object H60 {
  def of(c: Column): Column =
    ColumnBridge.column(H60(ColumnBridge.expression(c)))
}
