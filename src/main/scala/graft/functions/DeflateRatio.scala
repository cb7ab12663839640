package graft.functions

import java.util.zip.Deflater

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Static helper the generated code calls. */
object DeflateRatioUtil {
  /** DEFLATE-compressed size of a string's UTF-8 bytes (level 6, raw
    * deflate, no zlib/gzip header — pure entropy signal, no framing
    * constant). Deterministic for a given input across JVMs: level-6
    * DEFLATE in `java.util.zip` is the bundled zlib, and the same bytes
    * always produce the same stream on this platform. Empty/null → 0. */
  def compressedSize(s: UTF8String): Long = {
    if (s == null) return 0L
    val bytes = s.getBytes
    if (bytes.isEmpty) return 0L
    val d = new Deflater(6, true)
    try {
      d.setInput(bytes)
      d.finish()
      val buf = new Array[Byte](8192)
      var total = 0L
      while (!d.finished()) total += d.deflate(buf)
      total
    } finally d.end()
  }
}

/** Compressed-size expression for the compressibility quality signal —
  * natural-language text compresses to ~30-60% while boilerplate, spam
  * keyword stuffing, and repeated templates compress far harder, and
  * random/encrypted junk barely compresses at all; ratio thresholds on
  * both ends are a standard corpus-curation gate. Codegen'd so the scan
  * stays inside whole-stage codegen (the Deflater call is the work; the
  * expression adds no eval fence). */
case class DeflateSize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = false // null ⇒ 0, total like ExtractPrice

  override def eval(input: InternalRow): Any =
    DeflateRatioUtil.compressedSize(child.eval(input).asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    val util = DeflateRatioUtil.getClass.getName.stripSuffix("$")
    ev.copy(
      code = code"""
        ${c.code}
        long ${ev.value} = $util.compressedSize(${c.isNull} ? null : ${c.value});""",
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object DeflateSize {
  /** Column-API entry point: compressed byte count of a string column. */
  def of(c: Column): Column =
    ColumnBridge.column(DeflateSize(ColumnBridge.expression(c)))

  /** Compressibility in integer ppm: `10⁶ · compressed / original` UTF-8
    * byte counts, round-half-up; 0 for empty. Low ppm = highly repetitive
    * text, ~10⁶ = incompressible junk. (Exact while 2·10⁶·compressed
    * < 2⁵³ — any document under ~4 GB.) */
  def ratioPpm(c: Column): Column = {
    import org.apache.spark.sql.functions._
    val orig = octet_length(c).cast("long")
    val comp = of(c)
    when(orig === 0L, lit(0L)).otherwise(
      floor((lit(2000000L) * comp + orig).cast("double") /
        (orig.cast("double") * 2.0)).cast("long"))
  }
}
