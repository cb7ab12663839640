package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization of a string column — the canonical-composition
  * pass every text-curation pipeline runs before hashing or deduplicating:
  * visually-identical strings with different codepoint sequences (`é` vs
  * `e` + U+0301) otherwise hash apart and defeat exact dedup.
  *
  * Spark has no built-in normalizer, so this is a native codegen'd
  * `UnaryExpression` over `java.text.Normalizer` (in-JDK, Unicode-standard
  * NFC — the same algorithm DuckDB's `nfc_normalize` implements, so
  * results are oracle-comparable). The already-NFC fast path
  * (`Normalizer.isNormalized`) skips the String round-trip for the common
  * all-ASCII row, keeping the hot loop allocation-free. */
case class NfcNormalize(child: Expression) extends UnaryExpression
    with org.apache.spark.sql.graft.GraftInputTypes {

  override def graftInputTypes: Seq[DataType] = Seq(StringType)

  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"

  override def nullSafeEval(s: Any): Any =
    NfcNormalizeUtil.nfc(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val util = NfcNormalizeUtil.getClass.getName.stripSuffix("$")
    defineCodeGen(ctx, ev, s => s"$util.nfc($s)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NfcNormalizeUtil {
  import java.text.Normalizer

  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    if (Normalizer.isNormalized(str, Normalizer.Form.NFC)) s
    else UTF8String.fromString(Normalizer.normalize(str, Normalizer.Form.NFC))
  }
}

object NfcNormalize {
  def of(c: Column): Column =
    ColumnBridge.column(NfcNormalize(ColumnBridge.expression(c)))
}
