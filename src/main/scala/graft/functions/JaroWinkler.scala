package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd Jaro-Winkler similarity — the classic algorithm (Winkler 1990):
  * jaro = (m/|a| + m/|b| + (m−t)/m)/3 over window-limited matches with
  * half-transposition counting, then the ≤4-char common-prefix boost
  * `jaro + 0.1·l·(1−jaro)` applied when jaro > 0.7. Conventions mirror
  * DuckDB's `jaro_winkler_similarity` exactly (verified by fuzz against it,
  * incl. empty-string → 0.0), so oracle queries hash-match. Byte-wise on
  * UTF-8 — identical to char-wise on the ASCII corpus. */
case class JaroWinkler(left: Expression, right: Expression)
    extends BinaryExpression with org.apache.spark.sql.graft.GraftInputTypes {

  override def graftInputTypes: Seq[DataType] = Seq(StringType, StringType)

  override def dataType: DataType = DoubleType
  override def prettyName: String = "jaro_winkler"

  override def nullSafeEval(a: Any, b: Any): Any =
    JaroWinklerUtil.jw(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val util = JaroWinklerUtil.getClass.getName.stripSuffix("$")
    defineCodeGen(ctx, ev, (a, b) => s"$util.jw($a, $b)")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object JaroWinklerUtil {

  def jw(ua: UTF8String, ub: UTF8String): Double = {
    val a = ua.getBytes
    val b = ub.getBytes
    val l1 = a.length
    val l2 = b.length
    if (l1 == 0 || l2 == 0) return 0.0 // DuckDB convention (incl. both empty)
    val window = math.max(math.max(l1, l2) / 2 - 1, 0)
    val f1 = new Array[Boolean](l1)
    val f2 = new Array[Boolean](l2)
    var m = 0
    var i = 0
    while (i < l1) {
      val lo = math.max(0, i - window)
      val hi = math.min(l2 - 1, i + window)
      var j = lo
      var done = false
      while (j <= hi && !done) {
        if (!f2(j) && a(i) == b(j)) {
          f1(i) = true; f2(j) = true; m += 1; done = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var t = 0
    var k = 0
    i = 0
    while (i < l1) {
      if (f1(i)) {
        while (!f2(k)) k += 1
        if (a(i) != b(k)) t += 1
        k += 1
      }
      i += 1
    }
    t /= 2
    val jaro = (m.toDouble / l1 + m.toDouble / l2 + (m - t).toDouble / m) / 3.0
    var l = 0
    while (l < 4 && l < l1 && l < l2 && a(l) == b(l)) l += 1
    if (jaro > 0.7) jaro + l * 0.1 * (1.0 - jaro) else jaro
  }
}

object JaroWinkler {
  def of(a: Column, b: Column): Column =
    ColumnBridge.column(
      JaroWinkler(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
