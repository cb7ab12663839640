package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{BooleanType, DataType}
import org.apache.spark.unsafe.types.UTF8String

/** Row-level DELETION-VECTOR membership test — the read-side half of
  * merge-on-read DML ([[graft.ops.TableManifest]] `"dvs"` section): TRUE
  * when the row at `rowIndex` of the data file named by `filePath` is
  * marked deleted. The deletion bitmaps ride a BROADCAST
  * [[graft.ops.Dv.Index]]: basename buckets of (dir-relative name,
  * positions) entries behind the table's qualified root prefix, so file
  * identity resolves by EXACT relative path (one live file's relative
  * path being a suffix of another's can never bind positions to the
  * wrong file — the round-18 identity fix; a foreign path rendering
  * falls back to longest-suffix). Scan-side cost: one hash lookup per
  * row + (only on a bucket hit) a prefix strip + string compare +
  * binary search, inside whole-stage codegen — no join, no shuffle.
  * Reads wrap scans of DV'd files with `Filter(!DvDeleted(file, idx))`;
  * files without a DV never enter the branch at all (the scan is split
  * DV'd/clean upstream).
  *
  * Null-safe: a NULL path or index (never produced by `_metadata`) is
  * simply "not deleted" — the expression can never invent a deletion. */
object DvDeletedUtil {
  def deleted(dvs: graft.ops.Dv.Index,
      path: UTF8String, rowIndex: Long): Boolean = {
    if (path == null) return false
    val arr = dvs.positionsOf(path.toString)
    arr != null && java.util.Arrays.binarySearch(arr, rowIndex) >= 0
  }
}

case class DvDeleted(left: Expression, right: Expression,
    dvs: Broadcast[graft.ops.Dv.Index])
  extends BinaryExpression {

  override def dataType: DataType = BooleanType
  override def nullable: Boolean = false

  /** The executor-side lookup the generated code calls (resolves the
    * broadcast lazily on the executor, like any broadcast reference). */
  def isDeleted(path: UTF8String, rowIndex: Long): Boolean =
    DvDeletedUtil.deleted(dvs.value, path, rowIndex)

  override def eval(input: InternalRow): Any = {
    val p = left.eval(input)
    val i = right.eval(input)
    if (p == null || i == null) false
    else isDeleted(p.asInstanceOf[UTF8String], i.asInstanceOf[Long])
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val l = left.genCode(ctx)
    val r = right.genCode(ctx)
    val self = ctx.addReferenceObj("dvDeleted", this, classOf[DvDeleted].getName)
    ev.copy(
      code = code"""
        ${l.code}
        ${r.code}
        boolean ${ev.value} = !${l.isNull} && !${r.isNull} &&
          $self.isDeleted(${l.value}, ${r.value});""",
      isNull = FalseLiteral)
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object DvDeleted {
  /** Column-API entry: `DvDeleted.of($"_metadata.file_path",
    * $"_metadata.row_index", bc)`. */
  def of(path: Column, rowIndex: Column,
      dvs: Broadcast[graft.ops.Dv.Index]): Column =
    ColumnBridge.column(DvDeleted(
      ColumnBridge.expression(path), ColumnBridge.expression(rowIndex), dvs))
}
