package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.ImplicitCastInputTypes
import org.apache.spark.sql.types.{AbstractDataType, DataType}

/** Bridge trait for declaring `inputTypes` from graft's expression package:
  * `AbstractDataType` is `private[sql]`, so an expression outside
  * `org.apache.spark.sql` cannot override
  * `ExpectsInputTypes.inputTypes` directly. Implementors provide the
  * concrete `DataType`s (public, and a subtype of AbstractDataType) and
  * get analysis-time type checking PLUS implicit input coercion (e.g.
  * `array<float>` → `array<double>`) — without it, a wrongly-typed SQL
  * call like `h60(42)` passes analysis and dies mid-job in codegen or
  * with a ClassCastException. */
trait GraftInputTypes extends ImplicitCastInputTypes {
  /** Expected input types, one per child, as public DataTypes. */
  def graftInputTypes: Seq[DataType]
  override def inputTypes: Seq[AbstractDataType] = graftInputTypes
}
