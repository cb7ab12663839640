package org.apache.spark.sql.graft

import org.apache.spark.sql.types.StructType

/** Bridge to `StructType.merge` (private[sql]) — the SAME merge parquet's
  * own `mergeSchema` inference applies across footers
  * (`SchemaMergeUtils.mergeSchemasInParallel`), so a manifest-carried
  * schema evolved through this merge is exactly what merged footer
  * inference over the listed files would produce, minus the O(files)
  * footer reads. */
object SchemaBridge {
  def merge(a: StructType, b: StructType): StructType = a.merge(b)

  /** Deep-nullable view (private[spark] `asNullable`): what a file SCAN of
    * this schema serves — any listed file may be missing a column, so a
    * declared non-null field still reads as nullable, exactly like merged
    * footer inference would report it. */
  def asNullable(s: StructType): StructType = s.asNullable
}
