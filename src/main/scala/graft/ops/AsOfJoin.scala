package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for every left row, the single latest right row of the same
  * key whose timestamp is ≤ the left timestamp (event attribution, slowly-
  * changing-dimension lookup, market-data alignment).
  *
  * Spark-first formulation — no per-row subquery, no range cross join: tag
  * and union both sides, then one window pass per key ordered by
  * (ts, side, tiebreak) carrying the last right id forward (`last(...,
  * ignoreNulls)` over an unbounded-preceding frame). One shuffle on the key,
  * linear scan within each key — the 100 TB shape. A right row at exactly
  * the left timestamp matches (right sorts before left on equal ts).
  */
object AsOfJoin {

  /** Returns the left rows (original columns) + `asof_id` = the matched
    * right `idCol` (null when no right row precedes). `key` and `tsCol` must
    * be present in both sides; `idCol` only needs to exist on the RIGHT and
    * must be unique per (key, ts) there — it tie-breaks which right row wins
    * when several share a timestamp (ordering among left rows is irrelevant:
    * they carry null `__rid` and cannot affect each other's carried value). */
  def latestPreceding(
      left: DataFrame,
      right: DataFrame,
      key: String,
      tsCol: String,
      idCol: String): DataFrame = {
    val leftCols = left.columns
    val idType = right.schema(idCol).dataType // keep the id's own type —
    // a lossy cast (e.g. string UUIDs to long) would null every match
    val l = left.withColumn("__kind", lit(1))
      .withColumn("__rid", lit(null).cast(idType))
    val r = right.select(
      right.columns.collect {
        case c if c == key || c == tsCol || c == idCol => col(c)
      }.toSeq: _*)
      .withColumn("__kind", lit(0))
      .withColumn("__rid", col(idCol))
    // align schemas: right side carries nulls for left-only columns
    val rAligned = leftCols.foldLeft(r) { (df, c) =>
      if (df.columns.contains(c)) df
      else df.withColumn(c, lit(null).cast(left.schema(c).dataType))
    }.select((leftCols.map(col) :+ col("__kind") :+ col("__rid")): _*)
    val combined = l.select((leftCols.map(col) :+ col("__kind") :+ col("__rid")): _*)
      .union(rAligned)

    val w = Window.partitionBy(key)
      .orderBy(col(tsCol), col("__kind"), col("__rid"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    combined
      .withColumn("asof_id", last(col("__rid"), ignoreNulls = true).over(w))
      .filter(col("__kind") === 1)
      .drop("__kind", "__rid")
  }
}
