package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series regularization for event streams: complete a sparse per-key
  * daily series onto its dense day grid and carry observations forward —
  * the standard feature-engineering step before any rolling-window model
  * (a rolling mean over a grid with holes silently weights present days).
  *
  * Scale shape: the day grid is generated per key with `sequence()`
  * (distributed explode, fan-out bounded by each key's own span — no
  * global date dimension to cross-join), the grid↔observation join is an
  * equi-join on (key, day), and the forward fill is one running-frame
  * window pass per key. No driver materialization anywhere.
  */
object TimeSeries {

  /** Complete `daily` (one row per (key, day) with an observed `valCol`)
    * onto each key's dense [min(day), max(day)] grid; gap days get
    * `observed = false` and the last observed value carried forward.
    * `observed` reflects ROW PRESENCE, not value nullness: a real
    * observation row whose value is null keeps `observed = true` (its
    * value is still forward-filled — it contributed nothing to fill
    * with), instead of being silently conflated with a missing grid day.
    * `dayCol` must be DateType. */
  def gapFillDaily(
      daily: DataFrame,
      key: String,
      dayCol: String,
      valCol: String): DataFrame = {
    val span = daily.groupBy(key)
      .agg(min(dayCol).as("__d0"), max(dayCol).as("__d1"))
    val grid = span.select(
      col(key), explode(sequence(col("__d0"), col("__d1"))).as(dayCol))
    val w = Window.partitionBy(key).orderBy(dayCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(daily.withColumn("__present", lit(true)), Seq(key, dayCol), "left")
      .withColumn("observed", coalesce(col("__present"), lit(false)))
      .withColumn(valCol, last(col(valCol), ignoreNulls = true).over(w))
      .drop("__present")
  }
}
