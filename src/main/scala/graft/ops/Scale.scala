package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew- and shuffle-management patterns for 100 TB operation.
  *
  * AQE handles moderate skew adaptively (`spark.sql.adaptive.skewJoin`);
  * these are the explicit forms for the pathological cases AQE can't split —
  * a hot grouping key (two-phase salted aggregation) and a hot join key
  * (salt × replicate join). Both are result-identical to their naive forms
  * (asserted in ScaleSpec).
  */
object Scale {

  /** Two-phase aggregation for skewed group keys: partial-aggregate on
    * (key, salt), then merge per key. `merges` maps each partial column to
    * its re-aggregation (e.g. partial counts re-SUM, partial mins re-MIN). */
  def saltedAggregate(
      df: DataFrame,
      key: Column,
      salts: Int,
      partials: Seq[Column],
      merges: Seq[Column => Column]): DataFrame = {
    val salted = df.withColumn("__salt", pmod(spark_partition_id(), lit(salts)))
    val phase1 = salted.groupBy(key.as("__key"), col("__salt"))
      .agg(partials.head, partials.tail: _*)
    val partialCols = phase1.columns.drop(2)
    val merged = partialCols.zip(merges).map { case (c, m) => m(col(c)).as(c) }
    phase1.groupBy(col("__key"))
      .agg(merged.head, merged.tail: _*)
  }

  /** Scalable global running sum over a total order: range-partition by the
    * order column, compute per-partition running sums with a local window,
    * then add broadcast prefix offsets (one long per partition to the
    * driver) — the same two-pass shape as MovieCatalogETL's block-ordinal
    * repair. Avoids the single-task global window Spark would otherwise
    * plan for `Window.orderBy` with no partitionBy. */
  def prefixSum(
      df: DataFrame,
      orderCol: String,
      valueCol: String,
      outCol: String,
      partitions: Int = 32): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ranged = df.repartitionByRange(partitions, col(orderCol))
      .withColumn("__pid", spark_partition_id())
    val w = Window.partitionBy("__pid").orderBy(orderCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = ranged.withColumn("__local", sum(col(valueCol)).over(w))
    val totals = local.groupBy("__pid").agg(sum(col(valueCol)).as("t"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    val offsets = totals.map(_._1).zip(
      totals.map(_._2).scanLeft(0L)(_ + _).dropRight(1))
    val offsetDf = broadcast(
      df.sparkSession.createDataFrame(offsets.toSeq).toDF("__pid", "__off"))
    local.join(offsetDf, "__pid")
      .withColumn(outCol, col("__local") + col("__off"))
      .drop("__pid", "__local", "__off")
  }

  /** Skewed equi-join: salt the (large, skewed) left side, replicate each
    * right-side row across all salts, join on (key, salt). Row multiplicity
    * is identical to the plain join; the hot key's rows spread over `salts`
    * reducers instead of one. */
  def skewJoin(
      big: DataFrame,
      small: DataFrame,
      bigKey: String,
      smallKey: String,
      salts: Int): DataFrame = {
    val saltedBig = big.withColumn("__salt",
      pmod(monotonically_increasing_id(), lit(salts)))
    val replicatedSmall = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1)).cast("array<long>")))
    saltedBig.join(replicatedSmall,
      col(bigKey) === col(smallKey) && saltedBig("__salt") === replicatedSmall("__salt"))
      .drop("__salt")
  }
}
