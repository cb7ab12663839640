package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.ops.Cached._

/** Skew- and shuffle-management patterns for 100 TB operation.
  *
  * AQE handles moderate skew adaptively (`spark.sql.adaptive.skewJoin`);
  * these are the explicit forms for the pathological cases AQE can't split —
  * a hot grouping key (two-phase salted aggregation) and a hot join key
  * (salt × replicate join). Both are result-identical to their naive forms
  * (asserted in ScaleSpec).
  */
object Scale {

  /** Key-skew diagnostics — the measurement that decides whether a join or
    * aggregation on `key` needs [[saltedAggregate]]/[[skewJoin]] before it
    * becomes the one straggler task of a 1000-executor stage. One grouped
    * count (the same shuffle the real query would pay), then bounded
    * summaries: the hot-key share and top-k concentration in exact ppm
    * (integer cross-multiplication — no float thresholds), so the report
    * is engine-exact and can gate CI. Top-k ties break toward the smaller
    * key, making the bounded `limit` deterministic. Output is ONE row:
    * `(n_rows, n_keys, max_cnt, max_ppm, topk_ppm)`. */
  def skewReport(df: DataFrame, key: String, topK: Int = 10): DataFrame = {
    require(topK >= 1, s"topK must be >= 1: $topK")
    val counts = df.groupBy(col(key).as("k")).agg(count(lit(1)).as("cnt"))
      // three bounded consumers, one corpus shuffle; distinct-key-sized
      // (corpus-scale for unique keys) → recoverable cache
      .cachedView
    val totals = counts.agg(
      sum(col("cnt")).as("n_rows"), count(lit(1)).as("n_keys"),
      max(col("cnt")).as("max_cnt"))
    val top = counts.orderBy(col("cnt").desc, col("k")).limit(topK)
      .agg(sum(col("cnt")).as("top_cnt"))
    totals.crossJoin(broadcast(top))
      // DECIMAL(38,0) cross-multiplication (the Stats.ksDrift discipline):
      // cnt * 1e6 overflows Long past ~9.2e12 rows on one key — exactly
      // the 100 TB regime this report exists to gate — and a wrapped
      // negative ppm would silently pass a CI skew gate. DIV returns LONG,
      // so the output schema is unchanged.
      .select(
        col("n_rows"), col("n_keys"), col("max_cnt"),
        expr("CAST(max_cnt AS DECIMAL(38,0)) * 1000000 DIV n_rows")
          .as("max_ppm"),
        expr("CAST(top_cnt AS DECIMAL(38,0)) * 1000000 DIV n_rows")
          .as("topk_ppm"))
  }

  /** Spread per-row compute: a sub-row-group parquet file is unsplittable,
    * so a small-file corpus arrives as 1–2 input partitions and serializes
    * expensive per-row expressions (shingle hashing, MinHash signatures,
    * quantization, edit-distance DPs) into one task. No-op when the input
    * is already parallel enough — at real scale inputs carry thousands of
    * partitions and the extra shuffle would be pure waste. */
  def ensureParallelism(df: DataFrame, min: Int = 0): DataFrame = {
    if (df.isStreaming) return df // .rdd is illegal on a streaming plan
    val target =
      if (min > 0) min else df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions >= math.max(1, target / 2)) df
    else df.repartition(target)
  }

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

  /** Scalable global running sum over a total numeric order: bucket by
    * fixed-width ranges of the order column (min/max from one small agg —
    * fully deterministic, unlike `repartitionByRange`, whose sampled
    * boundaries can differ between the offsets job and the join job and
    * silently misalign prefix sums), compute per-bucket running sums with a
    * local window, then add broadcast prefix offsets (one long per bucket
    * to the driver) — the same two-pass shape as MovieCatalogETL's
    * block-ordinal repair. Avoids the single-task global window Spark plans
    * for `Window.orderBy` with no partitionBy.
    *
    * `valueCol` must be integral (the per-bucket offsets are exact longs);
    * for money use a fixed-point integer column (e.g. cents) upstream.
    *
    * Null order values bucket to -1 and accumulate FIRST, matching the
    * reference window's ASC NULLS FIRST exactly like [[groupedRunning]]
    * does (a bare `least(floor(...))` would silently send them to the
    * LAST bucket and inflate their prefix by every other bucket's total).
    * The per-bucket offsets go through a ≤ buckets+1-row driver collect —
    * bounded by construction; the grouped twins window their offsets
    * in-plan instead because #groups is unbounded, but a global prefix
    * has exactly one offsets row per bucket. */
  def prefixSum(
      df: DataFrame,
      orderCol: String,
      valueCol: String,
      outCol: String,
      buckets: Int = 32): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}
    df.schema(valueCol).dataType match {
      case ByteType | ShortType | IntegerType | LongType => // exact long sums
      case dt => throw new IllegalArgumentException(
        s"prefixSum requires an integral valueCol (got $valueCol: $dt); " +
          "use a fixed-point integer column (e.g. cents) upstream")
    }
    val Array(lo, hi) = df.agg(
      min(col(orderCol)).cast("double"), max(col(orderCol)).cast("double"))
      .collect()(0).toSeq.map {
        case null => 0.0 // all-null order column: everything buckets to -1
        case d => d.asInstanceOf[Double]
      }.toArray
    val width = math.max((hi - lo) / buckets, 1e-9)
    val bucketed = df.withColumn("__b",
      when(col(orderCol).isNull, lit(-1)).otherwise(
        least(floor((col(orderCol).cast("double") - lit(lo)) / lit(width)),
          lit(buckets - 1))).cast("int"))
    val w = Window.partitionBy("__b").orderBy(col(orderCol).asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = bucketed.withColumn("__local", sum(col(valueCol)).over(w))
    val totals = bucketed.groupBy("__b")
      .agg(sum(col(valueCol)).as("t"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val offsets = (-1 until buckets).map { b =>
      b -> (-1 until b).map(totals.getOrElse(_, 0L)).sum
    }
    val offsetDf = broadcast(
      df.sparkSession.createDataFrame(offsets).toDF("__b", "__off"))
    local.join(offsetDf, "__b")
      .withColumn(outCol, col("__local") + col("__off"))
      .drop("__b", "__local", "__off")
  }

  /** Exact per-group rank (1-based, ordered by `orderCol` with `tieCol`
    * breaking ties) without a single-task-per-group window: rows bucket by
    * fixed-width ranges of the order column inside each group (per-group
    * min/max from one small broadcast agg), rank locally per (group,
    * bucket), then add per-group bucket offsets — computed IN-PLAN over a
    * #groups×#buckets-row aggregate and broadcast, no driver collect. A
    * `Window.partitionBy(group)` plans one task per group, which dies on
    * low-cardinality groups (languages, sources) at 100 TB; this caps the
    * largest task at ~|group|/buckets. Result is identical to
    * `row_number() OVER (PARTITION BY group ORDER BY order, tie)`
    * (asserted in ScaleSpec), INCLUDING null keys: a null group is a
    * group (the joins are null-safe `<=>`), and null order values bucket
    * to -1 so they rank first exactly like the window's ASC NULLS FIRST.
    * Degenerate case: a group whose order values are all equal lands in
    * one bucket — same as the naive window, no worse. */
  def groupedRank(
      df: DataFrame,
      groupCol: String,
      orderCol: String,
      tieCol: String,
      outCol: String,
      buckets: Int = 32): DataFrame =
    groupedRunning(df, groupCol, orderCol, tieCol, outCol, buckets,
      w => row_number().over(w).cast("long"),
      count(lit(1)))

  /** Shared scaffolding for [[groupedRank]] / [[groupedPrefixSum]]: range-
    * bucket rows inside each group (per-group min/max from one broadcast
    * agg; null order values to bucket -1 so they come first, matching ASC
    * NULLS FIRST), compute `local` per (group, bucket) window, then add
    * exclusive running offsets of `perBucketTotal` — a #groups×#buckets-row
    * relation windowed cheaply and broadcast, no driver collect. The
    * bucketing, degenerate-range guard, and null-safe joins live HERE
    * exactly once so the two primitives can never diverge on an edge
    * case. */
  private def groupedRunning(
      df: DataFrame,
      groupCol: String,
      orderCol: String,
      tieCol: String,
      outCol: String,
      buckets: Int,
      local: org.apache.spark.sql.expressions.WindowSpec => Column,
      perBucketTotal: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ranges = df.groupBy(groupCol).agg(
      min(col(orderCol)).cast("double").as("__lo"),
      max(col(orderCol)).cast("double").as("__hi"))
      .withColumnRenamed(groupCol, "__g")
    val bucketed = df
      .join(broadcast(ranges), col(groupCol) <=> col("__g"))
      .drop("__g")
      .withColumn("__b",
        when(col(orderCol).isNull, lit(-1)).otherwise(
          least(floor((col(orderCol).cast("double") - col("__lo")) /
            greatest((col("__hi") - col("__lo")) / buckets, lit(1e-9))),
            lit(buckets - 1))).cast("int"))
      .drop("__lo", "__hi")
    val localDf = bucketed.withColumn("__local",
      local(Window.partitionBy(groupCol, "__b").orderBy(orderCol, tieCol)))
    val offsets = bucketed.groupBy(groupCol, "__b")
      .agg(perBucketTotal.as("__c"))
      .withColumn("__off",
        coalesce(sum(col("__c")).over(
          Window.partitionBy(groupCol).orderBy("__b")
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .drop("__c")
      .withColumnRenamed(groupCol, "__g")
      .withColumnRenamed("__b", "__b2")
    localDf
      .join(broadcast(offsets),
        col(groupCol) <=> col("__g") && col("__b") === col("__b2"))
      .withColumn(outCol, col("__local") + col("__off"))
      .drop("__g", "__b2", "__b", "__local", "__off")
  }

  /** Exact per-group RUNNING SUM of an integral weight column (ordered by
    * `orderCol` with `tieCol` breaking ties) without a single-task-per-group
    * window — [[groupedRank]]'s bucketed shape with the per-(group, bucket)
    * offset relation carrying weight totals instead of row counts. The
    * result equals `sum(weight) OVER (PARTITION BY group ORDER BY order,
    * tie ROWS UNBOUNDED PRECEDING)` (asserted in ScaleSpec), including
    * null group keys (null-safe joins) and null order values (bucket -1,
    * accumulated first, matching ASC NULLS FIRST). `weightCol` must be
    * integral so the broadcast offsets are exact longs — double partials
    * would make the prefix depend on merge order. This is the primitive
    * behind budget-bounded selection ([[Sampling.budgetSelect]]): at 100 TB
    * the largest task is ~|group|/buckets, not |group|. */
  def groupedPrefixSum(
      df: DataFrame,
      groupCol: String,
      orderCol: String,
      tieCol: String,
      weightCol: String,
      outCol: String,
      buckets: Int = 32): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}
    df.schema(weightCol).dataType match {
      case ByteType | ShortType | IntegerType | LongType => // exact long sums
      case dt => throw new IllegalArgumentException(
        s"groupedPrefixSum requires an integral weightCol (got $weightCol: " +
          s"$dt); use a fixed-point integer column upstream")
    }
    groupedRunning(df, groupCol, orderCol, tieCol, outCol, buckets,
      w => sum(col(weightCol))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("long"),
      sum(col(weightCol)))
  }

  /** Skewed equi-join: salt the (large, skewed) left side, replicate each
    * right-side row across all salts, join on (key, salt). Row multiplicity
    * is identical to the plain join; the hot key's rows spread over `salts`
    * reducers instead of one. Join keys are resolved against their OWN
    * side, so `bigKey` and `smallKey` may share a name (the common
    * equi-join case — a bare `col()` would fail analysis as ambiguous);
    * when they do, the output carries both same-named key columns, like
    * any expression-condition join — rename one side first if downstream
    * selects the key by name. */
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
      saltedBig(bigKey) === replicatedSmall(smallKey) &&
        saltedBig("__salt") === replicatedSmall("__salt"))
      .drop(saltedBig("__salt"))
      .drop(replicatedSmall("__salt"))
  }
}
