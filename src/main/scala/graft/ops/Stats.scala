package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.ops.Cached._

/** Dataset-profiling statistics computed in ONE scan — the numeric-column
  * relationship report of a data card. Where [[Pca]] ships float Gram
  * moments for the eigensolve, these ops are integer-exact end to end so a
  * SQL oracle reproduces them bit-for-bit.
  */
object Stats {

  /** Pearson correlation matrix over integer-valued derived columns in a
    * single pass: one global aggregate collapses the corpus to the
    * d + d + d·(d−1)/2 moment sums (Σx, Σx², Σxy — all exact longs, so
    * the shuffle-free map-side combine is order-independent), then every
    * pairwise correlation is computed from that ONE row with an identical
    * IEEE expression shape on both engines and rounded once to 6dp.
    *
    * Scale shape: zero joins, zero row-level shuffle — the only exchange
    * is the final 1-row aggregate merge; state is O(d²) numbers however
    * large the input. Caller must supply columns whose derived long values
    * keep Σx·y < 2⁶³ (cents/dollars-scale integers are fine to ~1e9 rows).
    *
    * `cols` maps output names to integer-valued derivations (e.g.
    * `round(price)`); names must be distinct. Output: one row per
    * unordered pair `(col_x, col_y, n, corr)` in listed-order pairs. */
  def corrMatrix(df: DataFrame, cols: Seq[(String, Column)]): DataFrame = {
    require(cols.size >= 2, "need at least two columns")
    require(cols.map(_._1).distinct.size == cols.size, "names must be distinct")
    val names = cols.map(_._1)
    // positional internal aliases — name-derived ones collide when names
    // contain the separator (pair (a, b_c) vs (a_b, c) → one sp_a_b_c)
    // COMPLETE-CASE rows only: n counts every row while the moment sums
    // skip nulls, so one null cell would silently fabricate correlations
    // (values can even leave [-1, 1]); listwise deletion keeps n and
    // every moment over the SAME row set. Documented behavior: rows with
    // any null among the profiled columns are excluded. Plain IsNotNull
    // conjunctions, not na.drop: AtLeastNNonNulls measured ~2× the whole
    // query's wall time where the simple predicates fuse into codegen.
    val base = df.select(cols.zipWithIndex.map { case ((_, c), i) =>
      c.cast("long").as(s"__c$i") }: _*)
      .filter(cols.indices.map(i => col(s"__c$i").isNotNull).reduce(_ && _))
    val pairsIdx =
      for { i <- names.indices; j <- i + 1 until names.size } yield (i, j)
    val aggs =
      names.indices.map(i => sum(col(s"__c$i")).as(s"s_$i")) ++
        names.indices.map(i => sum(col(s"__c$i") * col(s"__c$i")).as(s"ss_$i")) ++
        pairsIdx.map { case (i, j) =>
          sum(col(s"__c$i") * col(s"__c$j")).as(s"sp_${i}_$j")
        }
    val m = base.agg(count(lit(1)).as("n"), aggs: _*)

    val nD = col("n").cast("double")
    // nullif on the divisor: a zero-variance (constant) column makes its
    // correlations UNDEFINED — that must surface as null rows, not as an
    // ANSI divide-by-zero killing the whole report (at 100 TB one stuck
    // sensor column would otherwise take down every other pair's numbers)
    def corrOf(i: Int, j: Int): Column =
      round((nD * col(s"sp_${i}_$j") - col(s"s_$i").cast("double") * col(s"s_$j"))
        / nullif(sqrt((nD * col(s"ss_$i") - col(s"s_$i").cast("double") * col(s"s_$i"))
          * (nD * col(s"ss_$j") - col(s"s_$j").cast("double") * col(s"s_$j"))),
          lit(0.0)), 6)
    val pairs = pairsIdx.map { case (i, j) =>
      struct(lit(names(i)).as("col_x"), lit(names(j)).as("col_y"),
        corrOf(i, j).as("corr"))
    }
    m.select(col("n"), explode(array(pairs: _*)).as("p"))
      .select(col("p.col_x"), col("p.col_y"), col("n"), col("p.corr"))
      .orderBy("col_x", "col_y")
  }

  /** Two-sample Kolmogorov–Smirnov drift per group vs the whole corpus:
    * `D = sup_x |F_g(x) − F(x)|` of an integer-valued column — the
    * DISTRIBUTIONAL drift alarm (length profiles, score histograms) that
    * complements the token-space KL of `TextStats.sourceDrift`. Entirely
    * integer-exact: the sup is evaluated at every corpus jump point with
    * cross-multiplied CDF counts (`|cum_g·n − cum·n_g|` — no division
    * until the final ppm), so the statistic is bit-stable and
    * oracle-matchable with zero float comparisons.
    *
    * Scale shape: one (group, value) count shuffle, then everything runs
    * on the collapsed count table; the corpus CDF uses the bucketed
    * [[Scale.prefixSum]] (no single-partition exchange), per-group CDFs
    * are group-partitioned windows, and the value grid expands by
    * |groups| — a driver-bounded literal list — via `explode`, never a
    * cartesian join. Driver traffic: the group list and one scalar. */
  def ksDrift(df: DataFrame, groupCol: String, valueCol: String): DataFrame =
    ksDriftFromCounts(df
      .select(col(groupCol).cast("string").as("g"),
        col(valueCol).cast("long").as("v"))
      .groupBy("g", "v").agg(count(lit(1)).as("c")))

  /** Exact TWO-SAMPLE Kolmogorov–Smirnov distance between two integer
    * count tables `(v, c)` — `sup_x |F_a(x) − F_b(x)|` directly, the
    * window-vs-reference / A-vs-B drift statistic ([[ksDrift]] compares
    * each group against the POOLED corpus, which is a different, diluted
    * statistic when only two samples exist). One row `(n_a, n_b, ks_ppm)`,
    * integer-exact via DECIMAL(38,0) cross-multiplied CDFs.
    *
    * Scale shape: one count-table equi-join on the value grid, CDFs via
    * the bucketed [[Scale.prefixSum]] (no single-partition window), then a
    * 1-row max — no all-pairs, no driver data beyond two scalars. */
  def ksTwoSample(a: DataFrame, b: DataFrame): DataFrame = {
    val av = a.groupBy("v").agg(sum("c").as("ca"))
    val bv = b.groupBy("v").agg(sum("c").as("cb"))
    val u = av.join(bv, Seq("v"), "full_outer")
      .select(col("v"), coalesce(col("ca"), lit(0L)).as("ca"),
        coalesce(col("cb"), lit(0L)).as("cb"))
      // lineage-recoverable cache (Index.buildPostings rationale): the
      // value grid is corpus-distinct-sized; non-replicated checkpoint
      // blocks would abort the job on any executor loss
      .cachedView
    val n = u.agg(sum("ca"), sum("cb")).collect()(0)
    val (na, nb) = (n.getLong(0), n.getLong(1))
    require(na > 0 && nb > 0, "ksTwoSample: both samples must be non-empty")
    // STRICT bound: at na = nb = 1e16 exactly, disjoint supports give
    // dmax = na·nb = 1e32 and dmax·10⁶ = 10³⁸ > DECIMAL(38,0)'s max
    // (10³⁸−1) — Spark nulls the overflow instead of raising, so an
    // inclusive cap would ship ks_ppm = null silently
    require(na < 10000000000000000L && nb < 10000000000000000L,
      s"ksTwoSample: counts ($na, $nb) exceed the DECIMAL(38,0) exact-ppm " +
        "range (under 1e16 rows per sample)")
    val dec = "decimal(38,0)"
    val cum = Scale.prefixSum(
      Scale.prefixSum(u, "v", "ca", "cuma"), "v", "cb", "cumb")
    cum
      .select(abs(col("cuma").cast(dec) * lit(nb).cast(dec)
        - col("cumb").cast(dec) * lit(na).cast(dec)).as("dnum"))
      .agg(max(col("dnum")).as("dmax"))
      .select(lit(na).as("n_a"), lit(nb).as("n_b"),
        expr(s"dmax * 1000000 DIV (CAST($na AS $dec) * CAST($nb AS $dec))")
          .as("ks_ppm"))
  }

  /** [[ksDrift]] from a pre-aggregated `(g, v, c)` count table — the entry
    * point when upstream already holds histograms (and the one that makes
    * the huge-count arithmetic regime testable without 1e18 physical rows).
    * Columns must be named exactly `g` (group), `v` (integer value),
    * `c` (count).
    *
    * All cross-multiplied CDF arithmetic runs in DECIMAL(38,0): the Long
    * products `cumg·nAll` / `cumc·ng` overflow past ~9.2e18 and
    * `dmax·1000000` past ~9.2e12 — silently wrong/negative ppm at exactly
    * the corpus scale this module targets. DECIMAL(38,0) is exact while
    * `nAll < 1e16` (then `dmax·10⁶ ≤ nAll²·10⁶ < 10³⁸`); at or beyond that
    * the guard fails loudly instead of letting Spark null the overflow. */
  def ksDriftFromCounts(counts: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val gv = counts.select(col("g"), col("v"), col("c")).cachedView // corpus-distinct-sized; recoverable cache, not checkpoint blocks
    val cv = gv.groupBy("v").agg(sum("c").as("cv"))
    val cumc = Scale.prefixSum(cv, "v", "cv", "cumc").select("v", "cumc")
    val ng = gv.groupBy("g").agg(sum("c").as("ng"))
    val nAll = gv.agg(sum("c")).collect()(0).getLong(0)
    require(nAll < 10000000000000000L, // strict 1e16: nAll²·10⁶ = 10³⁸
      // exactly at the cap overflows DECIMAL(38,0) to a silent null
      s"ksDrift: corpus count $nAll exceeds the DECIMAL(38,0) exact-ppm " +
        "range (under 1e16 rows); shard the corpus or rescale the counts")
    // a null group key would NPE the driver sort AND silently break the
    // CDF grid's equi-join (null never equals null there, so the null
    // group's counts vanish and its ks_ppm reads 1e6) — fail loudly with
    // the remedy named instead; madOutliers handles null groups because
    // its joins are null-safe, this op's grid join is not
    val rawGroups = ng.select("g").collect().map(_.getString(0)).toSeq
    require(!rawGroups.contains(null),
      "ksDrift: null group key — filter or label null groups upstream " +
        "(the CDF grid join is not null-safe)")
    val groups = rawGroups.sorted
    val grid = cumc.select(col("v"), col("cumc"),
      explode(array(groups.map(lit(_)): _*)).as("g"))
    val w = Window.partitionBy("g").orderBy("v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val dec = "decimal(38,0)"
    grid.join(gv, Seq("g", "v"), "left")
      .withColumn("cumg", sum(coalesce(col("c"), lit(0L))).over(w))
      .join(broadcast(ng), "g")
      .select(col("g"), col("ng"),
        abs(col("cumg").cast(dec) * lit(nAll).cast(dec)
          - col("cumc").cast(dec) * col("ng").cast(dec)).as("dnum"))
      .groupBy("g")
      .agg(max(col("ng")).as("ng"), max(col("dnum")).as("dmax"))
      // IntegralDivide on decimals returns LONG, so ks_ppm keeps the same
      // output schema the Long math had; the quotient is ≤ 1e6 by
      // construction (dmax ≤ ng·nAll)
      .select(col("g").as("source"), col("ng").as("n_docs"),
        expr(s"dmax * 1000000 DIV (CAST(ng AS $dec) * CAST($nAll AS $dec))")
          .as("ks_ppm"))
      .orderBy("source")
  }

  /** Robust per-group outlier report: median and MAD (median absolute
    * deviation) of an integral `valueCol`, and how many rows sit more
    * than `k`·MAD from the median — the data-quality sweep that survives
    * the outliers it is hunting (mean/stddev z-scores are dragged by the
    * very rows they should flag; median/MAD have a 50% breakdown point).
    * Two grouped EXACT percentile aggregates plus broadcast joins of the
    * ≤-#groups-row median/MAD tables — deterministic cross-engine because
    * interpolated medians of integers are exact binary halves (`k` or
    * `k+0.5`), so every deviation and threshold comparison is on exactly
    * representable doubles, never a rounding race. Exact `percentile`
    * shuffles each group's values; at 100 TB swap in `approx_percentile`
    * (q96's sketch machinery, rank-error-bounded) — the report shape is
    * identical, exactness here buys the oracle. A group with MAD = 0
    * (over half its mass on one value) flags every off-median row — the
    * conventional degenerate reading. */
  def madOutliers(
      df: DataFrame, groupCol: String, valueCol: String,
      k: Double = 5.0): DataFrame = {
    require(k > 0, s"k must be > 0: $k")
    val v = df.select(col(groupCol).as("g"), col(valueCol).as("vc"))
    val med = v.groupBy("g")
      .agg(expr("percentile(vc, 0.5)").as("med"))
      .withColumnRenamed("g", "__gm")
    // null-safe joins: the null group is a group — a data-quality sweep
    // that silently drops the rows with a NULL key understates outliers
    // exactly where the data is worst. localCheckpoint: two consumers
    // (the MAD aggregate and the final report) must not re-pay the scan
    // and the med join.
    val d = v.join(broadcast(med), col("g") <=> col("__gm"))
      .drop("__gm")
      .withColumn("dev", abs(col("vc") - col("med")))
      // corpus-sized (one row per input row): recoverable cache, not
      // non-replicated checkpoint blocks
      .cachedView
    val mad = d.groupBy("g")
      .agg(expr("percentile(dev, 0.5)").as("mad"))
      .withColumnRenamed("g", "__gd")
    d.join(broadcast(mad), col("g") <=> col("__gd"))
      .drop("__gd")
      .groupBy("g")
      .agg(
        count(lit(1)).as("n"),
        max(col("med")).as("med"), // constant within the group
        max(col("mad")).as("mad"),
        sum(when(col("dev") > lit(k) * col("mad"), 1L).otherwise(0L))
          .as("n_outliers"),
        max(col("dev")).as("max_dev"))
  }

  /** Exact equi-depth histogram of a long column: `k` buckets of
    * near-equal row count with per-bucket `(bucket, n_rows, lo, hi)`
    * boundaries — the optimizer-statistics / data-card shape where
    * equi-WIDTH bins would collapse a skewed distribution into one hot
    * bin. Bucket assignment is the closed formula `(rank−1)·k DIV n`
    * (q140's tercile idiom — no NTILE-semantics coupling across engines),
    * with the global rank from [[Scale.groupedRank]] over a constant
    * group: range-bucketed local ranks + broadcast offsets, never a
    * single-task global window. `tieCol` must be row-unique so re-runs
    * and engines rank identically. NULL values are excluded (a rank over
    * NULL orders engine-dependently); the caller reads their count from
    * [[Audit.profile]]. */
  def equiDepthHistogram(df: DataFrame, valueCol: String, tieCol: String,
      k: Int, buckets: Int = 32): DataFrame = {
    require(k >= 1, s"bucket count must be >= 1: $k")
    val vals = df.filter(col(valueCol).isNotNull)
      .select(col(valueCol), col(tieCol)).withColumn("__g1", lit(0))
      // corpus-sized; recoverable cache — feeds the count + groupedRank's
      // three branches
      .cachedView
    val n = vals.agg(count(lit(1)).as("__n"))
    Scale.groupedRank(vals, "__g1", valueCol, tieCol, "__rnk", buckets)
      .crossJoin(broadcast(n))
      .withColumn("bucket",
        expr(s"CAST((__rnk - 1) * $k DIV __n AS BIGINT)"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_rows"),
        min(col(valueCol)).as("lo"), max(col(valueCol)).as("hi"))
      .orderBy("bucket")
  }
}
