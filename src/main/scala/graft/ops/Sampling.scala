package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data pipelines.
  *
  * `df.sample()` is seed-dependent *and* partition-layout-dependent — rerun
  * the job with different file splits and the sample changes, which breaks
  * reproducibility audits and cross-engine verification. Hash-gating on a
  * stable id (the q34 split idiom: `h60(id) % 10000 < rate_bp`) gives every
  * engine, every run, and every partitioning the identical sample, and
  * composes with stratification by making the rate a per-stratum column.
  * Per-row, shuffle-free, codegen'd.
  */
object Sampling {

  /** THE acceptance gate every sampler here shares: keep the row when
    * `h60(id) % 10000 < rateBp`. One definition, so the modulus/cast can
    * never drift apart between the flat, stratified, and temperature
    * variants. */
  private def bpGate(id: Column, rateBp: Column): Column =
    pmod(graft.functions.H60.of(id.cast("string")), lit(10000L)) < rateBp

  /** Keep rows where `h60(id) % 10000 < rateBp` (basis points: 10000 = all).
    * `id` should be a stable string-castable row identity. */
  def hashSample(df: DataFrame, id: Column, rateBp: Int): DataFrame = {
    require(rateBp >= 0 && rateBp <= 10000, s"rateBp out of [0,10000]: $rateBp")
    df.filter(bpGate(id, lit(rateBp.toLong)))
  }

  /** Deterministic fixed-size per-key sample: the `k` rows with the lowest
    * `h60(id)` in each key group (ties broken by `idCol`), ranked 1..k.
    *
    * Bottom-k-by-hash IS a uniform without-replacement reservoir sample —
    * the hash imposes a random but *stable* order, so unlike reservoir
    * algorithms seeded per partition, the selected set is independent of
    * partitioning, file splits, and engine. Executed via the bounded-heap
    * [[graft.plans.TopKPerKey]] operator: each input partition forwards at
    * most k rows per key (map-side partial top-k), so the shuffle moves
    * ≤ k·keys·partitions rows — never a full per-key sort, never a
    * one-task-per-key window. The per-key quota variant with an arbitrary
    * caller order lives in [[quotaSample]]-style q82; this one fixes the
    * order to the sampling hash. */
  def bottomKPerKey(df: DataFrame, keys: Seq[String], idCol: String,
      k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    graft.plans.TopKPerKey(
      df.withColumn("__h", graft.functions.H60.of(col(idCol).cast("string"))),
      keys = keys,
      order = Seq(
        graft.plans.TopKPerKey.Order("__h"),
        graft.plans.TopKPerKey.Order(idCol)),
      k = k)
      .drop("__h")
  }

  /** Weighted sampling WITHOUT replacement, integer-exact and
    * engine-agnostic: each row draws `weight` independent 60-bit hash
    * priorities (`h60(id + "#" + i)`) and keeps the minimum; the global
    * `k` lowest priorities are the sample. Min-of-w-uniform-draws is the
    * Efraimidis–Spirakis exponential-key scheme with the float math
    * replaced by integer hashing, so selection is reproducible across
    * engines, runs, and partitionings — no `pow`/`ln` cross-engine float
    * drift. Row amplification equals the weight (caller keeps weights
    * small ints, e.g. quality tiers). The priority is a per-row
    * `array_min` over the hashed unit draws — no explode, no group-by: the
    * only distributed work is the global top-k, which collapses to
    * TakeOrderedAndProject (per-partition k, never a full sort). Higher
    * weight ⇒ proportionally higher inclusion probability; rows with a
    * null or sub-1 weight are EXCLUDED (weight 0 = drop) — without the
    * filter, `sequence(1, 0)` would count DOWN and a null priority would
    * sort ahead of every real one. */
  def weightedSample(df: DataFrame, id: Column, weight: Column,
      k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    requireIntegralWeight(df, weight)
    df
      // null id too, not only null weight: a null id hashes to a NULL
      // priority, which sorts ASC NULLS FIRST and would WIN the sample
      // ahead of every real row regardless of weight
      .filter(weight.isNotNull && weight >= 1 && id.isNotNull)
      .withColumn("priority", esPriority(id, weight))
      .orderBy(col("priority"), id)
      .limit(k)
  }

  /** Per-key twin of [[weightedSample]]: the k lowest integer-hash
    * Efraimidis–Spirakis priorities WITHIN each key — "keep each
    * language's k best-weighted docs" where the global form keeps a
    * corpus-wide k. The rank rides the bounded-heap
    * [[graft.plans.TopKPerKey]] operator (map-side partial top-k, ≤
    * k·keys·partitions rows move, spill fallback on near-unique keys) —
    * never a one-task-per-key window, never a full per-key sort. Same
    * weight contract as the global form: integral, null/sub-1 excluded. */
  def weightedSamplePerKey(df: DataFrame, keys: Seq[String], idCol: String,
      weight: Column, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    requireIntegralWeight(df, weight)
    graft.plans.TopKPerKey(
      df.filter(weight.isNotNull && weight >= 1 && col(idCol).isNotNull)
        .withColumn("priority", esPriority(col(idCol), weight)),
      keys = keys,
      order = Seq(
        graft.plans.TopKPerKey.Order("priority"),
        graft.plans.TopKPerKey.Order(idCol)),
      k = k)
  }

  // integral weights only: fractional weights (e.g. normalized 0.3/0.7)
  // would silently fail the >= 1 gate row by row and sample nothing —
  // reject the schema up front instead of losing the corpus quietly
  private def requireIntegralWeight(df: DataFrame, weight: Column): Unit = {
    import org.apache.spark.sql.types.{ByteType, DataType, IntegerType, LongType, ShortType}
    val wType = df.select(weight).schema.head.dataType
    require(Set[DataType](ByteType, ShortType, IntegerType, LongType).contains(wType),
      s"weight must be an integral column (unit-draw replication), got $wType")
  }

  /** Min of `weight` independent 60-bit hash draws — the
    * Efraimidis–Spirakis exponential key with the float math replaced by
    * integer hashing (see [[weightedSample]]'s scaladoc for why). The int
    * cast WRAPS for weights >= 2^31 (sequence() takes int bounds): 2^31
    * would count down, 2^32 would silently sample with weight ~0 — fail
    * loudly inside the plan instead. Weights are documented as small
    * tiers; 2^31 unit draws per row is a usage bug. */
  private def esPriority(id: Column, weight: Column): Column = {
    val wInt = when(weight > lit(Int.MaxValue.toLong),
        raise_error(concat(lit("weightedSample: weight exceeds Int.MaxValue: "),
          weight.cast("string"))).cast("int"))
      .otherwise(weight.cast("int"))
    array_min(transform(
      sequence(lit(1), wInt),
      i => graft.functions.H60.of(
        concat(id.cast("string"), lit("#"), i.cast("string")))))
  }

  /** Stratified variant: per-stratum rates in basis points, `defaultBp` for
    * strata not in the map. Downsampling hot strata (e.g. boilerplate-heavy
    * sources) while keeping rare ones is the standard corpus-balancing
    * move; the gate stays per-row and deterministic. */
  def stratifiedHashSample(
      df: DataFrame,
      id: Column,
      stratum: Column,
      ratesBp: Map[String, Int],
      defaultBp: Int): DataFrame = {
    require((defaultBp +: ratesBp.values.toSeq).forall(r => r >= 0 && r <= 10000),
      "rates must be in [0,10000] basis points")
    val rate = ratesBp.foldLeft(lit(defaultBp.toLong)) { case (acc, (k, bp)) =>
      when(stratum === k, lit(bp.toLong)).otherwise(acc)
    }
    df.filter(bpGate(id, rate))
  }

  /** Temperature-based multilingual rebalancing (the mT5/XLM-R move):
    * sample stratum `l` towards a share ∝ `n_l^(1/τ)`, flattening the
    * head languages and boosting the tail. τ = 2 here — the exponent is
    * then `sqrt`, which IEEE 754 rounds correctly, so (unlike `pow`'s
    * libm-dependent transcendentals) every engine computes bit-identical
    * rates from identical counts and ONE final rounding to basis points
    * makes the whole gate engine-exact.
    *
    * Rates are computed IN-PLAN: stratum counts (one map-side-combined
    * groupBy, ≤ #strata rows) broadcast-join back, the Σ√n normalizer is
    * a 1-row broadcast, acceptance is the stateless h60 gate — zero extra
    * shuffle over the corpus, deterministic under any partitioning.
    * Returns the input rows that survive, with their stratum's `rate_bp`
    * attached (capped at 10000: a tail stratum whose fair share exceeds
    * its size keeps everything — upsampling needs replication, a
    * different op). */
  /** Shared τ=2 rate scaffolding of [[temperatureSample]] (capped) and
    * [[temperatureResample]] (uncapped): per-stratum counts, the ORDERED
    * Σ√n normalizer, and the ONCE-rounded basis-point factor. One
    * definition so the IEEE-exactness discipline — and therefore the
    * q120/q165 oracles — can never drift apart between the twins.
    *
    * Σ√n is accumulated in EXPLICIT stratum order (nulls first), not a
    * free agg: IEEE double addition isn't associative, so an order-free
    * sum's value depends on partial-agg merge order and can flip a rate
    * at a .5 rounding boundary between runs/engines. The window is global
    * but ≤ #strata rows — bounded by construction, not by the corpus.
    * Returns `(__s, <rateCol>)`, a ≤-#strata-row broadcast relation. */
  private def sqrtShareRates(df: DataFrame, stratum: Column, budget: Long,
      rateCol: String, cap: Boolean): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counts = df.groupBy(stratum.as("__s"))
      .agg(count(lit(1)).as("__n"))
    val ow = Window.orderBy(col("__s").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val norm = counts.withColumn("__cz", sum(sqrt(col("__n"))).over(ow))
      .agg(max(col("__cz")).as("__z")) // all terms > 0: last = max
    val raw = round(lit(10000.0) * sqrt(col("__n")) * budget / col("__z")
      / col("__n")).cast("long")
    counts.crossJoin(broadcast(norm))
      .withColumn(rateCol, if (cap) least(lit(10000L), raw) else raw)
      .select(col("__s"), col(rateCol))
  }

  def temperatureSample(
      df: DataFrame,
      id: Column,
      stratum: Column,
      budget: Long): DataFrame = {
    require(budget >= 1, s"budget must be >= 1: $budget")
    require(!df.columns.contains("rate_bp") && !df.columns.contains("__s"),
      "input columns rate_bp/__s collide with outputs — rename them first")
    // null-ID rows are excluded BEFORE the counts, not just at the gate:
    // the h60 gate can never admit a null id, so counting such rows would
    // systematically undershoot every stratum's realized share against
    // its computed rate. (A null STRATUM is still a real stratum — see
    // the null-safe join below.)
    val input = df.filter(id.isNotNull)
    val rated = sqrtShareRates(input, stratum, budget, "rate_bp", cap = true)
    // null-safe stratum match: groupBy counted null-stratum rows, so the
    // join must route them to their own rate too — `===` would both
    // drop them silently AND depress every real stratum's share
    input.join(broadcast(rated), stratum <=> col("__s"))
      .filter(bpGate(id, col("rate_bp")))
      .drop("__s")
  }

  /** Temperature rebalancing WITH replication — the upsampling side of the
    * mT5/XLM-R recipe that [[temperatureSample]]'s 10000 bp cap explicitly
    * leaves out: stratum `l`'s target share is ∝ `√n_l` (τ = 2, same
    * IEEE-exact sqrt-and-round-once rate math as the sampling twin), and a
    * stratum whose fair share EXCEEDS its size replicates its rows instead
    * of capping. Each row emits `f_bp DIV 10000` whole copies plus one more
    * when the stateless h60 gate admits the `f_bp MOD 10000` fractional
    * remainder — so per-stratum expected output is exactly
    * `n_l · f_bp_l / 10000` and the realized set is deterministic in
    * (id, stratum, counts) alone: partition-independent, re-run-stable,
    * engine-reproducible. Head strata (f < 1) degrade to pure gate
    * sampling — one op covers both sides of the recipe.
    *
    * Output: input columns + the stratum's `f_bp` + a 1-based `copy`
    * index (so downstream keys on (id, copy) stay unique). Scale shape
    * mirrors [[temperatureSample]] — counts groupBy, ≤ #strata windowed
    * normalizer, broadcast joins, then a row-local explode whose fan-out
    * is the replication factor itself; a factor above 10000 copies/row
    * fails loudly in-plan (that is a budget/corpus mismatch, not a
    * mixture). */
  def temperatureResample(
      df: DataFrame,
      id: Column,
      stratum: Column,
      budget: Long): DataFrame = {
    require(budget >= 1, s"budget must be >= 1: $budget")
    val reserved = Seq("f_bp", "copy", "__s", "__copies").filter(df.columns.contains)
    require(reserved.isEmpty,
      s"input columns ${reserved.mkString(", ")} collide with internal " +
        "aliases or output columns — rename them first")
    // null-ID rows excluded before counting, like [[temperatureSample]]:
    // a null id would get whole copies but never the gated fractional
    // extra — an inconsistent partial replication — while still inflating
    // its stratum's count
    val input = df.filter(id.isNotNull)
    val rated = sqrtShareRates(input, stratum, budget, "f_bp", cap = false)
    input.join(broadcast(rated), stratum <=> col("__s"))
      .withColumn("__copies",
        when(col("f_bp") > lit(100000000L),
          raise_error(concat(
            lit("temperatureResample: factor exceeds 10000 copies/row: "),
            col("f_bp").cast("string"))).cast("long"))
          .otherwise(expr("f_bp DIV 10000")) +
          when(bpGate(id, pmod(col("f_bp"), lit(10000L))), 1L).otherwise(0L))
      .withColumn("copy", explode(
        when(col("__copies") >= 1,
          sequence(lit(1L), col("__copies")))
          .otherwise(array().cast("array<bigint>"))))
      .drop("__s", "__copies")
  }

  /** Corpus mixture rebalancing: select rows so each key's share of the
    * output matches a target mixture — the "rebalance the training mix to
    * N% per language/source" move. Per key the quota is
    * `budget · share_bp / 10000` (integer floor), filled with that key's
    * best rows: rank 1 = smallest `orderCol` (negate an integer score for
    * best-first), ties broken by `tieCol`. A key whose availability is
    * under quota contributes everything it has (the rank filter is the
    * cap); keys absent from `sharesBp` are excluded — a mixture is a
    * whitelist.
    *
    * Ranking goes through [[Scale.groupedRank]] — per-(key, value-range)
    * bucketed local ranks plus broadcast offsets — because mixture keys
    * are exactly the low-cardinality case (5 languages at 100 TB) where
    * `Window.partitionBy(key)` would plan one task per key. The quota
    * relation is a handful of rows, broadcast. Returns the selected rows
    * plus their 1-based per-key `mix_rank`. */
  def rebalanceToShares(
      df: DataFrame,
      keyCol: String,
      orderCol: String,
      tieCol: String,
      budget: Long,
      sharesBp: Map[String, Int],
      buckets: Int = 32): DataFrame = {
    require(budget >= 0, s"budget must be >= 0: $budget")
    require(sharesBp.values.forall(bp => bp >= 0 && bp <= 10000),
      "shares must be in [0,10000] basis points")
    val quotas = sharesBp.toSeq
      .map { case (k, bp) => (k, budget * bp / 10000) }
    val qdf = broadcast(
      df.sparkSession.createDataFrame(quotas).toDF(keyCol, "__quota"))
    Scale.groupedRank(df, keyCol, orderCol, tieCol, "mix_rank", buckets)
      .join(qdf, keyCol)
      .filter(col("mix_rank") <= col("__quota"))
      .drop("__quota")
  }

  /** Budget-bounded greedy selection: per group, take rows in score order
    * (best first = smallest `orderCol`; negate an integer score upstream)
    * until the CUMULATIVE integral weight (tokens, bytes) would exceed
    * `budget` — the "fill each source's token budget with its best
    * documents" selection step of corpus curation, where quotas are token
    * counts, not document counts ([[rebalanceToShares]] is the per-doc
    * twin). Prefix semantics: selection stops at the first row that
    * overshoots — no knapsack backfill with later smaller rows, so the
    * selected set is a deterministic prefix of the score order and stable
    * under re-runs. The running weight rides through
    * [[Scale.groupedPrefixSum]] (bucketed local windows + broadcast
    * offsets), so low-cardinality groups never serialize into one task.
    * Weights must be non-negative: the prefix interpretation relies on the
    * running sum being monotone (a negative weight would let later rows
    * re-enter the budget — the underlying [[Scale.groupedPrefixSum]] still
    * equals the window exactly, but the filtered set is no longer a
    * prefix). A negative weight therefore fails LOUDLY at execution (plan-
    * level raise_error, mirroring [[weightedSample]]'s integral-weight
    * rejection) instead of silently re-admitting later rows. Returns the
    * surviving rows with their cumulative weight in `cum_weight`. */
  def budgetSelect(
      df: DataFrame,
      groupCol: String,
      orderCol: String,
      tieCol: String,
      weightCol: String,
      budget: Long,
      buckets: Int = 32): DataFrame = {
    require(budget >= 0, s"budget must be >= 0: $budget")
    val guarded = df.withColumn(weightCol,
      when(col(weightCol) < 0,
        raise_error(concat(lit("budgetSelect: negative weight breaks the " +
          "prefix interpretation: "), col(weightCol).cast("string"))))
        .otherwise(col(weightCol)))
    Scale.groupedPrefixSum(
        guarded, groupCol, orderCol, tieCol, weightCol, "cum_weight", buckets)
      .filter(col("cum_weight") <= budget)
  }

  /** Deterministic GROUP-disjoint k-fold assignment: every row of a group
    * (user, document cluster, session) lands in the same fold —
    * `fold = h60(group) mod k`, the engine-agnostic md5 hash q34's
    * train/val/test split uses — so no fold's eval set shares a group
    * with its training folds, re-runs and engines agree bit-for-bit, and
    * assignment is a row-local projection (ZERO shuffle; folds are
    * hash-balanced, not exactly equal). Rows with a NULL group get a NULL
    * fold: "unknown group" cannot be proven disjoint from anything, so
    * the caller decides (filter, or assign after imputation). The fold
    * lands in `foldCol`, which must not already exist — `withColumn`
    * would silently overwrite a prior assignment being compared against. */
  def groupKFold(df: DataFrame, groupCol: String, k: Int,
      foldCol: String = "fold"): DataFrame = {
    require(k >= 2, s"fold count must be >= 2: $k")
    require(!df.columns.contains(foldCol),
      s"output column `$foldCol` already exists — pass a different foldCol")
    df.withColumn(foldCol,
      pmod(graft.functions.H60.of(col(groupCol).cast("string")),
        lit(k.toLong)))
  }

  /** Temporal-split leakage report: split rows at `cutoff` (train strictly
    * before, test at-or-after) and count the GROUPS (users, documents,
    * sessions) that appear on BOTH sides — the leakage that silently
    * inflates eval scores when a per-group signal crosses the time
    * boundary. One row out: `(n_train, n_test, n_groups_train,
    * n_groups_test, n_leaked_groups, leaked_ppm)` with ppm over the test
    * side's groups (the side whose integrity the split exists to protect).
    *
    * Scale shape: one groupBy over the group column with two conditional
    * counts (map-side combined), then an O(#groups) one-row aggregate —
    * never two scans or a self-join. Rows with a NULL group form one
    * group (they leak like any other shared key); rows with a NULL
    * timestamp match neither side and are excluded (reported via
    * n_train + n_test < total). */
  def temporalLeakage(df: DataFrame, tsCol: String, cutoff: Column,
      groupCol: String): DataFrame = {
    require(groupCol != "__tr" && groupCol != "__te",
      s"group column `$groupCol` collides with an internal alias")
    df.groupBy(col(groupCol))
      .agg(
        count_if(col(tsCol) < cutoff).as("__tr"),
        count_if(col(tsCol) >= cutoff).as("__te"))
      .agg(
        coalesce(sum(col("__tr")), lit(0L)).as("n_train"),
        coalesce(sum(col("__te")), lit(0L)).as("n_test"),
        count_if(col("__tr") > 0).as("n_groups_train"),
        count_if(col("__te") > 0).as("n_groups_test"),
        count_if(col("__tr") > 0 && col("__te") > 0).as("n_leaked_groups"))
      .select(
        col("n_train"), col("n_test"), col("n_groups_train"),
        col("n_groups_test"), col("n_leaked_groups"),
        Audit.ppmHalfUp("n_leaked_groups", "n_groups_test").as("leaked_ppm"))
  }
}
