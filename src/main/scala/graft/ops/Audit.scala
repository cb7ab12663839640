package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Observation}
import org.apache.spark.sql.functions._

/** Declarative data-quality gate (expectations-style) for ingest pipelines:
  * each rule is a boolean predicate GOOD rows satisfy; the audit reports
  * `(rule, n_rows, n_violations)` per rule.
  *
  * Scale shape: ALL rules are evaluated in one scan and one aggregate
  * (`count_if` per rule inside a single `agg`), never one pass per rule;
  * the rule-per-row unpivot happens on the one-row aggregate result, so
  * the output is O(#rules) regardless of input size. A NULL predicate
  * result counts as a violation (unknown is not good).
  */
object Audit {

  /** Half-up EXACT parts-per-million of `numer / denom` over long column
    * names: `(2·10⁶·numer + denom) DIV (2·max(denom, 1))` — integer-only
    * (no float threshold can drift between engines), half-up at the .5
    * boundary, and 0 for an empty denominator instead of a divide error.
    * ONE definition for every audit/report ppm (the bpGate/kAnonAggs
    * "shared core" discipline): a fix to the rounding or guard idiom
    * lands everywhere at once instead of silently diverging across the
    * six call sites this replaced. */
  private[ops] def ppmHalfUp(numer: String, denom: String): Column =
    expr(s"(2 * 1000000 * ($numer) + $denom) DIV (2 * GREATEST($denom, 1))")


  /** One row per rule, ordered by rule name: (rule, n_rows, n_violations).
    * `rules` maps rule name → predicate that good rows satisfy. */
  def check(df: DataFrame, rules: Seq[(String, Column)]): DataFrame = {
    require(rules.nonEmpty, "need at least one rule")
    require(rules.forall(_._1.matches("[A-Za-z0-9_]+")),
      "rule names must be [A-Za-z0-9_]+ (they become column names)")
    require(rules.map(_._1).distinct.size == rules.size,
      "duplicate rule names")
    val aggs = count(lit(1)).as("__n") +: rules.map { case (name, pred) =>
      count_if(!coalesce(pred, lit(false))).as(s"__v_$name")
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = rules.map { case (name, _) => s"'$name', __v_$name" }
    one
      .selectExpr(
        s"stack(${rules.size}, ${stackArgs.mkString(", ")}) AS (rule, n_violations)",
        "__n AS n_rows")
      .select("rule", "n_rows", "n_violations")
      .orderBy("rule")
  }

  /** In-flight variant: attach the same rule counters as `observe`d metrics
    * riding whatever action the caller runs next — ZERO extra scans or
    * jobs, the production shape for auditing a 100 TB write you were doing
    * anyway (vs [[check]], which is its own aggregate job). Read the
    * violation counts from `obs.get` after the action: keys are `n_rows`
    * and `v_<rule>`. */
  def observed(
      df: DataFrame,
      obs: Observation,
      rules: Seq[(String, Column)]): DataFrame = {
    require(rules.nonEmpty, "need at least one rule")
    require(rules.map(_._1).distinct.size == rules.size,
      "duplicate rule names")
    val aggs = count(lit(1)).as("n_rows") +: rules.map { case (name, pred) =>
      count_if(!coalesce(pred, lit(false))).as(s"v_$name")
    }
    df.observe(obs, aggs.head, aggs.tail: _*)
  }

  /** k-anonymity risk profile over quasi-identifier columns `qi` — the
    * privacy audit a training-data release runs before shipping rows that
    * carry demographic-ish attributes: every row's equivalence class is
    * the set of rows sharing its QI tuple, and a class of size `k <
    * threshold` is re-identifiable. One row out:
    * `(n_rows, n_classes, min_k, n_unique_rows, n_risky_rows, risky_ppm)`
    * where `n_unique_rows` counts k=1 rows (fully identifying) and
    * `n_risky_rows` counts rows in any class below the threshold.
    *
    * Scale shape: ONE groupBy over the QI columns (map-side combined — the
    * class table is at most |distinct QI tuples|), then an O(#classes)
    * one-row aggregate; no row data ever reaches the driver. NULL QI
    * values group together (SQL GROUP BY semantics): "attribute unknown"
    * is itself a quasi-identifier value. Rates are exact half-up ppm. */
  def kAnonymity(df: DataFrame, qi: Seq[String], threshold: Long): DataFrame = {
    require(qi.nonEmpty, "need at least one quasi-identifier column")
    require(!qi.contains("__k"),
      "QI column __k collides with an internal alias — rename it first")
    require(threshold >= 2, s"threshold must be >= 2: $threshold")
    kAnonymityOfClasses(
      df.groupBy(qi.map(col): _*).agg(count(lit(1)).as("__k")), threshold)
  }

  // the shared class-profile aggregate: empty input gets explicit zero
  // counts (min_k stays NULL — "no classes" is not "a class of size 0"),
  // so the gate reads 0 ppm instead of NULL arithmetic
  private def kAnonAggs(threshold: Long): Seq[Column] = Seq(
    coalesce(sum(col("__k")), lit(0L)).as("n_rows"),
    count(lit(1)).as("n_classes"),
    min(col("__k")).as("min_k"),
    coalesce(sum(when(col("__k") === 1, 1L).otherwise(0L)), lit(0L))
      .as("n_unique_rows"),
    coalesce(sum(when(col("__k") < threshold, col("__k")).otherwise(0L)),
      lit(0L)).as("n_risky_rows"))

  private val kAnonProfileCols: Seq[Column] = Seq(
    col("n_rows"), col("n_classes"), col("min_k"), col("n_unique_rows"),
    col("n_risky_rows"),
    ppmHalfUp("n_risky_rows", "n_rows").as("risky_ppm"))

  /** The O(#classes) second half of [[kAnonymity]], exposed for callers
    * that already hold per-class sizes in a `__k` column (the streaming
    * monitor's finalized windowed counts). */
  private[graft] def kAnonymityOfClasses(classes: DataFrame,
      threshold: Long): DataFrame = {
    val aggs = kAnonAggs(threshold)
    classes.agg(aggs.head, aggs.tail: _*).select(kAnonProfileCols: _*)
  }

  /** Grouped twin of [[kAnonymityOfClasses]]: one profile row per `by`
    * tuple over pre-computed class sizes — lets the streaming monitor
    * profile every window a trigger finalizes in ONE frame. */
  private[graft] def kAnonymityOfClassesBy(classes: DataFrame,
      by: Seq[String], threshold: Long): DataFrame = {
    val aggs = kAnonAggs(threshold)
    classes.groupBy(by.map(col): _*).agg(aggs.head, aggs.tail: _*)
      .select(by.map(col) ++ kAnonProfileCols: _*)
  }

  /** Per-PARTITION [[kAnonymity]] — one risk-profile row per distinct
    * `by` tuple (per day, per source, per release shard): the batch twin
    * of [[graft.streaming.PrivacyMonitor]]'s per-window profile, and the
    * "which slice regressed" drill-down the global audit can't answer.
    * Same math, same one-shuffle shape: ONE groupBy over (by ++ qi)
    * builds every partition's classes, a second map-side-combined
    * aggregate collapses them to |distinct by| profile rows. */
  def kAnonymityBy(df: DataFrame, by: Seq[String], qi: Seq[String],
      threshold: Long): DataFrame = {
    require(by.nonEmpty, "need at least one partition column")
    require(qi.nonEmpty, "need at least one quasi-identifier column")
    require(by.intersect(qi).isEmpty,
      s"partition and QI columns overlap: ${by.intersect(qi).mkString(",")}")
    val reserved = Set("__k", "n_rows", "n_classes", "min_k",
      "n_unique_rows", "n_risky_rows", "risky_ppm")
    val clash = (by ++ qi).filter(reserved)
    require(clash.isEmpty,
      s"columns ${clash.mkString(", ")} collide with internal aliases or " +
        "output profile columns — rename them first")
    require(threshold >= 2, s"threshold must be >= 2: $threshold")
    val aggs = kAnonAggs(threshold)
    df.groupBy((by ++ qi).map(col): _*).agg(count(lit(1)).as("__k"))
      .groupBy(by.map(col): _*).agg(aggs.head, aggs.tail: _*)
      .select(by.map(col) ++ kAnonProfileCols: _*)
      .orderBy(by.map(col): _*)
  }

  /** l-diversity companion to [[kAnonymity]]: within each QI equivalence
    * class, how many DISTINCT values of the sensitive column appear — a
    * class where everyone shares one sensitive value leaks it even at
    * high k. One row out:
    * `(n_rows, n_classes, min_l, n_low_classes, n_exposed_rows, exposed_ppm)`
    * counting classes (and the rows inside them) with `l < threshold`.
    * A NULL sensitive value counts as ONE distinct value of its own
    * (countDistinct skips NULLs; an all-NULL class would otherwise report
    * l=0 and a mixed class would under-count its diversity). Same
    * one-shuffle scale shape as [[kAnonymity]]. */
  // the shared diversity-profile pieces: class build (count + distinct
  // sensitive, NULL counted as one value of its own) and the O(#classes)
  // collapse — one definition behind both the global and per-partition
  // audits
  private def lDivClassAggs(sensitive: String): Seq[Column] = Seq(
    count(lit(1)).as("__k"),
    (countDistinct(col(sensitive)) +
      coalesce(max(when(col(sensitive).isNull, 1L).otherwise(0L)),
        lit(0L))).as("__l"))

  private def lDivAggs(threshold: Long): Seq[Column] = Seq(
    coalesce(sum(col("__k")), lit(0L)).as("n_rows"),
    count(lit(1)).as("n_classes"),
    min(col("__l")).as("min_l"),
    coalesce(sum(when(col("__l") < threshold, 1L).otherwise(0L)),
      lit(0L)).as("n_low_classes"),
    coalesce(sum(when(col("__l") < threshold, col("__k")).otherwise(0L)),
      lit(0L)).as("n_exposed_rows"))

  private val lDivProfileCols: Seq[Column] = Seq(
    col("n_rows"), col("n_classes"), col("min_l"), col("n_low_classes"),
    col("n_exposed_rows"),
    ppmHalfUp("n_exposed_rows", "n_rows").as("exposed_ppm"))

  def lDiversity(df: DataFrame, qi: Seq[String], sensitive: String,
      threshold: Long): DataFrame = {
    require(qi.nonEmpty, "need at least one quasi-identifier column")
    // a sensitive column that is also a QI makes every class trivially
    // l=1 — the audit would flag the whole dataset as exposed, silently
    require(!qi.contains(sensitive),
      s"sensitive column $sensitive is also a quasi-identifier — " +
        "diversity within its own equivalence classes is always 1")
    require(!(qi :+ sensitive).exists(Set("__k", "__l")),
      "columns __k/__l collide with internal aliases — rename them first")
    require(threshold >= 2, s"threshold must be >= 2: $threshold")
    val cls = lDivClassAggs(sensitive); val aggs = lDivAggs(threshold)
    df.groupBy(qi.map(col): _*).agg(cls.head, cls.tail: _*)
      .agg(aggs.head, aggs.tail: _*)
      .select(lDivProfileCols: _*)
  }

  /** Per-PARTITION [[lDiversity]] — one diversity-profile row per `by`
    * tuple, the drill-down twin of [[kAnonymityBy]]: same class math,
    * two stacked map-side-combined aggregates, one shuffle each. */
  def lDiversityBy(df: DataFrame, by: Seq[String], qi: Seq[String],
      sensitive: String, threshold: Long): DataFrame = {
    require(by.nonEmpty, "need at least one partition column")
    require(qi.nonEmpty, "need at least one quasi-identifier column")
    require(by.intersect(qi).isEmpty,
      s"partition and QI columns overlap: ${by.intersect(qi).mkString(",")}")
    require(!qi.contains(sensitive) && !by.contains(sensitive),
      s"sensitive column $sensitive is also a partition/QI column — " +
        "diversity within its own equivalence classes is always 1")
    val reserved = Set("__k", "__l", "n_rows", "n_classes", "min_l",
      "n_low_classes", "n_exposed_rows", "exposed_ppm")
    val clash = (by ++ qi :+ sensitive).filter(reserved)
    require(clash.isEmpty,
      s"columns ${clash.mkString(", ")} collide with internal aliases or " +
        "output profile columns — rename them first")
    require(threshold >= 2, s"threshold must be >= 2: $threshold")
    val cls = lDivClassAggs(sensitive); val aggs = lDivAggs(threshold)
    df.groupBy((by ++ qi).map(col): _*).agg(cls.head, cls.tail: _*)
      .groupBy(by.map(col): _*).agg(aggs.head, aggs.tail: _*)
      .select(by.map(col) ++ lDivProfileCols: _*)
      .orderBy(by.map(col): _*)
  }

  /** Deterministic pseudonymization: replace identifier columns with
    * stable keyed surrogates — sha256 over `secret|value`, truncated to 32
    * hex chars — so the SAME identifier under the SAME secret maps to the
    * SAME token in every table (joinability survives the masking), while
    * recovering the identifier requires the secret (rotate it and every
    * surrogate changes, severing old linkages). NULL stays NULL: "absent"
    * must remain distinguishable from any real token. Row-local
    * projection — zero shuffle, codegen'd hash, no UDF.
    *
    * This is PSEUDONYMIZATION (GDPR art. 4(5)) — linkage protection, not
    * anonymity: token frequency still mirrors identifier frequency, so
    * gate releases with [[kAnonymity]] over the remaining columns.
    *
    * Key-exposure surface: the raw secret never reaches the query plan —
    * a DERIVED key (its sha256) is embedded as the plan literal, so
    * explain output / Spark UI / event logs cannot leak a secret that is
    * reused elsewhere. The derived key still suffices to RE-COMPUTE
    * tokens (any row-local scheme must carry its effective key in the
    * plan), so plan/UI/event-log access must be restricted to parties
    * cleared to link — or rotate the secret after the job. */
  def pseudonymize(df: DataFrame, cols: Seq[String],
      secret: String): DataFrame = {
    require(cols.nonEmpty, "need at least one column to pseudonymize")
    require(secret.nonEmpty, "empty secret defeats the keyed surrogate")
    require(!secret.contains("|"),
      "secret must not contain the `|` domain separator")
    val derived = java.security.MessageDigest.getInstance("SHA-256")
      .digest(secret.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    cols.foldLeft(df) { (d, c) =>
      d.withColumn(c,
        when(col(c).isNull, lit(null).cast("string"))
          .otherwise(substring(
            sha2(concat_ws("|", lit(derived), col(c).cast("string")), 256),
            1, 32)))
    }
  }

  /** Referential-integrity audit: how many `child` rows carry a foreign
    * key with no match in `parent` — the cross-table conformance check a
    * star-schema ingest runs per load. One row out: `(n_child, n_orphans,
    * n_null_fk, orphan_ppm)`. A NULL foreign key is NOT an orphan (the
    * SQL FK contract: NULL references nothing) — it is counted separately
    * as `n_null_fk` so "missing" and "dangling" stay distinguishable.
    *
    * Scale shape: parent keys are projected and deduplicated BEFORE the
    * join (the join input is |distinct keys|, not |parent|), then one
    * equi-join — broadcast when the key set is small, shuffle otherwise,
    * Catalyst/AQE's call — and a one-row aggregate. No anti-join double
    * pass, no collect. */
  def referentialIntegrity(child: DataFrame, fk: String,
      parent: DataFrame, pk: String): DataFrame = {
    val keys = parent.select(col(pk).as("__pk")).distinct()
    child.select(col(fk).as("__fk"))
      .join(keys, col("__fk") === col("__pk"), "left")
      .agg(
        count(lit(1)).as("n_child"),
        count_if(col("__fk").isNotNull && col("__pk").isNull)
          .as("n_orphans"),
        count_if(col("__fk").isNull).as("n_null_fk"))
      .select(
        col("n_child"), col("n_orphans"), col("n_null_fk"),
        ppmHalfUp("n_orphans", "n_child").as("orphan_ppm"))
  }

  /** One-pass column profiler — the `ANALYZE`-style schema report every
    * curation run opens with: per column `(column, n_rows, n_nulls,
    * n_distinct, min_s, max_s)`, bounds rendered as strings so one frame
    * profiles heterogeneous column types. ALL columns are profiled in a
    * single scan and ONE aggregate (the per-column stack happens on the
    * one-row result, O(#cols) output regardless of input size).
    *
    * `exact = true` uses `count_distinct` — Catalyst plans multiple
    * distinct aggregates via Expand, multiplying the shuffled rows by
    * #cols; the oracle-checkable contract. At 100 TB pass `exact = false`
    * for `approx_count_distinct` at rsd 0.02 (HLL, one pass, NO Expand) —
    * same shape, ±2% standard error on cardinalities. */
  def profile(df: DataFrame, cols: Seq[String],
      exact: Boolean = true): DataFrame = {
    require(cols.nonEmpty, "need at least one column to profile")
    require(cols.forall(_.matches("[A-Za-z0-9_]+")),
      "profiled column names must be [A-Za-z0-9_]+")
    require(cols.distinct.size == cols.size, "duplicate columns")
    val aggs = count(lit(1)).as("__n") +: cols.flatMap { c =>
      Seq(
        count(col(c)).as(s"__c_$c"),
        (if (exact) countDistinct(col(c))
         else approx_count_distinct(col(c), 0.02)).as(s"__d_$c"),
        min(col(c)).cast("string").as(s"__mn_$c"),
        max(col(c)).cast("string").as(s"__mx_$c"))
    }
    val stackArgs = cols.map(c =>
      s"'$c', __c_$c, __d_$c, __mn_$c, __mx_$c").mkString(", ")
    df.agg(aggs.head, aggs.tail: _*)
      .selectExpr(
        s"stack(${cols.size}, $stackArgs)" +
          " AS (column, __nonnull, n_distinct, min_s, max_s)",
        "__n AS n_rows")
      .selectExpr("column", "n_rows", "n_rows - __nonnull AS n_nulls",
        "n_distinct", "min_s", "max_s")
      .orderBy("column")
  }

  /** Corpus data-card report — the one-row statistics block every dataset
    * release ships (docs/tokens/chars, language count, exact-dup rate,
    * short-doc share, length percentiles), computed in a SINGLE aggregate
    * over one scan of `corpus` (columns: `text`, `lang`, `n_chars`) — never
    * one pass per metric at 100 TB. Rates are exact integer ppm
    * (half-up, the q81 idiom); token counts from the shared tokenizer; the
    * duplicate count dedups on the 60-bit text hash so the distinct
    * shuffle carries 8 bytes/doc instead of whole documents. */
  def corpusReport(corpus: DataFrame): DataFrame =
    corpus
      .agg(
        count(lit(1)).as("n_docs"),
        sum(size(TextOps.tokens(col("text")))).cast("long").as("n_tokens"),
        sum(col("n_chars")).as("n_chars"),
        countDistinct(col("lang")).as("n_langs"),
        // countDistinct skips NULLs, but null-text docs are in n_docs —
        // count the null group as ONE distinct "text" (null-text docs are
        // mutual duplicates under "identical text"), else a corpus with N
        // null texts reports N phantom duplicates
        (countDistinct(TextOps.h60(col("text"))) +
          coalesce(max(when(col("text").isNull, 1L).otherwise(0L)), lit(0L)))
          .as("n_unique_texts"),
        sum(when(col("n_chars") < 200, 1L).otherwise(0L)).as("n_short"),
        expr("percentile(n_chars, 0.5)").as("p50_chars"),
        expr("percentile(n_chars, 0.9)").as("p90_chars"))
      .select(
        col("n_docs"), col("n_tokens"), col("n_chars"), col("n_langs"),
        // GREATEST guard: an empty corpus reports 0 ppm, not a division
        // by zero (null, or an error under ANSI mode)
        ppmHalfUp("n_docs - n_unique_texts", "n_docs").as("dup_ppm"),
        ppmHalfUp("n_short", "n_docs")
          .as("short_ppm"),
        col("p50_chars"), col("p90_chars"))
}
