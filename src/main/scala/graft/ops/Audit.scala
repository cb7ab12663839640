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
        expr("(2 * 1000000 * (n_docs - n_unique_texts) + n_docs)" +
          " DIV (2 * GREATEST(n_docs, 1))").as("dup_ppm"),
        expr("(2 * 1000000 * n_short + n_docs) DIV (2 * GREATEST(n_docs, 1))")
          .as("short_ppm"),
        col("p50_chars"), col("p90_chars"))
}
