package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** DSIR — Data Selection via Importance Resampling (Xie et al. 2023,
  * public): score every document of a large RAW corpus by how target-like
  * it is under hashed-n-gram bag-of-words language models of a small
  * TARGET corpus vs the raw corpus itself, then keep the highest-weight
  * documents. The standard "make 100 TB of crawl look like Wikipedia"
  * selection step, computed entirely in-engine.
  *
  * Engine-agnostic like [[NaiveBayes]]: the per-feature log-probability
  * ratio `ln(ct+1) − ln(Nt+V) − ln(cr+1) + ln(Nr+V)` is the ONLY float
  * step, computed in one identically-shaped left-associated expression and
  * rounded ONCE to fixed-point (·10⁴); document weights are then exact
  * integer sums, so selection reproduces bit-for-bit in a SQL oracle.
  *
  * Scale shape: features are hashed word bigrams (`pmod(h60, vocab)`), so
  * the feature vocabulary is bounded at `vocab` regardless of corpus size;
  * counting is one map-side-combined groupBy per side (≤ vocab rows each);
  * the ratio table is ≤ vocab rows and BROADCAST into a shuffle-free
  * scoring pass; the only per-corpus shuffle is the final per-doc sum.
  * Selection is top-k — TakeOrderedAndProject, never a global sort.
  */
object Dsir {

  /** Hashed-bigram features of `(doc_id, text)`: one row per bigram
    * occurrence, bucketed into `vocab` ids. */
  def features(docs: DataFrame, vocab: Int): DataFrame =
    docs
      .withColumn("toks", TextOps.tokens(col("text")))
      .filter(size(col("toks")) >= 2)
      .select(col("doc_id"),
        explode(graft.functions.NgramHashes.of(col("toks"), 2)).as("h"))
      .select(col("doc_id"), pmod(col("h"), lit(vocab.toLong)).as("b"))

  /** Fixed-point log importance weight per raw document:
    * `(doc_id, logw)` where `logw = Σ_f round(scale · ln-ratio(f))` over
    * the document's bigram features. Positive ⇒ more target-like. */
  def importanceWeights(
      raw: DataFrame,
      target: DataFrame,
      vocab: Int = 4096,
      scale: Long = 10000L): DataFrame = {
    require(vocab >= 2, s"vocab must be >= 2: $vocab")
    val rawF = features(raw, vocab)
    val tgtF = features(target, vocab)
    // ONE counting pass per corpus; the smoothing totals fall out of the
    // <= vocab-row count tables for free instead of extra corpus scans
    // (raw is still scanned once more by the scoring join below — the
    // inherent two passes: count, then score)
    // localCheckpoint pins the tiny count tables so the totals action and
    // the ratio join both read them instead of re-scanning the corpora
    val ct = tgtF.groupBy("b").agg(count(lit(1)).as("ct")).localCheckpoint()
    val cr = rawF.groupBy("b").agg(count(lit(1)).as("cr")).localCheckpoint()
    val sumOf = (df: DataFrame, c: String) =>
      df.agg(coalesce(sum(col(c)), lit(0L))).head().getLong(0)
    val nT = sumOf(ct, "ct") + vocab // add-1 smoothing mass over the buckets
    val nR = sumOf(cr, "cr") + vocab
    val ratio = ct.join(cr, Seq("b"), "full")
      .select(col("b"),
        round((log(coalesce(col("ct"), lit(0L)) + 1) - log(lit(nT))
          - log(coalesce(col("cr"), lit(0L)) + 1) + log(lit(nR)))
          * scale).cast("long").as("lr"))
    val scored = rawF.join(broadcast(ratio), Seq("b"), "left")
      .groupBy("doc_id")
      .agg(sum(coalesce(col("lr"), lit(0L))).as("logw"))
    // featureless documents (< 2 tokens → zero bigram rows) score a
    // NEUTRAL logw = 0 instead of vanishing: dropping them would shrink
    // select()'s candidate pool silently, and a zero-evidence doc should
    // outrank negative-evidence docs, not be unselectable
    raw.select("doc_id").distinct()
      .join(scored, Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("logw"), lit(0L)).as("logw"))
  }

  /** Keep the `k` most target-like documents (ties → doc_id): the DSIR
    * selection step as a bounded top-k. */
  def select(weights: DataFrame, k: Int): DataFrame =
    weights.orderBy(col("logw").desc, col("doc_id")).limit(k)
}
