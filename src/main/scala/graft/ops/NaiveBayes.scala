package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Model-based quality filtering: a multinomial Naive Bayes classifier
  * over hashed token buckets, trained and applied entirely in-engine —
  * the fastText-style "does this look like reference text?" gate of LLM
  * data pipelines, without shipping a model file.
  *
  * Engine-agnostic by construction: the only floating-point step is the
  * per-bucket log-likelihood-ratio, computed with an IDENTICAL expression
  * shape on both engines — `ln(cp+1) − ln(Npos+V) − ln(cn+1) + ln(Nneg+V)`
  * left-associated, on integer-valued doubles — then rounded ONCE to
  * fixed-point deci-milli-nats (·10⁴). Everything after that rounding is
  * exact integer addition, so document scores and predictions reproduce
  * bit-for-bit in a SQL oracle. (A last-ulp libm divergence could only
  * flip a rounding that lands within ~1e-15 of a .5 boundary —
  * vanishing, and deterministic per dataset, never flaky.)
  *
  * Scale shape: token counting is one `groupBy(y, bucket)` with map-side
  * combine (≤ 2·V result rows); class totals are a 2-row collect; the
  * per-bucket LLR table is ≤ V rows and BROADCAST to the scoring join, so
  * scoring is one shuffle-free pass plus the per-doc sum. Laplace
  * smoothing keeps every LLR finite for buckets seen in only one class —
  * and for buckets seen in NEITHER (out-of-vocabulary at scoring time),
  * which score the smoothed constant ln(Nneg+V) − ln(Npos+V), not 0.
  */
object NaiveBayes {

  /** Train on `docs` = `(doc_id, text)` with boolean `labels` =
    * `(doc_id, y)` (the seed heuristic or reference-corpus membership)
    * and score every document: returns `(doc_id, score, pred)` where
    * `score` is the integer fixed-point log-posterior ratio (prior +
    * summed token LLRs, positive ⇒ more positive-class-like) and
    * `pred = score > 0`. Both classes must be non-empty. */
  def fitScore(
      docs: DataFrame,
      labels: DataFrame,
      vocab: Int = 4096,
      scale: Long = 10000L): DataFrame = {
    require(vocab >= 2, s"vocab must be >= 2: $vocab")
    val toks = docs.select(col("doc_id"),
      explode(TextOps.tokens(col("text"))).as("tok"))
      .select(col("doc_id"),
        pmod(TextOps.h60(col("tok")), lit(vocab.toLong)).as("b"))

    // localCheckpoint pins the ≤ 2·V-row count table: it feeds the class
    // totals action AND both sides of the LLR full join — unpinned, the
    // corpus-scale tokenize+hash+join pipeline would re-run per consumer
    val cnt = toks.join(labels, "doc_id")
      .groupBy("y", "b").agg(count(lit(1)).as("c"))
      .localCheckpoint()

    val tokTotals = cnt.groupBy("y").agg(sum("c").as("n"))
      .collect().map(r => r.getBoolean(0) -> r.getLong(1)).toMap
    val docTotals = labels.groupBy("y").agg(count(lit(1)).as("d"))
      .collect().map(r => r.getBoolean(0) -> r.getLong(1)).toMap
    require(docTotals.getOrElse(true, 0L) > 0 && docTotals.getOrElse(false, 0L) > 0,
      s"both classes must be non-empty, got docs per class: $docTotals")
    val nPos = tokTotals.getOrElse(true, 0L) + vocab
    val nNeg = tokTotals.getOrElse(false, 0L) + vocab

    // one rounding per bucket; expression shape mirrored in SQL oracles
    val llr = cnt.filter(col("y")).select(col("b"), col("c").as("cp"))
      .join(cnt.filter(!col("y")).select(col("b"), col("c").as("cn")),
        Seq("b"), "full")
      .select(col("b"),
        round((log(coalesce(col("cp"), lit(0L)) + 1) - log(lit(nPos))
          - log(coalesce(col("cn"), lit(0L)) + 1) + log(lit(nNeg)))
          * scale).cast("long").as("llr"))

    val prior = round(
      lit(math.log(docTotals(true).toDouble / docTotals(false))) * scale)
      .cast("long")

    // Out-of-vocabulary buckets — never seen in EITHER class — still have
    // a defined smoothed LLR: ln(1) − ln(Npos+V) − ln(1) + ln(Nneg+V).
    // Coalescing them to 0 instead would let a document full of unseen
    // tokens score only its prior and silently flip pred; the constant
    // goes through the SAME expression shape and single rounding as the
    // per-bucket LLRs, so cross-engine bit-parity holds for it too.
    val llrOov = round(
      (log(lit(1.0)) - log(lit(nPos)) - log(lit(1.0)) + log(lit(nNeg)))
        * scale).cast("long")

    // score EVERY document: a null/empty text yields zero token rows, so
    // without the left join back to the id set it would vanish from the
    // output instead of scoring its prior (zero token evidence)
    val tokScores = toks.join(broadcast(llr), Seq("b"), "left")
      .groupBy("doc_id")
      .agg(sum(coalesce(col("llr"), llrOov)).as("tok_llr"))
    docs.select("doc_id").distinct()
      .join(tokScores, Seq("doc_id"), "left")
      .select(col("doc_id"),
        (coalesce(col("tok_llr"), lit(0L)) + prior).as("score"))
      .withColumn("pred", col("score") > 0)
  }
}
