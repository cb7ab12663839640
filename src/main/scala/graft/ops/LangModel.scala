package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Statistical language-model scoring for corpus curation — the
  * perplexity-style quality filter every large-scale text pipeline runs
  * (score each document under an n-gram LM trained on the corpus itself or
  * a trusted reference corpus; drop the tail). Cf. the CCNet/KenLM
  * filtering stage of public web-corpus pipelines; the reference
  * (/root/reference) has no text-curation surface at all — this is part of
  * the training-pipeline extension.
  *
  * Everything is aggregates and equi-joins: token/bigram counting is two
  * map-side-combined groupBys, scoring joins each document's bigram
  * instances against the count tables on their string keys, and the
  * vocabulary size rides along as a broadcast one-row aggregate — no
  * driver-side model object, no collect. At 100 TB the LM tables are
  * themselves distributed (vocabulary and bigram tables shuffle on their
  * keys); nothing assumes they fit anywhere.
  */
object LangModel {

  /** Add-k–smoothed bigram cross-entropy per document, trained on
    * `train` and scored over `score` (pass the same frame for both to do
    * in-corpus scoring):
    *
    *   avg_logp(d) = round(mean over bigrams (w1 w2) of
    *     ln((c2(w1 w2) + k) / (c1(w1) + k·V)), 6)
    *
    * where c2/c1 are corpus bigram/unigram counts and V the vocabulary
    * size. Higher (closer to 0) = more typical text; gibberish and
    * boilerplate land in the low tail. Documents with fewer than 2 tokens
    * carry no bigram and are dropped (same as the SQL formulation).
    * Rounded to 6dp so the double mean is engine-stable under summation
    * reorder. */
  def bigramLogProb(train: DataFrame, score: DataFrame,
      k: Double = 0.5): DataFrame = {
    import graft.ops.Cached._
    def toks(df: DataFrame) =
      df.select(col("doc_id"), split(col("text"), " ").as("t"))
    val trainToks = toks(train)
    val unigrams = trainToks.select(explode(col("t")).as("w"))
    // c1 feeds both the scoring join and the vocabulary count below; its
    // shuffle (the Exchange under the final aggregate) is deduplicated at
    // runtime by AQE stage reuse, so no explicit materialization is
    // needed (measured: a localCheckpoint cut here was a net LOSS — the
    // store+read of the cut cost more than the reused-exchange re-agg).
    val c1 = unigrams.groupBy("w").agg(count(lit(1)).as("c1"))
    // V = COUNT(DISTINCT w) over the unigrams ≡ the number of groups the
    // c1 aggregate already produced — counting c1's rows instead of
    // running a second distinct-aggregate over the full token explode
    // removes an entire tokenize+explode pass over the corpus (the
    // distinct agg was the more expensive formulation of the same number)
    val vocab = c1.agg(count(lit(1)).cast("double").as("v"))

    def bigrams(df: DataFrame) = df
      .filter(size(col("t")) >= 2)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(0, size(t) - 2), " +
          "i -> struct(t[i] AS w1, concat(t[i], ' ', t[i + 1]) AS b))"))
        .as("s"))
      .select(col("doc_id"), col("s.w1").as("w1"), col("s.b").as("b"))

    val c2 = bigrams(trainToks).groupBy("b").agg(count(lit(1)).as("c2"))
    // LEFT joins: a bigram/word unseen in training scores under the pure
    // smoothing mass k/(c1 + kV) (resp. c1 = 0) instead of dropping —
    // that's the whole point of add-k smoothing
    bigrams(toks(score))
      .join(c2, Seq("b"), "left")
      .join(c1, col("w1") === col("w"), "left")
      .crossJoin(broadcast(vocab))
      .groupBy("doc_id")
      .agg(
        round(avg(log(
          (coalesce(col("c2"), lit(0L)) + k) /
            (coalesce(col("c1"), lit(0L)) + col("v") * k))), 6)
          .as("avg_logp"),
        count(lit(1)).as("n_bigrams"))
  }
}
