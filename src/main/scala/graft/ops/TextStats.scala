package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.ops.Cached._

/** Text-analysis operators: language id, quality scoring, token counting,
  * fingerprinting. All single-pass, per-row, codegen-friendly — embarrassingly
  * parallel at any scale (no shuffle at all until an aggregation is asked). */
object TextStats {

  /** Tiny per-language stopword lists for the n-gram-free heuristic
    * language id. (Real pipelines plug fastText etc. — the operator shape,
    * argmax over per-language evidence counts, is what matters here.) */
  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "in", "to", "is"),
    "es" -> Seq("el", "la", "de", "y", "en", "que", "es"),
    "de" -> Seq("der", "die", "das", "und", "ist", "von", "zu"))

  private def hits(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => t.isin(words.map(lit(_)): _*)))

  /** (doc_id, en_hits, es_hits, de_hits, lang_pred): strict-argmax language
    * with ties → "und". */
  def languageId(docs: DataFrame): DataFrame = {
    val toks = TextOps.tokens(col("text"))
    docs
      .withColumn("en_hits", hits(toks, stopwords("en")))
      .withColumn("es_hits", hits(toks, stopwords("es")))
      .withColumn("de_hits", hits(toks, stopwords("de")))
      .withColumn("lang_pred",
        when(col("en_hits") > col("es_hits") && col("en_hits") > col("de_hits"), "en")
          .when(col("es_hits") > col("en_hits") && col("es_hits") > col("de_hits"), "es")
          .when(col("de_hits") > col("en_hits") && col("de_hits") > col("es_hits"), "de")
          .otherwise("und"))
      .select("doc_id", "en_hits", "es_hits", "de_hits", "lang_pred")
  }

  /** Heuristic quality score from length / uniqueness / stopword-density
    * signals: `0.4·uniq_ratio + 0.3·stop_ratio + 0.3·min(n_tokens/64, 1)`,
    * emitted in exact integer micro-units (ppm).
    *
    * Integer-exact on purpose: the ratios are rationals over n_tokens and a
    * dyadic /64, which land exactly on ROUND(x,6) half-way boundaries —
    * where Spark (decimal half-up) and DuckDB (×1e6 in double, then
    * half-away) disagree. One shared integer formula,
    * `(2·num + den) div (2·den)` over a common denominator, removes floats
    * from the comparison entirely. */
  def quality(docs: DataFrame): DataFrame = {
    val toks = TextOps.tokens(col("text"))
    docs
      .withColumn("n_tokens", size(toks).cast("long"))
      .withColumn("n_uniq", size(array_distinct(toks)).cast("long"))
      .withColumn("n_stop", hits(toks, stopwords("en")).cast("long"))
      // score_ppm = round(1e6 · (0.4·u/t + 0.3·s/t + 0.3·min(t,64)/64))
      .withColumn("num",
        lit(64L) * (lit(400000L) * col("n_uniq") + lit(300000L) * col("n_stop"))
          + lit(300000L) * least(col("n_tokens"), lit(64L)) * col("n_tokens"))
      .withColumn("den", lit(64L) * col("n_tokens"))
      .withColumn("score_ppm", expr("(2 * num + den) DIV (2 * den)"))
      .select("doc_id", "n_tokens", "n_uniq", "n_stop", "score_ppm")
  }

  /** Gopher-style quality rule battery (Rae et al. 2021, table A1 — the
    * published heuristic filter suite every large curation pipeline since
    * has reused): per-document booleans for
    *   - word count within `[minWords, maxWords]`
    *   - mean word length within [3, 10] characters
    *   - symbol-to-word ratio (`#` and `...`) ≤ 1/10
    *   - ≥ 80% of words contain an alphabetic character
    *   - ≥ 2 distinct Gopher stop words present
    * plus an overall `pass` conjunction.
    *
    * Every ratio rule is a cross-multiplied INTEGER comparison (`3·n ≤
    * chars ≤ 10·n`, never `chars/n`), so the verdicts are bit-identical in
    * any engine — no float thresholds to disagree on. The two line-shape
    * rules from the paper (bullet-start / ellipsis-end line fractions) need
    * multi-line text and live with the line machinery
    * ([[TextOps.removeBoilerplateLines]]); this corpus is single-line.
    * Scale shape: per-row expressions only, zero shuffle — embarrassingly
    * parallel at any corpus size. */
  def gopherRules(
      docs: DataFrame,
      minWords: Int = 50,
      maxWords: Int = 100000): DataFrame = {
    val gopherStops = Seq("the", "be", "to", "of", "and", "that", "have", "with")
    val toks = TextOps.tokens(col("text"))
    docs
      .withColumn("n_words", size(toks).cast("long"))
      // total characters across words = text minus its separator spaces
      .withColumn("word_chars",
        length(expr("replace(text, ' ', '')")).cast("long"))
      .withColumn("n_alpha_words",
        size(filter(toks, w => w.rlike("[a-zA-Z]"))).cast("long"))
      .withColumn("n_stop_hits",
        size(array_intersect(array_distinct(toks),
          array(gopherStops.map(lit(_)): _*))).cast("long"))
      .withColumn("n_symbols",
        (length(col("text")) - length(expr("replace(text, '#', '')"))).cast("long")
          + expr(
            "CAST(length(text) - length(replace(text, '...', '')) AS BIGINT) DIV 3"))
      .withColumn("ok_word_count",
        col("n_words").between(minWords.toLong, maxWords.toLong))
      .withColumn("ok_mean_word_len",
        lit(3L) * col("n_words") <= col("word_chars") &&
          col("word_chars") <= lit(10L) * col("n_words"))
      .withColumn("ok_symbol_ratio",
        lit(10L) * col("n_symbols") <= col("n_words"))
      .withColumn("ok_alpha_words",
        lit(5L) * col("n_alpha_words") >= lit(4L) * col("n_words"))
      .withColumn("ok_stop_words", col("n_stop_hits") >= 2L)
      .withColumn("pass",
        col("ok_word_count") && col("ok_mean_word_len") &&
          col("ok_symbol_ratio") && col("ok_alpha_words") &&
          col("ok_stop_words"))
      .select("doc_id", "n_words", "word_chars", "n_alpha_words",
        "n_stop_hits", "n_symbols", "ok_word_count", "ok_mean_word_len",
        "ok_symbol_ratio", "ok_alpha_words", "ok_stop_words", "pass")
  }

  /** Token counting: whitespace tokens, BPE-ish subword pieces (letter runs,
    * digit runs, single other symbols), and byte length. */
  def tokenCounts(docs: DataFrame): DataFrame =
    docs
      .withColumn("ws_tokens", size(TextOps.tokens(col("text"))))
      .withColumn("bpe_pieces",
        size(expr("regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]', 0)")))
      .withColumn("n_bytes", octet_length(col("text")))
      .select("doc_id", "ws_tokens", "bpe_pieces", "n_bytes")

  /** Per-document unigram Shannon entropy (nats) over whitespace tokens:
    * `ln(n) − Σ c·ln(c) / n` where `c` are within-doc word counts — the
    * cheap gibberish/repetition signal (keyboard-mash and template spam
    * both collapse the word distribution, one from too few distinct words
    * repeated, one from a fixed skeleton) that complements [[quality]]'s
    * ratio features. Two map-side-combined aggregates keyed by
    * (doc, word) then doc — entropy never sees the corpus vocabulary, so
    * the shuffle is bounded by document size, not corpus size. Rounded to
    * 6dp for engine-stable double sums. */
  def wordEntropy(docs: DataFrame): DataFrame = {
    val toks = docs.select(
      col("doc_id"), explode(TextOps.tokens(col("text"))).as("w"))
    toks.groupBy("doc_id", "w").agg(count(lit(1)).as("c"))
      .groupBy("doc_id")
      .agg(
        sum("c").as("n_tokens"),
        round(
          log(sum(col("c")).cast("double")) -
            sum(col("c").cast("double") * log(col("c").cast("double"))) /
              sum(col("c")).cast("double"), 6).as("entropy"))
  }

  /** Rolling-hash document fingerprint over word 4-gram windows: min / max /
    * xor-fold of the window hashes (winnowing-style content signature, order-
    * independent folds so partitioning never changes the result). */
  def fingerprint(docs: DataFrame): DataFrame = {
    val toks = TextOps.tokens(col("text"))
    docs
      .withColumn("toks", toks)
      .filter(size(col("toks")) >= 4)
      .withColumn("wh", graft.functions.NgramHashes.of(col("toks"), 4))
      .withColumn("fp_min", array_min(col("wh")))
      .withColumn("fp_max", array_max(col("wh")))
      .withColumn("fp_xor", aggregate(col("wh"), lit(0L), (a, x) => a.bitwiseXOR(x)))
      .select("doc_id", "fp_min", "fp_max", "fp_xor")
  }

  /** Vocabulary growth curve (Heaps-law corpus analytics): the distinct
    * word-bigram count of the corpus prefix at `step`%, 2·`step`%, …,
    * 100%, prefixes drawn by the stable h60 document gate (engine-
    * reproducible, so the "prefix" is the same sample in any engine).
    *
    * The naive form replicates the corpus once per threshold; instead
    * each distinct bigram contributes at the FIRST prefix containing it
    * (its minimum document bucket), so the whole curve is: one distinct
    * reduction to (bigram-hash, min bucket), a ≤`buckets`-row count, and
    * a tiny in-plan expansion of bucket→thresholds — ONE corpus-scale
    * shuffle total, no replication, no non-equi join, no single-partition
    * window. */
  def vocabGrowth(docs: DataFrame, buckets: Int = 100,
      step: Int = 10): DataFrame = {
    require(buckets % step == 0, s"step must divide buckets: $buckets/$step")
    val f = docs
      .withColumn("b",
        pmod(TextOps.h60(col("doc_id").cast("string")), lit(buckets.toLong)))
      .withColumn("toks", TextOps.tokens(col("text")))
      .filter(size(col("toks")) >= 2)
      .select(col("b"),
        explode(array_distinct(
          graft.functions.NgramHashes.of(col("toks"), 2))).as("h"))
    val curve = f.groupBy("h").agg(min(col("b")).as("mb"))
      .groupBy("mb").agg(count(lit(1)).as("c"))
      .select(explode(sequence(
        expr(s"(mb DIV $step + 1) * $step").cast("long"),
        lit(buckets.toLong), lit(step.toLong))).as("pct"), col("c"))
      .groupBy("pct").agg(sum(col("c")).as("n_bigrams"))
    // zero-fill thresholds before the first populated bucket so the curve
    // always has buckets/step points
    docs.sparkSession.range(1, buckets / step + 1)
      .select((col("id") * step).cast("long").as("pct"))
      .join(curve, Seq("pct"), "left")
      .select(col("pct"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"))
      .orderBy("pct")
  }

  /** BM25 (Okapi, Lucene-style idf) top-k retrieval for a bag of query
    * terms: `score(d) = Σ_t ln(1 + (N − df + 0.5)/(df + 0.5)) ·
    * tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))`, rounded to 6dp before
    * ranking (ties → doc_id) so rankings are engine-stable.
    *
    * Scale shape: the per-(doc, term) shuffle carries only rows matching
    * the query terms (the explode is filtered before the groupBy); df is a
    * ≤|terms|-row broadcast; N and avgdl travel as one broadcast scalar
    * row; the doc-length join is keyed by doc_id and feeds the final
    * per-doc aggregation on the same key (one exchange, reused); top-k is
    * TakeOrderedAndProject, never a full sort. */
  def bm25TopK(
      docs: DataFrame,
      queryTerms: Seq[String],
      k1: Double,
      b: Double,
      k: Int): DataFrame = {
    require(queryTerms.nonEmpty, "queryTerms must be non-empty")
    val toks = TextOps.tokens(col("text"))
    val dl = docs.select(col("doc_id"), size(toks).cast("long").as("dl"))
    val stats = dl.agg(count(lit(1)).as("n_docs"), avg(col("dl")).as("avgdl"))
    val tf = docs
      .select(col("doc_id"), explode(toks).as("tok"))
      .filter(col("tok").isin(queryTerms.map(lit(_)): _*))
      .groupBy("doc_id", "tok").agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("tok").agg(count(lit(1)).as("df"))
    val idf = log(lit(1.0) +
      (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
    val norm = col("tf") + lit(k1) *
      (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl"))
    tf.join(broadcast(dfreq), "tok")
      .join(dl, "doc_id")
      .crossJoin(broadcast(stats))
      .groupBy("doc_id")
      .agg(round(sum(idf * col("tf") * lit(k1 + 1) / norm), 6).as("score"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(k)
  }

  /** Per-document top-k TF-IDF terms: tf = in-doc term count, idf =
    * ln(N/df) over the corpus, score rounded to 6dp before ranking (ties →
    * lexicographic term) so rankings are engine-stable. Two shuffles — the
    * (doc, term) count and the per-term document frequency — both keyed by
    * the term; N travels as one broadcast scalar. */
  def tfidfTopTerms(docs: DataFrame, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tf = docs
      .select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("tok"))
      .groupBy("doc_id", "tok").agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("tok").agg(count(lit(1)).as("df"))
    val n = docs.select(countDistinct(col("doc_id")).as("n_docs"))
    val w = Window.partitionBy("doc_id").orderBy(col("score").desc, col("tok"))
    tf.join(dfreq, "tok")
      .crossJoin(broadcast(n))
      .withColumn("score",
        round(col("tf") * log(col("n_docs").cast("double") / col("df")), 6))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select("doc_id", "tok", "tf", "score", "rn")
  }

  /** Per-source token-distribution drift vs the whole corpus: KL
    * divergence Σ_t p_s(t)·ln(p_s(t)/p(t)) — the monitor that catches a
    * source whose content shifted (new crawl snapshot, broken extractor)
    * before it pollutes a training mix. Reported in fixed-point: each
    * (source, token) term c·(ln c + ln N − ln C_t − ln N_s)·10⁴ is rounded
    * ONCE to an integer (the q108 discipline — identical left-associated
    * ln shape on both engines over integer-valued doubles), then
    * integer-summed, so the aggregate is bit-stable under any partitioning
    * or order. `kl_fp` ≈ N_s · KL(source ‖ corpus) · 10⁴.
    *
    * Scale shape: one explode → one (source, token) count shuffle; the
    * per-token corpus counts and per-source totals derive from that
    * already-collapsed count table (`localCheckpoint`ed once for its three
    * consumers), never from a second corpus pass; the corpus total rides
    * in as a broadcast 1-row aggregate. */
  def sourceDrift(docs: DataFrame): DataFrame = {
    val st = docs
      .select(col("source"), explode(TextOps.tokens(col("text"))).as("tok"))
      .groupBy("source", "tok").agg(count(lit(1)).as("c"))
      .cachedView // vocabulary-sized; recoverable cache for its three consumers
    val ct = st.groupBy("tok").agg(sum("c").as("ct"))
    val ns = st.groupBy("source").agg(sum("c").as("ns"))
    val nt = st.agg(sum("c").as("n"))
    val term = round((log(col("c")) + log(col("n")) - log(col("ct"))
      - log(col("ns"))) * col("c") * 10000).cast("long")
    st.join(ct, "tok")
      .join(broadcast(ns), "source")
      .crossJoin(broadcast(nt))
      .groupBy("source")
      .agg(max(col("ns")).as("n_tokens"), count(lit(1)).as("n_types"),
        sum(term).as("kl_fp"))
      .orderBy("source")
  }
}
