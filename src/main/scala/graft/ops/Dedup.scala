package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.Cached._

/** Document deduplication operators for LLM-scale data pipelines.
  *
  * Scale design: every variant is shuffle-bounded by a *blocking* key —
  * LSH band keys (MinHash), the minimum shingle hash (n-gram Jaccard), or
  * the full text hash (exact) — so candidate generation is an equi-join, not
  * an all-pairs cross join. At 100 TB the band/bucket join shuffles only
  * (key, docId, signature) tuples, never document bodies.
  */
object Dedup {

  /** Exact dedup: one surviving row per distinct text (lowest doc_id wins).
    * At scale, group on h60(text) first and only compare bodies within a
    * colliding bucket; here the direct groupBy is the oracle-checked form. */
  def exact(docs: DataFrame): DataFrame =
    docs.groupBy("text")
      .agg(min(col("doc_id")).as("doc_id"), count(lit(1)).as("n_copies"))

  /** MinHash+LSH near-dup candidate pairs with estimated similarity.
    *
    * shingle(3-gram) → k-row MinHash signature → `bands`×`rowsPerBand`
    * banding → equi-join on (band index, band key) → estimate = fraction of
    * agreeing signature rows, filtered at `minEst`.
    *
    * The band join carries only (band, key, doc_id) — signatures are
    * re-attached to the deduplicated pair list afterwards, so the shuffle
    * never amplifies the k-long signature payload bands× (each band key is
    * itself derived from the signature, making the slim join lossless).
    */
  def minhashPairs(
      docs: DataFrame,
      k: Int = 16,
      bands: Int = 4,
      rowsPerBand: Int = 4,
      minEst: Double = 0.5): DataFrame = {
    // ONE shingle/signature/band pipeline (minhashIndexEntries) feeds both
    // the ad-hoc pair query and the persisted incremental index, so the
    // two can never drift. Materialized: the entries relation feeds FOUR
    // plan consumers (both sides of the band self-join + both signature
    // re-attach joins), and Spark plans each subtree independently — so
    // without the cut the tokenize/shingle/MinHash pass over every
    // document body runs four times. The cached relation is the slim
    // (doc_id, band, key, sig) projection — O(bands + k) longs per doc,
    // never the text — so at corpus scale the cut stores a small multiple
    // of the id space while saving three full passes over the bodies.
    val entries = minhashIndexEntries(docs, k, bands, rowsPerBand).cachedView
    val sigs = entries.select("doc_id", "sig").distinct()
    val keyed = entries.select("doc_id", "band", "key")

    val cand = keyed
      .select(col("band"), col("key"), col("doc_id").as("doc_a"))
      .join(keyed.select(col("band"), col("key"), col("doc_id").as("doc_b")),
        Seq("band", "key"))
      .filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b")
      .distinct()

    cand
      .join(sigs.select(col("doc_id").as("doc_a"), col("sig").as("sig_a")), "doc_a")
      .join(sigs.select(col("doc_id").as("doc_b"), col("sig").as("sig_b")), "doc_b")
      .withColumn("est_sim",
        size(filter(zip_with(col("sig_a"), col("sig_b"), (x, y) =>
          when(x === y, lit(1)).otherwise(lit(null)))
          , x => x.isNotNull)).cast("double") / k)
      .filter(col("est_sim") >= minEst)
      .select("doc_a", "doc_b", "est_sim")
  }

  /** Persisted LSH index entries for a document set: one row per
    * (doc_id, band, key) with the k-row MinHash signature attached — the
    * durable state [[minhashIncrement]] dedups new batches against. Same
    * shingle/signature/banding family as [[minhashPairs]], factored so the
    * index and the ad-hoc pair query can never drift. */
  def minhashIndexEntries(
      docs: DataFrame,
      k: Int = 16,
      bands: Int = 4,
      rowsPerBand: Int = 4): DataFrame = {
    require(bands * rowsPerBand == k, "bands*rowsPerBand must equal k")
    Scale.ensureParallelism(docs)
      .withColumn("toks", TextOps.tokens(col("text")))
      .filter(size(col("toks")) >= 3)
      .withColumn("sig", TextOps.minhashSignature(
        graft.functions.NgramHashes.of(col("toks"), 3), k))
      .select(col("doc_id"),
        posexplode(TextOps.bandKeys(col("sig"), bands, rowsPerBand))
          .as(Seq("band", "key")),
        col("sig"))
  }

  /** Incremental MinHash-LSH dedup of a NEW batch against a persisted
    * band index — the form continuous ingestion needs: the already-curated
    * corpus is never re-scanned, only its slim (band, key, id, sig) index
    * rows join against the batch's keys.
    *
    * A new document is a duplicate when its estimated similarity reaches
    * `minEst` against ANY indexed document (the corpus always wins,
    * regardless of id order) or any earlier-id document of its own batch.
    * Returns one row per matched new document:
    * (doc_id, n_dups, dup_of = lowest matching id, best_est). Accepted
    * docs = `newDocs` anti-joined on the result; appending their
    * [[minhashIndexEntries]] to the index (a manifest-committed parquet
    * append in practice) makes the next batch's dedup see them.
    *
    * Scale shape: both candidate joins are (band, key) equi-joins carrying
    * ids only; signatures re-attach by id afterwards. The index side is
    * ~`bands` rows per corpus doc and the probe side is batch-sized, so
    * the shuffle is bounded by the BATCH, not the corpus — the entire
    * point of keeping the index. */
  def minhashIncrement(
      newDocs: DataFrame,
      index: DataFrame,
      k: Int = 16,
      bands: Int = 4,
      rowsPerBand: Int = 4,
      minEst: Double = 0.5): DataFrame = {
    // Materialized for the same reason as [[minhashPairs]]: the batch's
    // entries feed five plan consumers (newKeyed in candOld + twice in
    // candNew, newSigs in the re-attach + otherSigs union), each of which
    // would otherwise re-run the signature pass over the batch bodies.
    // Batch-sized by definition, so the cut is always small.
    val newEntries =
      minhashIndexEntries(newDocs, k, bands, rowsPerBand).cachedView
    val newKeyed = newEntries.select("band", "key", "doc_id")
    val newSigs = newEntries.select("doc_id", "sig").distinct()
    val candOld = newKeyed
      .join(index.select(col("band"), col("key"), col("doc_id").as("other")),
        Seq("band", "key"))
      // at-least-once re-delivery legally replays a batch whose entries
      // were already appended to the index: the SAME doc must not be
      // rejected as a duplicate of itself, or replayed rows vanish
      .filter(col("other") =!= col("doc_id"))
      .select("doc_id", "other")
    val candNew = newKeyed
      .join(newKeyed.select(col("band"), col("key"),
        col("doc_id").as("other")), Seq("band", "key"))
      .filter(col("other") < col("doc_id"))
      .select("doc_id", "other")
    // distinct over the UNION, not just the index side: a replayed batch's
    // docs sit in BOTH the index and newSigs, and a duplicated sig row
    // would double-count that neighbor in n_dups — exactly in the
    // at-least-once redelivery scenario this op supports
    val otherSigs = index.select(col("doc_id").as("other"),
        col("sig").as("sig_b"))
      .unionByName(newSigs.select(col("doc_id").as("other"),
        col("sig").as("sig_b")))
      .distinct()
    candOld.unionByName(candNew).distinct()
      .join(newSigs.select(col("doc_id"), col("sig").as("sig_a")), "doc_id")
      .join(otherSigs, "other")
      .withColumn("est_sim",
        size(filter(zip_with(col("sig_a"), col("sig_b"), (x, y) =>
          when(x === y, lit(1)).otherwise(lit(null))), x => x.isNotNull))
          .cast("double") / k)
      .filter(col("est_sim") >= minEst)
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_dups"), min(col("other")).as("dup_of"),
        max(col("est_sim")).as("best_est"))
  }

  /** Per-document 32-bit SimHash (near-dup = small Hamming distance; the
    * companion pairing is a bucket join on rotated prefixes at scale). */
  def simhash(docs: DataFrame): DataFrame =
    docs
      .withColumn("th", TextOps.shingleHashes(TextOps.tokens(col("text"))))
      .withColumn("simhash", graft.functions.SimHash32.of(col("th")))
      .select("doc_id", "simhash")

  /** Distinct (doc_id, shingle-hash) pairs — the shared candidate-set shape
    * of the three decontamination variants. ONE definition so tokenization,
    * the ≥n filter, and the hash family cannot drift between q58/q88/q91
    * and their oracle SQL. */
  private def docShingleHashes(df: DataFrame, n: Int): DataFrame =
    Scale.ensureParallelism(df)
      .withColumn("toks", TextOps.tokens(col("text")))
      .filter(size(col("toks")) >= n)
      .select(col("doc_id"),
        explode(array_distinct(graft.functions.NgramHashes.of(col("toks"), n)))
          .as("h"))

  /** Benchmark decontamination: per training document, the number of
    * distinct word n-gram shingles it shares with an evaluation/benchmark
    * corpus (n_shared > 0 ⇒ contaminated; the caller drops or audits them).
    *
    * Both sides reduce to distinct (doc_id, shingle-hash) pairs, so the
    * only shuffle is the equi-join on the 60-bit shingle hash — at 100 TB
    * the eval side (benchmarks are small) collapses to a broadcast set and
    * the training corpus streams through it; document bodies never move.
    * Cf. /root/reference — no decontamination exists there; this is part of
    * the training-pipeline surface the rebuild adds.
    */
  def shingleOverlap(train: DataFrame, evalDocs: DataFrame, n: Int = 3): DataFrame = {
    val evalHashes = docShingleHashes(evalDocs, n).select("h").distinct()
    docShingleHashes(train, n)
      .join(evalHashes, "h") // per-doc hashes already distinct ⇒ count = distinct shared
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_shared"))
  }

  /** [[shingleOverlap]] with per-document coverage: every training document
    * keeps a row with its distinct-shingle count, how many of those appear
    * anywhere in the eval corpus, and the contamination fraction — the
    * graded signal pipelines threshold on (e.g. drop > 10% overlap, audit
    * 1–10%) where the boolean join form only flags any-overlap. Same scale
    * shape: distinct (doc_id, hash) pairs, one equi-join on the 60-bit
    * hash, eval side broadcast-sized in practice. The join is LEFT so
    * clean documents keep frac = 0 rows instead of vanishing. */
  def shingleOverlapFraction(train: DataFrame, evalDocs: DataFrame,
      n: Int = 3): DataFrame = {
    val evalHashes = docShingleHashes(evalDocs, n).select("h").distinct()
      .withColumn("__hit", lit(1L))
    docShingleHashes(train, n)
      .join(evalHashes, Seq("h"), "left")
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_shingles"),
        coalesce(sum(col("__hit")), lit(0L)).as("n_shared"))
      .withColumn("frac",
        round(col("n_shared").cast("double") / col("n_shingles"), 6))
  }

  /** Bloom-pruned decontamination: the training documents that share NO
    * word n-gram shingle with the eval corpus — i.e. the clean set q58/q88
    * would keep.
    *
    * The eval side's distinct shingle hashes build a [[BloomFilter]]
    * (`df.stat.bloomFilter` — a distributed OR-merge, sketch size set by
    * item count and `fpp`, independent of corpus size). Training shingles
    * stream through the filter *before* the exact semi-join, so at 100 TB
    * only the ~`fpp` false-positive fraction of clean shingles (plus true
    * hits) pays the join shuffle; everything else is eliminated scan-side by
    * a codegen'd bit probe. Blooms have no false negatives and the exact
    * join removes false positives, so the result is value-identical to the
    * plain anti-join. The eval shingle set is materialized once
    * (`localCheckpoint`, the Cluster.scala pattern) and reused by all three
    * of its consumers — the size count, the sketch build, and the exact
    * confirm join — so the eval corpus (the small side by construction) is
    * shingled exactly once, not three times.
    */
  def bloomClean(train: DataFrame, evalDocs: DataFrame, n: Int = 3,
      fpp: Double = 0.03): DataFrame = {
    val evalHashes = docShingleHashes(evalDocs, n).select("h").distinct()
      .localCheckpoint()
    val nEval = math.max(evalHashes.count(), 1L)
    val bloom = evalHashes.stat.bloomFilter("h", nEval, fpp)
    val contaminated = docShingleHashes(train, n)
      .filter(graft.functions.BloomMightContain.of(bloom, col("h")))
      .join(evalHashes, "h")
      .select("doc_id").distinct()
    train.join(contaminated, Seq("doc_id"), "left_anti")
  }

  /** Substring-level duplication detection (the span dedup of Lee et al.,
    * "Deduplicating Training Data Makes Language Models Better", 2022 —
    * doc-level dedup misses boilerplate, licenses and quoted passages that
    * repeat INSIDE otherwise-distinct documents).
    *
    * Slides a `window`-char window at `stride` over every document, hashes
    * each window, and flags windows whose hash occurs more than once in the
    * corpus — in another document or repeated within the same one. Returns
    * one row per window: `(doc_id, p (1-based char offset), h, is_dup)` —
    * span-level, so a caller can mask/cut the flagged `[p, p+window)`
    * ranges, not just drop whole documents.
    *
    * Scale shape: the shuffle carries (hash, doc_id) pairs — 16 bytes per
    * window, never window text; `stride` caps volume at `chars/stride`
    * rows per document (stride = window ⇒ non-overlapping first-pass scan);
    * the duplicated-hash set comes from one groupBy and rejoins by
    * equi-join. Window offsets are generated through a two-level explode so
    * no single row ever materializes more than 64 Ki positions at once — a
    * 100 MB document at stride 1 streams through ~1.5 k bounded inner
    * arrays instead of one 100 M-element array (`sequence()` would
    * otherwise both OOM and hit Spark's array-length ceiling). 60-bit
    * hashes keep accidental collisions ≈ 0 at trillions of windows while
    * staying exactly reproducible in the DuckDB oracle (q101).
    *
    * Honesty note on `stride > 1`: two documents only collide on a window
    * when both sample the SAME substring, so a shared run at different
    * offsets mod `stride` can be missed (fixed-stride sampling is
    * alignment-sensitive — fine for aligned duplication like shared
    * prefixes/templates, and for the within-corpus audit rate; for
    * alignment-robust detection use `stride = 1`, or anchor window starts
    * on content the way `TextOps.cdcChunks` picks chunk boundaries). */
  def duplicatedSpans(
      docs: DataFrame,
      window: Int = 64,
      stride: Int = 32): DataFrame = {
    require(window > 0 && stride > 0, "window and stride must be positive")
    val chunk = 1 << 16
    // Lazily checkpointed: `wins` feeds BOTH the duplicated-hash aggregate
    // and the probe side of the rejoin, and without materialization the
    // hash-every-window scan (the dominant cost) runs once per consumer.
    // Lazy (eager = false) so merely building/explaining the plan stays
    // side-effect free; the first action computes windows once and both
    // subtrees reuse the (doc_id, p, h) rows — 24 bytes/window, spilling
    // to disk when they outgrow memory.
    val wins = Scale.ensureParallelism(docs)
      .filter(length(col("text")) >= window)
      // nJ = number of window start offsets; ci = 64Ki-position chunk index
      .withColumn("nJ", expr(s"(length(text) - $window) DIV $stride + 1"))
      .select(col("doc_id"), col("text"), col("nJ"),
        explode(expr(s"sequence(0L, (nJ - 1) DIV $chunk)")).as("ci"))
      .select(col("doc_id"), col("text"),
        explode(expr(
          s"sequence(ci * $chunk, least(nJ - 1, ci * $chunk + ${chunk - 1}))"))
          .as("j"))
      .select(col("doc_id"), expr(s"j * $stride + 1").as("p"), col("text"))
      .select(col("doc_id"), col("p"),
        TextOps.h60(col("text").substr(col("p"), lit(window))).as("h"))
      // the window-hash relation is the LARGEST in the pipeline (one row
      // per window position) — recoverable cache, never non-replicated
      // checkpoint blocks (Index.buildPostings rationale)
      .cachedView
    markDuplicated(wins)
  }

  /** Shared tail of the span detectors: flag every (doc_id, p, h) window
    * row whose hash occurs more than once in the corpus. */
  private def markDuplicated(wins: DataFrame): DataFrame = {
    val dupHashes = wins.groupBy("h")
      .agg(count(lit(1)).as("n"))
      .filter(col("n") > 1)
      .select("h")
    wins.join(dupHashes.withColumn("is_dup", lit(true)), Seq("h"), "left")
      .select(col("doc_id"), col("p"), col("h"),
        coalesce(col("is_dup"), lit(false)).as("is_dup"))
  }

  /** Alignment-robust variant of [[duplicatedSpans]]: window starts are
    * CONTENT-ANCHORED instead of fixed-stride — a window starts at `p`
    * exactly when `h60(text[p, p+anchorGram)) % stride == 0` (the
    * [[TextOps.cdcChunks]] boundary trick applied to window placement).
    * Because the anchor decision depends only on the `anchorGram` chars at
    * the position, two copies of a shared run anchor at the SAME relative
    * offsets no matter where the run sits in each document — so a
    * duplicate at offsets differing by a non-multiple of `stride`, which
    * fixed-stride sampling provably misses, still collides here. Expected
    * sampling density matches fixed-stride (one window per `stride` chars,
    * geometrically distributed gaps).
    *
    * Cost shape: every char position is examined (an `anchorGram`-char
    * hash each, via the same bounded two-level explode), but only the
    * ~1/stride anchored survivors hash their full `window` chars or enter
    * the shuffle — so vs `stride = 1` this trades exactness for
    * `window/anchorGram`-fold less hash input and `stride`-fold less
    * shuffle. Long anchor-free gaps (probability (1-1/stride)^len) are the
    * honest residual blind spot, the standard CDC trade-off. */
  def duplicatedSpansAnchored(
      docs: DataFrame,
      window: Int = 64,
      stride: Int = 32,
      anchorGram: Int = 8): DataFrame = {
    require(window > 0 && stride > 0, "window and stride must be positive")
    require(anchorGram > 0 && anchorGram <= window,
      "anchorGram must be in [1, window]")
    val chunk = 1 << 16
    val wins = Scale.ensureParallelism(docs)
      .filter(length(col("text")) >= window)
      // nP = number of candidate start positions (stride-1 enumeration;
      // the anchor predicate then keeps ~1/stride of them)
      .withColumn("nP", expr(s"length(text) - $window + 1"))
      .select(col("doc_id"), col("text"), col("nP"),
        explode(expr(s"sequence(0L, (nP - 1) DIV $chunk)")).as("ci"))
      .select(col("doc_id"), col("text"),
        explode(expr(
          s"sequence(ci * $chunk + 1, least(nP, ci * $chunk + $chunk))"))
          .as("p"))
      // anchor check BEFORE the window hash: h60 is non-negative, so % is
      // pmod, and the identical predicate runs in the DuckDB oracle
      .filter(TextOps.h60(col("text").substr(col("p"), lit(anchorGram)))
        % lit(stride.toLong) === 0)
      .select(col("doc_id"), col("p"),
        TextOps.h60(col("text").substr(col("p"), lit(window))).as("h"))
      // corpus × anchor-hit positions — recoverable cache (see above)
      .cachedView
    markDuplicated(wins)
  }

  /** Cut duplicated spans out of the corpus, keep-first policy (the Lee et
    * al. remedy, not just the diagnosis): for every duplicated window the
    * globally first occurrence (lowest `(doc_id, p)`) keeps its text; every
    * other occurrence's `[p, p+window)` range is cut from its document.
    * Kept intervals are PROTECTED: a document's cut ranges are subtracted
    * against its own kept ranges before splicing, so a kept span can never
    * be clipped by an overlapping cut whose keeper lives in another
    * document — every duplicated substring's content survives somewhere.
    * The converse guarantee is deliberately NOT total: when a document's
    * kept ranges jointly cover a cut occurrence of some other hash, that
    * occurrence survives inside the protected region (protection wins over
    * removal), so a re-scan can still flag residual duplication in such
    * overlap webs — run detect→cut to a fixpoint if zero residual matters
    * more than keeping every keeper intact.
    * Returns `docs` with `text` rewritten (other columns untouched);
    * documents with nothing to cut pass through byte-identical.
    *
    * Overlapping cut ranges (stride < window) are merged per document, the
    * keep-subtraction and the final splice are `aggregate`s over the small
    * per-doc interval arrays — per-row array work, no extra shuffle beyond
    * [[duplicatedSpans]]' own. The flagged-window set (tiny: duplicated
    * windows only) is `localCheckpoint`ed once for its two consumers, so
    * the dominant hash-every-window scan runs once per call, not once per
    * downstream subtree (the `bloomClean` pattern). Use `stride = 1` when
    * the cut must be alignment-exact (see the honesty note on
    * [[duplicatedSpans]]). */
  def cutDuplicatedSpans(
      docs: DataFrame,
      window: Int = 64,
      stride: Int = 1): DataFrame = {
    val flagged = duplicatedSpans(docs, window, stride)
      .filter(col("is_dup"))
      .localCheckpoint()
    cutFlaggedSpans(docs, flagged, window)
  }

  /** Detect → cut iterated to a fixpoint: re-scan after every cut and stop
    * when no duplicated window remains (or after `maxRounds`). One round of
    * [[cutDuplicatedSpans]] can leave residual duplication two ways — a cut
    * occurrence surviving inside a keeper-protected region (overlap webs),
    * and the splice itself creating a NEW duplicated window across a cut
    * joint — so callers that need a zero-residual guarantee iterate.
    * Each round is one detect scan (reused for both the emptiness check and
    * the cut, via the eager `localCheckpoint` of the tiny flagged set) plus
    * one splice; the rewritten corpus gets a [[Lineage]] state cut per
    * round so lineage stays O(1) across rounds and the fixpoint survives
    * executor loss in durable mode (the [[Cluster]] fixpoint pattern).
    * Convergence is typical but not guaranteed (adversarial overlap webs
    * can stall on keeper protection), hence the `maxRounds` bound — the
    * caller can re-check with [[duplicatedSpans]] when zero residual is a
    * hard requirement. */
  def cutDuplicatedSpansFixpoint(
      docs: DataFrame,
      window: Int = 64,
      stride: Int = 1,
      maxRounds: Int = 8): DataFrame = {
    val lin = new Lineage(docs.sparkSession)
    var cur = docs
    var round = 0
    while (round < maxRounds) {
      val flagged = duplicatedSpans(cur, window, stride)
        .filter(col("is_dup"))
        .localCheckpoint() // tiny: duplicated windows only
      if (flagged.isEmpty) return cur
      // the rewritten corpus is ITERATED state — Lineage cut (durable
      // when a checkpoint dir is configured, like Cluster/Graph/Bpe)
      cur = lin.state(cutFlaggedSpans(cur, flagged, window), eager = true)
      round += 1
    }
    cur
  }

  /** Splice core shared by the one-shot cut and the fixpoint: applies the
    * keep-first / keeper-protected cutting policy documented on
    * [[cutDuplicatedSpans]] to a pre-computed flagged-window set
    * (`(doc_id, p, h)` rows of duplicated windows only, expected to be
    * materialized by the caller since it feeds two subtrees here). */
  private def cutFlaggedSpans(
      docs: DataFrame,
      flagged: DataFrame,
      window: Int): DataFrame = {
    val emptyIvs = "cast(array() as array<struct<s:bigint,e:bigint>>)"
    val keep = flagged.groupBy("h")
      .agg(min(struct(col("doc_id"), col("p"))).as("keep"))
    val keepIvs = keep
      .groupBy(col("keep.doc_id").as("doc_id"))
      .agg(sort_array(collect_set(struct(col("keep.p").as("s"),
        (col("keep.p") + lit(window.toLong)).as("e")))).as("keeps"))
    val cuts = flagged.join(keep, "h")
      .filter(!(col("doc_id") === col("keep.doc_id")
        && col("p") === col("keep.p")))
      .groupBy("doc_id")
      .agg(sort_array(collect_set(struct(col("p").as("s"),
        (col("p") + lit(window.toLong)).as("e")))).as("ivs"))
      .withColumn("merged", expr(
        s"""aggregate(ivs, $emptyIvs,
           |  (acc, iv) -> CASE
           |    WHEN size(acc) > 0 AND element_at(acc, -1).e >= iv.s
           |    THEN concat(slice(acc, 1, size(acc) - 1),
           |      array(named_struct('s', element_at(acc, -1).s,
           |        'e', greatest(element_at(acc, -1).e, iv.e))))
           |    ELSE concat(acc, array(iv)) END)""".stripMargin))
      .join(keepIvs, Seq("doc_id"), "left")
      .withColumn("keeps", coalesce(col("keeps"), expr(emptyIvs)))
      // subtract kept ranges from each merged cut range: walk the (sorted)
      // overlapping keeps, emitting the uncovered segments of the cut
      .withColumn("protected", expr(
        s"""flatten(transform(merged, c ->
           |  aggregate(
           |    filter(keeps, k -> k.s < c.e AND k.e > c.s),
           |    named_struct('pos', c.s, 'acc', $emptyIvs),
           |    (st, k) -> named_struct(
           |      'pos', greatest(st.pos, k.e),
           |      'acc', CASE WHEN k.s > st.pos
           |        THEN concat(st.acc,
           |          array(named_struct('s', st.pos, 'e', k.s)))
           |        ELSE st.acc END),
           |    st -> CASE WHEN st.pos < c.e
           |      THEN concat(st.acc,
           |        array(named_struct('s', st.pos, 'e', c.e)))
           |      ELSE st.acc END)))""".stripMargin))
      .select("doc_id", "protected")
    docs.join(cuts, Seq("doc_id"), "left")
      .withColumn("text", when(col("protected").isNull, col("text"))
        .otherwise(expr(
          """aggregate(protected, named_struct('pos', 1L, 'acc', ''),
            |  (st, iv) -> named_struct('pos', iv.e,
            |    'acc', concat(st.acc,
            |      substring(text, cast(st.pos AS INT),
            |        cast(iv.s - st.pos AS INT)))),
            |  st -> concat(st.acc,
            |    substring(text, cast(st.pos AS INT), length(text))))"""
            .stripMargin)))
      .drop("protected")
  }

  /** Exact n-gram Jaccard over candidate pairs blocked by the minimum shingle
    * hash (documents sharing their rarest-hashed shingle collide; a cheap
    * single-key block that catches all high-Jaccard pairs with 3-gram
    * overlap on the min element). */
  def jaccardPairs(docs: DataFrame, minJaccard: Double = 0.5): DataFrame = {
    val sh = Scale.ensureParallelism(docs)
      .withColumn("toks", TextOps.tokens(col("text")))
      .filter(size(col("toks")) >= 3)
      // Jaccard runs on hashed shingles (array<long>) — set-equivalent to
      // the string shingles modulo 60-bit collisions, far cheaper to
      // intersect. One blocking key per doc ⇒ each pair appears exactly
      // once, so no distinct is needed.
      .withColumn("hs", graft.functions.NgramHashes.of(col("toks"), 3))
      .withColumn("minh", array_min(col("hs")))
      .select("doc_id", "hs", "minh")
    val a = sh.select(col("minh"), col("doc_id").as("doc_a"), col("hs").as("hs_a"))
    val b = sh.select(col("minh"), col("doc_id").as("doc_b"), col("hs").as("hs_b"))
    a.join(b, "minh")
      .filter(col("doc_a") < col("doc_b"))
      .withColumn("jac", TextOps.jaccard(col("hs_a"), col("hs_b")))
      .filter(col("jac") >= minJaccard)
      .select("doc_a", "doc_b", "jac")
  }
}
