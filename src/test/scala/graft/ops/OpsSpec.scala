package graft.ops

import graft.SparkSpec
import graft.queries.ExtQueries
import org.apache.spark.sql.functions._

class OpsSpec extends SparkSpec {

  test("every extension query runs non-empty at sf0.001") {
    ExtQueries.queries.foreach { case (name, fn) =>
      // SQL-statement queries need the graft parser (TestSessions doc)
      val n =
        if (graft.TestSessions.parserQueries(name))
          graft.TestSessions.withExtensionsActive(s => fn(s, sfDir).count())
        else fn(spark, sfDir).count()
      assert(n > 0, s"$name returned no rows")
    }
  }

  test("bigram LM: common text outscores rare text; hand-checked on a tiny corpus") {
    import spark.implicits._
    // corpus: "a b" x3 establishes 'a b' as the common bigram; "a c" is rare
    val docs = Seq(
      (1L, "a b"), (2L, "a b"), (3L, "a b"), (4L, "a c"))
      .toDF("doc_id", "text")
    val scores = graft.ops.LangModel.bigramLogProb(docs, docs, k = 0.5)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // counts: c1(a)=4, c2("a b")=3, c2("a c")=1, V=3
    val common = math.log((3 + 0.5) / (4 + 0.5 * 3))
    val rare = math.log((1 + 0.5) / (4 + 0.5 * 3))
    assert(math.abs(scores(1L) - BigDecimal(common).setScale(6,
      BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
    assert(math.abs(scores(4L) - BigDecimal(rare).setScale(6,
      BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
    assert(scores(1L) > scores(4L), "common bigram must outscore rare one")
    // unseen-at-scoring text falls through the smoothing mass, no drop
    val unseen = graft.ops.LangModel.bigramLogProb(
      docs, Seq((9L, "z q")).toDF("doc_id", "text"), k = 0.5)
      .collect()
    assert(unseen.length == 1 &&
      math.abs(unseen.head.getDouble(1) -
        BigDecimal(math.log(0.5 / (0.5 * 3))).setScale(6,
          BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
  }

  test("contamination fraction: perturbed eval copies near 1, clean docs 0, ratio exact") {
    val rows = ExtQueries.q88ContaminationFrac(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getAs[Long]("n_shingles").toDouble
      val shared = r.getAs[Long]("n_shared").toDouble
      assert(math.abs(r.getAs[Double]("frac") - shared / n) < 1e-6)
    }
    // augmented near-dup copies of eval docs (id = eval_id + 1e6) are the
    // contaminated tail this op exists to surface
    val synth = rows.filter(r => r.getAs[Long]("doc_id") >= 1000000L &&
      (r.getAs[Long]("doc_id") - 1000000L) % 7 == 0)
    assert(synth.nonEmpty && synth.forall(_.getAs[Double]("frac") > 0.5))
    // and a clean-doc row exists with frac = 0 (LEFT join keeps it)
    assert(rows.exists(_.getAs[Double]("frac") == 0.0))
  }

  test("minhash LSH finds every synthetic near-dup pair") {
    val pairs = ExtQueries.q15MinhashLsh(spark, sfDir).collect()
    // doc_id % 50 == 0 → perturbed copy at id+1,000,000 (sf0.001: 10 docs)
    val synthetic = pairs.filter(r => r.getLong(1) == r.getLong(0) + 1000000L)
    assert(synthetic.length == 10, s"expected 10 synth pairs, got ${synthetic.length}")
    assert(synthetic.forall(_.getDouble(2) >= 0.5))
  }

  /** Non-periodic filler: distinct counter tokens (no cycling below 700k
    * chars), so no 64-gram repeats within it and different seeds never
    * share a 64-gram across docs. */
  private def uniq(seed: Char, len: Int): String =
    (0 until (len / 7 + 1)).map(i => f"$seed$i%05d,").mkString.take(len)

  test("duplicated spans: shared 64-char run flagged at its exact offsets") {
    import spark.implicits._
    val boiler = "x" * 30 + "SHARED-BOILERPLATE-" + "y" * 30 // 79 chars
    val docs = Seq(
      (1L, uniq('A', 40) + boiler + uniq('B', 20)), // boiler at offset 41 (1-based)
      (2L, boiler + uniq('C', 100)),                // boiler at offset 1
      (3L, uniq('D', 240))                          // nothing repeated anywhere
    ).toDF("doc_id", "text")
    val spans = Dedup.duplicatedSpans(docs, window = 64, stride = 1).cache()
    // stride 1 ⇒ any shared ≥64-char run must collide: doc 2's window at
    // p=1 equals doc 1's at p=41 (both cover boiler[0,64))
    val dup1 = spans.filter($"doc_id" === 1L && $"is_dup").select("p")
      .as[Long].collect().sorted
    val dup2 = spans.filter($"doc_id" === 2L && $"is_dup").select("p")
      .as[Long].collect().sorted
    assert(dup1.nonEmpty && dup2.nonEmpty, "shared run must be flagged in both docs")
    // offsets must correspond: doc1 dup windows start 40 later than doc2's
    assert(dup1.toSeq == dup2.map(_ + 40L).toSeq,
      s"span offsets must align: ${dup1.toSeq} vs ${dup2.toSeq}")
    // the 79-char shared run yields exactly 79-64+1 = 16 dup windows each
    assert(dup1.length == 16, s"expected 16 overlapping dup windows, got ${dup1.length}")
    assert(spans.filter($"doc_id" === 3L && $"is_dup").count() == 0,
      "the unique doc must have no duplicated spans")
    spans.unpersist()
  }

  test("duplicated spans: a block repeated WITHIN one document is flagged and cut") {
    import spark.implicits._
    val block = "z" * 20 + "WITHIN-DOC-LICENSE-BLOCK" + "w" * 20 // 64 chars
    val filler = uniq('F', 50)
    val d4 = block + filler + block // second copy at offset 64+50+1 = 115
    val docs = Seq((4L, d4)).toDF("doc_id", "text")
    val dup = Dedup.duplicatedSpans(docs, window = 64, stride = 1)
      .filter($"is_dup").select("p").as[Long].collect().sorted
    assert(dup.toSeq == Seq(1L, 115L),
      s"both within-doc occurrences must be flagged: ${dup.toSeq}")
    val cut = Dedup.cutDuplicatedSpans(docs, window = 64, stride = 1)
      .select("text").as[String].head()
    assert(cut == block + filler,
      "keep-first must keep the first copy and cut the second")
  }

  test("duplicated spans: offsets are exact across the 64Ki chunk boundary") {
    import spark.implicits._
    // > 65536 window positions forces the outer explode to ci ∈ {0, 1}; an
    // off-by-one at the boundary would duplicate or drop offsets silently
    val n = 65700
    val docs = Seq((9L, uniq('L', n))).toDF("doc_id", "text")
    val ps = Dedup.duplicatedSpans(docs, window = 64, stride = 1)
      .select("p").as[Long]
    val nJ = (n - 64) + 1
    assert(ps.count() == nJ, "one window per start offset, none lost")
    assert(ps.distinct().count() == nJ, "no offset emitted twice")
    val mm = ps.agg(min("p"), max("p")).as[(Long, Long)].head()
    assert(mm == ((1L, nJ.toLong)), s"offset range wrong: $mm")
  }

  test("cut duplicated spans: every non-kept occurrence removed (disjoint keeps)") {
    import spark.implicits._
    val boiler = "x" * 30 + "SHARED-BOILERPLATE-" + "y" * 30 // 79 chars
    val d1 = uniq('A', 40) + boiler + uniq('B', 20)
    val d2 = boiler + uniq('C', 100)
    val d3 = uniq('D', 240)
    val docs = Seq((1L, d1), (2L, d2), (3L, d3)).toDF("doc_id", "text")
    val cut = Dedup.cutDuplicatedSpans(docs, window = 64, stride = 1)
      .orderBy("doc_id").select("text").as[String].collect()
    assert(cut(0) == d1, "first occurrence keeps its text verbatim")
    assert(cut(1) == uniq('C', 100),
      s"doc 2's copy of the shared run must be cut out: '${cut(1).take(60)}'")
    assert(cut(2) == d3, "untouched docs pass through byte-identical")
    // the remedy worked: no duplicated window survives a re-scan
    val recheck = Dedup.duplicatedSpans(
      Seq((1L, cut(0)), (2L, cut(1)), (3L, cut(2))).toDF("doc_id", "text"),
      window = 64, stride = 1)
    assert(recheck.filter(col("is_dup")).count() == 0)
  }

  test("cut duplicated spans: kept occurrences are protected from overlapping cuts") {
    import spark.implicits._
    // S = 65 distinct chars; A = S[0,64), B = S[1,65). keeper(A) lives in
    // doc 2, keeper(B) in doc 1 — doc 2's cut of B overlaps its kept A,
    // which an unprotected cut would destroy (A would then survive nowhere)
    val s65 = (0 until 65).map(i => ('0' + i).toChar).mkString
    val a = s65.substring(0, 64)
    val b = s65.substring(1, 65)
    val docs = Seq((1L, b), (2L, s65), (3L, a)).toDF("doc_id", "text")
    val cut = Dedup.cutDuplicatedSpans(docs, window = 64, stride = 1)
      .orderBy("doc_id").select("text").as[String].collect()
    assert(cut(0) == b, "doc 1 holds B's keeper — untouched")
    assert(cut(1) == a,
      s"doc 2 must keep its protected A span and cut only B's tail: '${cut(1)}'")
    assert(cut(2) == "", "doc 3's copy of A is fully cut")
  }

  test("ngram jaccard: synthetic pairs have near-1 similarity") {
    val pairs = ExtQueries.q17NgramJaccard(spark, sfDir).collect()
    val synthetic = pairs.filter(r => r.getLong(1) == r.getLong(0) + 1000000L)
    assert(synthetic.length == 10)
    assert(synthetic.forall(_.getDouble(2) > 0.8))
  }

  test("embedding near-dup finds exactly the 5 perturbed vectors at sf0.001") {
    val pairs = ExtQueries.q18EmbedNearDup(spark, sfDir).collect()
    assert(pairs.length == 5)
    assert(pairs.forall(r => r.getLong(1) == r.getLong(0) + 1000000L))
    assert(pairs.forall(_.getDouble(2) > 0.99))
  }

  test("simhash of near-identical docs has small hamming distance") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "the quick brown fox jumps over the lazy dog again and often"),
      (3L, "completely different content about spark query engines at scale"))
      .toDF("doc_id", "text")
    val sh = Dedup.simhash(docs).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(hamming(sh(1L), sh(2L)) < hamming(sh(1L), sh(3L)))
    assert(hamming(sh(1L), sh(2L)) <= 8)
  }

  test("LSH ANN returns correctly-ranked bucket-mates only") {
    val vecs = graft.Tables.load(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val buckets = vecs.withColumn("bucket", Similarity.lshBucket("v"))
      .select("vec_id", "bucket").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val lsh = Similarity.lshTopK(vecs, col("vec_id") < 10, 3).collect()
    assert(lsh.nonEmpty)
    // every neighbor shares its probe's bucket (the candidate-set contract)
    assert(lsh.forall(r => buckets(r.getLong(1)) == buckets(r.getLong(0))))
    // ranks are 1..n per probe, sims non-increasing within a probe
    lsh.groupBy(_.getLong(0)).values.foreach { g =>
      val sorted = g.sortBy(_.getInt(3))
      assert(sorted.map(_.getInt(3)).sameElements(1 to g.length))
      assert(sorted.map(_.getDouble(2)).sliding(2).forall(
        p => p.length < 2 || p(0) >= p(1)))
    }
    // candidate generation ≡ bucket equality: lshTopK must never exceed
    // the per-bucket population minus the probe itself
    val popByBucket = buckets.values.groupBy(identity).map { case (k, v) => k -> v.size }
    lsh.groupBy(_.getLong(0)).foreach { case (q, g) =>
      assert(g.length <= math.min(3, popByBucket(buckets(q)) - 1))
    }
  }

  test("multimodal: metadata-only path prunes the payload column at the scan") {
    val media = Multimodal.asMedia(graft.Tables.load(spark, sfDir, "documents"))
    val plan = Multimodal.metadataOnly(media).queryExecution.executedPlan.toString
    assert(!plan.contains("payload"), "payload should be pruned:\n" + plan)
  }

  test("multimodal: synthetic media routes and decodes through the real codecs") {
    val decoded = Multimodal.routeBatch(
        Multimodal.syntheticMedia(graft.Tables.load(spark, sfDir, "documents")))
      .collect()
    assert(decoded.length == 500)
    val byKind = decoded.groupBy(_.kind)
    // real PNGs decode with real dimensions, real WAVs with real formats;
    // text payloads are classified unknown and come back as DATA, not errors
    assert(byKind("image").forall(d =>
      d.ok && d.width == 3 && d.height == 2 && d.channels == 3))
    assert(byKind("audio").forall(d =>
      d.ok && d.sample_rate == 8000 && d.channels == 1 &&
        d.frames == 40 + d.doc_id % 8))
    assert(byKind("unknown").forall(d => !d.ok))
    // closed-form decode stats: rms of constant amplitude a is exactly
    // a/32768; solid (r,g,b) means average to (r+g+b)/3
    byKind("audio").foreach { d =>
      val a = ((d.doc_id % 1000) + 1) * 16
      assert(d.metric == a / 32768.0, s"doc ${d.doc_id}: rms ${d.metric}")
    }
    byKind("image").foreach { d =>
      val exp = ((d.doc_id * 37) % 256 + (d.doc_id * 59) % 256 +
        (d.doc_id * 83) % 256) / 3.0
      assert(d.metric == exp, s"doc ${d.doc_id}: mean ${d.metric} != $exp")
    }
  }

  test("multimodal: frame sampling reassembles to the payload") {
    import spark.implicits._
    val media = Multimodal.asMedia(
      Seq((1L, "x" * 100), (2L, "abcdefgh" * 20), (3L, "")).toDF("doc_id", "text"))
    // empty payload → zero frames (NOT a phantom [0,-1] descending sequence)
    assert(Multimodal.frameSample(media, 64, 1)
      .filter(col("doc_id") === 3L).count() == 0)
    // every frame (everyNth=1): lengths must sum back to n_bytes
    val frames = Multimodal.frameSample(media, frameBytes = 64, everyNth = 1)
      .groupBy("doc_id").agg(sum("frame_bytes").as("total"), count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(frames(1L) == ((100L, 2L))) // 64 + 36
    assert(frames(2L) == ((160L, 3L))) // 64 + 64 + 32
    // every 2nd frame: indices 0, 2, ...
    val sampled = Multimodal.frameSample(media, 64, 2)
      .select("doc_id", "frame_idx").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(sampled.forall(_._2 % 2 == 0))
  }

  test("SimHash32 expression is value-identical to the declarative nested-fold form") {
    import spark.implicits._
    val docs = Seq(
      "the quick brown fox jumps over the lazy dog",
      "one",
      "spark native engine with many tokens for simhash voting coverage today")
      .toDF("text")
      .withColumn("th", TextOps.shingleHashes(TextOps.tokens(col("text"))))
    val rows = docs
      .withColumn("native", graft.functions.SimHash32.of(col("th")))
      .withColumn("declarative", TextOps.simhash32("th"))
      .collect()
    rows.foreach { r =>
      assert(r.getLong(r.fieldIndex("native")) == r.getLong(r.fieldIndex("declarative")))
    }
  }

  test("NgramHashes is value-identical to the declarative shingles3+h60 chain") {
    import spark.implicits._
    val docs = Seq(
      "the quick brown fox jumps",
      "a b c",
      "spark native engine with many tokens for shingling coverage")
      .toDF("text")
    val toks = TextOps.tokens(col("text"))
    val rows = docs
      .withColumn("native", graft.functions.NgramHashes.of(toks, 3))
      .withColumn("declarative", TextOps.shingleHashes(TextOps.shingles3(toks)))
      .collect()
    rows.foreach { r =>
      assert(r.getSeq[Long](1) == r.getSeq[Long](2),
        s"divergence for '${r.getString(0)}'")
    }
  }

  test("exact dedup collapses duplicates to the lowest doc_id") {
    import spark.implicits._
    val docs = Seq((5L, "a b c"), (9L, "a b c"), (2L, "x y z"))
      .toDF("doc_id", "text")
    val out = Dedup.exact(docs).collect()
      .map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(out == Map(5L -> 2L, 2L -> 1L))
  }

  test("decontamination: shared-shingle counts are exact, distinct, and skip clean docs") {
    import spark.implicits._
    val evalDocs = Seq((100L, "the quick brown fox jumps")).toDF("doc_id", "text")
    val train = Seq(
      // shares shingles "the quick brown", "quick brown fox" (and repeats one)
      (1L, "the quick brown fox the quick brown fox"),
      // shares exactly one 3-gram: "brown fox jumps"
      (2L, "a brown fox jumps away"),
      // no shared 3-gram despite shared words
      (3L, "the brown quick fox"),
      // too short for any 3-gram
      (4L, "the quick")).toDF("doc_id", "text")
    val out = Dedup.shingleOverlap(train, evalDocs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // doc 1 shares {the quick brown, quick brown fox} — the repeat counts
    // once; doc 2 shares {brown fox jumps}; docs 3/4 are clean → absent
    assert(out == Map(1L -> 2L, 2L -> 1L))
  }

  test("pooled quantized centroids: integer means are exact per (group, component)") {
    import spark.implicits._
    val vecs = Seq(
      (0L, Seq(1.0, -1.0)),
      (2L, Seq(0.5, 0.25)),
      (1L, Seq(0.0, 0.0))) // zero vector: scale 0 → qv all zeros
      .toDF("vec_id", "v")
    val out = Similarity.pooledQuantizedCentroids(vecs, col("vec_id") % 2, dim = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // grp 0: ids 0,2 → qv = [127,-127] and [127,64] (scale 127/0.5=254;
    //   0.25*254=63.5 → round half-up 64) → means [(127+127)/2, (-127+64)/2]
    assert(out((0L, 1L)) == 127.0)
    assert(out((0L, 2L)) == -31.5)
    // grp 1: the zero vector alone → means 0
    assert(out((1L, 1L)) == 0.0 && out((1L, 2L)) == 0.0)
  }

  test("audit metrics ride an existing action via observe - no extra scan") {
    val rules = Seq(
      "qty_le_40" -> (col("l_quantity") <= 40.0),
      "price_positive" -> (col("l_extendedprice") > 0.0))
    val li = graft.Tables.load(spark, sfDir, "lineitem")
    val obs = new org.apache.spark.sql.Observation("audit_obs")
    val nRows = Audit.observed(li, obs, rules).count()
    val m = obs.get
    assert(m("n_rows") == nRows)
    val oneShot = Audit.check(li, rules).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(m("v_qty_le_40") == oneShot("qty_le_40"))
    assert(m("v_price_positive") == oneShot("price_positive"))
  }

  test("native regr_slope/regr_r2/corr agree with q73's exact-decimal closed form") {
    val closed = ExtQueries.q73Regression(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(3))).toMap
    val native = graft.Tables.load(spark, sfDir, "lineitem")
      .groupBy("l_returnflag")
      .agg(
        expr("regr_slope(l_extendedprice, l_quantity)").as("sl"),
        expr("regr_r2(l_extendedprice, l_quantity)").as("r2"),
        expr("corr(l_extendedprice, l_quantity)").as("c"))
      .collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3)))
    assert(native.nonEmpty)
    native.foreach { case (k, (sl, r2, c)) =>
      assert(math.abs(sl - closed(k)._1) < 1e-6, s"slope mismatch for $k")
      assert(math.abs(r2 - closed(k)._2) < 1e-6, s"r2 mismatch for $k")
      assert(math.abs(c * c - closed(k)._2) < 1e-6, s"corr² mismatch for $k")
    }
  }

  test("gap fill: dense grid per key, forward-filled values, observed flags") {
    import spark.implicits._
    import java.sql.Date
    val daily = Seq(
      (1L, Date.valueOf("2024-01-01"), 5L),
      (1L, Date.valueOf("2024-01-04"), 7L),
      (2L, Date.valueOf("2024-02-10"), 1L)).toDF("k", "day", "n")
    val out = TimeSeries.gapFillDaily(daily, "k", "day", "n")
      .orderBy("k", "day").collect()
    assert(out.length == 5) // k=1 spans 4 days, k=2 spans 1
    val k1 = out.filter(_.getLong(0) == 1L)
    assert(k1.map(_.getLong(2)).toSeq == Seq(5L, 5L, 5L, 7L))
    assert(k1.map(_.getBoolean(3)).toSeq == Seq(true, false, false, true))
  }

  test("gap fill: a present row with a NULL value stays observed=true, " +
    "never conflated with a missing grid day") {
    import spark.implicits._
    import java.sql.Date
    val daily = Seq(
      (1L, Date.valueOf("2024-01-01"), Option(5L)),
      (1L, Date.valueOf("2024-01-02"), Option.empty[Long]),
      (1L, Date.valueOf("2024-01-04"), Option(7L))).toDF("k", "day", "n")
    val out = TimeSeries.gapFillDaily(daily, "k", "day", "n")
      .orderBy("day").collect()
    // Jan 2 is a REAL observation (with no value) — observed; Jan 3 is a
    // grid gap — not. Both carry the Jan 1 value forward.
    assert(out.map(_.getBoolean(3)).toSeq == Seq(true, true, false, true))
    assert(out.map(_.getLong(2)).toSeq == Seq(5L, 5L, 5L, 7L))
  }

  test("bm25: scores match the closed-form formula; non-matching docs drop out") {
    import spark.implicits._
    val docs = Seq(
      (1L, "x x y"),
      (2L, "x z z z"),
      (3L, "w w w")).toDF("doc_id", "text")
    val out = TextStats.bm25TopK(docs, Seq("x"), k1 = 1.2, b = 0.75, k = 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(1))
    // N=3, df(x)=2, avgdl=10/3; idf = ln(1 + 1.5/2.5)
    val idf = math.log(1.6)
    def score(tf: Double, dl: Double): Double = {
      val s = idf * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / (10.0 / 3)))
      math.round(s * 1e6) / 1e6
    }
    assert(out.map(_._1).toSeq == Seq(1L, 2L)) // d3 has no query term
    assert(math.abs(out(0)._2 - score(2, 3)) < 1e-9)
    assert(math.abs(out(1)._2 - score(1, 4)) < 1e-9)
  }

  test("corpusReport: null texts form one dup group; empty corpus is 0 ppm") {
    import spark.implicits._
    val mixed = Seq(
      (1L, Option("alpha beta"), "en", 100L),
      (2L, Option.empty[String], "en", 0L),
      (3L, Option.empty[String], "en", 0L))
      .toDF("doc_id", "text", "lang", "n_chars")
    val card = graft.ops.Audit.corpusReport(mixed).head()
    assert(card.getAs[Long]("n_docs") == 3L)
    // 2 distinct "texts" (alpha-beta + the null group): 1 dup of 3 docs —
    // countDistinct alone would skip NULLs and report 2 phantom dups
    assert(card.getAs[Long]("dup_ppm") == 333333L,
      s"dup_ppm: ${card.getAs[Long]("dup_ppm")}")
    val empty = graft.ops.Audit.corpusReport(mixed.filter(lit(false))).head()
    assert(empty.getAs[Long]("n_docs") == 0L)
    assert(empty.getAs[Long]("dup_ppm") == 0L &&
      empty.getAs[Long]("short_ppm") == 0L,
      "empty corpus reports 0 ppm, not a division by zero")
  }
}
