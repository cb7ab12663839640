package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** BPE vocabulary learning: the window-function merge is differentially
  * fuzzed against an independent sequential fold (the overlap cases are
  * where relational implementations go wrong), and training reproduces
  * the textbook example. */
class BpeSpec extends SparkSpec {

  /** Independent reference: greedy left-to-right merge as a sequential
    * scan — the semantics BPE implementations agree on. */
  private def refMerge(syms: List[String], a: String, b: String): List[String] =
    syms match {
      case x :: y :: rest if x == a && y == b => (a + b) :: refMerge(rest, a, b)
      case x :: rest => x :: refMerge(rest, a, b)
      case Nil => Nil
    }

  test("mergeRound equals the sequential fold on randomized overlap-heavy words") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val alphabet = Vector("a", "b", "c")
    val words = (1 to 300).map { i =>
      val syms = Vector.fill(rnd.nextInt(11) + 1)(alphabet(rnd.nextInt(3)))
      (syms.mkString, 1L, syms)
    }.distinct
    val df = words.toDF("word", "cnt", "syms")
    for ((a, b) <- Seq(("a", "b"), ("a", "a"), ("c", "c"), ("b", "a"))) {
      val got = Bpe.mergeRound(df, a, b)
        .collect().map(r => r.getString(0) -> r.getSeq[String](2).toList).toMap
      words.foreach { case (w, _, syms) =>
        val want = refMerge(syms.toList, a, b)
        assert(got(w) == want,
          s"word '$w' merge ($a,$b): got ${got(w)}, want $want")
      }
    }
  }

  test("train reproduces the textbook low/lower/newest merges") {
    import spark.implicits._
    // 'lo' wins round 1 (freq 5); 'low' wins round 2 (freq 5)
    val docs = Seq(
      1L -> "low low low low low",
      2L -> "lower lowest newest newest").toDF("doc_id", "text")
    val merges = Bpe.train(docs, rounds = 2)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4)))
    assert(merges(0) == ((1, "l", "o", "lo", 7L)), s"got ${merges(0)}")
    assert(merges(1) == ((2, "lo", "w", "low", 7L)), s"got ${merges(1)}")
  }

  test("segment replays a merge table; fully merged words stop producing pairs") {
    import spark.implicits._
    val docs = Seq(1L -> "ab ab ab").toDF("doc_id", "text")
    val words = Bpe.wordCounts(docs)
      .select(col("word"), col("cnt"), split(col("word"), "").as("syms"))
    val seg = Bpe.segment(words, Seq(("a", "b")))
      .collect().map(r => r.getString(0) -> r.getSeq[String](2).toList).toMap
    assert(seg("ab") == List("ab"))
    // training past exhaustion yields no further merges rather than failing
    val m = Bpe.train(docs, rounds = 3)
    assert(m.count() == 1L, "single possible merge learned once")
  }

  test("trainWithWords' final table equals segment(wordCounts, merges) (q113 reuse)") {
    import spark.implicits._
    val docs = Seq(
      1L -> "banana bandana ban banana",
      2L -> "an ban banana nab",
      3L -> "low lower lowest newest").toDF("doc_id", "text")
    val (mergesDf, trained) = Bpe.trainWithWords(docs, rounds = 4)
    val merges = mergesDf.orderBy("step")
      .collect().map(r => (r.getString(1), r.getString(2))).toSeq
    val replayed = Bpe.segment(
      Bpe.wordCounts(docs)
        .select(col("word"), col("cnt"), split(col("word"), "").as("syms")),
      merges)
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect()
        .map(r => (r.getString(0), r.getLong(1), r.getSeq[String](2).toList))
        .sortBy(_._1).toList
    assert(canon(trained) == canon(replayed),
      "training's final word table must be bit-identical to a fresh replay")
    // train (the merges-only API) agrees with trainWithWords' merge table
    val m2 = Bpe.train(docs, rounds = 4).orderBy("step")
      .collect().map(r => (r.getString(1), r.getString(2))).toSeq
    assert(m2 == merges, "train and trainWithWords learn identical merges")
  }

  test("compression accounting: symbols partition words exactly (q113 invariant)") {
    import spark.implicits._
    val docs = Seq(
      1L -> "banana bandana ban banana",
      2L -> "an ban banana nab").toDF("doc_id", "text")
    val words = Bpe.wordCounts(docs)
      .select(col("word"), col("cnt"), split(col("word"), "").as("syms"))
    val merges = Bpe.train(docs, rounds = 3)
      .collect().map(r => (r.getString(1), r.getString(2))).toSeq
    val acct = Bpe.segment(words, merges)
      .select(col("word"), col("cnt"), explode(col("syms")).as("s"))
      .agg(
        sum(col("cnt") * length(col("s"))).as("char_tokens"),
        sum(col("cnt")).as("bpe_tokens"))
      .head()
    // segmenting never gains or loses characters: Σ cnt·len(sym) must equal
    // the raw corpus character count (whitespace excluded)
    val rawChars = Bpe.wordCounts(docs)
      .agg(sum(col("cnt") * length(col("word")))).head().getLong(0)
    assert(acct.getLong(0) == rawChars, s"char accounting ${acct.getLong(0)} != $rawChars")
    // 3 merges over this corpus strictly compress
    assert(acct.getLong(1) < rawChars, "merged corpus must have fewer tokens than chars")
  }
}
