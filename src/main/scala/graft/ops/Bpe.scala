package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Byte-pair-encoding vocabulary learning (Sennrich et al. 2016) as
  * distributed aggregations — the tokenizer-training step of an LLM data
  * pipeline run inside the engine: start from the corpus word-frequency
  * table with words split into characters, and each round (1) count
  * adjacent symbol pairs weighted by word frequency, (2) pick the most
  * frequent pair (ties: lexicographically smallest), (3) merge its
  * occurrences in every word, greedy left-to-right.
  *
  * The merge step is the classic correctness trap: occurrences can
  * overlap (`a a a` merging `(a,a)`), and "greedy left-to-right" is a
  * sequential scan. It relationalizes exactly: candidate positions form
  * consecutive runs, and the greedy scan takes every OTHER candidate of a
  * run starting at its head — so `taken(i) = cand(i) AND (i − run_head(i))
  * is even`, computable with plain window functions (`lag` for run heads,
  * a running `max` to propagate the head position). The same four window
  * expressions run verbatim in any SQL engine, which is what makes the
  * learned merge table oracle-checkable bit-for-bit; a differential spec
  * also pins it against an independent sequential fold.
  *
  * Scale shape: per round, one window chain partitioned by word (millions
  * of tiny groups — the good case) over the exploded symbols, one pair
  * aggregation with map-side combine, and a 1-row collect for the argmax
  * pair. Everything re-aggregates back to one row per word, and each
  * round's word table gets a [[Lineage.state]] cut so the nested window
  * plan stays flat across rounds — non-replicated `localCheckpoint` blocks
  * by default, or (when the session has `sc.setCheckpointDir` configured)
  * persisted-with-lineage rounds plus a reliable checkpoint every few
  * rounds so a long cluster training run survives executor loss. Corpus
  * size only enters through the DISTINCT-word table — the 100 TB corpus
  * itself is touched once, by the word count.
  */
object Bpe {

  /** Distinct-word frequency table of whitespace tokens: `(word, cnt)`. */
  def wordCounts(docs: DataFrame): DataFrame =
    docs.select(explode(TextOps.tokens(col("text"))).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy("word").agg(count(lit(1)).as("cnt"))

  /** One greedy left-to-right merge of `(a, b) → a+b` in every symbol
    * array of `words` = `(word, cnt, syms: array<string>)`. */
  private[ops] def mergeRound(words: DataFrame, a: String, b: String): DataFrame = {
    val w = Window.partitionBy("word").orderBy("i")
    words
      .select(col("word"), col("cnt"), posexplode(col("syms")).as(Seq("i", "s")))
      // coalesce: the last symbol's lead is null and null-AND must not
      // leak into the head/taken logic (mirrored in the SQL oracle)
      .withColumn("cand", coalesce(
        col("s") === lit(a) && lead("s", 1).over(w) === lit(b), lit(false)))
      .withColumn("head",
        col("cand") && !coalesce(lag("cand", 1).over(w), lit(false)))
      .withColumn("head_i",
        max(when(col("head"), col("i"))).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("taken",
        col("cand") && pmod(col("i") - col("head_i"), lit(2)) === 0)
      .withColumn("consumed",
        coalesce(lag("taken", 1).over(w), lit(false)))
      .filter(!col("consumed"))
      .groupBy("word")
      .agg(min("cnt").as("cnt"),
        transform(array_sort(collect_list(struct(col("i"),
          when(col("taken"), lit(a + b)).otherwise(col("s")).as("s")))),
          x => x.getField("s")).as("syms"))
  }

  /** Learn `rounds` merges from `docs = (doc_id, text)`. Returns the merge
    * table `(step, pair_a, pair_b, merged, cnt)` in learning order —
    * exactly what a tokenizer ships as `merges.txt`. */
  def train(docs: DataFrame, rounds: Int): DataFrame = {
    val (merges, _, lin) = trainRounds(docs, rounds)
    // the merge table lives driver-side (one row collected per round), so
    // nothing downstream depends on the word-table lineage anymore — in
    // durable mode this releases the interim persisted rounds
    lin.close()
    merges
  }

  /** [[train]] that ALSO returns the final-round word table `(word, cnt,
    * syms)`. Training already materializes exactly the table a subsequent
    * [[segment]] of the same corpus with the learned merges would rebuild —
    * the fold over [[mergeRound]] from the same `wordCounts` start state in
    * the same merge order — so a train-then-apply pipeline (q113) reads it
    * here instead of re-running every merge round a second time. Interim
    * round state stays live (the words table depends on it); it unpins via
    * LRU/session end exactly like [[segment]]'s. */
  def trainWithWords(docs: DataFrame, rounds: Int): (DataFrame, DataFrame) = {
    val (merges, words, _) = trainRounds(docs, rounds)
    (merges, words)
  }

  private def trainRounds(
      docs: DataFrame, rounds: Int): (DataFrame, DataFrame, Lineage) = {
    require(rounds >= 1, s"rounds must be >= 1: $rounds")
    val spark = docs.sparkSession
    val lin = new Lineage(spark)
    var words = lin.state(wordCounts(docs)
      .select(col("word"), col("cnt"), split(col("word"), "").as("syms")))
    val merges = Seq.newBuilder[(Int, String, String, String, Long)]
    for (step <- 1 to rounds) {
      val w = Window.partitionBy("word").orderBy("i")
      val best = words
        .select(col("word"), col("cnt"), posexplode(col("syms")).as(Seq("i", "s")))
        .withColumn("nxt", lead("s", 1).over(w))
        .filter(col("nxt").isNotNull)
        .groupBy("s", "nxt").agg(sum("cnt").as("c"))
        .orderBy(col("c").desc, col("s"), col("nxt"))
        .limit(1).collect()
      if (best.nonEmpty) {
        val (a, b, c) = (best(0).getString(0), best(0).getString(1), best(0).getLong(2))
        merges += ((step, a, b, a + b, c))
        words = lin.state(mergeRound(words, a, b))
      }
    }
    import spark.implicits._
    (merges.result().toDF("step", "pair_a", "pair_b", "merged", "cnt"),
      words, lin)
  }

  /** Segment `words` (any `(word, cnt, syms)` table, e.g. fresh
    * `wordCounts` with char splits) by replaying a learned merge table in
    * order — the "apply tokenizer" half. Unlike [[train]], the RESULT here
    * is the final round's table, so interim durable-mode persists can't be
    * released eagerly — they unpin via LRU/session end (bounded: at most
    * `every` round-states live at once). */
  def segment(words: DataFrame, merges: Seq[(String, String)]): DataFrame = {
    val lin = new Lineage(words.sparkSession)
    merges.foldLeft(words) { case (acc, (a, b)) =>
      lin.state(mergeRound(acc, a, b))
    }
  }
}
