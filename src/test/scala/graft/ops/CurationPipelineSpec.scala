package graft.ops

import java.nio.file.Files

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** End-to-end composition test: the full training-corpus curation pipeline
  * built ONLY from the library's public operators, in the order a real
  * data release runs them —
  *
  *   quality gate → exact dedup → near-dup drop → decontamination
  *     → data card → compacted publish
  *
  * Each stage's contract is already unit/oracle-tested on its own; this
  * spec pins that the stages compose (schemas line up, no stage needs a
  * private shim) and that the corpus-level invariants hold at the seams:
  * counts only shrink, seeded duplicates actually die at the stage that
  * owns them, and the final data card agrees with the published corpus.
  */
class CurationPipelineSpec extends SparkSpec {

  test("corpus curation pipeline composes end-to-end") {
    val docs = Tables.load(spark, sfDir, "documents")
      .select("doc_id", "text", "lang", "n_chars")
    val n0 = docs.count()

    // -- 1. quality gate: drop the lowest-scoring decile ------------------
    val scored = TextStats.quality(docs)
    val cut = scored.agg(expr("percentile(score_ppm, 0.1)")).head().getDouble(0)
    val kept = docs.join(
      scored.filter(col("score_ppm") >= cut).select("doc_id"), "doc_id")
    val nKept = kept.count()
    assert(nKept < n0 && nKept >= (n0 * 8) / 10,
      s"decile gate should drop ~10%: $n0 -> $nKept")

    // -- 2. exact dedup: seed verbatim copies, dedup must remove them all -
    val exactSeeded = kept.union(kept.filter(col("doc_id") % 50 === 0)
      .withColumn("doc_id", col("doc_id") + 2000000L))
    val survivors = exactSeeded.join(
      Dedup.exact(exactSeeded).select("doc_id"), "doc_id")
    assert(survivors.count() == nKept,
      "exact dedup must remove exactly the seeded verbatim copies")

    // -- 3. near-dup drop: seed perturbed copies (one appended token), ----
    //       MinHash/LSH pairs them with their source, loser side dies
    val nearSeeded = survivors.union(survivors
      .filter(col("doc_id") % 40 === 0)
      .select((col("doc_id") + 3000000L).as("doc_id"),
        concat(col("text"), lit(" zq")).as("text"),
        col("lang"), col("n_chars")))
    val pairs = Dedup.minhashPairs(nearSeeded, k = 32, bands = 8,
      rowsPerBand = 4, minEst = 0.5)
    val pairsPlan = pairs.queryExecution.executedPlan.toString
    assert(!pairsPlan.contains("CartesianProduct")
      && !pairsPlan.contains("BroadcastNestedLoopJoin"),
      "near-dup candidates must come from the band equi-join, never all-pairs")
    val nearDeduped = nearSeeded.join(
      pairs.select(greatest(col("doc_a"), col("doc_b")).as("doc_id")).distinct(),
      Seq("doc_id"), "left_anti")
    // every seed pairs with its source under a lower id, so all seeds die;
    // the corpus also has ORGANIC near-dup pairs (the operator finding them
    // is it working, not over-matching), so the count may shrink further
    assert(nearDeduped.filter(col("doc_id") >= 3000000L).count() == 0,
      "every seeded near-dup must be dropped")
    val nNear = nearDeduped.count()
    assert(nNear <= survivors.count() && nNear >= (survivors.count() * 8) / 10,
      s"only near-dups may be dropped: ${survivors.count()} -> $nNear")

    // -- 4. decontamination: an eval set drawn from the corpus must not ---
    //       survive into the training split
    val evalDocs = docs.filter(col("doc_id") % 97 === 0)
      .select((col("doc_id") + 9000000L).as("doc_id"), col("text"))
    val clean = Dedup.bloomClean(nearDeduped, evalDocs)
    val nClean = clean.count()
    assert(nClean > 0 && nClean < nearDeduped.count())
    assert(clean.join(evalDocs.select("text"), Seq("text"), "left_semi")
      .count() == 0, "no eval text may survive decontamination")

    // -- 5. data card must describe exactly the corpus it ships with ------
    val card = Audit.corpusReport(clean).head()
    assert(card.getAs[Long]("n_docs") == nClean)
    assert(card.getAs[Long]("dup_ppm") == 0L,
      "post-dedup corpus must report a zero duplicate rate")
    assert(card.getAs[Long]("n_tokens") > 0)

    // -- 6. publish: fragmented write, then compacted in place ------------
    val out = Files.createTempDirectory("graft-publish").toFile.getAbsolutePath
    clean.repartition(16).write.mode("overwrite").parquet(out)
    val stats = Compaction.compactInPlace(spark, out,
      targetBytes = 1L << 30, minFileBytes = 1L << 30)
    assert(stats.filesBefore == 16 && stats.filesAfter == 1, s"$stats")
    assert(spark.read.parquet(out).count() == nClean,
      "published corpus must match the curated row count exactly")
  }
}
