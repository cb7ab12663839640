package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sequence packing for training-batch preparation: lay all documents out
  * on one global token axis in deterministic `doc_id` order and chunk that
  * axis into fixed-capacity context windows ("bins"). Documents MAY span a
  * bin boundary — this is the concat-and-chunk packing used for LLM
  * pretraining (every bin is exactly full, zero padding waste), not
  * no-split greedy packing (which wastes the bin tails and is inherently
  * sequential).
  *
  * The result is the pack manifest a training loader needs: one row per
  * (bin, document-piece) with the piece's offset inside the document, its
  * offset inside the bin, and its length. Pieces of a bin tile `[0,
  * capacity)` exactly; pieces of a document tile `[0, n_tokens)` exactly.
  *
  * Scale shape: the only global coordination is [[Scale.prefixSum]] over
  * `(doc_id, n_tokens)` — per-bucket local windows plus one broadcast
  * offset per bucket, never a single-task global window. The bin explode
  * adds at most `n_tokens / capacity + 1` rows per document (a 1M-token
  * doc at capacity 2048 is ~500 manifest rows), and there is no further
  * shuffle: 100 TB of text packs with two passes over an 16-byte-per-doc
  * projection.
  */
object Pack {

  /** Pack `docs` — `(doc_id, n_tokens)` rows, e.g. from
    * `TextStats.tokenCounts` — into bins of `capacity` tokens. Returns
    * `(bin_id, doc_id, doc_tok_start, bin_tok_start, n_tokens)`: the
    * piece of `doc_id` starting at token `doc_tok_start` (0-based within
    * the document) lands in bin `bin_id` at offset `bin_tok_start` and is
    * `n_tokens` long. Zero-token documents produce no manifest rows. */
  def packSequences(
      docs: DataFrame,
      capacity: Long,
      buckets: Int = 32): DataFrame = {
    require(capacity >= 1, s"capacity must be >= 1, got $capacity")
    // a NEGATIVE token count would enter the prefix sum before the
    // zero-token filter drops its row, silently shifting every later
    // document's offsets so bin pieces overlap — the manifest would no
    // longer tile [0, capacity) and a training loader would overwrite
    // tokens. Corrupt counts fail loudly in-plan instead.
    val guarded = docs.select(col("doc_id"),
      when(col("n_tokens") < 0,
        raise_error(concat(lit("packSequences: negative n_tokens: "),
          col("n_tokens").cast("string"))))
        .otherwise(col("n_tokens")).as("n_tokens"))
    val pre = Scale.prefixSum(
      guarded,
      orderCol = "doc_id", valueCol = "n_tokens", outCol = "end_tok",
      buckets = buckets)
    val c = lit(capacity)
    pre
      .filter(col("n_tokens") > 0)
      .withColumn("start_tok", col("end_tok") - col("n_tokens"))
      .select(col("doc_id"), col("start_tok"), col("end_tok"),
        explode(sequence(
          expr(s"start_tok DIV $capacity"),
          expr(s"(end_tok - 1) DIV $capacity"))).as("bin_id"))
      .select(
        col("bin_id"),
        col("doc_id"),
        (greatest(col("start_tok"), col("bin_id") * c) - col("start_tok"))
          .as("doc_tok_start"),
        (greatest(col("start_tok"), col("bin_id") * c) - col("bin_id") * c)
          .as("bin_tok_start"),
        (least(col("end_tok"), (col("bin_id") + 1) * c) -
          greatest(col("start_tok"), col("bin_id") * c)).as("n_tokens"))
  }
}
