package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.DataFrame

/** Incremental MinHash-LSH dedup against a persisted band index: the
  * corpus always wins regardless of id order, earlier batch ids win within
  * a batch, and appending accepted entries lets the next batch see this
  * one's survivors. Exact copies are used as seeds so band collisions are
  * deterministic (a 1-token change at bands=4 can legally miss). */
class IncrementalDedupSpec extends SparkSpec {

  import spark.implicits._

  private def df(rows: (Long, String)*): DataFrame =
    rows.toDF("doc_id", "text")

  private val old = df(
    1L -> "alpha beta gamma delta epsilon",
    2L -> "one two three four five",
    10L -> "red green blue yellow purple")

  test("corpus wins over the batch regardless of id order; batch chains by id") {
    val batch = df(
      0L -> "red green blue yellow purple",      // copy of old 10, NEW id smaller
      20L -> "alpha beta gamma delta epsilon",   // copy of old 1
      21L -> "alpha beta gamma delta epsilon",   // copy of old 1 AND of new 20
      22L -> "totally fresh unique words here")  // accepted
    val got = Dedup.minhashIncrement(batch, Dedup.minhashIndexEntries(old))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got.keySet == Set(0L, 20L, 21L), s"matched set: ${got.keySet}")
    assert(got(0L) == ((1L, 10L, 1.0)), "new id 0 dropped against indexed 10")
    assert(got(20L) == ((1L, 1L, 1.0)))
    assert(got(21L) == ((2L, 1L, 1.0)), "21 matches indexed 1 and earlier batch doc 20")
  }

  test("appending accepted entries makes batch-2 dedup see batch-1 survivors") {
    val batch1 = df(22L -> "totally fresh unique words here")
    val idx1 = Dedup.minhashIndexEntries(old)
    assert(Dedup.minhashIncrement(batch1, idx1).isEmpty, "22 is accepted")
    val idx2 = idx1.unionByName(Dedup.minhashIndexEntries(batch1))
    val got2 = Dedup.minhashIncrement(
      df(30L -> "totally fresh unique words here"), idx2).collect()
    assert(got2.length == 1 && got2(0).getLong(0) == 30L &&
      got2(0).getLong(2) == 22L, "batch-2 copy caught against appended index")
  }

  test("index entries carry the durable contract: bands rows per doc, sig attached") {
    val idx = Dedup.minhashIndexEntries(old)
    assert(idx.columns.toSeq == Seq("doc_id", "band", "key", "sig"))
    val perDoc = idx.groupBy("doc_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(perDoc == Map(1L -> 4L, 2L -> 4L, 10L -> 4L),
      s"4 band rows per doc: $perDoc")
  }

  test("disjoint batch produces an empty result, not an error") {
    val batch = df(40L -> "nothing shared with anything at all")
    assert(Dedup.minhashIncrement(batch, Dedup.minhashIndexEntries(old)).isEmpty)
  }

  test("a replayed batch already in the index is not its own duplicate") {
    // at-least-once delivery: crash after the index append re-delivers the
    // batch against an index that already holds its entries — self-matches
    // would silently reject (and lose) every replayed row
    val batch = df(22L -> "totally fresh unique words here")
    val idx = Dedup.minhashIndexEntries(old)
      .unionByName(Dedup.minhashIndexEntries(batch))
    assert(Dedup.minhashIncrement(batch, idx).isEmpty,
      "replayed unique doc must survive, not match itself at est 1.0")
    // replay of a batch with an internal duplicate: the first delivery
    // accepted 22 and dropped 23, so the index holds ONLY 22's entries —
    // the replay must reach the same verdict (22 survives, 23 drops)
    val batch2 = batch.unionByName(df(23L -> "totally fresh unique words here"))
    val rows = Dedup.minhashIncrement(batch2, idx).collect()
    val got = rows.map(r => (r.getLong(0), r.getLong(2))).toMap
    assert(got == Map(23L -> 22L), s"replay verdict must be stable: $got")
    // n_dups counts DOCUMENTS, not signature rows: doc 22 sits in both the
    // index and the batch during a replay, and an un-deduped sig union
    // would double-count it as two neighbors of 23
    assert(rows.map(r => (r.getLong(0), r.getLong(1))).toMap == Map(23L -> 1L),
      s"replayed neighbor double-counted: ${rows.mkString(",")}")
  }
}
