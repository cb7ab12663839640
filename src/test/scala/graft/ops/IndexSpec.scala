package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Inverted index: df-capped build (no stopword list ever collected),
  * set-semantics postings, and the conjunctive-lookup term policies
  * (listed must hit, capped matches everything, absent empties).
  */
class IndexSpec extends SparkSpec {
  import spark.implicits._

  // "the" in all 3 docs (capped at maxDf=2); "dup dup" collapses per doc
  private def corpus = Seq[(java.lang.Long, String)](
    (1L, "the dup dup key"), (2L, "the key fast"), (3L, "the fast"),
    (null, "the ghost"), (4L, null))
    .toDF("doc_id", "text")

  private def postings =
    Index.buildPostings(corpus, "doc_id", "text", maxDf = 2L)

  test("build: set-semantics postings, capped term keeps df with NULL docs") {
    val rows = postings.collect()
      .map(r => r.getString(0) -> (r.getLong(1),
        Option(r.getSeq[Long](2)).map(_.toList))).toMap
    assert(rows("dup") == ((1L, Some(List(1L)))), "within-doc dups collapse")
    assert(rows("key") == ((2L, Some(List(1L, 2L)))), "sorted postings")
    assert(rows("fast") == ((2L, Some(List(2L, 3L)))))
    assert(rows("the") == ((3L, None)), "capped term: df kept, docs NULL")
    assert(!rows.contains("ghost"), "null-id docs contribute nothing")
  }

  test("a doc stored as several rows contributes each term once") {
    val chunked = Seq[(java.lang.Long, String)](
      (1L, "key alpha"), (1L, "key beta"), (2L, "key"))
      .toDF("doc_id", "text")
    val p = Index.buildPostings(chunked, "doc_id", "text", maxDf = 10L)
    val key = p.filter(col("term") === "key").head()
    assert(key.getLong(1) == 2L, "df counts DOCS, not chunk rows")
    assert(key.getSeq[Long](2).toList == List(1L, 2L), "no duplicate postings")
    // and the hit-count gate still matches the chunked doc
    assert(Index.conjunctiveLookup(p, Seq("key")).as[Long].collect().toList ==
      List(1L, 2L))
  }

  test("lookup: listed AND, capped ignored, absent empties, all-capped empties") {
    def docs(terms: String*) =
      Index.conjunctiveLookup(postings, terms).as[Long].collect().toList
    assert(docs("key", "fast") == List(2L))
    assert(docs("dup", "key") == List(1L))
    // capped term carries no selectivity — 'the key' ≡ 'key'
    assert(docs("the", "key") == List(1L, 2L))
    // corpus-absent term: nothing can contain it
    assert(docs("key", "zebra") == Nil)
    // every term capped: no selective anchor, empty by contract
    assert(docs("the") == Nil)
    // duplicate query terms collapse (not double-counted hits)
    assert(docs("key", "key", "fast") == List(2L))
  }
}
