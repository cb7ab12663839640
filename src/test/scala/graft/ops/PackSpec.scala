package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Concat-and-chunk sequence packing: bins are exactly full (except the
  * last), pieces tile both the bin axis and each document, and the
  * manifest is independent of input partitioning. */
class PackSpec extends SparkSpec {

  private def manifest(rows: Seq[(Long, Long)], cap: Long) = {
    import spark.implicits._
    Pack.packSequences(rows.toDF("doc_id", "n_tokens"), capacity = cap)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
  }

  test("bins fill to exactly capacity; last bin holds the remainder") {
    val docs = Seq(1L -> 5L, 2L -> 9L, 3L -> 3L, 4L -> 7L) // 24 tokens
    val m = manifest(docs, cap = 8)
    val perBin = m.groupBy(_._1).view.mapValues(_.map(_._5).sum).toMap
    assert(perBin == Map(0L -> 8L, 1L -> 8L, 2L -> 8L),
      s"24 tokens at capacity 8 = three exactly-full bins: $perBin")
    // doc 2 (9 tokens) must span bins 0 and 1
    val doc2 = m.filter(_._2 == 2L).sortBy(_._3)
    assert(doc2.map(d => (d._1, d._3, d._5)).toSeq ==
      Seq((0L, 0L, 3L), (1L, 3L, 6L)),
      s"doc 2 splits 3+6 across the 0/1 boundary: ${doc2.toSeq}")
  }

  test("pieces tile each document and each bin without gaps or overlap") {
    val docs = Seq(1L -> 13L, 2L -> 1L, 3L -> 29L, 4L -> 6L, 5L -> 17L)
    val cap = 10L
    val m = manifest(docs, cap)
    // per document: pieces sorted by doc_tok_start are contiguous from 0
    for ((id, n) <- docs) {
      val pieces = m.filter(_._2 == id).sortBy(_._3)
      assert(pieces.head._3 == 0L && pieces.map(_._5).sum == n)
      pieces.sliding(2).foreach {
        case Array(a, b) => assert(a._3 + a._5 == b._3,
          s"doc $id pieces must be contiguous")
        case _ =>
      }
    }
    // per bin: pieces sorted by bin_tok_start are contiguous from 0 and
    // every bin except the highest reaches capacity
    val maxBin = m.map(_._1).max
    for ((bin, pieces0) <- m.groupBy(_._1)) {
      val pieces = pieces0.sortBy(_._4)
      assert(pieces.head._4 == 0L)
      pieces.sliding(2).foreach {
        case Array(a, b) => assert(a._4 + a._5 == b._4,
          s"bin $bin pieces must be contiguous")
        case _ =>
      }
      if (bin < maxBin)
        assert(pieces.map(_._5).sum == cap, s"bin $bin must be full")
    }
  }

  test("a negative token count fails loudly instead of shifting offsets") {
    import spark.implicits._
    val bad = Seq((1L, 10L), (2L, -5L), (3L, 10L)).toDF("doc_id", "n_tokens")
    val e = intercept[Exception] {
      Pack.packSequences(bad, capacity = 8).collect()
    }
    assert(e.getMessage.contains("negative n_tokens") ||
      Option(e.getCause).exists(_.getMessage.contains("negative n_tokens")),
      s"expected the loud guard, got: ${e.getMessage}")
  }

  test("zero-token docs vanish; manifest is partition-independent") {
    import spark.implicits._
    val rows = (1L to 200L).map(i => i -> (i % 7)) // includes n_tokens = 0
    val base = Pack.packSequences(rows.toDF("doc_id", "n_tokens"), 16)
      .collect().map(_.toSeq).sortBy(_.toString)
    val shuffled = Pack.packSequences(
      rows.toDF("doc_id", "n_tokens").repartition(7, col("n_tokens")), 16)
      .collect().map(_.toSeq).sortBy(_.toString)
    assert(base.sameElements(shuffled), "repartitioning must not change packing")
    assert(!base.exists(_(1) == 7L), "doc 7 has 0 tokens: no manifest row")
  }
}
