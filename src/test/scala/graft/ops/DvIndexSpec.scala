package graft.ops

import org.scalatest.funsuite.AnyFunSuite

/** Deletion-vector FILE IDENTITY (round-18 ADVICE low): positions bind
  * by EXACT dir-relative path under the table's qualified root — one
  * live file's relative path being a suffix of another's
  * (`part-0.parquet` at the root vs `k=1/part-0.parquet`) must never
  * alias its positions. A path rendering that doesn't carry the root
  * prefix falls back to the LONGEST matching segment-anchored suffix
  * (most specific wins). */
class DvIndexSpec extends AnyFunSuite {

  private val idx = Dv.Index("file:/t/", Map(
    "part-0.parquet" -> Seq(
      ("part-0.parquet", Array(1L)),
      ("k=1/part-0.parquet", Array(2L)))))

  test("exact relative-path binding under the root prefix") {
    assert(idx.positionsOf("file:/t/part-0.parquet").toSeq == Seq(1L))
    assert(idx.positionsOf("file:/t/k=1/part-0.parquet").toSeq == Seq(2L))
  }

  test("a suffix SIBLING without its own entry never inherits one") {
    // pre-round-18 suffix matching would have bound k=2's rows to the
    // root file's positions (endsWith("/part-0.parquet") is true)
    assert(idx.positionsOf("file:/t/k=2/part-0.parquet") == null)
    // and a bucket miss stays a miss
    assert(idx.positionsOf("file:/t/other.parquet") == null)
  }

  test("foreign rendering falls back to the longest (most specific) suffix") {
    assert(idx.positionsOf("hdfs://nn/t/k=1/part-0.parquet").toSeq == Seq(2L))
    assert(idx.positionsOf("hdfs://nn/t/part-0.parquet").toSeq == Seq(1L))
  }

  test("null-safe and empty-index-safe") {
    assert(Dv.Index("", Map.empty).positionsOf("file:/t/x.parquet") == null)
    assert(graft.functions.DvDeletedUtil.deleted(idx, null, 0L) == false)
  }
}
