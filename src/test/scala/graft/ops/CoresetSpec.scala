package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Greedy k-center ([[Coreset.selectFull]]) — hand-checkable 1-D fixture
  * plus the Gonzalez invariants on a real embedding slice. */
class CoresetSpec extends SparkSpec {
  import spark.implicits._

  // 1-D points embedded as single-element vectors: positions on a line.
  private def line(pts: (Long, Long)*) =
    pts.toDF("vec_id", "x").select(col("vec_id"), array(col("x")).as("qv"))

  test("farthest-point picks and nearest-center assignment on a line") {
    // positions: 0, 1, 10, 11, 30 — center0 = id0 (pos 0); farthest is
    // id4 (pos 30, d=900); then id3 (pos 11: min(121, 361) = 121 beats
    // id2's min(100, 400) = 100).
    val v = line((0L, 0L), (1L, 1L), (2L, 10L), (3L, 11L), (4L, 30L))
    val (summary, centers) = Coreset.selectFull(v, k = 3)
    assert(centers.map(c => (c._1, c._2, c._3)) ===
      Seq((0L, 0L, 0L), (1L, 4L, 900L), (2L, 3L, 121L)))
    val rows = summary.orderBy("cid")
      .as[(Long, Long, Long, Long, Long)].collect()
    // cell 0: ids 0,1 (radius 1); cell 1: id 4; cell 2: ids 2,3 (radius 1)
    assert(rows === Array(
      (0L, 0L, 2L, 1L, 1L), (1L, 4L, 1L, 0L, 0L), (2L, 3L, 2L, 1L, 1L)))
  }

  test("distance ties break toward the lowest id") {
    // pos 0 (center0), then 8 and 8 duplicated at ids 1,2: equal max
    // distance — the lower id must win round 1.
    val v = line((0L, 0L), (1L, 8L), (2L, 8L))
    val (_, centers) = Coreset.selectFull(v, k = 2)
    assert(centers(1) === ((1L, 1L, 64L)))
  }

  test("an input whose distances overflow the encoded argmax fails loudly") {
    // sqDist(0, 3e9) = 9e18 < 2^63, but ·idCap (2^20) wildly overflows —
    // pre-guard this silently selected wrong centers
    val v = line((0L, 0L), (1L, 3000000000L))
    val e = intercept[IllegalArgumentException](Coreset.selectFull(v, k = 2))
    assert(e.getMessage.contains("overflows the encoded argmax"))
  }

  test("selection distances are non-increasing and bound the final radius") {
    val v = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), KMeans.quantize(col("embedding")).as("qv"))
    val (summary, centers) = Coreset.selectFull(v, k = 6)
    val sel = centers.drop(1).map(_._3)
    assert(sel === sel.sorted.reverse, "selection dists must be sorted desc")
    val radius = summary.agg(max("radius")).as[Long].collect()(0)
    // every point was within sel.last of the chosen set when the last
    // center was picked, and adding it only shrinks distances
    assert(radius <= sel.last)
    assert(summary.agg(sum("n_pts")).as[Long].collect()(0) === v.count())
  }
}
