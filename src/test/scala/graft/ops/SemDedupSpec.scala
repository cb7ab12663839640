package graft.ops

import graft.SparkSpec

/** Semantic dedup: near-identical vectors within a cluster drop
  * keep-lowest-id; chains drop aggressively; distant vectors survive. */
class SemDedupSpec extends SparkSpec {

  test("near pairs drop the higher id; distant vectors survive") {
    import spark.implicits._
    // two far-apart clusters, a near pair inside each (d2 = 1 and 4)
    val pts = Seq(
      (1L, Seq(0L, 0L)), (2L, Seq(1L, 0L)), (3L, Seq(0L, 40L)),
      (10L, Seq(500L, 500L)), (11L, Seq(500L, 502L)))
    val out = SemDedup.dropNearVectors(
      pts.toDF("vec_id", "qv"), k = 2, iters = 2, maxSqDist = 10L)
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(out == Map(1L -> false, 2L -> true, 3L -> false,
      10L -> false, 11L -> true), s"got $out")
  }

  test("chains drop every vector with a smaller-id near neighbor") {
    import spark.implicits._
    // 1~2 and 2~3 are near, 1~3 is not: 2 and 3 both drop (the SemDeDup
    // aggressive-drop semantics — 3 drops via 2 even though 2 dropped)
    val pts = Seq(
      (1L, Seq(0L, 0L)), (2L, Seq(3L, 0L)), (3L, Seq(6L, 0L)))
    val out = SemDedup.dropNearVectors(
      pts.toDF("vec_id", "qv"), k = 1, iters = 1, maxSqDist = 9L)
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(out == Map(1L -> false, 2L -> true, 3L -> true), s"got $out")
  }
}
