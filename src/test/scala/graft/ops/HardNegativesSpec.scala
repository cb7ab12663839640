package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.DataFrame

/** Hard-negative mining: negatives never come from the probe's own
  * cluster, ranking is by exact integer distance with id ties, and the
  * nCells bound really restricts the candidate pool. */
class HardNegativesSpec extends SparkSpec {

  import spark.implicits._

  // three well-separated 4-dim clusters; k-means with k=3, ids as init
  // recovers them exactly
  private def vecs: DataFrame = Seq(
    1L -> Seq(0L, 0L, 0L, 0L),
    2L -> Seq(1L, 0L, 0L, 0L),
    3L -> Seq(0L, 1L, 0L, 0L),
    10L -> Seq(100L, 100L, 0L, 0L),
    11L -> Seq(101L, 100L, 0L, 0L),
    20L -> Seq(0L, 0L, 500L, 500L),
    21L -> Seq(0L, 0L, 501L, 500L)).toDF("vec_id", "qv")

  test("negatives come from foreign clusters only, ranked by exact distance") {
    val probes = Seq(1L).toDF("vec_id")
    val got = HardNegatives.mine(vecs, probes, k = 3, iters = 2,
      nCells = 2, topK = 4)
      .orderBy("rn").collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getInt(3)))
    assert(got.map(_._1).toSet.intersect(Set(2L, 3L)).isEmpty,
      "own-cluster vectors are never negatives")
    // cluster B (dist ~2e4) ranks before cluster C (dist ~5e5)
    assert(got.map(_._1).toSeq == Seq(10L, 11L, 20L, 21L), s"got ${got.toSeq}")
    assert(got(0)._2 == 100L * 100 + 100L * 100, "exact integer distance")
  }

  test("nCells=1 restricts candidates to the single nearest foreign cell") {
    val probes = Seq(1L).toDF("vec_id")
    val got = HardNegatives.mine(vecs, probes, k = 3, iters = 2,
      nCells = 1, topK = 10)
      .collect().map(_.getLong(1)).toSet
    assert(got == Set(10L, 11L), s"only the near foreign cell: $got")
  }

  test("multiple probes rank independently; ties break by candidate id") {
    val probes = Seq(1L, 10L).toDF("vec_id")
    val got = HardNegatives.mine(vecs, probes, k = 3, iters = 2,
      nCells = 2, topK = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3)))
      .groupBy(_._1).map { case (p, rows) =>
        p -> rows.sortBy(_._3).map(_._2).toSeq
      }
    assert(got(1L) == Seq(10L, 11L))
    // dist(10→2) = dist(10→3) = 99² + 100²: the tie breaks by candidate id
    assert(got(10L) == Seq(2L, 3L),
      s"probe 10's negatives from cluster A with id tie-break: ${got(10L)}")
  }
}
