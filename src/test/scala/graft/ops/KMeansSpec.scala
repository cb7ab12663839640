package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Integer-exact Lloyd k-means: hand-computed fixture (including the
  * round-half-up centroid averaging), quantization exactness, and
  * partition independence. */
class KMeansSpec extends SparkSpec {

  test("quantize: exact fixed-point longs, offset keeps components non-negative") {
    import spark.implicits._
    val out = Seq(Tuple1(Seq(-0.5f, 0.25f, 0.0f)))
      .toDF("embedding")
      .select(KMeans.quantize(col("embedding")).as("qv"))
      .collect()(0).getSeq[Long](0)
    // floor(-0.5*1024)+1024 = 512; floor(0.25*1024)+1024 = 1280; 0 -> 1024
    assert(out == Seq(512L, 1280L, 1024L))
  }

  test("two obvious clusters recovered from a degenerate init; exact centroids") {
    import spark.implicits._
    // ids 1..3 cluster at the origin, 4..6 at (10,10); init takes the two
    // smallest ids — BOTH in the origin cluster — and Lloyd still separates
    val pts = Seq(
      (1L, Seq(0L, 0L)), (2L, Seq(0L, 2L)), (3L, Seq(2L, 0L)),
      (4L, Seq(10L, 10L)), (5L, Seq(10L, 12L)), (6L, Seq(12L, 10L)))
    val df = pts.toDF("vec_id", "qv")
    val out = KMeans.fit(df, k = 2, iters = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val byId = out.map(t => t._1 -> (t._2, t._3)).toMap
    assert(Set(1L, 2L, 3L).map(byId(_)._1).size == 1, "origin cluster together")
    assert(Set(4L, 5L, 6L).map(byId(_)._1).size == 1, "far cluster together")
    assert(byId(1L)._1 != byId(4L)._1, "the two clusters are distinct")
    // after 2 updates: c0 = roundHalfUp(mean{(0,0),(0,2),(2,0)}) = (1,1),
    // c1 = roundHalfUp(mean{(10,10),(10,12),(12,10)}) = (11,11)
    assert(byId(1L)._2 == 2L, s"dist((0,0),(1,1)) = 2, got ${byId(1L)._2}")
    assert(byId(5L)._2 == 2L, s"dist((10,12),(11,11)) = 2, got ${byId(5L)._2}")
  }

  test("assignment is partition-independent and ties break to the lowest cid") {
    import spark.implicits._
    // a point equidistant from both init centroids must land in cid 0
    val pts = Seq(
      (1L, Seq(0L, 0L)), (2L, Seq(4L, 0L)), (3L, Seq(2L, 0L)))
    val one = KMeans.fit(pts.toDF("vec_id", "qv"), k = 2, iters = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(one(3L) == one(1L) && one(1L) == 0L,
      s"equidistant point joins the lowest cid: $one")
    val base = KMeans.fit(pts.toDF("vec_id", "qv"), k = 2, iters = 2)
      .collect().map(_.toSeq).sortBy(_.toString)
    val rep = KMeans.fit(pts.toDF("vec_id", "qv").repartition(5), k = 2, iters = 2)
      .collect().map(_.toSeq).sortBy(_.toString)
    assert(base.sameElements(rep), "repartitioning must not change the fit")
  }
}
