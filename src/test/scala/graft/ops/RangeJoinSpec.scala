package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RangeJoinSpec extends SparkSpec {

  private def points = {
    import spark.implicits._
    (0L until 500L).map(i => (i, i * 3 % 997)).toDF("p_id", "p")
  }

  private def intervals = {
    import spark.implicits._
    (0L until 40L).map(i => (i, i * 25, i * 25 + 40)).toDF("iv_id", "lo", "hi")
  }

  test("binned range join ≡ naive range join, at several bin widths") {
    val naive = points.join(intervals, col("p") >= col("lo") && col("p") < col("hi"))
      .select("p_id", "iv_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(naive.nonEmpty)
    Seq(1L, 7L, 40L, 1000L).foreach { w =>
      val binned = RangeJoin.binned(points, "p", intervals, "lo", "hi", w)
        .select("p_id", "iv_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(binned == naive, s"binWidth=$w diverges from naive join")
    }
  }

  test("plan is an equi-join on the bin — no nested-loop/cartesian node") {
    val plan = RangeJoin.binned(points, "p", intervals, "lo", "hi", 40L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"range join planned a nested loop:\n$plan")
  }

  test("date-typed binned join ≡ naive date containment join, plan equi-only") {
    import spark.implicits._
    def d(days: Long) = java.sql.Date.valueOf(
      java.time.LocalDate.of(1995, 1, 1).plusDays(days))
    val pts = (0L until 300L).map(i => (i, d(i * 5 % 731))).toDF("p_id", "pd")
    val ivs = (0L until 10L).map(i => (i, d(i * 70), d(i * 70 + 95)))
      .toDF("iv_id", "d_lo", "d_hi")
    val naive = pts.join(ivs, col("pd") >= col("d_lo") && col("pd") < col("d_hi"))
      .select("p_id", "iv_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(naive.nonEmpty)
    Seq(1L, 30L, 95L, 400L).foreach { w =>
      val binned = RangeJoin.binnedDates(pts, "pd", ivs, "d_lo", "d_hi", w)
        .select("p_id", "iv_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(binned == naive, s"binWidthDays=$w diverges from naive date join")
    }
    val plan = RangeJoin.binnedDates(pts, "pd", ivs, "d_lo", "d_hi", 95L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"date range join planned a nested loop:\n$plan")
  }

  test("seeded fuzz: random intervals/points/widths always equal the naive join") {
    import spark.implicits._
    val rnd = new scala.util.Random(20260812L)
    (1 to 5).foreach { trial =>
      val pts = Seq.fill(300)(rnd.between(-500L, 500L)).zipWithIndex
        .map { case (p, i) => (i.toLong, p) }.toDF("p_id", "p")
      val ivs = Seq.fill(25) {
        val lo = rnd.between(-500L, 500L)
        (lo, lo + rnd.between(0L, 120L))
      }.zipWithIndex.map { case ((lo, hi), i) => (i.toLong, lo, hi) }
        .toDF("iv_id", "lo", "hi")
      val naive = pts.join(ivs, col("p") >= col("lo") && col("p") < col("hi"))
        .select("p_id", "iv_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val w = rnd.between(1L, 200L)
      val binned = RangeJoin.binned(pts, "p", ivs, "lo", "hi", w)
        .select("p_id", "iv_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(binned == naive, s"trial $trial width=$w diverged")
    }
  }

  test("long keys above 2^53 bin exactly (double floor-division would collapse them)") {
    import spark.implicits._
    val base = 1L << 60
    // two adjacent points around a bin boundary that double arithmetic
    // cannot distinguish (2^60 and 2^60+1 are equal as doubles)
    val pts = Seq((1L, base), (2L, base + 1), (3L, base + 99)).toDF("p_id", "p")
    val ivs = Seq((10L, base + 1, base + 50)).toDF("iv_id", "lo", "hi")
    val got = RangeJoin.binned(pts, "p", ivs, "lo", "hi", 50L)
      .select("p_id").collect().map(_.getLong(0)).toSet
    assert(got == Set(2L), s"expected only the in-range point, got $got")
  }

  test("empty intervals and out-of-range points produce empty results, not errors") {
    import spark.implicits._
    val none = RangeJoin.binned(
      points, "p",
      Seq((0L, -100L, -50L)).toDF("iv_id", "lo", "hi"), "lo", "hi", 7L)
    assert(none.count() == 0)
  }
}
