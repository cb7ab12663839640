package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Hard error bound for the approx-distinct operator (q28): HyperLogLog++
  * at rsd=0.02 must land within 2·rsd of the exact per-group cardinalities,
  * group for group — tighter than the 5% `within_tol` bound the q28 oracle
  * row hash-checks in-engine. */
class ApproxBoundsSpec extends SparkSpec {

  test("percentile_approx within its rank-error bound of the exact percentile") {
    // approx_percentile(accuracy=a) guarantees a rank error ≤ n/a: the
    // returned value's true rank is within n/10000 of the target rank.
    // Verify against exact sorted ranks per quantile on lineitem prices.
    val accuracy = 10000
    val prices = graft.Tables.load(spark, sfDir, "lineitem")
      .select(col("l_extendedprice").as("x"))
    val n = prices.count()
    val sorted = prices.orderBy("x").collect().map(_.getDouble(0))
    Seq(0.1, 0.5, 0.9, 0.99).foreach { q =>
      val approx = prices
        .agg(percentile_approx(col("x"), lit(q), lit(accuracy)).as("p"))
        .collect().head.getDouble(0)
      // true rank of the returned value (first index with sorted(i) >= approx)
      val rank = sorted.indexWhere(_ >= approx) match {
        case -1 => n - 1
        case i => i.toLong
      }
      val target = (q * n).toLong
      // bound: the documented n/accuracy rank error plus a few rows of
      // discretization slack from the indexWhere rounding
      val rankErr = math.abs(rank - target).toDouble / n
      assert(rankErr <= 1.0 / accuracy + 5.0 / n,
        s"q=$q: approx=$approx rank=$rank target=$target rankErr=$rankErr")
    }
  }

  test("hll sketches merge losslessly: partial-per-partition union == single-pass") {
    // The 100 TB posture for distinct counting: build HLL sketch PARTIALS
    // per shard (here: per event_type), union them, estimate — DataSketches
    // binary sketches are mergeable across jobs/days without re-scanning.
    val ev = graft.Tables.load(spark, sfDir, "events")
    // per-shard partial sketches (one binary blob per group)
    val partials = ev.groupBy("event_type")
      .agg(expr("hll_sketch_agg(user_id, 12)").as("sk"))
    val unioned = partials
      .agg(expr("hll_sketch_estimate(hll_union_agg(sk, false))").as("est"))
      .collect().head.getLong(0)
    // single-pass global sketch at the same lgConfigK
    val direct = ev
      .agg(expr("hll_sketch_estimate(hll_sketch_agg(user_id, 12))").as("est"))
      .collect().head.getLong(0)
    assert(unioned == direct,
      s"union-of-partials $unioned != single-pass $direct")
    // and the estimate is within HLL error of the exact cardinality
    val exact = ev.select(countDistinct(col("user_id"))).collect().head.getLong(0)
    assert(math.abs(unioned - exact).toDouble / exact <= 0.05,
      s"estimate $unioned vs exact $exact")
  }

  test("q28 approx_count_distinct within 2·rsd of exact per event_type") {
    // q28's public output folds the sketch into within_tol, so the 2·rsd
    // check recomputes both aggregates on the same input here
    val rsd = 0.02
    val joined = graft.Tables.load(spark, sfDir, "events")
      .groupBy("event_type")
      .agg(
        approx_count_distinct(col("user_id"), rsd = rsd).as("approx_users"),
        countDistinct(col("user_id")).as("exact_users"))
      .collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      val a = r.getAs[Long]("approx_users").toDouble
      val e = r.getAs[Long]("exact_users").toDouble
      val relErr = math.abs(a - e) / e
      assert(relErr <= 2 * rsd,
        s"${r.getAs[String]("event_type")}: approx=$a exact=$e relErr=$relErr > ${2 * rsd}")
    }
    // and the shipped query itself reports every group inside its bound
    val tol = ExtQueries.q28ApproxDistinct(spark, sfDir).collect()
    assert(tol.nonEmpty && tol.forall(_.getAs[Boolean]("within_tol")))
  }
}
