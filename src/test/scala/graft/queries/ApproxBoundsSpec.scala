package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Hard error bound for the approx-distinct operator (q28), which is
  * rows-only at the driver gate (cross-engine sketches differ by design):
  * HyperLogLog++ at rsd=0.02 must land within 2·rsd of the exact
  * per-group cardinalities, group for group. */
class ApproxBoundsSpec extends SparkSpec {

  test("q28 approx_count_distinct within 2·rsd of exact per event_type") {
    val rsd = 0.02
    val approx = ExtQueries.q28ApproxDistinct(spark, sfDir)
      .select("event_type", "approx_users")
    val exact = graft.Tables.load(spark, sfDir, "events")
      .groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("exact_users"))
    val joined = approx.join(exact, "event_type").collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      val a = r.getAs[Long]("approx_users").toDouble
      val e = r.getAs[Long]("exact_users").toDouble
      val relErr = math.abs(a - e) / e
      assert(relErr <= 2 * rsd,
        s"${r.getAs[String]("event_type")}: approx=$a exact=$e relErr=$relErr > ${2 * rsd}")
    }
  }
}
