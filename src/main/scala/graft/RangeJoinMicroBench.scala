package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Honest measurement of the binned range join vs the stock nested-loop
  * plan at sf0.1: lineitem ship-days (~600k points) against 7-day windows
  * derived from 1/100th of orders (~1.5k intervals) — the q45 workload.
  * The naive plan compares every (point, interval) combination (~10^9);
  * the binned plan touches only same-bin combinations. */
object RangeJoinMicroBench {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    val epoch = lit("1970-01-01").cast("date")
    val points = Tables.load(spark, dir, "lineitem")
      .select(datediff(col("l_shipdate").cast("date"), epoch).as("ship_day"))
    val intervals = Tables.load(spark, dir, "orders")
      .filter(col("o_orderkey") % 100 === 0)
      .select(col("o_orderkey"),
        datediff(col("o_orderdate").cast("date"), epoch).as("lo_day"),
        (datediff(col("o_orderdate").cast("date"), epoch) + 7).as("hi_day"))
      .cache()
    intervals.count()

    def timeIt(label: String)(f: => Long): Unit =
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        val n = f
        println(f"$label run$i: ${(System.nanoTime() - t0) / 1e9}%.2fs rows=$n")
      }

    timeIt("naive BroadcastNestedLoopJoin") {
      points.join(intervals,
        col("ship_day") >= col("lo_day") && col("ship_day") < col("hi_day")).count()
    }
    timeIt("binned RangeJoin (width=7)") {
      ops.RangeJoin.binned(points, "ship_day", intervals,
        "lo_day", "hi_day", binWidth = 7).count()
    }
    spark.stop()
  }
}
