package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
object TopKMicroBench {
  def main(args: Array[String]): Unit = {
    val stock = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    stock.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    def timeIt(label: String)(f: => Long): Unit = {
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        val n = f
        println(f"$label run$i: ${(System.nanoTime() - t0) / 1e9}%.2fs rows=$n")
      }
    }
    val orders = Tables.load(stock, dir, "lineitem")
    val w = Window.partitionBy("l_suppkey")
      .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
    timeIt("stock WindowGroupLimit") {
      orders.withColumn("rn", row_number().over(w)).filter(col("rn") <= 2).count()
    }
    timeIt("custom TopKPerKey") {
      graft.plans.TopKPerKey(orders, Seq("l_suppkey"),
        Seq(graft.plans.TopKPerKey.Order("l_extendedprice", desc = true),
          graft.plans.TopKPerKey.Order("l_orderkey"),
          graft.plans.TopKPerKey.Order("l_linenumber")), 2).count()
    }
    stock.stop()
  }
}
