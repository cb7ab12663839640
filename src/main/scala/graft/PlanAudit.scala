package graft
import org.apache.spark.sql.SparkSession
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.01"
    for (name <- Seq("q1_filter_project", "q3_join_revenue", "q6_pivot", "q8_sort_limit", "q18_embed_neardup")) {
      println(s"===== $name")
      val plan = SparkEntry.queries(name)(spark, dir).queryExecution.executedPlan.toString
      // summarize: operator lines only
      plan.linesIterator.filter(l => l.matches(".*(Scan|Join|Exchange|Aggregate|TakeOrdered|WholeStageCodegen|Window|Sort|PushedFilters).*")).take(25).foreach(println)
    }
    spark.stop()
  }
}
