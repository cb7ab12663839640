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
    val names =
      if (args.nonEmpty) args.toSeq
      else Seq("q1_filter_project", "q3_join_revenue", "q6_pivot", "q8_sort_limit",
        "q18_embed_neardup", "q45_range_join", "q48_repetition", "q50_quantized_topk",
        "q52_tfidf", "q15_minhash_lsh", "q17_ngram_jaccard", "q13_sessionize",
        "q58_decontaminate", "q62_date_range_join", "q63_upsert", "q64_rolling_window")
    for (name <- names) {
      println(s"===== $name")
      val plan = SparkEntry.queries(name)(spark, dir).queryExecution.executedPlan.toString
      // summarize: operator lines only
      plan.linesIterator.filter(l => l.matches(".*(Scan|Join|Exchange|Aggregate|TakeOrdered|WholeStageCodegen|Window|Sort|PushedFilters|Generate).*")).take(30).foreach(println)
    }
    spark.stop()
  }
}
