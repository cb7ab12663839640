package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Runtime bloom-filter pruning (Spark's InjectRuntimeFilter): a selective
  * dimension filter is turned into a bloom filter applied on the fact side
  * BEFORE its shuffle — the engine-level pattern that keeps a 100 TB fact
  * shuffle proportional to the selected keys, not the full table. The rule
  * only fires on shuffle joins over file scans past size thresholds, so the
  * spec writes real parquet and lowers the thresholds to test scale. */
class RuntimeFilterSpec extends SparkSpec {

  test("selective dim filter injects a bloom filter on the fact scan side") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-rf").toString
    (0L until 200000L).map(i => (i % 1000, i)).toDF("k", "payload")
      .write.mode("overwrite").parquet(s"$dir/fact")
    (0L until 1000L).map(i => (i, i % 7)).toDF("k", "cat")
      .write.mode("overwrite").parquet(s"$dir/dim")

    val prev = Map(
      "spark.sql.autoBroadcastJoinThreshold" ->
        spark.conf.get("spark.sql.autoBroadcastJoinThreshold"),
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" ->
        spark.conf.get(
          "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold"),
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" ->
        spark.conf.get("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold"))
    try {
      // force a shuffle join (no broadcast) and drop the 10GB/10MB size
      // gates that a local-mode fixture can never reach
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
      spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "100MB")
      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")

      val fact = spark.read.parquet(s"$dir/fact")
      val dim = spark.read.parquet(s"$dir/dim").filter(col("cat") === 3)
      val joined = fact.join(dim, "k")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("might_contain"),
        s"runtime bloom filter did not inject:\n$plan")
      // and it must not change results vs the unfiltered plan
      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
      val expected = fact.join(dim, "k").count()
      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      assert(joined.count() == expected && expected > 0)
    } finally prev.foreach { case (k, v) => spark.conf.set(k, v) }
  }
}
