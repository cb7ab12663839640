package graft.io

import java.nio.file.{Files, Paths}

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Partitioned parquet layout + partition pruning — the scan-side behavior
  * that makes day-partitioned 100 TB event tables queryable: a day filter
  * must prune to one directory, not scan everything. */
class PartitionedSinkSpec extends SparkSpec {

  test("day-partitioned write prunes partitions on read") {
    val base = Files.createDirectories(Paths.get("target/tmp/partitioned"))
    val out = base.resolve(s"events_${System.nanoTime()}").toString
    val events = Tables.load(spark, sfDir, "events")
      .withColumn("day", col("ts").cast("date"))
    events.write.partitionBy("day").parquet(out)

    val firstDay = events.agg(min(col("day"))).collect()(0).getDate(0)
    val read = spark.read.parquet(out).filter(col("day") === lit(firstDay))
    val plan = read.queryExecution.executedPlan.toString

    assert(plan.contains("PartitionFilters: ["), plan)
    assert(plan.matches("(?s).*PartitionFilters: \\[[^\\]]*day[^\\]]*\\].*"),
      "day filter should appear in PartitionFilters:\n" + plan)
    // pruned scan reads exactly the one day's rows
    val expected = events.filter(col("day") === lit(firstDay)).count()
    assert(read.count() == expected && expected > 0)
    // and the directory layout is hive-style day=...
    assert(Files.list(Paths.get(out)).iterator().asScala
      .exists(_.getFileName.toString.startsWith("day=")))
  }

  private implicit class IterAsScala[T](it: java.util.Iterator[T]) {
    def asScala: Iterator[T] = new Iterator[T] {
      def hasNext = it.hasNext
      def next() = it.next()
    }
  }
}
