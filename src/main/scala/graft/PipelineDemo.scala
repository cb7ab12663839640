package graft

import java.nio.file.{Files, Paths}

import graft.etl.{CatalogDiff, MovieCatalogETL}
import graft.gen.EventGen
import graft.io.{ConfluentAvro, InMemorySchemaRegistry}
import graft.sources.{FileLog, FileLogSink}
import graft.streaming.{EventDecode, Segmentation}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** End-to-end drive of the rebuilt reference pipeline (SURVEY.md §3):
  * synthesized Movies.txt → catalog ETL → incremental diff → Confluent-Avro
  * frames, plus generated events → union decode → segmentation. Run with:
  * `sbt "runMain graft.PipelineDemo"`. */
object PipelineDemo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .appName("graft-pipeline-demo")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // --- batch ETL -----------------------------------------------------
    val dir = Files.createDirectories(Paths.get("target/tmp/demo"))
    val moviesTxt = dir.resolve("Movies.txt")
    val sb = new StringBuilder
    (1 to 500).foreach { i =>
      sb.append(s"ITEM $i\n")
      if (i % 7 != 0) sb.append(s"Title = Movie #$i\n")
      if (i % 5 != 0) sb.append(s"Genre = Genre${i % 3}\n")
      if (i % 2 == 0) sb.append(s"ListPrice = ${i}99USD$$$i.99\n")
      sb.append(s"Actor = Actor${i % 11}\n\n")
    }
    Files.writeString(moviesTxt, sb.toString)

    val catalog = MovieCatalogETL.run(spark, moviesTxt.toString).cache()
    println(s"[demo] catalog rows=${catalog.count()} cols=${catalog.columns.length}")
    catalog.select("item_id", "Title", "Genre", "ListPrice")
      .orderBy(col("item_id").cast("long")).show(5, truncate = false)

    // --- incremental diff + publish frames -----------------------------
    val published = (1 to 300).map(_.toString).toDF("movie_id")
    val fresh = CatalogDiff.newItems(
      catalog.withColumnRenamed("item_id", "ItemID"), published)
    // registry-assigned schema id → framed executor-side → one atomic log
    // segment → consumed back through the DSv2 source + the same registry
    val registry = new InMemorySchemaRegistry
    val catalogLog = Files.createTempDirectory(dir, "catalog-log").toString
    val nPublished = FileLogSink.publish(
      ConfluentAvro.catalogFramesResolved(
        CatalogDiff.enrichedEvents(fresh), registry), catalogLog)
    val consumed = ConfluentAvro.decodeCatalogFrames(
      spark.read.format("graft-log").load(catalogLog), registry)
    println(s"[demo] new items=${fresh.count()} published=$nPublished " +
      s"consumed=${consumed.count()} via graft-log")

    // --- event stream: generate → graft-log → decode → segment ---------
    val events = EventGen.batch(spark, 20000, seed = 42)
    val eventLog = Files.createTempDirectory(dir, "events-log").toString
    EventGen.asJson(events).collect().map(_.getString(0))
      .grouped(5000).foreach(batch => FileLog.appendStrings(eventLog, batch.toSeq))
    val stream = EventDecode.decode(
      spark.readStream.format("graft-log")
        .option("maxRecordsPerTrigger", "5000").load(eventLog))
    val q = stream.writeStream.format("memory").queryName("demo_events")
      .outputMode("append").start()
    q.processAllAvailable(); q.stop()
    val decoded = spark.table("demo_events").cache()
    println(s"[demo] decoded events=${decoded.count()} (streamed off graft-log)")
    decoded.groupBy("event_name").count().orderBy("event_name").show()
    Segmentation.funnel(decoded, windowLen = "6 hours")
      .orderBy("window").show(truncate = false)

    spark.stop()
  }
}
