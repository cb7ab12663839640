package graft.etl

import java.nio.file.{Files, Paths}

import graft.SparkSpec
import org.apache.spark.sql.functions._

class StreamingCatalogETLSpec extends SparkSpec {

  private def writeCatalogFile(dir: java.nio.file.Path, name: String,
      ids: Range): Unit = {
    val sb = new StringBuilder
    ids.foreach { i =>
      sb.append(s"ITEM $i\n")
      sb.append(s"Title = Movie #$name-$i\n")
      sb.append(s"ListPrice = $$$i.99\n\n")
    }
    Files.writeString(dir.resolve(name), sb.toString)
  }

  test("file-source streaming ETL processes drops exactly once across restarts") {
    val base = Files.createDirectories(
      Paths.get(s"target/tmp/stream_etl_${System.nanoTime()}"))
    val in = Files.createDirectories(base.resolve("in"))
    val out = base.resolve("out").toString
    val ckpt = base.resolve("ckpt").toString

    writeCatalogFile(in, "a.txt", 1 to 30)
    val q1 = StreamingCatalogETL.start(spark, in.toString, out, ckpt)
    q1.awaitTermination()
    val after1 = spark.read.parquet(out)
    assert(after1.count() == 30)
    assert(after1.columns.contains("Title") && after1.columns.contains("ListPrice"))

    // drop a second file, restart from the checkpoint: only the new file runs
    writeCatalogFile(in, "b.txt", 1 to 12)
    val q2 = StreamingCatalogETL.start(spark, in.toString, out, ckpt)
    q2.awaitTermination()
    val after2 = spark.read.parquet(out)
    assert(after2.count() == 42)
    // price extraction ran inside the stream
    val prices = after2.filter(col("ListPrice") > 0).count()
    assert(prices == 42)
  }
}
