package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat

/** Scratch probe (not a test): does the DSv2 parquet reader populate
  * ParquetFileFormat.ROW_INDEX_TEMPORARY_COLUMN_NAME when it rides the
  * requested data schema? Decides the dv'd-stream delivery design. */
object RowIdxProbeMain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .appName("rowidx-probe").getOrCreate()
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("rowidx").toString
    (0L until 10L).map(k => (k, k * 10L)).toDF("k", "v")
      .coalesce(1).write.mode("overwrite").parquet(dir)
    val tmpCol = ParquetFileFormat.ROW_INDEX_TEMPORARY_COLUMN_NAME
    println(s"[probe] tmp col name = $tmpCol")
    val files = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getName).toSeq
    val fstat = files.map { f =>
      val s = new java.io.File(dir, f)
      f -> (s.length(), s.lastModified())
    }.toMap
    val schema = StructType(Seq(
      StructField("k", LongType), StructField("v", LongType),
      StructField(tmpCol, LongType)))
    val idx = ManifestReadTable.index(spark, dir, files, fstat, Some(schema))
    val (full, data) = ManifestReadTable.splitSchemas(schema, idx)
    val batch = org.apache.spark.sql.execution.datasources.v2.parquet
      .ParquetScanBuilder(spark, idx, full, data,
        new CaseInsensitiveStringMap(java.util.Collections.emptyMap()))
      .build().toBatch
    val parts = batch.planInputPartitions()
    val factory = batch.createReaderFactory()
    println(s"[probe] partitions = ${parts.length}")
    parts.foreach { p =>
      println(s"[probe] columnar=${factory.supportColumnarReads(p)}")
      val r = factory.createReader(p)
      while (r.next()) {
        val row = r.get()
        println(s"[probe] row k=${row.getLong(0)} v=${row.getLong(1)} " +
          s"idx=${if (row.isNullAt(2)) "NULL" else row.getLong(2)}")
      }
      r.close()
    }
    spark.stop()
  }
}
