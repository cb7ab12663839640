package graft.etl

import java.nio.file.{Files, Paths}

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** SURVEY.md §5.1 golden test: the committed reference output
  * `/root/reference/data/processed/movies.parquet` (8,701 rows × 75 cols) is
  * the only correctness artifact the reference ships. We invert the pivot —
  * emit `ITEM <n>` + `Key = Value` lines per row, re-encoding ListPrice in
  * the dirty `$`-form the extractor expects — run the rebuilt ETL over the
  * synthesized text, and require exact round-trip equality. Exercises
  * S1, P1-P5, W1-W3, A1, F12, F7 end-to-end against real reference data. */
class GoldenETLSpec extends SparkSpec {

  private val goldenPath = "/root/reference/data/processed/movies.parquet"

  test("ETL round-trips the reference's committed catalog exactly") {
    assume(Files.exists(Paths.get(goldenPath)))
    val golden = spark.read.parquet(goldenPath)
    val cols = golden.columns
    assert(cols.length == 75 && cols.contains("ItemID"))

    // Invert the pivot into block text, in ItemID ordinal order.
    val attrCols = cols.filterNot(_ == "ItemID")
    val rows = golden.collect()
      .sortBy(r => r.getString(r.fieldIndex("ItemID")).toLong)
    val sb = new StringBuilder
    rows.foreach { r =>
      sb.append("ITEM ").append(r.getString(r.fieldIndex("ItemID"))).append('\n')
      attrCols.foreach { c =>
        val idx = r.fieldIndex(c)
        if (!r.isNullAt(idx)) {
          val v = r.get(idx)
          val rendered = c match {
            // float → "$8.99" so the extractor reproduces the exact float;
            // 0.0 prices stay representable as "$0.0"
            case "ListPrice" => "$" + v.toString
            case _ => v.toString
          }
          // '\n' inside values would break the line format; golden data has none
          sb.append(c).append(" = ").append(rendered).append('\n')
        }
      }
    }
    val dir = Files.createDirectories(Paths.get("target/tmp/golden"))
    val txt = dir.resolve("Movies.txt")
    Files.writeString(txt, sb.toString)

    val rebuilt = MovieCatalogETL.run(spark, txt.toString)
      .withColumnRenamed("item_id", "ItemID")

    assert(rebuilt.count() == golden.count())
    assert(rebuilt.columns.sorted.sameElements(golden.columns.sorted))

    // Full-table equality via symmetric except on normalized column order.
    val ordered = golden.columns.sorted.toSeq
    val a = rebuilt.select(ordered.map(col): _*)
    val b = golden.select(ordered.map(col): _*)
    val onlyRebuilt = a.exceptAll(b).count()
    val onlyGolden = b.exceptAll(a).count()
    assert(onlyRebuilt == 0 && onlyGolden == 0,
      s"round-trip diff: $onlyRebuilt extra, $onlyGolden missing")
  }
}
