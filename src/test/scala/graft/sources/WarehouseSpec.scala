package graft.sources

import graft.SparkSpec
import graft.etl.CatalogDiff
import org.apache.spark.sql.functions._

class WarehouseSpec extends SparkSpec {

  test("view warehouse: read/append round-trip and diff-then-publish flow") {
    import spark.implicits._
    val wh: Warehouse = new ViewWarehouse(spark)

    Seq("1", "2", "3").toDF("movie_id")
      .localCheckpoint(true).createOrReplaceTempView("wh_published")
    assert(wh.read("wh_published").count() == 3)

    // the reference loop: catalog vs published → new items → publish back
    val catalog = Seq(
      ("1", "Movie One"), ("2", "Movie Two"),
      ("4", "Movie Four"), ("5", "Movie Five"))
      .toDF("ItemID", "Title")
    val fresh = CatalogDiff.newItems(catalog, wh.read("wh_published"))
    assert(fresh.select("ItemID").collect().map(_.getString(0)).toSet == Set("4", "5"))

    wh.append("wh_published", fresh.select(col("ItemID").as("movie_id")))
    assert(wh.read("wh_published").count() == 5)
    // idempotent second diff: nothing new remains
    assert(CatalogDiff.newItems(catalog, wh.read("wh_published")).count() == 0)
  }

  test("jdbc warehouse: reader configuration builds without a live endpoint") {
    // construction must not touch the network; only .load()/.save() would
    val wh = new JdbcWarehouse(spark, "jdbc:postgresql://warehouse.invalid/db",
      props = Map("user" -> "svc"),
      readPartitions = Some(("id", 0L, 1000000L, 32)))
    assert(wh != null)
  }
}
