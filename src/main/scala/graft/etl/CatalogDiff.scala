package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental "only new items" diff (reference J1 — the driver-side
  * `~isin(collected snowflake ids)` at
  * /root/reference/services/spark_batch_processor.py:83-85).
  *
  * Rebuilt as a left anti equi-join: Catalyst picks broadcast-hash when the
  * published-ids side fits the broadcast threshold and shuffled-hash/SMJ
  * otherwise — an unbounded id set never lands on the driver, unlike `isin`.
  */
object CatalogDiff {

  /** Rows of `catalog` whose ItemID is absent from `published.movie_id`. */
  def newItems(catalog: DataFrame, published: DataFrame): DataFrame =
    catalog.join(
      published.select(col("movie_id")).distinct(),
      catalog("ItemID") === col("movie_id"),
      "left_anti")

  /** The enriched-event projection the reference publishes per new row
    * (MovieCatalogEvent ctor, /root/reference/UserEvents.py:29-53): executor-
    * side, no collect loop. */
  def enrichedEvents(newRows: DataFrame): DataFrame =
    newRows.select(
      date_format(current_timestamp(), "yyyy-MM-dd'T'HH:mm:ss.SSSSSS")
        .as("timestamp"),
      lit("movie_catalog_enriched").as("event_name"),
      col("ItemID").as("movie_id"),
      col("Title").as("title"),
      col("Genre").as("genre"),
      col("ListPrice").cast("float").as("list_price"))
}
