package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The warehouse-connector seam (SURVEY.md §2.1 S7/S8): the reference reads
  * its published-catalog state from a SaaS warehouse
  * (/root/reference/services/snowflake_query_service.py:15-57) and the
  * engine only ever needs "give me table T as a DataFrame" / "append rows
  * to table T" from it. Everything downstream ([[graft.etl.CatalogDiff]],
  * the q33/q49 SQL surface) depends on this trait, so the backing store is
  * swappable: registered views for tests and local runs, JDBC for a real
  * warehouse. No SaaS-specific API appears anywhere — the JDBC impl is
  * plain `spark.read.format("jdbc")`, which covers any warehouse exposing
  * a JDBC endpoint.
  */
trait Warehouse {
  def read(table: String): DataFrame
  def append(table: String, rows: DataFrame): Unit
}

/** Session-catalog implementation: tables are temp views (how every spec
  * and the driver gate run). Appends materialize through an in-memory
  * union-and-replace — adequate for test fixtures, not a durable store. */
final class ViewWarehouse(spark: SparkSession) extends Warehouse {
  override def read(table: String): DataFrame = spark.table(table)
  override def append(table: String, rows: DataFrame): Unit = {
    val merged =
      if (spark.catalog.tableExists(table)) spark.table(table).unionByName(rows)
      else rows
    merged.localCheckpoint(true).createOrReplaceTempView(table)
  }
}

/** JDBC implementation — the production seam. Not executable in this
  * sandbox (zero egress, no JDBC driver jar ships in the container), but
  * the full configuration surface is here: partitioned parallel reads via
  * (partitionColumn, lowerBound, upperBound, numPartitions) so a large
  * warehouse table scans across executors instead of through one
  * connection, and batched appends. */
final class JdbcWarehouse(
    spark: SparkSession,
    url: String,
    props: Map[String, String] = Map.empty,
    readPartitions: Option[(String, Long, Long, Int)] = None) extends Warehouse {

  override def read(table: String): DataFrame = {
    val base = spark.read.format("jdbc")
      .option("url", url).option("dbtable", table)
    val withProps = props.foldLeft(base) { case (r, (k, v)) => r.option(k, v) }
    readPartitions.fold(withProps) { case (column, lo, hi, n) =>
      withProps
        .option("partitionColumn", column)
        .option("lowerBound", lo.toString)
        .option("upperBound", hi.toString)
        .option("numPartitions", n.toString)
    }.load()
  }

  override def append(table: String, rows: DataFrame): Unit = {
    val base = rows.write.format("jdbc")
      .option("url", url).option("dbtable", table).mode("append")
    props.foldLeft(base) { case (w, (k, v)) => w.option(k, v) }.save()
  }
}
