package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the full operator surface (one entry per implemented operator
  * from SURVEY.md §2 / §7.5); `oracleSql` gives the DuckDB-equivalent SQL the
  * driver hash-compares against at sf0.01.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    graft.queries.CoreQueries.q3JoinRevenue(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.CoreQueries.queries ++ graft.queries.ExtQueries.queries

  def oracleSql: Map[String, String] =
    graft.queries.CoreQueries.oracleSql ++ graft.queries.ExtQueries.oracleSql
}
