package graft.queries

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SURVEY.md §7.5 declared query set Q1–Q12 — the engine-surface contract the
  * driver's DuckDB oracle verifies at sf0.01.
  *
  * Hash-stability rules (the driver compares value hashes bit-for-bit):
  *   - Money/quantity aggregates go through exact DECIMAL sums (the testdata
  *     doubles are 2-decimal), then CAST to DOUBLE at the end — the decimal
  *     total is < 2^53 so the double is exact and order-independent.
  *   - Averages are exact-sum / count in double — one deterministic division.
  *   - Timestamps are never emitted raw (parquet NANOS vs MICROS precision
  *     mismatch); emit CAST(ts AS DATE) or epoch instead.
  *   - Every query ends in a total ORDER BY, mirrored in the oracle SQL.
  */
object CoreQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** Exact decimal-sum of a 2-decimal double column, emitted as double. */
  private def dsum(c: Column): Column =
    sum(c.cast("decimal(18,2)")).cast("double")

  /** Exact decimal revenue term: price * (1 - discount). */
  private def revenueTerm(price: Column, disc: Column): Column =
    price.cast("decimal(12,2)") * (lit(1).cast("decimal(4,2)") - disc.cast("decimal(4,2)"))

  // ---------------------------------------------------------------- Q1
  def q1FilterProject(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .filter(col("event_type") === "purchase" && col("value") > 100)
      .select(col("event_id"), col("user_id"), col("value"),
        col("ts").cast("date").as("day"))
      .orderBy("event_id")

  val q1Sql: String =
    """SELECT event_id, user_id, value, CAST(ts AS DATE) AS day
      |FROM events WHERE event_type = 'purchase' AND value > 100
      |ORDER BY event_id""".stripMargin

  // ---------------------------------------------------------------- Q2
  def q2GroupAgg(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        sum(revenueTerm(col("l_extendedprice"), col("l_discount")))
          .cast("double").as("sum_disc_price"),
        (dsum(col("l_quantity")) / count(col("l_quantity"))).as("avg_qty"),
        min(col("l_extendedprice")).as("min_price"),
        max(col("l_extendedprice")).as("max_price"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  val q2Sql: String =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS sum_disc_price,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(l_quantity) AS avg_qty,
      |  MIN(l_extendedprice) AS min_price,
      |  MAX(l_extendedprice) AS max_price,
      |  COUNT(*) AS count_order
      |FROM lineitem GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  // ---------------------------------------------------------------- Q3
  /** Revenue per nation: customer ⋈ orders ⋈ lineitem ⋈ nation.
    * nation/customer are dimension-sized — Catalyst broadcasts them; the
    * orders⋈lineitem fact join shuffles on orderkey (correct at 100 TB). */
  def q3JoinRevenue(s: SparkSession, dir: String): DataFrame = {
    val customer = t(s, dir, "customer")
    val orders = t(s, dir, "orders")
    val lineitem = t(s, dir, "lineitem")
    val nation = t(s, dir, "nation")
    lineitem
      .join(orders, col("l_orderkey") === col("o_orderkey"))
      .join(customer, col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .groupBy("n_name")
      .agg(
        sum(revenueTerm(col("l_extendedprice"), col("l_discount")))
          .cast("double").as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy("n_name")
  }

  val q3Sql: String =
    """SELECT n_name,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue,
      |  COUNT(*) AS n_items
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |GROUP BY n_name ORDER BY n_name""".stripMargin

  // ---------------------------------------------------------------- Q4
  /** Incremental-diff semantics (reference J1: `~isin(collected ids)`,
    * services/spark_batch_processor.py:83-85) rebuilt as a left anti join —
    * the 100 TB-safe form of "only new rows". */
  def q4AntiJoin(s: SparkSession, dir: String): DataFrame = {
    val part = t(s, dir, "part")
    val bigSales = t(s, dir, "lineitem").filter(col("l_quantity") >= 48)
    part.join(bigSales, col("p_partkey") === col("l_partkey"), "left_anti")
      .select("p_partkey", "p_name", "p_brand")
      .orderBy("p_partkey")
  }

  val q4Sql: String =
    """SELECT p_partkey, p_name, p_brand FROM part
      |WHERE NOT EXISTS (
      |  SELECT 1 FROM lineitem WHERE l_partkey = p_partkey AND l_quantity >= 48)
      |ORDER BY p_partkey""".stripMargin

  // ---------------------------------------------------------------- Q5
  def q5WindowTopK(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    t(s, dir, "orders")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
      .orderBy("o_custkey", "rn")
  }

  val q5Sql: String =
    """SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
      |  SELECT o_custkey, o_orderkey, o_totalprice,
      |    ROW_NUMBER() OVER (PARTITION BY o_custkey
      |      ORDER BY o_totalprice DESC, o_orderkey) AS rn
      |  FROM orders) WHERE rn <= 3
      |ORDER BY o_custkey, rn""".stripMargin

  // ---------------------------------------------------------------- Q6
  /** Long→wide pivot (reference A1 semantics, spark_batch_processor.py:40).
    * Explicit pivot values skip the distinct-collect pre-pass — at 100 TB the
    * value domain must be declared, not discovered. */
  val eventTypes: Seq[String] = Seq("click", "error", "purchase", "signup", "view")

  def q6Pivot(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .groupBy("user_id")
      .pivot("event_type", eventTypes)
      .agg(count(lit(1)))
      .na.fill(0L, eventTypes)
      .orderBy("user_id")

  val q6Sql: String =
    """SELECT user_id,
      |  COUNT(*) FILTER (WHERE event_type = 'click') AS click,
      |  COUNT(*) FILTER (WHERE event_type = 'error') AS error,
      |  COUNT(*) FILTER (WHERE event_type = 'purchase') AS purchase,
      |  COUNT(*) FILTER (WHERE event_type = 'signup') AS signup,
      |  COUNT(*) FILTER (WHERE event_type = 'view') AS view
      |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin

  // ---------------------------------------------------------------- Q7
  def q7CountDistinct(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .groupBy(col("ts").cast("date").as("day"))
      .agg(
        countDistinct(col("user_id")).as("n_users"),
        count(lit(1)).as("n_events"))
      .orderBy("day")

  val q7Sql: String =
    """SELECT CAST(ts AS DATE) AS day,
      |  COUNT(DISTINCT user_id) AS n_users, COUNT(*) AS n_events
      |FROM events GROUP BY 1 ORDER BY day""".stripMargin

  // ---------------------------------------------------------------- Q8
  /** Catalyst collapses orderBy+limit to TakeOrderedAndProject — per-partition
    * top-k then a k-row driver merge, no global sort at scale. */
  def q8SortLimit(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .select("o_orderkey", "o_custkey", "o_totalprice")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(10)

  val q8Sql: String =
    """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
      |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin

  // ---------------------------------------------------------------- Q9
  def q9SetOps(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events")
    val clicks = ev.filter(col("event_type") === "click").select("event_id")
    val views = ev.filter(col("event_type") === "view").select("event_id")
    val lowVal = ev.filter(col("value") < 50).select("event_id")
    clicks.union(views).distinct().except(lowVal).orderBy("event_id")
  }

  val q9Sql: String =
    """(SELECT event_id FROM events WHERE event_type = 'click'
      | UNION
      | SELECT event_id FROM events WHERE event_type = 'view')
      |EXCEPT
      |SELECT event_id FROM events WHERE value < 50
      |ORDER BY event_id""".stripMargin

  // ---------------------------------------------------------------- Q10
  def q10JsonExtract(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
      .filter(col("k").isNotNull)
      .groupBy("event_type")
      .agg(sum(col("k")).as("sum_k"), count(col("k")).as("n"))
      .orderBy("event_type")

  val q10Sql: String =
    """SELECT event_type,
      |  CAST(SUM(k) AS BIGINT) AS sum_k, COUNT(k) AS n
      |FROM (SELECT event_type,
      |        TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
      |      FROM events)
      |WHERE k IS NOT NULL
      |GROUP BY event_type ORDER BY event_type""".stripMargin

  // ---------------------------------------------------------------- Q11
  /** Exact dedup: group identical text, keep the lowest doc_id (deterministic
    * keeper). At scale this is a single hash-shuffle on a 64-bit text hash
    * prefix; here the full text is the grouping key for oracle parity. */
  def q11DedupExact(s: SparkSession, dir: String): DataFrame =
    graft.ops.Dedup.exact(t(s, dir, "documents"))
      .select("doc_id", "n_copies")
      .orderBy("doc_id")

  val q11Sql: String =
    """SELECT MIN(doc_id) AS doc_id, COUNT(*) AS n_copies
      |FROM documents GROUP BY text ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- Q12
  /** Brute-force cosine top-k: 5 probe vectors against the full table.
    * The probe side is broadcast (5 rows); the scan side streams — the
    * correct baseline shape at any scale. Similarity is computed in double
    * with in-order summation and rounded to 6dp so both engines agree. */
  def q12CosineTopK(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings").select(
      col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val probes = emb.filter(col("vec_id") < 5)
      .withColumnRenamed("vec_id", "query_id").withColumnRenamed("v", "q")
    graft.ops.Similarity.bruteTopK(emb, probes, 5)
      .orderBy("query_id", "rn")
  }

  val q12Sql: String =
    """SELECT query_id, vec_id, sim, rn FROM (
      |  SELECT query_id, vec_id, sim,
      |    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY sim DESC, vec_id) AS rn
      |  FROM (
      |    SELECT q.vec_id AS query_id, e.vec_id AS vec_id,
      |      ROUND(list_dot_product(CAST(q.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[]))
      |        / (sqrt(list_dot_product(CAST(q.embedding AS DOUBLE[]), CAST(q.embedding AS DOUBLE[])))
      |         * sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])))), 6) AS sim
      |    FROM embeddings q CROSS JOIN embeddings e
      |    WHERE q.vec_id < 5 AND e.vec_id <> q.vec_id))
      |WHERE rn <= 5 ORDER BY query_id, rn""".stripMargin

  // ----------------------------------------------------------------
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_filter_project" -> (q1FilterProject _),
    "q2_group_agg" -> (q2GroupAgg _),
    "q3_join_revenue" -> (q3JoinRevenue _),
    "q4_anti_join" -> (q4AntiJoin _),
    "q5_window_topk" -> (q5WindowTopK _),
    "q6_pivot" -> (q6Pivot _),
    "q7_count_distinct" -> (q7CountDistinct _),
    "q8_sort_limit" -> (q8SortLimit _),
    "q9_setops" -> (q9SetOps _),
    "q10_json_extract" -> (q10JsonExtract _),
    "q11_dedup_exact" -> (q11DedupExact _),
    "q12_cosine_topk" -> (q12CosineTopK _))

  val oracleSql: Map[String, String] = Map(
    "q1_filter_project" -> q1Sql,
    "q2_group_agg" -> q2Sql,
    "q3_join_revenue" -> q3Sql,
    "q4_anti_join" -> q4Sql,
    "q5_window_topk" -> q5Sql,
    "q6_pivot" -> q6Sql,
    "q7_count_distinct" -> q7Sql,
    "q8_sort_limit" -> q8Sql,
    "q9_setops" -> q9Sql,
    "q10_json_extract" -> q10Sql,
    "q11_dedup_exact" -> q11Sql,
    "q12_cosine_topk" -> q12Sql)
}
