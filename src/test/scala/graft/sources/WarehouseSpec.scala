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

  test("jdbc warehouse: partitioned-read options reach the JDBC layer (mock driver)") {
    MockJdbcDriver.ensureRegistered()
    MockJdbcDriver.queries.clear()
    val wh = new JdbcWarehouse(spark, "jdbc:graftmock://wh",
      props = Map("user" -> "svc"),
      readPartitions = Some(("id", 0L, 400L, 4)))
    val df = wh.read("wh_tbl")
    // schema came from the mock's ResultSetMetaData, not a live endpoint
    assert(df.schema.fieldNames.toSeq == Seq("id", "name"))
    // numPartitions landed: Spark derives one task per stride
    assert(df.rdd.getNumPartitions == 4)
    assert(df.count() == 0)
    val sqls = {
      import scala.jdk.CollectionConverters._
      MockJdbcDriver.queries.asScala.toVector
    }
    // partitionColumn/lowerBound/upperBound landed: four per-partition
    // queries with disjoint stride predicates on "id" (bounds 0..400 / 4
    // → stride 100), plus the WHERE 1=0 schema probe
    val strides = sqls.filter(s => s.contains("id") && s.contains("100"))
    assert(strides.nonEmpty,
      s"expected stride predicates on id in the executed SQL:\n${sqls.mkString("\n")}")
    val partitionQueries = sqls.filterNot(_.contains("1=0"))
    assert(partitionQueries.size == 4,
      s"expected 4 per-partition scans, got:\n${sqls.mkString("\n")}")
  }
}

/** In-JVM `java.sql.Driver` stub ("jdbc:graftmock:") built from dynamic
  * proxies: answers the schema probe with a fixed (id BIGINT, name VARCHAR)
  * ResultSetMetaData, returns zero rows, and records every SQL text handed
  * to `prepareStatement` — which is exactly what's needed to assert
  * [[JdbcWarehouse]]'s partitioned-read option plumbing without a network.
  * Unhandled JDBC methods return type-appropriate defaults. */
object MockJdbcDriver {

  val queries = new java.util.concurrent.ConcurrentLinkedQueue[String]()

  @volatile private var registered = false

  def ensureRegistered(): Unit = synchronized {
    if (!registered) {
      java.sql.DriverManager.registerDriver(new GraftMockDriver)
      registered = true
    }
  }

  private def default(t: Class[_]): AnyRef = t match {
    case java.lang.Boolean.TYPE => java.lang.Boolean.FALSE
    case java.lang.Integer.TYPE => Integer.valueOf(0)
    case java.lang.Long.TYPE => java.lang.Long.valueOf(0L)
    case java.lang.Short.TYPE => java.lang.Short.valueOf(0.toShort)
    case java.lang.Byte.TYPE => java.lang.Byte.valueOf(0.toByte)
    case java.lang.Double.TYPE => java.lang.Double.valueOf(0.0)
    case java.lang.Float.TYPE => java.lang.Float.valueOf(0.0f)
    case java.lang.Character.TYPE => java.lang.Character.valueOf(' ')
    case java.lang.Void.TYPE => null
    case c if c == classOf[String] => ""
    case _ => null
  }

  private def proxy[T](iface: Class[T])(
      handler: PartialFunction[(String, Seq[AnyRef]), AnyRef]): T =
    java.lang.reflect.Proxy.newProxyInstance(
      iface.getClassLoader, Array[Class[_]](iface),
      (_, m, args) => {
        val a: Seq[AnyRef] = if (args == null) Nil else args.toSeq
        handler.applyOrElse((m.getName, a),
          (_: (String, Seq[AnyRef])) => default(m.getReturnType))
      }).asInstanceOf[T]

  /** id BIGINT NOT NULL, name VARCHAR — enough surface for
    * JdbcUtils.getSchema. */
  private def rsmd: java.sql.ResultSetMetaData =
    proxy(classOf[java.sql.ResultSetMetaData]) {
      case ("getColumnCount", _) => Integer.valueOf(2)
      case ("getColumnLabel", Seq(i: Integer)) =>
        if (i == 1) "id" else "name"
      case ("getColumnName", Seq(i: Integer)) =>
        if (i == 1) "id" else "name"
      case ("getColumnType", Seq(i: Integer)) =>
        Integer.valueOf(if (i == 1) java.sql.Types.BIGINT else java.sql.Types.VARCHAR)
      case ("getColumnTypeName", Seq(i: Integer)) =>
        if (i == 1) "BIGINT" else "VARCHAR"
      case ("getPrecision", Seq(i: Integer)) =>
        Integer.valueOf(if (i == 1) 19 else 255)
      case ("isSigned", _) => java.lang.Boolean.TRUE
      case ("isNullable", Seq(i: Integer)) =>
        Integer.valueOf(
          if (i == 1) java.sql.ResultSetMetaData.columnNoNulls
          else java.sql.ResultSetMetaData.columnNullable)
    }

  private def resultSet: java.sql.ResultSet =
    proxy(classOf[java.sql.ResultSet]) {
      case ("getMetaData", _) => rsmd
      case ("next", _) => java.lang.Boolean.FALSE
      case ("wasNull", _) => java.lang.Boolean.FALSE
    }

  private def preparedStatement: java.sql.PreparedStatement =
    proxy(classOf[java.sql.PreparedStatement]) {
      case ("executeQuery", _) => resultSet
      case ("getMetaData", _) => rsmd
    }

  private def connection: java.sql.Connection =
    proxy(classOf[java.sql.Connection]) {
      case ("prepareStatement", (sql: String) +: _) =>
        queries.add(sql); preparedStatement
      case ("isClosed", _) => java.lang.Boolean.FALSE
      case ("isValid", _) => java.lang.Boolean.TRUE
      case ("getAutoCommit", _) => java.lang.Boolean.TRUE
      case ("getMetaData", _) =>
        proxy(classOf[java.sql.DatabaseMetaData]) {
          case ("getDatabaseProductName", _) => "GraftMock"
          case ("getURL", _) => "jdbc:graftmock://wh"
          case ("getJDBCMajorVersion", _) => Integer.valueOf(4)
          case ("supportsTransactions", _) => java.lang.Boolean.FALSE
        }
    }

  private[sources] def newConnection(): java.sql.Connection = connection
}

/** Top-level on purpose: Spark re-registers the driver by
  * `getClass.getCanonicalName` + `Class.forName`, which only agree for
  * top-level classes (a nested class's canonical name uses dots where the
  * binary name uses `$`). */
final class GraftMockDriver extends java.sql.Driver {
  override def acceptsURL(url: String): Boolean =
    url != null && url.startsWith("jdbc:graftmock:")
  override def connect(url: String, info: java.util.Properties): java.sql.Connection =
    if (acceptsURL(url)) MockJdbcDriver.newConnection() else null
  override def getMajorVersion: Int = 1
  override def getMinorVersion: Int = 0
  override def jdbcCompliant(): Boolean = false
  override def getPropertyInfo(url: String, info: java.util.Properties)
      : Array[java.sql.DriverPropertyInfo] = Array.empty
  override def getParentLogger: java.util.logging.Logger =
    throw new java.sql.SQLFeatureNotSupportedException()
}
