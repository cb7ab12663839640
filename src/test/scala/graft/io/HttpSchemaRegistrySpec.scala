package graft.io

import java.net.InetSocketAddress
import java.util.concurrent.atomic.AtomicInteger

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import graft.SparkSpec
import graft.io.ConfluentAvro
import graft.model.Event
import java.nio.file.Files

/** [[HttpSchemaRegistry]] against a loopback mock implementing the Confluent
  * REST protocol (backed by [[InMemorySchemaRegistry]] for the semantics) —
  * the transport half of the S6 seam, exercised with zero egress: in-JDK
  * `HttpServer` on 127.0.0.1, in-JDK `HttpClient` in the client. */
class HttpSchemaRegistrySpec extends SparkSpec {

  private val SubjectRe = "/subjects/([^/]+)/versions".r
  private val IdRe = "/schemas/ids/([0-9]+)".r

  /** Starts the mock registry; hands the test its base URL + a hit counter. */
  private def withServer(test: (String, () => Int) => Unit): Unit = {
    val delegate = new InMemorySchemaRegistry
    val hits = new AtomicInteger
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/", (ex: HttpExchange) => {
      hits.incrementAndGet()
      val (code, body) = (ex.getRequestMethod, ex.getRequestURI.getPath) match {
        case ("POST", SubjectRe(subject)) =>
          val req = new String(ex.getRequestBody.readAllBytes(), "UTF-8")
          val schema = new org.apache.avro.Schema.Parser()
            .parse(JsonStr.strField(req, "schema"))
          val id = delegate.register(
            java.net.URLDecoder.decode(subject, "UTF-8"), schema)
          (200, s"""{"id": $id}""")
        case ("GET", IdRe(id)) =>
          try (200,
            s"""{"schema": ${JsonStr.quote(delegate.schemaById(id.toInt).toString)}}""")
          catch {
            case _: IllegalArgumentException =>
              (404, """{"error_code": 40403, "message": "Schema not found"}""")
          }
        case _ => (404, """{"error_code": 404, "message": "unknown route"}""")
      }
      val bytes = body.getBytes("UTF-8")
      ex.getResponseHeaders.add(
        "Content-Type", "application/vnd.schemaregistry.v1+json")
      ex.sendResponseHeaders(code, bytes.length)
      ex.getResponseBody.write(bytes)
      ex.close()
    })
    server.start()
    try test(s"http://127.0.0.1:${server.getAddress.getPort}", () => hits.get())
    finally server.stop(0)
  }

  test("Confluent semantics over HTTP: stable ids, round-trip, registry error surfaced") {
    withServer { (url, _) =>
      val reg = new HttpSchemaRegistry(url)
      val catalog = ConfluentAvro.schemaFor(Event.CatalogName)
      val signIn = ConfluentAvro.schemaFor(Event.SignInName)
      val id1 = reg.register("catalog_update-value", catalog)
      val id2 = reg.register("catalog_update-value", catalog)
      val id3 = reg.register("events-value", signIn)
      assert(id1 == id2 && id1 != id3)
      assert(reg.schemaById(id3).getFields.toString == signIn.getFields.toString)
      val e = intercept[IllegalArgumentException](reg.schemaById(9999))
      assert(e.getMessage.contains("404") && e.getMessage.contains("40403"),
        s"registry diagnostics lost: ${e.getMessage}")
    }
  }

  test("client caches both directions: one HTTP round-trip per distinct key") {
    withServer { (url, hits) =>
      val reg = new HttpSchemaRegistry(url)
      val catalog = ConfluentAvro.schemaFor(Event.CatalogName)
      reg.register("catalog_update-value", catalog)
      val afterFirst = hits()
      (1 to 5).foreach(_ => reg.register("catalog_update-value", catalog))
      assert(hits() == afterFirst, "re-register of a cached schema hit the network")
      val id = reg.register("events-value", ConfluentAvro.schemaFor(Event.SignInName))
      reg.schemaById(id)
      val afterFetch = hits()
      (1 to 5).foreach(_ => reg.schemaById(id))
      assert(hits() == afterFetch, "schemaById of a cached id hit the network")
    }
  }

  test("produce→log→consume round-trip with executors resolving over HTTP") {
    withServer { (url, _) =>
      import spark.implicits._
      val reg = new HttpSchemaRegistry(url)
      val events = (1 to 5).map(i =>
        (s"2024-01-01T00:00:00.00000$i", "movie_catalog_enriched", s"$i",
          s"Movie #$i", "Drama", i.toFloat))
        .toDF("timestamp", "event_name", "movie_id", "title", "genre", "list_price")
      val dir = Files.createTempDirectory("graftlog-http").toFile.getAbsolutePath
      val n = graft.sources.FileLogSink.publish(
        ConfluentAvro.catalogFramesResolved(events, reg), dir)
      assert(n == 5)
      // consume with a FRESH client (empty caches) — ids resolve over HTTP
      val consumer = new HttpSchemaRegistry(url)
      val read = spark.read.format("graft-log").load(dir)
      val decoded = ConfluentAvro.decodeCatalogFrames(read, consumer)
        .orderBy("movie_id").collect()
      assert(decoded.length == 5)
      assert(decoded.map(_.getAs[String]("title")).toSeq ==
        (1 to 5).map(i => s"Movie #$i"))
    }
  }
}
