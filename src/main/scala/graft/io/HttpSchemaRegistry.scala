package graft.io

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets
import java.time.Duration
import java.util.concurrent.ConcurrentHashMap

import org.apache.avro.Schema

/** [[SchemaResolver]] over the Confluent Schema-Registry REST protocol
  * (public wire contract; cf. the reference's client use at
  * /root/reference/services/kafka_event_publisher.py:24-40):
  *
  *  - produce path: `POST /subjects/{subject}/versions` with body
  *    `{"schema": "<avro json>"}` → `{"id": N}`
  *  - consume path: `GET /schemas/ids/{id}` → `{"schema": "<avro json>"}`
  *
  * Both directions are cached exactly like the reference's serializer cache:
  * one network round-trip per distinct (subject, schema) on produce and per
  * distinct id on consume, after which executors resolve locally. Built on
  * in-JDK `java.net.http` — no client library. The `HttpClient` is
  * `@transient lazy` so the resolver serializes into tasks and re-opens its
  * connection pool executor-side; caches warm per JVM.
  *
  * Error surface: non-2xx responses raise with the registry's body (which
  * carries Confluent's `error_code`/`message` JSON) — callers see the
  * registry's own diagnostics, not a swallowed null.
  */
final class HttpSchemaRegistry(
    baseUrl: String,
    timeout: Duration = Duration.ofSeconds(10)) extends SchemaResolver {

  private val base = baseUrl.stripSuffix("/")
  private val idCache = new ConcurrentHashMap[(String, String), Integer]()
  private val schemaCache = new ConcurrentHashMap[Integer, String]()

  @transient private lazy val client: HttpClient =
    HttpClient.newBuilder().connectTimeout(timeout).build()

  // Network I/O stays OUTSIDE the cache's computeIfAbsent: a blocking fetch
  // inside the mapping function would hold the map bin for up to the full
  // timeout and stall unrelated keys that hash to it. The check-fetch-put
  // race can at most duplicate a round-trip; Confluent ids are stable per
  // (subject, schema), so both racers cache the same value.

  override def register(subject: String, schema: Schema): Int = {
    val key = (subject, schema.toString)
    val cached = idCache.get(key)
    if (cached != null) return cached.intValue()
    val body = s"""{"schema": ${JsonStr.quote(schema.toString)}}"""
    val resp = send(HttpRequest.newBuilder(
        URI.create(s"$base/subjects/${urlEnc(subject)}/versions"))
      .timeout(timeout)
      .header("Content-Type", "application/vnd.schemaregistry.v1+json")
      .POST(HttpRequest.BodyPublishers.ofString(body, StandardCharsets.UTF_8))
      .build())
    val id = Integer.valueOf(JsonStr.intField(resp, "id"))
    idCache.putIfAbsent(key, id)
    id.intValue()
  }

  override def schemaById(id: Int): Schema = {
    val key = Integer.valueOf(id)
    val cached = schemaCache.get(key)
    val json =
      if (cached != null) cached
      else {
        val resp = send(HttpRequest.newBuilder(
            URI.create(s"$base/schemas/ids/$id"))
          .timeout(timeout)
          .GET()
          .build())
        val s = JsonStr.strField(resp, "schema")
        schemaCache.putIfAbsent(key, s)
        s
      }
    new Schema.Parser().parse(json)
  }

  private def send(req: HttpRequest): String = {
    val resp = client.send(req, HttpResponse.BodyHandlers.ofString())
    require(resp.statusCode() / 100 == 2,
      s"schema registry ${req.method()} ${req.uri()} -> " +
        s"HTTP ${resp.statusCode()}: ${resp.body()}")
    resp.body()
  }

  private def urlEnc(s: String): String =
    java.net.URLEncoder.encode(s, "UTF-8").replace("+", "%20")
}

/** Minimal JSON string quote/extract for the two registry payload shapes —
  * enough for the protocol's `{"schema": "..."}`/`{"id": N}` bodies without
  * binding the library to a JSON dependency. Escapes per RFC 8259; parsing
  * locates a named field and decodes one string or integer value.
  */
private[io] object JsonStr {

  def quote(s: String): String = {
    val b = new StringBuilder(s.length + 16).append('"')
    s.foreach {
      case '"'  => b.append("\\\"")
      case '\\' => b.append("\\\\")
      case '\n' => b.append("\\n")
      case '\r' => b.append("\\r")
      case '\t' => b.append("\\t")
      case c if c < ' ' => b.append(f"\\u${c.toInt}%04x")
      case c => b.append(c)
    }
    b.append('"').toString
  }

  def intField(json: String, name: String): Int = {
    val i = fieldStart(json, name)
    val end = json.indexWhere(c => !c.isDigit && c != '-', i)
    json.substring(i, if (end < 0) json.length else end).trim.toInt
  }

  def strField(json: String, name: String): String = {
    val i = fieldStart(json, name)
    require(json.charAt(i) == '"', s"field $name is not a string in: $json")
    val b = new StringBuilder
    var j = i + 1
    while (json.charAt(j) != '"') {
      json.charAt(j) match {
        case '\\' =>
          json.charAt(j + 1) match {
            case 'n' => b.append('\n'); j += 2
            case 'r' => b.append('\r'); j += 2
            case 't' => b.append('\t'); j += 2
            case 'b' => b.append('\b'); j += 2
            case 'f' => b.append('\f'); j += 2
            case 'u' =>
              b.append(Integer.parseInt(json.substring(j + 2, j + 6), 16).toChar)
              j += 6
            // RFC 8259 only allows \" \\ \/ beyond the above — pass the
            // escaped char through verbatim for all three
            case c => b.append(c); j += 2
          }
        case c => b.append(c); j += 1
      }
    }
    b.toString
  }

  /** Index of the value of TOP-LEVEL key `name`. A real scanner, not an
    * indexOf: string values are skipped wholesale (escape-aware) and only
    * a quoted token at object depth 1 followed by `:` counts as a key —
    * so a registry response carrying the key's text inside an earlier
    * string value (or inside a nested object) cannot be mis-parsed. */
  private def fieldStart(json: String, name: String): Int = {
    val n = json.length
    var i = 0
    var depth = 0
    while (i < n) {
      json.charAt(i) match {
        case '{' | '[' => depth += 1; i += 1
        case '}' | ']' => depth -= 1; i += 1
        case '"' =>
          val start = i + 1
          i += 1
          while (i < n && json.charAt(i) != '"') {
            if (json.charAt(i) == '\\') i += 2 else i += 1
          }
          val end = i // closing quote
          i += 1
          if (depth == 1) {
            // pretty-printing registries put whitespace around the colon
            var j = i
            while (j < n && Character.isWhitespace(json.charAt(j))) j += 1
            if (j < n && json.charAt(j) == ':' &&
                json.substring(start, math.min(end, n)) == name) {
              j += 1
              while (j < n && Character.isWhitespace(json.charAt(j))) j += 1
              return j
            }
          }
        case _ => i += 1
      }
    }
    sys.error(s"no top-level field $name in: $json")
  }
}
