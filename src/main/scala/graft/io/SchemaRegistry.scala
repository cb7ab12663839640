package graft.io

import java.util.concurrent.ConcurrentHashMap

import org.apache.avro.Schema

/** The Schema-Registry protocol seam (SURVEY.md §2.1 S6): the reference
  * registers subjects and resolves schema ids over HTTP with a client-side
  * cache (/root/reference/services/kafka_event_publisher.py:24-40). The
  * engine depends only on this trait — id assignment on the produce path,
  * id → schema resolution on the consume path — so the transport is
  * pluggable: [[HttpSchemaRegistry]] implements the same two calls against
  * `POST /subjects/{subject}/versions` and `GET /schemas/ids/{id}` over
  * in-JDK `java.net.http` (spec'd against a loopback mock registry), while
  * [[InMemorySchemaRegistry]] provides the semantics for tests and local
  * pipelines.
  */
trait SchemaResolver extends Serializable {

  /** Id for (subject, schema), registering on first sight (produce path). */
  def register(subject: String, schema: Schema): Int

  /** Schema for a wire-format id (consume path). */
  def schemaById(id: Int): Schema
}

/** Registry semantics in memory: ids are assigned once per canonical schema
  * text within a subject (re-registering the same schema returns the same
  * id — the Confluent contract), and both directions are cached. Thread-safe.
  */
final class InMemorySchemaRegistry extends SchemaResolver {

  private val byId = new ConcurrentHashMap[Int, String]()
  private val bySubjectSchema = new ConcurrentHashMap[(String, String), Int]()
  private val nextId = new java.util.concurrent.atomic.AtomicInteger(1)

  override def register(subject: String, schema: Schema): Int =
    bySubjectSchema.computeIfAbsent((subject, schema.toString), { _ =>
      val id = nextId.getAndIncrement()
      byId.put(id, schema.toString)
      id
    })

  override def schemaById(id: Int): Schema = {
    val json = byId.get(id)
    require(json != null, s"schema id $id not registered")
    new Schema.Parser().parse(json)
  }

  def size: Int = byId.size()
}
