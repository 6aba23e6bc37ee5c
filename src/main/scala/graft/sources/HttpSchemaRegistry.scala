package graft.sources

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets

import org.json4s._
import org.json4s.jackson.JsonMethods

/** Confluent Schema Registry REST client — the network implementation of
  * [[SchemaRegistryClient]] the reference delegates to (transformer
  * application.yml:14-16 `schema.registry.url`, docker/connect
  * register-connector.json:15-18 auto-registration). Speaks the v1 REST
  * surface over the JDK's `java.net.http` (no extra dependency):
  *
  *   POST /subjects/{subject}/versions   {"schema": "…"}  → {"id": N}
  *   GET  /schemas/ids/{id}                               → {"schema": "…"}
  *   GET  /subjects                                       → ["s1", …]
  *   GET  /subjects/{subject}/versions                    → [1, 2, …]
  *   GET  /subjects/{subject}/versions/latest|{v}         → {id, schema, …}
  *
  * Driver-side only, like every registry impl here: executors receive the
  * immutable `snapshot` with the closure (see [[SchemaRegistryClient]]).
  * A 409 from registration (the registry's compatibility gate rejecting an
  * evolved writer schema) surfaces as `IllegalStateException` — the
  * producer must not silently publish an unreadable schema.
  */
final class HttpSchemaRegistry(baseUrl: String) extends SchemaRegistryClient {
  private val base = baseUrl.stripSuffix("/")
  private val http = HttpClient.newHttpClient()

  private def get(path: String): Option[JValue] = {
    val resp = http.send(
      HttpRequest.newBuilder(URI.create(base + path)).GET().build(),
      HttpResponse.BodyHandlers.ofString()
    )
    resp.statusCode() match {
      case 200 => Some(JsonMethods.parse(resp.body()))
      case 404 => None
      case c   => throw new IllegalStateException(s"GET $path -> $c: ${resp.body()}")
    }
  }

  override def register(subject: String, schemaJson: String): Int = {
    val body = JsonMethods.compact(JObject("schema" -> JString(schemaJson)))
    val req = HttpRequest.newBuilder(URI.create(s"$base/subjects/$subject/versions"))
      .header("Content-Type", "application/vnd.schemaregistry.v1+json")
      .POST(HttpRequest.BodyPublishers.ofString(body, StandardCharsets.UTF_8))
      .build()
    val resp = http.send(req, HttpResponse.BodyHandlers.ofString())
    if (resp.statusCode() != 200)
      throw new IllegalStateException(
        s"register $subject -> ${resp.statusCode()}: ${resp.body()}")
    JsonMethods.parse(resp.body()) \ "id" match {
      case JInt(i)  => i.toInt
      case JLong(i) => i.toInt
      case other    => throw new IllegalStateException(s"register $subject: no id in $other")
    }
  }

  override def byId(id: Int): Option[String] =
    get(s"/schemas/ids/$id").map { j =>
      j \ "schema" match {
        case JString(s) => s
        case other      => throw new IllegalStateException(s"byId $id: no schema in $other")
      }
    }

  override def latest(subject: String): Option[(Int, String)] =
    get(s"/subjects/$subject/versions/latest").map(versionFields(subject, _))

  override def snapshot: Map[Int, String] = {
    val subjects = get("/subjects").toSeq.flatMap {
      case JArray(items) => items.collect { case JString(s) => s }
      case _             => Nil
    }
    subjects.flatMap { s =>
      val versions = get(s"/subjects/$s/versions").toSeq.flatMap {
        case JArray(items) => items.collect { case JInt(v) => v.toInt }
        case _             => Nil
      }
      versions.flatMap(v => get(s"/subjects/$s/versions/$v").map(versionFields(s, _)))
    }.toMap
  }

  private def versionFields(subject: String, j: JValue): (Int, String) =
    (j \ "id", j \ "schema") match {
      case (JInt(id), JString(schema)) => (id.toInt, schema)
      case other => throw new IllegalStateException(s"version response for $subject malformed: $other")
    }
}
