package graft.sources

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

import scala.jdk.CollectionConverters._

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.apache.avro.{Schema, SchemaValidationException, SchemaValidatorBuilder}
import org.apache.spark.sql.functions._
import org.json4s._
import org.json4s.jackson.JsonMethods

import graft.GraftSpecBase

/** Confluent-shaped registry stub on the JDK HTTP server: the same REST
  * surface the reference's registry exposes (application.yml:14-16,
  * register-connector.json:15-18), backed by [[InMemorySchemaRegistry]]
  * and guarded by Avro's own can-read validator — a backward-incompatible
  * registration gets the registry's 409, exactly the Confluent
  * compatibility gate producers hit on a bad schema evolution.
  */
final class RegistryStub(port: Int = 0) {
  val registry          = new InMemorySchemaRegistry
  private val validator = new SchemaValidatorBuilder().canReadStrategy().validateLatest()
  private val server    = HttpServer.create(new InetSocketAddress("127.0.0.1", port), 0)

  def baseUrl: String = s"http://127.0.0.1:${server.getAddress.getPort}"

  def start(): RegistryStub = {
    server.createContext("/", (ex: HttpExchange) => handle(ex))
    server.setExecutor(null)
    server.start()
    this
  }

  def stop(): Unit = server.stop(0)

  private def respond(ex: HttpExchange, code: Int, json: JValue): Unit = {
    val bytes = JsonMethods.compact(JsonMethods.render(json)).getBytes(StandardCharsets.UTF_8)
    ex.getResponseHeaders.set("Content-Type", "application/vnd.schemaregistry.v1+json")
    ex.sendResponseHeaders(code, bytes.length.toLong)
    ex.getResponseBody.write(bytes)
  }

  private def versionJson(subject: String, version: Int, id: Int, schema: String): JValue =
    JObject(
      "subject" -> JString(subject), "version" -> JInt(version),
      "id"      -> JInt(id),         "schema"  -> JString(schema)
    )

  private def handle(ex: HttpExchange): Unit = {
    val parts = ex.getRequestURI.getPath.split("/").filter(_.nonEmpty).toList
    try {
      (ex.getRequestMethod, parts) match {
        case ("POST", List("subjects", subject, "versions")) =>
          val body = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
          JsonMethods.parse(body) \ "schema" match {
            case JString(schemaJson) =>
              val next   = new Schema.Parser().parse(schemaJson)
              val latest = registry.latest(subject).map(v => new Schema.Parser().parse(v._2))
              try {
                latest.foreach(l => validator.validate(next, Seq(l).asJava))
                respond(ex, 200, JObject("id" -> JInt(registry.register(subject, schemaJson))))
              } catch {
                case e: SchemaValidationException =>
                  respond(ex, 409, JObject(
                    "error_code" -> JInt(409),
                    "message"    -> JString(s"Schema being registered is incompatible: ${e.getMessage}")
                  ))
              }
            case _ =>
              respond(ex, 422, JObject("error_code" -> JInt(42201), "message" -> JString("no schema")))
          }

        case ("GET", List("schemas", "ids", id)) =>
          registry.byId(id.toInt) match {
            case Some(s) => respond(ex, 200, JObject("schema" -> JString(s)))
            case None    => respond(ex, 404, JObject("error_code" -> JInt(40403), "message" -> JString("Schema not found")))
          }

        case ("GET", List("subjects")) =>
          respond(ex, 200, JArray(registry.subjects.map(JString(_)).toList))

        case ("GET", List("subjects", subject, "versions")) =>
          val vs = registry.versions(subject)
          if (vs.isEmpty) respond(ex, 404, JObject("error_code" -> JInt(40401), "message" -> JString("Subject not found")))
          else respond(ex, 200, JArray((1 to vs.length).map(JInt(_)).toList))

        case ("GET", List("subjects", subject, "versions", v)) =>
          val vs = registry.versions(subject)
          val idx = if (v == "latest") vs.length - 1 else v.toInt - 1
          if (idx < 0 || idx >= vs.length)
            respond(ex, 404, JObject("error_code" -> JInt(40402), "message" -> JString("Version not found")))
          else {
            val (id, schema) = vs(idx)
            respond(ex, 200, versionJson(subject, idx + 1, id, schema))
          }

        case _ => respond(ex, 404, JObject("error_code" -> JInt(404), "message" -> JString("not found")))
      }
    } finally ex.close()
  }
}

/** Proves the REST contract end-to-end: [[HttpSchemaRegistry]] against the
  * stub matches the in-memory registry bit-for-bit, the compatibility gate
  * rejects a bad evolution with 409, and the full producer flow — register
  * an EVOLVED writer schema over HTTP, encode with it, decode with
  * registry-fetched schemas — resolves in both directions.
  */
class HttpSchemaRegistrySpec extends GraftSpecBase {
  import spark.implicits._

  private val v1 =
    """{"type":"record","name":"Animal","fields":[
      |  {"name":"id","type":"long"},
      |  {"name":"name","type":["null","string"],"default":null}
      |]}""".stripMargin

  private val v2 =
    """{"type":"record","name":"Animal","fields":[
      |  {"name":"id","type":"long"},
      |  {"name":"name","type":["null","string"],"default":null},
      |  {"name":"color","type":"string","default":"unknown"}
      |]}""".stripMargin

  // adds a REQUIRED field with no default: a v3 reader cannot read v2
  // data — the canonical backward-incompatible evolution
  private val v3bad =
    """{"type":"record","name":"Animal","fields":[
      |  {"name":"id","type":"long"},
      |  {"name":"weight","type":"double"}
      |]}""".stripMargin

  private def withStub[A](f: (RegistryStub, HttpSchemaRegistry) => A): A = {
    val stub = new RegistryStub().start()
    try f(stub, new HttpSchemaRegistry(stub.baseUrl))
    finally stub.stop()
  }

  test("register/byId/latest/snapshot round-trip over HTTP, idempotently") {
    withStub { (stub, client) =>
      val id1 = client.register("animals-value", v1)
      assert(client.register("animals-value", v1) === id1) // idempotent POST
      val id2 = client.register("animals-value", v2)
      assert(id2 !== id1)
      assert(client.byId(id1) === stub.registry.byId(id1))
      assert(client.byId(id1 + id2 + 17) === None) // 404 → None
      assert(client.latest("animals-value") === stub.registry.latest("animals-value"))
      assert(client.latest("no-such-subject") === None)
      assert(client.snapshot === stub.registry.snapshot)
    }
  }

  test("backward-incompatible registration is refused with the registry's 409") {
    withStub { (_, client) =>
      client.register("animals-value", v1)
      val e = intercept[IllegalStateException](client.register("animals-value", v3bad))
      assert(e.getMessage.contains("409"))
      // the rejected schema must not have been assigned an id
      assert(client.snapshot.values.toSet === Set(client.byId(1).get))
    }
  }

  test("client-side BACKWARD gate: default-added field passes, type change is rejected before POST") {
    withStub { (stub, client) =>
      val id1 = SchemaCompat.registerChecked(client, "animals-value", v1)
      assert(id1 === 1) // first registration of a subject always passes

      // adding a field WITH a default: new readers fill it on old data — OK
      val id2 = SchemaCompat.registerChecked(client, "animals-value", v2)
      assert(id2 !== id1)

      // changing id long → string: Avro resolution can't promote — rejected
      val typeChanged =
        """{"type":"record","name":"Animal","fields":[
          |  {"name":"id","type":"string"},
          |  {"name":"name","type":["null","string"],"default":null},
          |  {"name":"color","type":"string","default":"unknown"}
          |]}""".stripMargin
      val e = intercept[IllegalArgumentException](
        SchemaCompat.registerChecked(client, "animals-value", typeChanged))
      assert(e.getMessage.contains("BACKWARD"))
      assert(e.getMessage.contains("TYPE_MISMATCH"))
      // gate fired client-side: the registry never saw the bad schema
      assert(stub.registry.versions("animals-value").length === 2)

      // required-field addition (no default) is the other canonical reject
      assert(intercept[IllegalArgumentException](
        SchemaCompat.registerChecked(client, "animals-value", v3bad))
        .getMessage.contains("READER_FIELD_MISSING_DEFAULT_VALUE"))
      assert(stub.registry.versions("animals-value").length === 2)
    }
  }

  test("compat modes check the right direction") {
    // v1 → v2 adds `color` WITH a default: old readers simply skip the new
    // field, new readers fill the default — compatible both ways.
    assert(SchemaCompat.check(SchemaCompat.Backward, v1, v2) === Seq.empty)
    assert(SchemaCompat.check(SchemaCompat.Forward, v1, v2) === Seq.empty)
    assert(SchemaCompat.check(SchemaCompat.Full, v1, v2) === Seq.empty)

    // v1 → dropped `name`, added required `weight`: BACKWARD broken (a
    // v3bad reader has no default for weight on v1 data). FORWARD is fine —
    // a v1 reader on v3bad data ignores weight and fills name from its
    // null default.
    assert(SchemaCompat.check(SchemaCompat.Backward, v1, v3bad).nonEmpty)
    assert(SchemaCompat.check(SchemaCompat.Forward, v1, v3bad) === Seq.empty)
    assert(SchemaCompat.check(SchemaCompat.Full, v1, v3bad).nonEmpty)
    assert(SchemaCompat.check(SchemaCompat.None, v1, v3bad) === Seq.empty)
  }

  test("writer-schema evolution through the registry resolves both directions") {
    withStub { (_, client) =>
      val id1 = client.register("animals-value", v1)
      // the producer upgrade: re-register the evolved schema, fetch ids/
      // schemas back over HTTP, and use them on the wire
      val id2     = client.register("animals-value", v2)
      val (latestId, writerV2) = client.latest("animals-value").get
      assert(latestId === id2)

      val oldFrame = AvroWire.encodeRows(Seq((1L, "Buddy")).toDF("id", "name"), client.byId(id1).get, id1)
        .select(lit(null).cast("binary").as("key"), col("avro").as("value"))
      val newFrame = AvroWire.encodeRows(Seq((2L, "Rex", "brown")).toDF("id", "name", "color"), writerV2, id2)
        .select(lit(null).cast("binary").as("key"), col("avro").as("value"))
      val frames = oldFrame.unionByName(newFrame)

      // v1 write → v2 read: the added field fills from its default
      val asV2 = AvroWire.decodeRows(frames, client.snapshot, writerV2)
        .select("decoded.id", "decoded.name", "decoded.color")
        .as[(Long, String, String)].collect().toSet
      assert(asV2 === Set((1L, "Buddy", "unknown"), (2L, "Rex", "brown")))

      // v2 write → v1 read: the added field is dropped, the rest resolves
      val asV1 = AvroWire.decodeRows(frames, client.snapshot, client.byId(id1).get)
        .select("decoded.id", "decoded.name")
        .as[(Long, String)].collect().toSet
      assert(asV1 === Set((1L, "Buddy"), (2L, "Rex")))
    }
  }
}
