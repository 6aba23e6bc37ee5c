package graft.streaming

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

import com.sun.net.httpserver.{HttpExchange, HttpServer}

/** REST control plane over [[StreamRegistry]] — the operator-facing HTTP
  * surface the reference exposes per stream
  * (AnimalStreamController.java:46-184 + the
  * docs/test-kafka-stream-control.md playbook), on the JDK's built-in
  * HTTP server (no framework dependency; swap for a real server at
  * deploy without touching the registry).
  *
  * Routes (name = registered query name):
  *   GET  /api/stream/{name}/status                     — A19
  *   GET  /api/stream/{name}/offsets                    — A17 (+ lag)
  *   POST /api/stream/{name}/start | /stop              — A16
  *   POST /api/stream/{name}/offsets/reset/earliest     — A18
  *   POST /api/stream/{name}/offsets/reset/latest       — A18
  *   POST /api/stream/{name}/offsets/reset   {"partitionOffsets":{"0":42}}
  *   POST /api/export/{name}                 body = one JSON record — A15
  *     (202 with rows=1 when parsed, 422 when rejected — the reference's
  *      ManualAnimalExportController contract)
  */
final class ControlServer(
    registry: StreamRegistry,
    exporters: Map[String, String => Long] = Map.empty,
    port: Int = 0
) {
  import org.json4s._
  import org.json4s.jackson.JsonMethods

  private val server = HttpServer.create(new InetSocketAddress("127.0.0.1", port), 0)

  def boundPort: Int = server.getAddress.getPort

  def start(): ControlServer = {
    server.createContext("/api", (ex: HttpExchange) => handle(ex))
    server.setExecutor(null) // serial dispatch — control traffic is tiny
    server.start()
    this
  }

  def stop(): Unit = server.stop(0)

  private def esc(s: String): String =
    s.flatMap {
      case '"'          => "\\\""
      case '\\'         => "\\\\"
      case '\n'         => "\\n"
      case '\r'         => "\\r"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c            => c.toString
    }

  private def respond(ex: HttpExchange, code: Int, json: String): Unit = {
    val bytes = json.getBytes(StandardCharsets.UTF_8)
    ex.getResponseHeaders.set("Content-Type", "application/json")
    ex.sendResponseBody(code, bytes)
  }

  private def offsetsJson(name: String): String = {
    val sources = registry.offsets(name).map { case (desc, startOff, endOff, rows) =>
      s"""{"description":"${esc(desc)}","startOffset":"${esc(startOff)}","endOffset":"${esc(endOff)}","numInputRows":$rows}"""
    }.mkString("[", ",", "]")
    val lag = registry.lag(name).map(_.toString).getOrElse("null")
    s"""{"name":"${esc(name)}","sources":$sources,"lag":$lag}"""
  }

  private def statusJson(name: String): String =
    registry.status(name) match {
      case Some((id, runId, active, msg)) =>
        s"""{"name":"${esc(name)}","running":$active,"id":"$id","runId":"$runId","state":"${esc(msg)}"}"""
      case None =>
        s"""{"name":"${esc(name)}","running":false,"state":"NOT_RUNNING"}"""
    }

  private def parseResetBody(body: String): Option[ResetSpec] =
    try {
      JsonMethods.parse(body) \ "partitionOffsets" match {
        case JObject(fields) =>
          val m = fields.collect {
            case (p, JInt(o))  => p.toInt -> o.toLong
            case (p, JLong(o)) => p.toInt -> o
          }.toMap
          if (m.isEmpty) None else Some(ResetSpec.Offsets(m))
        case _ => None
      }
    } catch { case _: Exception => None }

  private def handle(ex: HttpExchange): Unit = {
    val method = ex.getRequestMethod
    val parts  = ex.getRequestURI.getPath.split("/").filter(_.nonEmpty).toList
    try {
      (method, parts) match {
        case ("GET", List("api", "stream", name, "status")) =>
          respond(ex, 200, statusJson(name))

        case ("GET", List("api", "stream", name, "offsets")) =>
          respond(ex, 200, offsetsJson(name))

        case ("POST", List("api", "stream", name, "start")) =>
          val ok = registry.start(name)
          respond(ex, 200, s"""{"success":$ok,"running":${registry.isRunning(name)}}""")

        case ("POST", List("api", "stream", name, "stop")) =>
          val ok = registry.stop(name)
          respond(ex, 200, s"""{"success":$ok,"running":${registry.isRunning(name)}}""")

        case ("POST", List("api", "stream", name, "offsets", "reset", target))
            if target == "earliest" || target == "latest" =>
          val spec = if (target == "earliest") ResetSpec.Earliest else ResetSpec.Latest
          val prev = registry.reset(name, spec)
          val prevJson = prev.map { case (d, s0, e0, n) =>
            s"""{"description":"${esc(d)}","startOffset":"${esc(s0)}","endOffset":"${esc(e0)}","numInputRows":$n}"""
          }.mkString("[", ",", "]")
          respond(ex, 200,
            s"""{"success":true,"resetTo":"$target","previousOffsets":$prevJson,"running":${registry.isRunning(name)}}""")

        case ("POST", List("api", "stream", name, "offsets", "reset")) =>
          val body = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
          parseResetBody(body) match {
            case Some(spec) =>
              registry.reset(name, spec)
              respond(ex, 200, s"""{"success":true,"resetTo":"specific","running":${registry.isRunning(name)}}""")
            case None =>
              respond(ex, 400, """{"success":false,"error":"body must carry partitionOffsets"}""")
          }

        case ("POST", List("api", "export", name)) =>
          exporters.get(name) match {
            case Some(f) =>
              val body = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
              val n    = f(body)
              if (n > 0) respond(ex, 202, s"""{"accepted":true,"rows":$n}""")
              else respond(ex, 422, """{"accepted":false,"error":"unprocessable record"}""")
            case None => respond(ex, 404, s"""{"error":"no exporter for ${esc(name)}"}""")
          }

        case _ => respond(ex, 404, """{"error":"not found"}""")
      }
    } catch {
      case e: Exception =>
        respond(ex, 500, s"""{"error":"${esc(String.valueOf(e.getMessage))}"}""")
    } finally ex.close()
  }

  private implicit class RichExchange(ex: HttpExchange) {
    def sendResponseBody(code: Int, bytes: Array[Byte]): Unit = {
      ex.sendResponseHeaders(code, bytes.length.toLong)
      val os = ex.getResponseBody
      os.write(bytes)
      os.flush()
    }
  }
}
