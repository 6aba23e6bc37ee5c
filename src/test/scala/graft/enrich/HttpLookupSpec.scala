package graft.enrich

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

import com.sun.net.httpserver.HttpServer

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.GraftSpecBase

/** The faithful per-record HTTP lookup must land on the same rows as the
  * idiomatic broadcast-join form over the equivalent dimension — the A5
  * equivalence SURVEY.md claims. Misses (404), malformed bodies and null
  * keys all take the enrich_failed branch.
  */
class HttpLookupSpec extends GraftSpecBase {
  import spark.implicits._

  private val dimRows = Map(
    1L -> """{"dim_id":1,"breed":"d1"}""",
    2L -> """{"dim_id":2,"breed":"d2"}""",
    5L -> """{"dim_id":5,"breed":"d5"}""",
    7L -> """not json at all"""          // served 200 but unparseable
  )

  private def startDimServer(): HttpServer = {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/api/animals", { ex =>
      val id    = ex.getRequestURI.getPath.split("/").last.toLong
      val body  = dimRows.get(id)
      val bytes = body.getOrElse("").getBytes(StandardCharsets.UTF_8)
      ex.sendResponseHeaders(if (body.isDefined) 200 else 404, if (body.isDefined) bytes.length.toLong else -1L)
      if (body.isDefined) ex.getResponseBody.write(bytes)
      ex.close()
    })
    server.start()
    server
  }

  test("per-record HTTP enrichment equals the broadcast-join form") {
    val server = startDimServer()
    try {
      val records = Seq(1L, 2L, 3L, 5L, 7L).toDF("lookup_key")
        .withColumn("payload", concat(lit("p"), col("lookup_key")))
        .repartition(3)
      val schema = StructType(Seq(
        StructField("dim_id", LongType), StructField("breed", StringType)
      ))

      val viaHttp = HttpLookup.enrichHttp(
        records, "lookup_key",
        s"http://127.0.0.1:${server.getAddress.getPort}/api/animals",
        schema, requiredField = "dim_id"
      )

      // the equivalent dimension TABLE holds only the parseable rows — the
      // join form must then agree row for row with the service form
      val dim = Seq((1L, "d1"), (2L, "d2"), (5L, "d5")).toDF("dim_id", "breed")
      val viaJoin = Enrichment.enrich(records, dim, "lookup_key", "dim_id")

      val cols = Seq("lookup_key", "payload", "dim_id", "breed", "enrich_failed")
      val h = viaHttp.select(cols.map(col): _*).as[(Long, String, Option[Long], Option[String], Boolean)].collect().toSet
      val j = viaJoin.select(cols.map(col): _*).as[(Long, String, Option[Long], Option[String], Boolean)].collect().toSet
      assert(h === j)
      // and the failure set is exactly {miss, unparseable}
      assert(h.filter(_._5).map(_._1) === Set(3L, 7L))
    } finally server.stop(0)
  }

  test("null keys fail without calling the service") {
    val server = startDimServer()
    try {
      val records = Seq(Some(1L), None).toDF("lookup_key")
      val schema  = StructType(Seq(StructField("dim_id", LongType), StructField("breed", StringType)))
      val out = HttpLookup.enrichHttp(
        records, "lookup_key",
        s"http://127.0.0.1:${server.getAddress.getPort}/api/animals",
        schema, requiredField = "dim_id"
      ).select("lookup_key", "enrich_failed").as[(Option[Long], Boolean)].collect().toSet
      assert(out === Set((Some(1L), false), (None, true)))
    } finally server.stop(0)
  }
}
