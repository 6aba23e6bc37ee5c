package graft.enrich

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructType}

/** One HTTP client per executor JVM: lazily initialized on first
  * partition, connection-pooled and keep-alive'd across batches — the
  * Spark analogue of the reference's singleton RestClient
  * (AnimalEnrichmentService.java:24-33).
  */
private object HttpClientPool {
  lazy val client: HttpClient = HttpClient.newBuilder()
    .connectTimeout(java.time.Duration.ofSeconds(5))
    .build()
}

/** A5, faithful form: per-record HTTP GET enrichment executed on the
  * executors (the reference's exact shape —
  * `GET {app}/api/animals/{id}` per CDC record,
  * AnimalEnrichmentService.java:79-82), as the alternative to
  * [[Enrichment.enrich]]'s broadcast-join form.
  *
  * Semantics match the join form row for row: a 2xx + parseable body with
  * a non-null required field appends the response fields; anything else
  * (404, timeout, malformed JSON, null key) yields nulls with
  * `enrich_failed = true` — the same branch contract (A7/A8), asserted
  * equal to the join form in HttpLookupSpec.
  *
  * Scale notes: the HTTP pass is a byte pump (one string column out);
  * JSON parsing stays in codegen'd `from_json` above it. Concurrency
  * comes from partition parallelism — per-partition requests are
  * sequential, which is the polite default against a dimension service
  * (p partitions = p in-flight requests per executor wave). Prefer the
  * join form whenever the dimension is readable as a table: it makes zero
  * network calls per row and lets Catalyst prune/broadcast. This form
  * exists for dimensions only reachable as a service.
  */
object HttpLookup {

  def enrichHttp(
      records: DataFrame,
      keyCol: String,
      baseUrl: String,
      responseSchema: StructType,
      requiredField: String = "id"
  ): DataFrame = {
    require(
      responseSchema.fieldNames.contains(requiredField),
      s"requiredField $requiredField not in response schema ${responseSchema.fieldNames.mkString(",")}"
    )
    val keyIdx    = records.schema.fieldIndex(keyCol)
    val outSchema = records.schema.add("__resp", StringType)
    val url       = baseUrl.stripSuffix("/")

    val rdd = records.rdd.mapPartitions { it =>
      val client = HttpClientPool.client
      it.map { row =>
        val key = row.get(keyIdx)
        val resp: String =
          if (key == null) null
          else
            try {
              val r = client.send(
                HttpRequest.newBuilder(URI.create(s"$url/$key"))
                  .timeout(java.time.Duration.ofSeconds(10)).GET().build(),
                HttpResponse.BodyHandlers.ofString()
              )
              if (r.statusCode() / 100 == 2) r.body() else null
            } catch { case _: Exception => null }
        Row.fromSeq(row.toSeq :+ resp)
      }
    }

    val parsed = records.sparkSession
      .createDataFrame(rdd, outSchema)
      .withColumn("__enriched", from_json(col("__resp"), responseSchema))
    responseSchema.fieldNames
      .foldLeft(parsed)((df, f) => df.withColumn(f, col(s"__enriched.$f")))
      // PERMISSIVE from_json turns garbage into an all-null row, so the
      // required field decides (same rule as the deserialization DLQ)
      .withColumn(
        "enrich_failed",
        col("__enriched").isNull || col(s"__enriched.$requiredField").isNull
      )
      .drop("__resp", "__enriched")
  }
}
