package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.GraftSpecBase
import graft.cdc.Envelope

/** Streaming twins of the reference's integration tests (SURVEY.md §5):
  *  - CdcPipelineIT: created/updated rows appear enriched in the output;
  *  - DlqPipelineIT: failed lookups land in the DLQ, are absent from the
  *    output, and appear after replay against the repaired dimension;
  *  - AnimalStreamControlIT: stop/start/status/offsets via StreamRegistry.
  * File-based sources/sinks stand in for Kafka topics (no broker here).
  */
class PipelineSpec extends GraftSpecBase {

  private val payload = StructType(Seq(
    StructField("id", LongType, nullable = true),
    StructField("name", StringType, nullable = true)
  ))
  private val recordSchema = StructType(Seq(
    StructField("key", StructType(Seq(StructField("id", LongType))), nullable = true),
    StructField("value", Envelope.envelopeSchema(payload), nullable = true)
  ))

  private def envRow(id: Long, name: String): Row =
    Row(Row(id), Row(null, Row(id, name), "c", 1000L))

  private def dim(ids: Long*): DataFrame = {
    import spark.implicits._
    ids.map(i => (i, s"breed-$i")).toDF("dim_id", "breed")
  }

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  test("enrich pipeline: hits to success sink, misses to DLQ, replay repairs them") {
    val srcDir     = tmp("src")
    val okPath     = tmp("ok")
    val dlqPath    = tmp("dlq")

    // phase 1 (DlqPipelineIT:55): dimension knows ids 1,2 — id 3 must fail
    spark
      .createDataFrame(
        spark.sparkContext.parallelize(Seq(envRow(1, "a"), envRow(2, "b"), envRow(3, "c"))),
        recordSchema
      )
      .write.mode("overwrite").parquet(srcDir)

    val source = spark.readStream.schema(recordSchema).parquet(srcDir)
    val q = Pipelines.startEnrichPipeline(
      "animalTransform", source, () => dim(1, 2), "dim_id", Seq("breed"),
      okPath, dlqPath, tmp("ckpt")
    )
    q.processAllAvailable(); q.stop()

    val ok = spark.read.parquet(okPath)
    assert(ok.select("id").collect().map(_.getLong(0)).sorted === Array(1L, 2L))
    assert(ok.columns.contains("breed") && ok.columns.contains("key"))
    val dlq = spark.read.parquet(dlqPath)
    // DLQ carries the ORIGINAL envelope (A9), not an error record
    assert(dlq.select("value.after.id").collect().map(_.getLong(0)) === Array(3L))

    // phase 2 (DlqPipelineIT:128): replay DLQ against the repaired dimension
    val replay = Pipelines.startDlqReplay(
      "animalDlqTransform", spark, dlqPath, dlq.schema, () => dim(1, 2, 3),
      "dim_id", Seq("breed"), okPath, tmp("ckpt2"), maxFilesPerTrigger = 10
    )
    replay.processAllAvailable(); replay.stop()
    assert(spark.read.parquet(okPath).select("id").collect().map(_.getLong(0)).sorted
      === Array(1L, 2L, 3L))
  }

  test("manifest pipeline: exactly-once across a FORCED micro-batch replay") {
    import graft.sources.ManifestJsonl
    val srcDir  = tmp("m-src")
    val okPath  = tmp("m-ok")
    val dlqPath = tmp("m-dlq")
    val ckpt    = tmp("m-ckpt")

    spark
      .createDataFrame(
        spark.sparkContext.parallelize(Seq(envRow(1, "a"), envRow(2, "b"), envRow(3, "c"))),
        recordSchema
      )
      .write.mode("overwrite").parquet(srcDir)

    def runPipeline(): Unit = {
      val q = Pipelines.startEnrichPipelineManifest(
        "manifestTransform",
        spark.readStream.schema(recordSchema).parquet(srcDir),
        () => dim(1, 2), "dim_id", Seq("breed"),
        okPath, dlqPath, ckpt
      )
      q.processAllAvailable(); q.stop()
    }
    runPipeline()
    val ok1 = ManifestJsonl.read(spark, okPath)
    assert(ok1.select("key_id").collect().map(_.getLong(0)).sorted === Array(1L, 2L))
    assert(ok1.columns.contains("breed"))
    val dlq1 = ManifestJsonl.read(spark, dlqPath)
    assert(dlq1.count() === 1L)
    // the DLQ row carries the original envelope as JSON
    assert(dlq1.select("envelope_json").head().getString(0).contains("\"id\":3"))

    // FORCE the replay: delete batch 0's checkpoint commit marker — on
    // restart the engine sees the offset log ahead of the commit log and
    // re-executes the batch with the SAME batchId (the crash-between-
    // sink-commit-and-checkpoint-commit window, for real)
    val commit0 = java.nio.file.Paths.get(ckpt, "commits", "0")
    assert(Files.exists(commit0), "expected checkpoint commit marker for batch 0")
    Files.delete(commit0)
    // the local-fs checksum sidecar must go with it or the re-write trips
    Files.deleteIfExists(java.nio.file.Paths.get(ckpt, "commits", ".0.crc"))
    runPipeline()

    // the replayed batch re-committed txnVersion 0 and was dropped by the
    // manifest's high-water mark: counts unchanged, no duplicates
    assert(ManifestJsonl.read(spark, okPath).count() === 2L)
    assert(ManifestJsonl.read(spark, dlqPath).count() === 1L)
    assert(
      ManifestJsonl.readManifest(java.nio.file.Paths.get(okPath)).get
        .txns === Map("manifestTransform-ok" -> 0L))
  }

  test("manual export: plain and envelope-shaped JSON, unparseable rejected") {
    val okPath = tmp("manual")
    assert(Pipelines.manualExport(spark, """{"id": 7, "name": "Buddy"}""", payload, okPath) === 1L)
    assert(Pipelines.manualExport(spark, """{"after": {"id": 8, "name": "Rex"}}""", payload, okPath) === 1L)
    assert(Pipelines.manualExport(spark, """{"name": "no-id"}""", payload, okPath) === 0L)
    val out = spark.read.parquet(okPath)
    assert(out.select("id").collect().map(_.getLong(0)).sorted === Array(7L, 8L))
  }

  test("registry: stop/start/status/offsets/reset lifecycle") {
    val srcDir = tmp("csrc")
    val okPath = tmp("cok")
    spark
      .createDataFrame(spark.sparkContext.parallelize(Seq(envRow(1, "a"))), recordSchema)
      .write.mode("overwrite").parquet(srcDir)

    val registry = new StreamRegistry(spark)
    registry.register(
      "ctl",
      epoch => {
        val source = spark.readStream.schema(recordSchema).parquet(srcDir)
        Pipelines.startEnrichPipeline(
          s"ctl-$epoch", source, () => dim(1), "dim_id", Seq("breed"),
          okPath, tmp("cdlq"), tmp(s"cckpt$epoch")
        )
      }
    )
    assert(registry.isRunning("ctl"))
    val st = registry.status("ctl")
    assert(st.exists(_._3))

    assert(registry.stop("ctl"))
    assert(!registry.isRunning("ctl"))
    assert(registry.start("ctl"))
    assert(registry.isRunning("ctl"))

    // reset: bumps epoch -> fresh checkpoint, query restarts (A18 semantics)
    registry.reset("ctl")
    assert(registry.isRunning("ctl"))
    registry.stopAll()
    assert(!registry.isRunning("ctl"))
  }
}
