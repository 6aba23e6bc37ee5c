package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.GraftSpecBase
import graft.cdc.Envelope

/** Full-topology assembly: the reference's three-function wiring
  * (eventTransform;animalTransform;animalDlqTransform) from one config,
  * with DLQ replay auto-start=false and on-demand start via the registry —
  * the DlqPipelineIT end-to-end scenario at topology level.
  */
class TopologySpec extends GraftSpecBase {

  private val payload = StructType(Seq(
    StructField("id", LongType, nullable = true),
    StructField("name", StringType, nullable = true)
  ))
  private val recordSchema = StructType(Seq(
    StructField("key", StructType(Seq(StructField("id", LongType))), nullable = true),
    StructField("value", Envelope.envelopeSchema(payload), nullable = true)
  ))

  private def tmp(p: String) = Files.createTempDirectory(p).toString

  test("topology: auto-started pipeline + on-demand DLQ replay") {
    import spark.implicits._
    val srcDir = tmp("tsrc"); val ok = tmp("tok"); val dlq = tmp("tdlq")
    spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(Row(1L), Row(null, Row(1L, "a"), "c", 1L)),
        Row(Row(9L), Row(null, Row(9L, "miss"), "c", 1L))
      )),
      recordSchema
    ).write.mode("overwrite").parquet(srcDir)

    def dim(ids: Long*) = ids.map(i => (i, s"d$i")).toDF("dim_id", "breed")
    val dlqSchema = recordSchema

    val registry = Topology.start(spark, Seq(
      Topology.PipelineDef(
        name = "animalTransform",
        source = () => spark.readStream.schema(recordSchema).parquet(srcDir),
        dimension = () => dim(1),
        dimKey = "dim_id",
        dimCols = Seq("breed"),
        successPath = ok,
        dlqPath = dlq,
        checkpointRoot = tmp("tckpt"),
        dlqReplay = Some(Topology.DlqReplayDef(repairDimension = () => dim(1, 9), dlqSchema = dlqSchema))
      )
    ))

    assert(registry.isRunning("animalTransform"))
    assert(!registry.isRunning("animalTransform-dlq"))   // auto-startup: false
    // drain the main pipeline
    spark.streams.active.foreach(_.processAllAvailable())
    assert(spark.read.parquet(ok).select("id").as[Long].collect().toSeq === Seq(1L))
    assert(spark.read.parquet(dlq).count() === 1)

    // operator starts the replay on demand (POST /api/dlq/animal/start)
    registry.start("animalTransform-dlq")
    spark.streams.active.foreach(_.processAllAvailable())
    registry.stopAll()
    assert(spark.read.parquet(ok).select("id").as[Long].collect().sorted === Array(1L, 9L))
  }

  test("topology with manifestSinks: same wiring, transactional manifest visibility") {
    import spark.implicits._
    import graft.sources.ManifestJsonl
    val srcDir = tmp("msrc"); val ok = tmp("mok"); val dlq = tmp("mdlq")
    spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(Row(1L), Row(null, Row(1L, "a"), "c", 1L)),
        Row(Row(9L), Row(null, Row(9L, "miss"), "c", 1L))
      )),
      recordSchema
    ).write.mode("overwrite").parquet(srcDir)

    def dim(ids: Long*) = ids.map(i => (i, s"d$i")).toDF("dim_id", "breed")
    val registry = Topology.start(spark, Seq(
      Topology.PipelineDef(
        name = "manifestTransform",
        source = () => spark.readStream.schema(recordSchema).parquet(srcDir),
        dimension = () => dim(1),
        dimKey = "dim_id",
        dimCols = Seq("breed"),
        successPath = ok,
        dlqPath = dlq,
        checkpointRoot = tmp("mckpt"),
        manifestSinks = true
      )
    ))
    try {
      assert(registry.isRunning("manifestTransform"))
      spark.streams.active.foreach(_.processAllAvailable())
      val okDf = ManifestJsonl.read(spark, ok)
      assert(okDf.select("key_id").collect().map(_.getLong(0)).toSeq === Seq(1L))
      val dlqDf = ManifestJsonl.read(spark, dlq)
      assert(dlqDf.count() === 1L)
      assert(dlqDf.select("envelope_json").head().getString(0).contains("\"id\":9"))
      // the commits are txn-ledgered under the pipeline's sink app ids
      assert(ManifestJsonl.readManifest(java.nio.file.Paths.get(ok)).get
        .txns.keySet.exists(_.endsWith("-ok")))
    } finally registry.stopAll()
  }

  test("topology control plane: sourceDir enables lag probes and reset-to-latest") {
    import spark.implicits._
    val srcDir = tmp("t2src"); val ok = tmp("t2ok"); val dlq = tmp("t2dlq")
    def writeEnv(ids: Long*): Unit =
      spark.createDataFrame(
        spark.sparkContext.parallelize(ids.map(i => Row(Row(i), Row(null, Row(i, s"n$i"), "c", 1L))), 1),
        recordSchema
      ).write.mode("append").parquet(srcDir)
    writeEnv(1L)

    val registry = Topology.start(spark, Seq(
      Topology.PipelineDef(
        name = "ctl2",
        source = () => spark.readStream.schema(recordSchema).parquet(srcDir),
        dimension = () => Seq((1L, "d1"), (2L, "d2")).toDF("dim_id", "breed"),
        dimKey = "dim_id",
        dimCols = Seq("breed"),
        successPath = ok,
        dlqPath = dlq,
        checkpointRoot = tmp("t2ckpt"),
        sourceDir = Some(srcDir)
      )
    ))
    spark.streams.active.foreach(_.processAllAvailable())
    assert(spark.read.parquet(ok).select("id").as[Long].collect().toSeq === Seq(1L))
    assert(registry.lag("ctl2") === Some(0L))

    // a file arriving while the stream is stopped shows as lag (A17:
    // committed-vs-end, no active query required)
    registry.stop("ctl2")
    writeEnv(2L)
    assert(registry.lag("ctl2") === Some(1L))

    // reset-to-latest skips the backlog (A18 seek-to-end over the
    // config-driven topology), and lag returns to zero
    registry.reset("ctl2", ResetSpec.Latest)
    spark.streams.active.foreach(_.processAllAvailable())
    assert(spark.read.parquet(ok).select("id").as[Long].collect().toSeq === Seq(1L))
    assert(registry.lag("ctl2") === Some(0L))
    registry.stopAll()
  }
}
