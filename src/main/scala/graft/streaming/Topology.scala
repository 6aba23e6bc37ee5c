package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.StructType

/** Config-driven topology assembly — the replacement for the reference's
  * `spring.cloud.function.definition: eventTransform;animalTransform;
  * animalDlqTransform` + binding wiring (application.yml:6-56). Each
  * pipeline declares its source, dimension, sinks and lifecycle policy;
  * `Topology.start` registers everything in a StreamRegistry, honoring
  * auto-start flags (the DLQ replay ships `autoStart = false`, started on
  * demand via the control plane exactly like the reference's
  * `auto-startup: false` binding).
  */
object Topology {

  /** One enrichment pipeline (the eventTransform/animalTransform shape).
    * @param dlqReplay when set, a companion replay pipeline consumes this
    *        pipeline's DLQ against the repair dimension (the
    *        animalDlqTransform shape), registered `<name>-dlq`.
    */
  final case class PipelineDef(
      name: String,
      source: () => DataFrame,
      dimension: () => DataFrame,
      dimKey: String,
      dimCols: Seq[String],
      successPath: String,
      dlqPath: String,
      checkpointRoot: String,
      autoStart: Boolean = true,
      dlqReplay: Option[DlqReplayDef] = None
  )

  final case class DlqReplayDef(
      repairDimension: () => DataFrame,
      dlqSchema: StructType,
      maxFilesPerTrigger: Int = 10,
      autoStart: Boolean = false
  )

  /** Register (and start per policy) every pipeline; returns the registry
    * as the control-plane handle (A16–A19).
    */
  def start(spark: SparkSession, pipelines: Seq[PipelineDef]): StreamRegistry = {
    val registry = new StreamRegistry(spark)
    pipelines.foreach { p =>
      registry.register(
        p.name,
        epoch =>
          Pipelines.startEnrichPipeline(
            s"${p.name}-$epoch",
            p.source(),
            p.dimension,
            p.dimKey,
            p.dimCols,
            p.successPath,
            p.dlqPath,
            s"${p.checkpointRoot}/${p.name}-$epoch"
          ),
        autoStart = p.autoStart
      )
      p.dlqReplay.foreach { r =>
        registry.register(
          s"${p.name}-dlq",
          epoch =>
            Pipelines.startDlqReplay(
              s"${p.name}-dlq-$epoch",
              spark,
              p.dlqPath,
              r.dlqSchema,
              r.repairDimension,
              p.dimKey,
              p.dimCols,
              p.successPath,
              s"${p.checkpointRoot}/${p.name}-dlq-$epoch",
              r.maxFilesPerTrigger
            ),
          autoStart = r.autoStart
        )
      }
    }
    registry
  }
}
