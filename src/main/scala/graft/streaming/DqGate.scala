package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming data-quality admission gate: the reference's DLQ branch
  * (A8/A9, `AnimalDlqTransformerStream`) applied to data QUALITY rather
  * than deserialization failure. Per micro-batch every row is evaluated
  * against a rule set; clean rows go to the main sink, violating rows go
  * to a quarantine sink tagged with the names of the rules they broke,
  * and one metrics row per rule per batch records the violation counts —
  * the audit trail a curation pipeline keeps per ingest increment.
  *
  * Scale shape: rule evaluation is a single codegen'd projection (an
  * array of failed rule names built from `when` expressions) — no second
  * pass per rule; the batch is cached once and filtered twice (the A8
  * cache-once-branch-twice pattern); metrics are one tiny aggregate.
  * Batch=<id> sink partitions are overwritten, never appended, so a
  * replayed micro-batch is idempotent (effectively exactly-once, same
  * contract as Pipelines.startCdcEnrichment).
  */
object DqGate {

  /** A named admission rule: `violated` must be a boolean Column over the
    * stream's schema (true = row breaks the rule).
    */
  final case class Rule(name: String, violated: Column)

  /** Tag each row with the array of rule names it violates (empty array =
    * clean). Exposed for batch use too — the column is pure codegen.
    */
  def tag(df: DataFrame, rules: Seq[Rule]): DataFrame =
    df.withColumn(
      "dq_violations",
      filter(
        array(rules.map(r => when(r.violated, lit(r.name)).otherwise(lit(null))): _*),
        c => c.isNotNull
      )
    )

  def start(
      name: String,
      stream: DataFrame,
      rules: Seq[Rule],
      mainPath: String,
      quarantinePath: String,
      metricsPath: String,
      checkpoint: String,
      trigger: Trigger = Trigger.AvailableNow()
  ): StreamingQuery =
    stream.writeStream
      .queryName(name)
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val tagged = tag(batch, rules).persist()
        try {
          tagged.where(size(col("dq_violations")) === 0)
            .drop("dq_violations")
            .write.mode("overwrite").parquet(s"$mainPath/batch=$batchId")
          tagged.where(size(col("dq_violations")) > 0)
            .write.mode("overwrite").parquet(s"$quarantinePath/batch=$batchId")
          val n = tagged.count()
          // Left-join the per-batch counts onto the static rule list so a
          // rule with ZERO violations still emits its metrics row each
          // batch — consumers can tell "rule passed" from "rule not run".
          val ruleNames = batch.sparkSession
            .createDataFrame(rules.map(r => Tuple1(r.name))).toDF("rule")
          val counts = tagged
            .select(explode_outer(col("dq_violations")).as("rule"))
            .where(col("rule").isNotNull)
            .groupBy("rule").agg(count(lit(1)).as("n_violations"))
          val metrics = ruleNames
            .join(counts, Seq("rule"), "left")
            .select(
              lit(batchId).as("batch_id"), col("rule"),
              coalesce(col("n_violations"), lit(0L)).as("n_violations"),
              lit(n).as("n_checked")
            )
          metrics.write.mode("overwrite").parquet(s"$metricsPath/batch=$batchId")
        } finally tagged.unpersist()
        ()
      }
      .start()
}
