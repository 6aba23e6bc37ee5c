package org.apache.spark.sql.graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Companion to ColumnBridge for whole plans: `Dataset.ofRows` (the lift
  * from a LogicalPlan to a DataFrame) is `private[sql]` in Spark 4, and
  * custom logical operators need it to enter the public API. Lives inside
  * the org.apache.spark.sql package tree solely to re-export that lift.
  */
object PlanBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession],
      plan
    )

  /** The analyzed logical plan of a DataFrame (attribute refs resolved). */
  def analyzed(df: DataFrame): LogicalPlan = df.queryExecution.analyzed

  /** `Observation.getOrEmpty` is `private[sql]`: the non-blocking metrics
    * read a foreachBatch sink needs — if the write action ever completes
    * without firing the observation, the blocking `get` would hang the
    * stream, and `get.apply(key)` would throw on a missing metric.
    */
  def observedOrEmpty(obs: org.apache.spark.sql.Observation): Map[String, Any] =
    obs.getOrEmpty
}
