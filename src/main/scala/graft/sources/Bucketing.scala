package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table helpers (SURVEY.md scale mandate: "co-locate joins via
  * bucketing or pre-partitioning").
  *
  * Writing both sides of a recurring join bucketed by the join key means
  * every subsequent join/aggregation on that key is shuffle-free: Spark's
  * scan reports the bucketing as an existing hash partitioning and the
  * planner elides both Exchanges. For a fact table joined every micro-batch
  * (the enrichment pipeline) or re-aggregated across a 100 TB backfill,
  * paying one bucketed write amortizes every downstream shuffle away.
  * BucketingSpec asserts the no-Exchange plan.
  */
object Bucketing {

  /** Write `df` as a bucketed managed table (sorted within buckets for
    * sort-merge-ready scans).
    */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write
      .mode("overwrite")
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)

  /** Join two tables bucketed on their join keys — planner-verified
    * shuffle-free when both were written with the same bucket count.
    */
  def bucketedJoin(
      spark: SparkSession,
      leftTable: String,
      rightTable: String,
      leftKey: String,
      rightKey: String
  ): DataFrame = {
    import org.apache.spark.sql.functions.col
    spark.table(leftTable).join(spark.table(rightTable), col(leftKey) === col(rightKey))
  }

  /** True when the executed plan contains no shuffle Exchange — the
    * property bucketing buys.
    */
  def isShuffleFree(df: DataFrame): Boolean =
    !df.queryExecution.executedPlan.toString.contains("Exchange hashpartitioning")
}
