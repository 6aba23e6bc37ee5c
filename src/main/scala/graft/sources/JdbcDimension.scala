package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** JDBC dimension source — the reference's enrichment dimension lives in
  * Postgres behind JPA (app AnimalController.java:33-37 reads the
  * `animals` table the enrichment service serves); SURVEY.md §1.6 maps it
  * to `spark.read.format("jdbc")`. This closes the source-type gap: a
  * dimension provider thunk backed by any JDBC database, pluggable
  * wherever the pipelines take `dim: () => DataFrame` — each
  * micro-batch's call re-reads the table, so dimension updates become
  * visible with the same freshness the reference gets from per-record
  * service calls.
  *
  * Scale shape: enrichment dimensions are broadcast-small, so the default
  * is a single-partition read on one executor followed by a broadcast —
  * the right plan for a lookup table. For genuinely large dimensions pass
  * `partitionColumn`/`numPartitions` bounds and the scan fans out into
  * range-parallel JDBC cursors (Spark's stride-partitioned read), at
  * which point the join side decision is Catalyst's again.
  */
object JdbcDimension {

  /** One read of `table` (a table name or `(subquery) alias`) at `url`. */
  def read(
      spark: SparkSession,
      url: String,
      table: String,
      connectionProperties: Map[String, String] = Map.empty,
      partitionColumn: Option[String] = None,
      lowerBound: Long = 0L,
      upperBound: Long = 0L,
      numPartitions: Int = 1
  ): DataFrame = {
    val props = new java.util.Properties()
    connectionProperties.foreach { case (k, v) => props.setProperty(k, v) }
    partitionColumn match {
      case Some(c) =>
        spark.read.jdbc(url, table, c, lowerBound, upperBound, numPartitions, props)
      case None =>
        spark.read.jdbc(url, table, props)
    }
  }

  /** Per-micro-batch provider: every call is a fresh read. */
  def provider(
      spark: SparkSession,
      url: String,
      table: String,
      connectionProperties: Map[String, String] = Map.empty
  ): () => DataFrame = () => read(spark, url, table, connectionProperties)
}
