package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys (SURVEY.md scale mandate): fact rows
  * scatter across `buckets` sub-partitions via a deterministic salt; the
  * dimension replicates `buckets`×; the join key becomes (key, salt), so
  * one hot key spreads over `buckets` reducers.
  *
  * AQE's skew-join split handles sort-merge skew automatically; explicit
  * salting remains the tool for shuffled-hash hotspots and for skewed
  * aggregations downstream of the join. Results are identical to the
  * unsalted join (verified in SkewJoinSpec and by sharing the plain
  * join's oracle in the query registry).
  *
  * `saltExpr` must be deterministic per row (e.g. a hash of a unique id —
  * NOT rand(), which breaks retry/replay semantics at scale).
  */
object SkewJoin {

  def saltedJoin(
      fact: DataFrame,
      dim: DataFrame,
      factKey: String,
      dimKey: String,
      saltExpr: Column,
      buckets: Int,
      joinType: String = "inner"
  ): DataFrame = {
    val salted = fact.withColumn("__salt_f", pmod(saltExpr, lit(buckets.toLong)))
    val replicated = dim.withColumn(
      "__salt_d",
      explode(sequence(lit(0L), lit(buckets.toLong - 1)))
    )
    salted
      .join(
        replicated,
        salted(factKey) === replicated(dimKey) && col("__salt_f") === col("__salt_d"),
        joinType
      )
      .drop("__salt_f", "__salt_d")
  }
}
