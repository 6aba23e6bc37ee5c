package graft.operators

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._

/** Banded range join: points to intervals (SURVEY.md custom-operator
  * mandate — "as-of join, range join").
  *
  * A naive point-in-interval join is non-equi, which Spark plans as a
  * (broadcast) nested-loop — O(|points| × |intervals|) comparisons and no
  * shuffle partitioning to scale on. Banding makes it an equi-join:
  * intervals explode into fixed-width bands they overlap, points hash to
  * their containing band, the join key is the band, and the exact
  * predicate filters residually. Cost is O(|points| + Σ interval_width /
  * band) shuffled rows — the standard interval-index shape (cf. Spark's
  * own range-join hints in Databricks runtime, DuckDB's IEJoin).
  *
  * Pick `bandWidth` near the median interval width: too small replicates
  * intervals, too large fans points into crowded bands.
  */
object RangeJoin {

  def pointInInterval(
      points: DataFrame,
      intervals: DataFrame,
      ptCol: String,
      startCol: String,
      endCol: String,
      bandWidth: Long
  ): DataFrame = {
    require(bandWidth > 0)
    val banded = intervals.withColumn(
      "__band",
      explode(sequence(expr(s"$startCol div $bandWidth"), expr(s"($endCol - 1) div $bandWidth")))
    )
    points
      .withColumn("__band", expr(s"$ptCol div $bandWidth"))
      .join(
        banded,
        Seq("__band")
      )
      .filter(col(ptCol) >= col(startCol) && col(ptCol) < col(endCol))
      .drop("__band")
  }
}
