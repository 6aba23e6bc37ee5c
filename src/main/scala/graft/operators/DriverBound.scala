package graft.operators

import org.apache.spark.sql.{DataFrame, Row}

/** Guard for the model-sized driver-collect pattern (guide §5: the driver
  * should do almost no data work).
  *
  * Several iterative queries follow the coarsen-distributed / solve-serial
  * split: the corpus-sized pass runs in Spark, and the fixed-point
  * iterations run on a COLLECTED table that is model-sized — either by
  * construction (Louvain's label vocabulary ≤ |brands|) or as a property
  * of the current data (HITS' |distinct sources| × 27 buckets, Markov's
  * ≤ |event types|² matrix). The data-property class has no construction
  * bound: a future fixture with high-cardinality `source`/`event_type`
  * would silently pull a data-sized table onto the driver. This guard
  * makes that failure LOUD and cheap: the collect is capped at
  * `maxRows + 1` rows via limit() — so an over-bound table never
  * materializes on the driver — and anything over the bound throws with
  * the table's name instead of OOMing the driver or shipping a silently
  * quadratic plan.
  */
object DriverBound {

  /** Default bound: far above every legitimate model-sized table in the
    * registry (largest observed: HITS edge list = sources × 27 ≈ few
    * hundred rows at any SF; PCA Gram buffer 2,146 values) and far below
    * anything corpus-sized.
    */
  val DefaultMaxRows: Int = 100000

  /** Collect `df`, failing loudly if it exceeds `maxRows` rows. The pull
    * itself is bounded by limit(maxRows + 1), so the failure mode is an
    * exception naming `what`, never a driver OOM. Row order is whatever
    * the limit returns — callers must not depend on it (all current
    * callers build maps/groupings).
    */
  def collectBounded(df: DataFrame, what: String, maxRows: Int = DefaultMaxRows): Array[Row] = {
    val rows = df.limit(maxRows + 1).collect()
    require(
      rows.length <= maxRows,
      s"driver-collect guard: '$what' returned more than $maxRows rows — " +
        "this table was assumed model-sized; the serial solve must not run " +
        "on a corpus-sized table (use the distributed path or raise the bound deliberately)"
    )
    rows
  }
}
