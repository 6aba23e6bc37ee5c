package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The per-batch MERGE kernel of the streaming CDC snapshot maintenance
  * (`cdc_apply_stream`). Kept separate so the associativity property —
  * the final snapshot is identical however (and in whatever order) the
  * change log is chopped into batches — is testable as a pure DataFrame
  * law (CdcApplyStreamSpec) without streaming machinery.
  *
  * Snapshot schema: (custkey, name, acctbal, mktsegment, deleted,
  * last_ms, last_eid). `deleted` rows are tombstones retaining the base
  * columns so an out-of-order resurrecting update restores them;
  * (last_ms, last_eid) is the high-water mark of the last APPLIED change
  * and gates every merge, which is what makes the fold associative and
  * idempotent (a replayed batch re-applies as a no-op).
  */
object SnapshotMerge {

  /** Latest change per key within one batch: (ms, event_id) descending.
    * Input columns: (key, op, new_bal, ms, event_id).
    */
  def compact(batch: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("key")).orderBy(col("ms").desc, col("event_id").desc)
    batch
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("key"), col("op"), col("new_bal"), col("ms"), col("event_id"))
  }

  /** Full-outer merge of a compacted change batch into a snapshot. */
  def merge(snap: DataFrame, latest: DataFrame): DataFrame = {
    val wins = col("key").isNotNull && (
      col("custkey").isNull ||
        col("ms") > col("last_ms") ||
        (col("ms") === col("last_ms") && col("event_id") > col("last_eid"))
    )
    snap
      .join(latest, col("custkey") === col("key"), "full_outer")
      .select(
        coalesce(col("custkey"), col("key")).as("custkey"),
        coalesce(col("name"), when(wins && col("op") === "u", concat(lit("NEW-"), col("key"))))
          .as("name"),
        when(wins && col("op") === "u", col("new_bal")).otherwise(col("acctbal")).as("acctbal"),
        coalesce(col("mktsegment"), when(wins && col("op") === "u", lit("UNKNOWN")))
          .as("mktsegment"),
        when(wins, col("op") === "d").otherwise(coalesce(col("deleted"), lit(false)))
          .as("deleted"),
        when(wins, col("ms")).otherwise(coalesce(col("last_ms"), lit(-1L))).as("last_ms"),
        when(wins, col("event_id")).otherwise(coalesce(col("last_eid"), lit(-1L)))
          .as("last_eid")
      )
  }

  /** The snapshot a reader serves: tombstones dropped, bookkeeping hidden. */
  def serve(snap: DataFrame): DataFrame =
    snap.filter(!col("deleted")).select("custkey", "name", "acctbal", "mktsegment")
}
