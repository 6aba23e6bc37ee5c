package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.GraftSpecBase

/** The associativity law behind `cdc_apply_stream`: folding the change
  * log into the snapshot batch-by-batch yields the SAME final snapshot
  * as one big merge, for any split and any batch ORDER — the high-water
  * mark (last_ms, last_eid) gates stale changes and tombstones retain
  * base columns for resurrection, so the fold commutes. This is the
  * property that lets a streaming MERGE survive repartitioned sources,
  * redelivered batches, and out-of-order file arrival.
  */
class CdcApplyStreamSpec extends GraftSpecBase {

  private def changeLog: DataFrame =
    graft.Tables
      .events(spark, sf())
      .select(
        (col("user_id") * 12).as("key"),
        when(col("event_type") === "error", lit("d")).otherwise(lit("u")).as("op"),
        col("value").as("new_bal"),
        unix_millis(col("ts")).as("ms"),
        col("event_id")
      )

  private def baseSnap: DataFrame =
    graft.Tables
      .customer(spark, sf())
      .select(
        col("c_custkey").as("custkey"),
        col("c_name").as("name"),
        col("c_acctbal").as("acctbal"),
        col("c_mktsegment").as("mktsegment"),
        lit(false).as("deleted"),
        lit(-1L).as("last_ms"),
        lit(-1L).as("last_eid")
      )

  private def served(snap: DataFrame): Set[(Long, String, Double, String)] =
    SnapshotMerge
      .serve(snap)
      .select(
        col("custkey").cast("long"),
        col("name"),
        col("acctbal").cast("double"),
        col("mktsegment")
      )
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getString(3)))
      .toSet

  test("batched merge equals one-shot merge for any split, including out-of-order") {
    val log      = changeLog.persist()
    val oneShot  = served(SnapshotMerge.merge(baseSnap, SnapshotMerge.compact(log)))
    assert(oneShot.nonEmpty)

    // three deterministic slices by event_id residue, folded in an order
    // that delivers the NEWEST changes first (worst case for a naive
    // latest-wins: a stale batch arrives after a fresh one)
    val slices = Seq(2, 0, 1).map(r => log.filter(col("event_id") % 3 === r))
    val folded = slices.foldLeft(baseSnap) { (snap, slice) =>
      // localCheckpoint models the write/read materialization boundary
      // between micro-batches without touching disk paths
      SnapshotMerge.merge(snap, SnapshotMerge.compact(slice)).localCheckpoint()
    }
    assert(served(folded) === oneShot)

    // idempotence: re-applying an already-applied batch is a no-op
    // (redelivery after a crash between sink write and checkpoint commit)
    val redelivered = SnapshotMerge.merge(folded, SnapshotMerge.compact(slices.head))
    assert(served(redelivered) === oneShot)
    log.unpersist()
    ()
  }
}
