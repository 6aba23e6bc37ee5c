package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-stream join topologies.
  *
  * The reference's framework (Kafka Streams) offers KStream-KStream
  * windowed joins even though its shipped topology never uses one; this
  * is that capability Spark-first: an interval-condition stream-stream
  * inner join whose per-side state retention Spark derives from the
  * watermarks plus the interval bound.
  */
object StreamJoins {

  /** View→purchase attribution: every view a user made in the `hours`
    * before each of their purchases.
    *
    * Input frames must be STREAMING and carry (event_id, user_id, ts).
    * Watermarks are sized to the join bound: purchases tolerate
    * `lateness` of disorder, and views must outlive purchases by the
    * full interval (`lateness + hours`) because a purchase may still
    * match a view `hours` old — the asymmetry IS the state-eviction
    * contract. Inner join ⇒ every match emits exactly once, independent
    * of micro-batch boundaries (asserted by StreamJoinSpec).
    */
  def viewPurchaseAttribution(
      views: DataFrame,
      purchases: DataFrame,
      hours: Int = 6,
      lateness: String = "1 hour"
  ): DataFrame = {
    val v = views
      .select(
        col("event_id").as("view_id"),
        col("user_id").as("v_user"),
        col("ts").as("view_ts")
      )
      .withWatermark("view_ts", s"${hours + 1} hours")
    val p = purchases
      .select(
        col("event_id").as("purchase_id"),
        col("user_id").as("p_user"),
        col("ts").as("purchase_ts")
      )
      .withWatermark("purchase_ts", lateness)
    v.join(
      p,
      expr(
        s"""v_user = p_user
           |AND view_ts >= purchase_ts - INTERVAL $hours HOURS
           |AND view_ts <= purchase_ts""".stripMargin
      )
    )
  }

  /** The LEFT OUTER form: every view emits — matched rows as they pair,
    * UNMATCHED views with null purchase columns once the watermark
    * proves no future purchase can still land in their interval. This is
    * the "which impressions never converted" feed, and the outer-ness is
    * exactly what distinguishes it from `viewPurchaseAttribution`: the
    * null row is emitted by state EVICTION, so it appears only after the
    * purchase-side watermark passes `view_ts + hours` — a
    * correctness-from-retention contract StreamJoinSpec pins down.
    *
    * Same asymmetric watermarks as the inner form; state per side is
    * O(users × window), unchanged — the outer join adds no state, only
    * an emit-on-evict rule.
    */
  def viewPurchaseAttributionOuter(
      views: DataFrame,
      purchases: DataFrame,
      hours: Int = 6,
      lateness: String = "1 hour"
  ): DataFrame = {
    val v = views
      .select(
        col("event_id").as("view_id"),
        col("user_id").as("v_user"),
        col("ts").as("view_ts")
      )
      .withWatermark("view_ts", s"${hours + 1} hours")
    val p = purchases
      .select(
        col("event_id").as("purchase_id"),
        col("user_id").as("p_user"),
        col("ts").as("purchase_ts")
      )
      .withWatermark("purchase_ts", lateness)
    v.join(
      p,
      expr(
        s"""v_user = p_user
           |AND view_ts >= purchase_ts - INTERVAL $hours HOURS
           |AND view_ts <= purchase_ts""".stripMargin
      ),
      "left_outer"
    )
  }
}
