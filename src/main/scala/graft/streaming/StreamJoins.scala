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
}
