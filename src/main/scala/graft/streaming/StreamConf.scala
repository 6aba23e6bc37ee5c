package graft.streaming

import org.apache.spark.sql.SparkSession

/** Per-query scoping of streaming state partitioning.
  *
  * Structured Streaming pins `spark.sql.shuffle.partitions` into the
  * query's checkpoint at first start — it becomes the STATE partition
  * count for the lifetime of that checkpoint. That makes it a
  * deployment-sizing knob (state volume / executor count), not a
  * session-wide batch setting: a stateful query over a
  * watermark-bounded few-GB state wants far fewer stores than the batch
  * shuffle default, and an over-partitioned state pays per-batch store
  * open/commit/snapshot overhead on every partition regardless of how
  * little state it holds.
  */
object StreamConf {

  /** Run `body` (which must both START and DRAIN its streaming query)
    * with the shuffle-partition setting temporarily at `n`, restoring
    * the session default afterwards. Because the value is
    * checkpoint-pinned at start, the override scopes exactly one
    * query's state layout and cannot leak into later batch plans.
    */
  def withStatePartitions[T](spark: SparkSession, n: Int)(body: => T): T = {
    val key = "spark.sql.shuffle.partitions"
    val old = spark.conf.get(key)
    spark.conf.set(key, n.toString)
    try body
    finally spark.conf.set(key, old)
  }
}
