package graft.streaming

import org.apache.spark.sql.SparkSession

/** Streaming state-store backend selection (SURVEY.md §2 B2/B7 at scale).
  *
  * The default HDFS-backed state store keeps every key's state on the JVM
  * heap; at a 100 TB/day keyspace (exact-dedup fingerprints, funnel
  * per-user state, session windows) that is an OOM, not a tuning problem.
  * Spark's RocksDB provider spills state to local SSD with bounded block-
  * cache memory, and changelog checkpointing uploads per-batch deltas
  * instead of full snapshots — the same design the reference inherits from
  * Kafka Streams' RocksDB default (its state stores are RocksDB-backed via
  * the Streams DSL; cf. reference README's state-dir configuration).
  *
  * Everything here is plain public session conf — kept in one place so
  * pipelines opt in uniformly and tests can prove behavior parity between
  * backends.
  */
object StateBackend {

  val RocksDBProvider =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  /** Conf for RocksDB-backed state with per-batch changelog uploads.
    *
    * @param boundedMemoryMB cap the total RocksDB memory (block cache +
    *        memtables) across all state store instances on an executor —
    *        the knob that makes state memory predictable on a shared
    *        1000-executor cluster.
    */
  def rocksDBConf(
      changelogCheckpointing: Boolean = true,
      boundedMemoryMB: Option[Long] = None
  ): Map[String, String] = {
    val base = Map(
      "spark.sql.streaming.stateStore.providerClass" -> RocksDBProvider,
      "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled" ->
        changelogCheckpointing.toString
    )
    base ++ boundedMemoryMB.fold(Map.empty[String, String]) { mb =>
      Map(
        "spark.sql.streaming.stateStore.rocksdb.boundedMemoryUsage" -> "true",
        "spark.sql.streaming.stateStore.rocksdb.maxMemoryUsageMB"   -> mb.toString
      )
    }
  }

  /** Run `body` with RocksDB state storage, restoring the previous
    * backend conf afterwards. Provider choice is read at query start, so
    * queries started inside `body` use RocksDB; already-running queries
    * are untouched.
    */
  def withRocksDB[A](spark: SparkSession, boundedMemoryMB: Option[Long] = None)(body: => A): A = {
    val conf = rocksDBConf(boundedMemoryMB = boundedMemoryMB)
    val prev = conf.keys.map(k => k -> spark.conf.getOption(k)).toMap
    conf.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }
}
