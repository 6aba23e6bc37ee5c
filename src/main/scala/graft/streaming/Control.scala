package graft.streaming

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQuery

/** Stream lifecycle + offset control plane (SURVEY.md §2 A16–A19),
  * replacing the reference's BindingsLifecycleController / AdminClient
  * machinery (StreamControlService.java, KafkaOffsetService.java).
  *
  * Queries register as *factories* so stop→start cycles (A16) and offset
  * resets (A18) can relaunch with fresh options. In Spark the consumer
  * group's committed offsets live in the checkpoint, so:
  *  - offsets/lag (A17) come from `lastProgress` (sources' start/end
  *    offsets and input row counts);
  *  - reset (A18) = stop → relaunch the factory pointed at a NEW
  *    checkpoint dir with explicit startingOffsets (the factory decides
  *    how — for Kafka sources a JSON offset map, for file sources a fresh
  *    listing) — Spark checkpoints are append-only, never edited in place.
  */
final class StreamRegistry(spark: SparkSession) {

  /** reset epoch per query: factories receive it to derive a fresh
    * checkpoint location on reset, mirroring the reference's
    * stop → alter offsets → restart cycle.
    */
  final case class Registration(factory: Int => StreamingQuery, var epoch: Int)

  private val registered = TrieMap.empty[String, Registration]
  private val active     = TrieMap.empty[String, StreamingQuery]

  def register(name: String, factory: Int => StreamingQuery, autoStart: Boolean = true): Unit = {
    registered.put(name, Registration(factory, 0))
    if (autoStart) start(name)
  }

  /** A16 — start (idempotent: no-op if already running). */
  def start(name: String): Boolean = registered.get(name) match {
    case Some(reg) if !isRunning(name) =>
      active.put(name, reg.factory(reg.epoch)); true
    case _ => false
  }

  /** A16 — stop, waiting for termination like the reference's 5s
    * stream-stop wait (StreamControlService.java:180-197).
    */
  def stop(name: String, timeoutMs: Long = 5000): Boolean =
    active.remove(name) match {
      case Some(q) =>
        // A query that already terminated with an error rethrows its
        // StreamingQueryException from stop()/awaitTermination(); teardown
        // must still complete (and stopAll must reach the remaining
        // queries), so report failure instead of propagating mid-loop.
        scala.util.Try {
          q.stop()
          q.awaitTermination(timeoutMs)
        }.getOrElse(false)
      case None => false
    }

  def isRunning(name: String): Boolean = active.get(name).exists(_.isActive)

  /** A19 — status probe: (id, runId, isActive, status message). */
  def status(name: String): Option[(String, String, Boolean, String)] =
    active.get(name).map(q => (q.id.toString, q.runId.toString, q.isActive, q.status.message))

  /** A17 — per-source offset/progress info from the last micro-batch:
    * (source description, startOffset, endOffset, numInputRows). The lag
    * analogue is endOffset vs the source's latestOffset, which for
    * rate-limited sources shows in the next progress event.
    */
  def offsets(name: String): Seq[(String, String, String, Long)] =
    active.get(name).toSeq.flatMap { q =>
      Option(q.lastProgress).toSeq.flatMap(_.sources.toSeq.map { s =>
        (s.description, String.valueOf(s.startOffset), String.valueOf(s.endOffset), s.numInputRows)
      })
    }

  /** A18 — offset reset: stop, bump the epoch (factories derive a fresh
    * checkpoint + startingOffsets from it), restart. Returns the previous
    * offsets for the reference's response contract
    * (AnimalStreamController reset response).
    */
  def reset(name: String): Seq[(String, String, String, Long)] = {
    val prev = offsets(name)
    stop(name)
    registered.get(name).foreach { reg => reg.epoch += 1 }
    start(name)
    prev
  }

  /** Stop everything (test teardown / shutdown hook). */
  def stopAll(): Unit = active.keys.foreach(stop(_))
}
