package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.GraftSpecBase

case class SEv(user_id: Long, ts: Timestamp, value: Double)

/** Streaming sessionization (B7's streaming twin): the same
  * `session_window` aggregation as the batch operator, under a watermark —
  * finalized sessions must match the batch result row-for-row, including
  * sessions BRIDGED by an out-of-order event that arrives in a later
  * micro-batch.
  */
class SessionWindowStreamSpec extends GraftSpecBase {
  import spark.implicits._

  private val GapMs = 30L * 60 * 1000

  private def t(ms: Long) = new Timestamp(ms)

  /** Drain batches through the streaming sessionizer (append mode). */
  private def runStream(batches: Seq[Seq[SEv]], name: String): Set[(Long, Long, Long, Double)] = {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[SEv]
    val out   = SessionWindows.sessionize(input.toDF(), "30 minutes", "1 hour")
    val q = out.writeStream.format("memory").queryName(name).outputMode("append").start()
    batches.foreach { b => input.addData(b: _*); q.processAllAvailable() }
    q.stop()
    spark
      .table(name)
      .select(col("user_id"), col("session_start_ms"), col("n_events"), col("sum_value"))
      .as[(Long, Long, Long, Double)]
      .collect()
      .toSet
  }

  /** The batch operator on the same rows (the oracle-checked form). */
  private def batchSessions(all: Seq[SEv]): Set[(Long, Long, Long, Double)] =
    graft.operators.EventAnalytics
      .sessionWindows(all.toDF(), "30 minutes")
      .as[(Long, Long, Long, Double)]
      .collect()
      .toSet

  test("finalized streaming sessions match the batch operator row-for-row") {
    val h = 3600L * 1000
    val evs = Seq(
      // user 1: two sessions — [0, 10min] and [2h, 2h05]
      SEv(1, t(0), 1.25), SEv(1, t(10 * 60 * 1000), 2.50),
      SEv(1, t(2 * h), 4.00), SEv(1, t(2 * h + 5 * 60 * 1000), 0.75),
      // user 2: one session
      SEv(2, t(h), 10.00), SEv(2, t(h + 29 * 60 * 1000), 0.01)
    )
    // flush sentinel far past everything: watermark = its ts − 1 h clears
    // every real session (sentinel's own open session never emits)
    val flush = SEv(99, t(30 * h), 0.0)
    val got   = runStream(Seq(evs, Seq(flush)), "sw1")
    assert(got === batchSessions(evs))
  }

  test("an out-of-order event in a later batch bridges two open sessions") {
    val m = 60L * 1000
    val b1 = Seq(
      SEv(7, t(0), 1.0), SEv(7, t(50 * m), 2.0) // 50 min apart: two open sessions
    )
    // arrives late but inside the watermark: 25 min sits within gap of both
    // neighbors, so the engine must MERGE the two open sessions into one
    val b2    = Seq(SEv(7, t(25 * m), 4.0))
    val flush = SEv(99, t(3000 * m), 0.0)
    val all   = b1 ++ b2
    val got   = runStream(Seq(b1, b2, Seq(flush)), "sw2")
    assert(got === batchSessions(all))
    assert(got === Set((7L, 0L, 3L, 7.0))) // one bridged session, not two
  }
}
