package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.GraftSpecBase

case class MigTap(k: String, ms: Long, id: Long)
case class MigReading(k: String, ms: Long, id: Long, x: Double)
case class MigFunnelEv(user_id: Long, ms: Long, event_type: String)

/** r12 verdict #3 — the four remaining fMGWS-only operators migrated to
  * transformWithState (Debounce, RateLimit, FunnelDetector, Anomaly;
  * StatefulDedup and RunningStats already had twins). Each test drains the
  * SAME multi-batch input through the fMGWS form and its tws twin under
  * the RocksDB provider (the only store transformWithState supports) and
  * asserts record-identical output — the StatefulDedup migration-spec
  * pattern. Batches are crafted so state CROSSES batch boundaries (the
  * part a single-batch comparison can't see).
  */
class TwsMigrationSpec extends GraftSpecBase {
  import spark.implicits._

  private def drain[I: org.apache.spark.sql.Encoder, O](
      qname: String,
      batches: Seq[Seq[I]],
      mk: MemoryStream[I] => Dataset[O]
  ): Seq[org.apache.spark.sql.Row] = {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[I]
    val q = mk(input).writeStream.format("memory").queryName(qname).outputMode("append").start()
    batches.foreach { b => input.addData(b: _*); q.processAllAvailable() }
    q.stop()
    spark.table(qname).collect().toSeq.sortBy(_.toString)
  }

  test("Debounce.leadingEdgeTws: output parity with the fMGWS form across batches") {
    // burst at 0/50/80 (head only), next head at 200; batch 2 continues the
    // SAME key from stored state (230 suppressed, 460 emitted) + a new key
    val batches = Seq(
      Seq(MigTap("a", 50L, 2), MigTap("a", 0L, 1), MigTap("a", 80L, 3), MigTap("a", 200L, 4)),
      Seq(MigTap("a", 230L, 5), MigTap("a", 460L, 6), MigTap("b", 10L, 7))
    )
    StateBackend.withRocksDB(spark) {
      val tws = drain[MigTap, MigTap]("deb_tws", batches,
        in => Debounce.leadingEdgeTws[String, MigTap](in.toDS(), _.k, _.ms, _.id, gapMs = 100L))
      val fmgws = drain[MigTap, MigTap]("deb_fmgws", batches,
        in => Debounce.leadingEdge[String, MigTap](in.toDS(), _.k, _.ms, _.id, gapMs = 100L))
      assert(tws === fmgws)
      assert(tws.map(_.getLong(2)).sorted === Seq(1L, 4L, 6L, 7L))
    }
  }

  test("RateLimit.tokenBucketTws: output parity with the fMGWS form across batches") {
    // capacity 2 tokens, refill 1 token/s: ids 1,2 admitted, 3 rejected
    // (same ms → no refill), batch 2 starts from the stored bucket —
    // id 4 at +1s has exactly one refilled token, id 5 rejected
    val batches = Seq(
      Seq(MigTap("a", 1000L, 1), MigTap("a", 1000L, 2), MigTap("a", 1000L, 3)),
      Seq(MigTap("a", 2000L, 4), MigTap("a", 2000L, 5), MigTap("b", 1L, 6))
    )
    StateBackend.withRocksDB(spark) {
      val tws = drain[MigTap, MigTap]("rl_tws", batches,
        in => RateLimit.tokenBucketTws[String, MigTap](
          in.toDS(), _.k, _.ms, _.id, capacityMilli = 2000L, refillMilliPerSec = 1000L))
      val fmgws = drain[MigTap, MigTap]("rl_fmgws", batches,
        in => RateLimit.tokenBucket[String, MigTap](
          in.toDS(), _.k, _.ms, _.id, capacityMilli = 2000L, refillMilliPerSec = 1000L))
      assert(tws === fmgws)
      assert(tws.map(_.getLong(2)).sorted === Seq(1L, 2L, 4L, 6L))
    }
  }

  test("FunnelDetector.detectTws: output parity with the fMGWS form across batches") {
    // user 1 completes across two batches (view,click | purchase) and must
    // not re-emit on a replayed purchase; user 2 never completes
    val stages = Seq("view", "click", "purchase")
    val batches = Seq(
      Seq(MigFunnelEv(1L, 20L, "click"), MigFunnelEv(1L, 10L, "view"), MigFunnelEv(2L, 5L, "click")),
      Seq(MigFunnelEv(1L, 30L, "purchase"), MigFunnelEv(2L, 9L, "purchase")),
      Seq(MigFunnelEv(1L, 40L, "purchase"))
    )
    StateBackend.withRocksDB(spark) {
      val tws = drain[MigFunnelEv, (Long, Long)]("fn_tws", batches,
        in => FunnelDetector.detectTws[Long, MigFunnelEv](in.toDS(), _.user_id, _.event_type, _.ms, stages))
      val fmgws = drain[MigFunnelEv, (Long, Long)]("fn_fmgws", batches,
        in => FunnelDetector.detect[Long, MigFunnelEv](in.toDS(), _.user_id, _.event_type, _.ms, stages))
      assert(tws === fmgws)
      assert(tws.map(r => (r.getLong(0), r.getLong(1))) === Seq((1L, 30L)))
    }
  }

  test("Anomaly.zScoreTws: output parity with the fMGWS form across batches") {
    // six calm readings build the prefix moments in batch 1; batch 2's
    // spike is scored against state restored from the store
    val calm  = (1 to 6).map(i => MigReading("a", i * 1000L, i, 10.0 + (i % 2)))
    val batches = Seq(calm, Seq(MigReading("a", 7000L, 7, 99.0), MigReading("a", 8000L, 8, 10.5)))
    StateBackend.withRocksDB(spark) {
      val tws = drain[MigReading, (MigReading, Double)]("an_tws", batches,
        in => Anomaly.zScoreTws[String, MigReading](in.toDS(), _.k, _.ms, _.id, _.x))
      val fmgws = drain[MigReading, (MigReading, Double)]("an_fmgws", batches,
        in => Anomaly.zScore[String, MigReading](in.toDS(), _.k, _.ms, _.id, _.x))
      assert(tws === fmgws)
      assert(tws.size === 1)
      assert(tws.head.getStruct(0).getLong(2) === 7L) // the spike, and only it
    }
  }
}
