package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.GraftSpecBase

/** Streaming CUSUM: closed-form parity with a plain-Scala sequential
  * fold, upward and downward shift detection with the right first-
  * crossing timestamp, Page's restart rule, in-batch order independence
  * (event-time sort), cross-batch state carry, and key isolation —
  * under the RocksDB provider.
  */
class CusumChartSpec extends GraftSpecBase {
  import spark.implicits._

  private def drain(
      batches: Seq[Seq[(String, Long, Long)]],
      target: Long,
      slack: Long,
      h: Long,
      qname: String
  ): Map[String, Seq[CusumChart.ChartState]] = {
    spark.conf.set(
      "spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
    )
    try {
      implicit val sqlCtx = spark.sqlContext
      val input = MemoryStream[(String, Long, Long)]
      val q = CusumChart.perKey(input.toDS(), target, slack, h)
        .writeStream.format("memory").queryName(qname).outputMode("update").start()
      batches.foreach { b => input.addData(b: _*); q.processAllAvailable() }
      q.stop()
      // all emissions in order (one per touched key per batch)
      spark.table(qname).as[CusumChart.ChartState].collect().toSeq
        .groupBy(_.key)
    } finally spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }

  /** Reference fold: the operator's documented semantics in plain Scala. */
  private def reference(
      points: Seq[(Long, Long)], // (ms, x) — pre-sorted per batch by caller
      target: Long,
      slack: Long,
      h: Long
  ): (Long, Long, Int, Long) = {
    var (sp, sn) = (0L, 0L)
    var tripped  = 0
    var tripMs   = -1L
    points.sortBy(_._1).foreach { case (ms, x) =>
      sp = math.max(0L, sp + (x - target - slack))
      sn = math.max(0L, sn + (target - x - slack))
      if (sp > h || sn > h) {
        if (tripped == 0) tripMs = ms
        tripped = 1; sp = 0L; sn = 0L
      }
    }
    (sp, sn, tripped, tripMs)
  }

  test("upward shift trips at the first crossing with the right timestamp") {
    // target 100, slack 5, h 30: values 120 add +15 per point → trips on 3rd
    val rows = (1 to 5).map(i => ("k", i * 1000L, 120L))
    val got = drain(Seq(rows), 100L, 5L, 30L, "cu1")("k").last
    assert(got.tripped === 1)
    assert(got.tripMs === 3000L)
    val (sp, sn, tr, ms) = reference(rows.map(r => (r._2, r._3)), 100L, 5L, 30L)
    assert((got.sPos, got.sNeg, got.tripped, got.tripMs) === ((sp, sn, tr, ms)))
  }

  test("downward shift trips on the negative side") {
    val rows = (1 to 5).map(i => ("k", i * 1000L, 80L))
    val got = drain(Seq(rows), 100L, 5L, 30L, "cu2")("k").last
    assert(got.tripped === 1 && got.tripMs === 3000L)
  }

  test("in-control data never trips and the statistic stays near zero") {
    val vals = Seq(98L, 103L, 99L, 102L, 100L, 97L, 104L)
    val rows = vals.zipWithIndex.map { case (v, i) => ("k", (i + 1) * 1000L, v) }
    val got = drain(Seq(rows), 100L, 5L, 30L, "cu3")("k").last
    assert(got.tripped === 0 && got.tripMs === -1L)
    assert(got.sPos <= 30L && got.sNeg <= 30L)
  }

  test("in-batch arrival order cannot change the emission (event-time sort)") {
    val rows = Seq(("k", 1000L, 120L), ("k", 2000L, 80L), ("k", 3000L, 130L), ("k", 4000L, 90L))
    val fwd = drain(Seq(rows), 100L, 0L, 25L, "cu4")("k").last
    val rev = drain(Seq(rows.reverse), 100L, 0L, 25L, "cu5")("k").last
    assert((fwd.sPos, fwd.sNeg, fwd.tripped, fwd.tripMs) ===
      ((rev.sPos, rev.sNeg, rev.tripped, rev.tripMs)))
  }

  test("state carries across batches and matches the reference fold; restart re-arms") {
    val b1 = (1 to 2).map(i => ("k", i * 1000L, 115L)) // builds sPos, no trip
    val b2 = (3 to 4).map(i => ("k", i * 1000L, 115L)) // trips, resets
    val b3 = (5 to 8).map(i => ("k", i * 1000L, 115L)) // builds again, trips again
    val emissions = drain(Seq(b1, b2, b3), 100L, 5L, 25L, "cu6")("k")
    assert(emissions.size === 3)
    val all = (b1 ++ b2 ++ b3).map(r => (r._2, r._3))
    // final state equals one continuous reference fold over everything
    val lastRef = {
      var (sp, sn, n) = (0L, 0L, 0L)
      var state = (0L, 0L)
      all.sortBy(_._1).foreach { case (_, x) =>
        sp = math.max(0L, sp + (x - 105L)); sn = math.max(0L, sn + (95L - x))
        if (sp > 25L || sn > 25L) { sp = 0; sn = 0 }
      }
      (sp, sn)
    }
    assert((emissions.last.sPos, emissions.last.sNeg) === lastRef)
    // batch 2 and batch 3 each tripped
    assert(emissions(1).tripped === 1 && emissions(2).tripped === 1)
    assert(emissions.last.nPoints === 8L)
  }

  test("keys are isolated") {
    val rows = (1 to 4).map(i => ("hotkey", i * 1000L, 200L)) ++
      (1 to 4).map(i => ("calm", i * 1000L, 100L))
    val got = drain(Seq(rows), 100L, 5L, 30L, "cu7")
    assert(got("hotkey").last.tripped === 1)
    assert(got("calm").last.tripped === 0)
  }
}
