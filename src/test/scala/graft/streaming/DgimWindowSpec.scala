package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.GraftSpecBase

/** Streaming DGIM sliding-window counter: exactness while buckets stay
  * singletons, the 1/(2(r−1)) error bound against an exact sliding
  * count, logarithmic state, in-batch order independence, cross-batch
  * continuity with expiry, and key isolation — under RocksDB.
  */
class DgimWindowSpec extends GraftSpecBase {
  import spark.implicits._

  private def drain(
      batches: Seq[Seq[(String, Long)]],
      windowMs: Long,
      r: Int,
      qname: String
  ): Map[String, DgimWindow.WindowEstimate] = {
    spark.conf.set(
      "spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
    )
    try {
      implicit val sqlCtx = spark.sqlContext
      val input = MemoryStream[(String, Long)]
      val q = DgimWindow.perKey(input.toDS(), windowMs = windowMs, r = r)
        .writeStream.format("memory").queryName(qname).outputMode("update").start()
      batches.foreach { b => input.addData(b: _*); q.processAllAvailable() }
      q.stop()
      spark.table(qname).as[DgimWindow.WindowEstimate].collect()
        .groupBy(_.key).map { case (k, rows) => k -> rows.maxBy(_.asOf) }
    } finally spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }

  test("exact while every in-window bucket is a singleton") {
    val got = drain(Seq(Seq(("k", 100L), ("k", 200L), ("k", 300L))), windowMs = 1000L, r = 4, qname = "dg1")("k")
    assert(got.estimate === 3L)
    assert(got.asOf === 300L)
  }

  test("error bound: estimate within 1/(2(r-1)) of the exact in-window count") {
    val r  = 4
    val W  = 10000L
    val rnd = new scala.util.Random(7)
    // bursty stream: 2000 events over ~60s so buckets merge repeatedly
    val tss = (0 until 2000).scanLeft(0L)((t, _) => t + rnd.nextInt(60)).tail
    val got   = drain(Seq(tss.map(("k", _))), windowMs = W, r = r, qname = "dg2")("k")
    val asOf  = tss.max
    val exact = tss.count(t => t > asOf - W).toLong
    val bound = 1.0 / (2 * (r - 1))
    assert(
      math.abs(got.estimate - exact).toDouble / exact <= bound,
      s"estimate ${got.estimate} vs exact $exact exceeds ±${bound * 100}%"
    )
  }

  test("state stays logarithmic: bucket count bounded by (r+1)*log2(n)+r for 5000 events") {
    val n   = 5000
    val r   = 2
    val tss = (1 to n).map(_.toLong * 10)
    val got = drain(Seq(tss.map(("k", _))), windowMs = Long.MaxValue / 2, r = r, qname = "dg3")("k")
    val bound = (r + 1) * (math.log(n.toDouble) / math.log(2.0)) + r
    assert(got.nBuckets <= bound.toInt, s"${got.nBuckets} buckets for $n events (bound $bound)")
  }

  test("in-batch arrival order cannot change the emission (event-time sort)") {
    val rnd  = new scala.util.Random(11)
    val tss  = (0 until 400).map(_ => rnd.nextInt(100000).toLong)
    val fwd  = drain(Seq(tss.map(("k", _))), windowMs = 50000L, r = 3, qname = "dg4")("k")
    val shuf = drain(Seq(rnd.shuffle(tss).map(("k", _))), windowMs = 50000L, r = 3, qname = "dg5")("k")
    assert(fwd.estimate === shuf.estimate)
    assert(fwd.nBuckets === shuf.nBuckets)
    assert(fwd.asOf === shuf.asOf)
  }

  test("cross-batch continuity: old events expire as the window slides forward") {
    val got = drain(Seq(
      (1 to 50).map(i => ("k", i.toLong * 10)),          // all inside [0, 500]
      Seq(("k", 100000L))                                 // jumps asOf far ahead
    ), windowMs = 1000L, r = 4, qname = "dg6")("k")
    // only the new event is inside [99000, 100000]
    assert(got.estimate === 1L)
    assert(got.nBuckets === 1)
  }

  test("keys are isolated") {
    val got = drain(Seq(Seq(("a", 10L), ("a", 20L), ("b", 10L))), windowMs = 1000L, r = 4, qname = "dg7")
    assert(got("a").estimate === 2L && got("b").estimate === 1L)
  }
}
