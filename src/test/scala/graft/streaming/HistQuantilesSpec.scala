package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.GraftSpecBase

/** Streaming HDR quantiles: digest equals a plain-Scala replay of the
  * same bucket math, accumulates across batches, is order independent
  * (commutative integer histogram), and honors the documented ≤ 6.25%
  * relative error against exact percentiles.
  */
class HistQuantilesSpec extends GraftSpecBase {
  import spark.implicits._

  private def drain(batches: Seq[Seq[(String, Double)]], qname: String): Map[String, HistQuantiles.KeyDigest] = {
    spark.conf.set(
      "spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
    )
    try {
      implicit val sqlCtx = spark.sqlContext
      val input = MemoryStream[(String, Double)]
      val q = HistQuantiles.perKey(input.toDS())
        .writeStream.format("memory").queryName(qname).outputMode("update").start()
      batches.foreach { b => input.addData(b: _*); q.processAllAvailable() }
      q.stop()
      spark.table(qname).as[HistQuantiles.KeyDigest].collect()
        .groupBy(_.key).map { case (k, rows) => k -> rows.maxBy(_.n) }
    } finally spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }

  /** Exact replay of the operator's documented bucket math. */
  private def reference(values: Seq[Double]): (Long, Long, Long, Long) = {
    val counts = new Array[Long](1024)
    values.foreach(x => counts(HistQuantiles.bucketOf(math.round(x * 1000000.0))) += 1L)
    val n = counts.sum
    (n,
      HistQuantiles.quantile(counts, n, 1, 2),
      HistQuantiles.quantile(counts, n, 9, 10),
      HistQuantiles.quantile(counts, n, 99, 100))
  }

  private val values = (1 to 200).map(i => i * i * 0.013)

  test("digest equals the closed-form bucket replay; accumulates across batches") {
    val (b1, b2) = values.splitAt(120)
    val got = drain(Seq(b1.map(("lat", _)), b2.map(("lat", _))), "hq1")("lat")
    val (n, p50, p90, p99) = reference(values)
    assert(got.n === n)
    assert((got.p50Micro, got.p90Micro, got.p99Micro) === ((p50, p90, p99)))
  }

  test("order independence is structural: reversed and shuffled input give identical digests") {
    val a = drain(Seq(values.map(("k", _))), "hq2")("k")
    val b = drain(Seq(values.reverse.map(("k", _))), "hq3")("k")
    assert(a === b)
  }

  test("documented error bound: each percentile within 6.25% of the exact order statistic") {
    val got = drain(Seq(values.map(("k", _))), "hq4")("k")
    val sorted = values.sorted.map(x => math.round(x * 1000000.0))
    def exact(q: Double) = sorted(math.ceil(q * sorted.size).toInt - 1)
    Seq(got.p50Micro -> exact(0.5), got.p90Micro -> exact(0.9), got.p99Micro -> exact(0.99)).foreach {
      case (approx, ex) =>
        assert(approx <= ex, s"lower-bound report must not exceed the exact value ($approx > $ex)")
        assert(ex - approx <= ex / 16 + 1, s"error beyond 1/16 bound: approx=$approx exact=$ex")
    }
  }

  test("keys do not interact") {
    val got = drain(Seq(Seq(("a", 10.0), ("b", 9000.0))), "hq5")
    assert(got("a").n === 1 && got("b").n === 1)
    assert(got("a").p50Micro < got("b").p50Micro)
  }
}
