package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.GraftSpecBase

/** Streaming KMV sketch: hash parity with the batch formula, exactness
  * below k, estimate quality above k, batch-boundary and order
  * independence (min-set union is commutative + idempotent), and key
  * isolation — all under the RocksDB provider.
  */
class KmvSketchSpec extends GraftSpecBase {
  import spark.implicits._

  private def drain(batches: Seq[Seq[(String, String)]], k: Int, qname: String): Map[String, KmvSketch.KeyEstimate] = {
    spark.conf.set(
      "spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
    )
    try {
      implicit val sqlCtx = spark.sqlContext
      val input = MemoryStream[(String, String)]
      val q = KmvSketch.perKey(input.toDS(), k = k)
        .writeStream.format("memory").queryName(qname).outputMode("update").start()
      batches.foreach { b => input.addData(b: _*); q.processAllAvailable() }
      q.stop()
      spark.table(qname).as[KmvSketch.KeyEstimate].collect()
        .groupBy(_.key).map { case (kk, rows) => kk -> rows.maxBy(_.nSeen) }
    } finally spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }

  test("hash52 matches the batch query's conv(substring(md5, 1, 13), 16, 10)") {
    val ids = Seq("0", "1", "42", "123456789")
    val viaSql = ids.map { id =>
      spark.sql(s"SELECT CAST(conv(substring(md5('$id'), 1, 13), 16, 10) AS BIGINT)")
        .head().getLong(0)
    }
    assert(ids.map(KmvSketch.hash52) === viaSql)
  }

  test("below k the sketch is exact; duplicates never inflate it") {
    val got = drain(Seq(
      Seq(("t", "a"), ("t", "b"), ("t", "a")),
      Seq(("t", "b"), ("t", "c"))
    ), k = 64, qname = "kmv1")("t")
    assert(got.estimate === 3L)
    assert(got.nSeen === 5L)
  }

  test("above k the estimate lands near the true cardinality") {
    val n = 2000
    val got = drain(Seq((0 until n).map(i => ("t", s"user-$i"))), k = 64, qname = "kmv2")("t")
    // KMV relative error ~ 1/sqrt(k-2) ≈ 12.7%; allow 3 sigma
    assert(math.abs(got.estimate - n).toDouble / n < 0.4, s"estimate ${got.estimate} too far from $n")
  }

  test("batch boundaries and order do not change the estimate (mergeable min-set)") {
    val ids = (0 until 500).map(i => s"id-$i")
    val one  = drain(Seq(ids.map(("k", _))), k = 32, qname = "kmv3")("k")
    val many = drain(ids.grouped(90).map(_.map(("k", _))).toSeq, k = 32, qname = "kmv4")("k")
    val rev  = drain(Seq(ids.reverse.map(("k", _))), k = 32, qname = "kmv5")("k")
    assert(one.estimate === many.estimate)
    assert(one.estimate === rev.estimate)
    assert(one.kth === many.kth && one.kth === rev.kth)
  }

  test("keys are isolated") {
    val got = drain(Seq(Seq(("a", "x"), ("b", "x"), ("b", "y"))), k = 8, qname = "kmv6")
    assert(got("a").estimate === 1L && got("b").estimate === 2L)
  }
}
