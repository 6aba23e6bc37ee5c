package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.GraftSpecBase

/** Streaming CMS heavy hitters: bucket parity with the batch query's md5
  * formula, the no-undercount guarantee, exactness at small cardinality,
  * in-batch order independence (counters-first fold), cross-batch
  * accumulation, candidate-entry semantics, and key isolation — all
  * under the RocksDB provider.
  */
class CmsHeavyHittersSpec extends GraftSpecBase {
  import spark.implicits._

  private def drain(
      batches: Seq[Seq[(String, String)]],
      m: Int,
      qname: String
  ): Map[String, Seq[CmsHeavyHitters.HeavyHitter]] = {
    spark.conf.set(
      "spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
    )
    try {
      implicit val sqlCtx = spark.sqlContext
      val input = MemoryStream[(String, String)]
      val q = CmsHeavyHitters.perKey(input.toDS(), m = m)
        .writeStream.format("memory").queryName(qname).outputMode("update").start()
      var batchNo = 0L
      val perBatchTag = scala.collection.mutable.ArrayBuffer.empty[Long]
      batches.foreach { b => input.addData(b: _*); q.processAllAvailable(); batchNo += 1 }
      q.stop()
      // update-mode memory sink appends every emission; the FINAL list per
      // key is the last full rank sequence — recover it by taking, per
      // (key, rank), the last-emitted row, which the sink preserves in
      // insertion order
      val rows = spark.table(qname).as[CmsHeavyHitters.HeavyHitter].collect()
      rows.zipWithIndex
        .groupBy { case (h, _) => (h.key, h.rank) }
        .map { case (_, grp) => grp.maxBy(_._2)._1 }
        .toSeq
        .groupBy(_.key)
        .map { case (k, hs) => k -> hs.sortBy(_.rank) }
    } finally spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }

  test("bucket() matches the batch query's conv(substring(md5(concat(r,':',id)),1,13),16,10) % 512") {
    val cases = Seq((0, "7"), (1, "42"), (2, "123456789"), (3, "0"))
    val viaSql = cases.map { case (r, id) =>
      spark.sql(
        s"SELECT CAST(conv(substring(md5(concat('$r', ':', '$id')), 1, 13), 16, 10) AS BIGINT) % 512"
      ).head().getLong(0)
    }
    assert(cases.map { case (r, id) => CmsHeavyHitters.bucket(r, id, 512).toLong } === viaSql)
  }

  test("small cardinality: estimates are exact and ranked by count then id") {
    val batch = Seq.fill(5)(("k", "a")) ++ Seq.fill(3)(("k", "b")) ++ Seq.fill(3)(("k", "c")) ++ Seq(("k", "d"))
    val got = drain(Seq(batch), m = 3, qname = "cms1")("k")
    assert(got.map(h => (h.id, h.estimate, h.rank)) === Seq(("a", 5L, 1), ("b", 3L, 2), ("c", 3L, 3)))
  }

  test("no undercount: every estimate >= the id's true count") {
    val ids = (0 until 300).flatMap(i => Seq.fill(1 + i % 7)((s"key", s"id-$i")))
    val truth = ids.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val got = drain(Seq(ids), m = 10, qname = "cms2")("key")
    got.foreach { h => assert(h.estimate >= truth(h.id), s"undercount for ${h.id}") }
  }

  test("in-batch arrival order cannot change the emission (counters-first fold)") {
    val rows = (0 until 200).map(i => ("k", s"id-${i % 23}"))
    val fwd = drain(Seq(rows), m = 5, qname = "cms3")("k")
    val rev = drain(Seq(rows.reverse), m = 5, qname = "cms4")("k")
    assert(fwd.map(h => (h.id, h.estimate, h.rank)) === rev.map(h => (h.id, h.estimate, h.rank)))
  }

  test("cross-batch accumulation: counts carry over batch boundaries") {
    val got = drain(Seq(
      Seq.fill(4)(("k", "hot")),
      Seq.fill(5)(("k", "hot")) ++ Seq(("k", "cold"))
    ), m = 2, qname = "cms5")("k")
    assert(got.head.id === "hot" && got.head.estimate === 9L)
  }

  test("a dominant id evicted earlier re-enters when touched again") {
    // batch 1 makes "x" dominant; batch 2's flood of "y" takes the single
    // candidate slot (x evicted); batch 3 touches "x" again — its
    // ACCUMULATED grid count (10+5=15 > 12) must bring it back on top,
    // proving eviction loses the candidate slot but never the counts
    val got = drain(Seq(
      Seq.fill(10)(("k", "x")),
      Seq.fill(12)(("k", "y")),
      Seq.fill(5)(("k", "x"))
    ), m = 1, qname = "cms6")("k")
    assert(got.head.id === "x" && got.head.estimate === 15L)
  }

  test("keys are isolated") {
    val got = drain(Seq(Seq(("a", "p"), ("a", "p"), ("b", "q"))), m = 1, qname = "cms7")
    assert(got("a").head.id === "p" && got("a").head.estimate === 2L)
    assert(got("b").head.id === "q" && got("b").head.estimate === 1L)
  }
}
