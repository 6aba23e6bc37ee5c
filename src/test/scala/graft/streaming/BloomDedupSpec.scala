package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.GraftSpecBase

/** Bounded-memory Bloom dedup: the no-false-negative guarantee (a
  * duplicate is never emitted twice), cross-batch state carry, key
  * isolation, in-batch order independence, and the documented saturation
  * behavior (false drops appear only when the filter is overloaded).
  */
class BloomDedupSpec extends GraftSpecBase {
  import spark.implicits._

  private def drain(
      batches: Seq[Seq[(String, String)]],
      mBits: Int = 8192,
      qname: String = "bd"
  ): Seq[(String, String)] = {
    spark.conf.set(
      "spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
    )
    try {
      implicit val sqlCtx = spark.sqlContext
      val input = MemoryStream[(String, String)]
      val q = BloomDedup.perKey(input.toDS(), mBits = mBits)
        .writeStream.format("memory").queryName(qname).outputMode("append").start()
      batches.foreach { b => input.addData(b: _*); q.processAllAvailable() }
      q.stop()
      spark.table(qname).as[(String, String)].collect().toSeq
    } finally spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }

  test("never emits a duplicate, within or across batches") {
    val out = drain(Seq(
      Seq(("k", "a"), ("k", "b"), ("k", "a")),
      Seq(("k", "b"), ("k", "c"), ("k", "c"))
    ), qname = "bd1")
    assert(out.sorted === Seq(("k", "a"), ("k", "b"), ("k", "c")))
  }

  test("keys are isolated: the same id passes once per key") {
    val out = drain(Seq(Seq(("k1", "x"), ("k2", "x"))), qname = "bd2")
    assert(out.sorted === Seq(("k1", "x"), ("k2", "x")))
  }

  test("emission is independent of in-batch arrival order") {
    val a = drain(Seq(Seq(("k", "z"), ("k", "a"), ("k", "m"))), qname = "bd3")
    val b = drain(Seq(Seq(("k", "a"), ("k", "m"), ("k", "z"))), qname = "bd4")
    assert(a.toSet === b.toSet && a.toSet === Set(("k", "a"), ("k", "m"), ("k", "z")))
  }

  test("well-sized filter passes every distinct id; saturated filter false-drops — never duplicates") {
    val ids = (0 until 200).map(i => s"id-$i")
    // 8192 bits for 200 ids (n = m/41): every distinct id emitted
    val roomy = drain(Seq(ids.map(("k", _))), mBits = 8192, qname = "bd5")
    assert(roomy.map(_._2).sorted === ids.sorted)
    // 64 bits for 200 ids: massively overloaded — SOME new ids are
    // falsely dropped (the documented trade), but nothing is emitted
    // twice and the survivors are a subset of the distinct ids
    val tight = drain(Seq(ids.map(("k", _))), mBits = 64, qname = "bd6")
    assert(tight.size < ids.size, "saturated filter must false-drop")
    assert(tight.map(_._2).distinct.size === tight.size, "no duplicates even saturated")
    assert(tight.map(_._2).toSet.subsetOf(ids.toSet))
  }
}
