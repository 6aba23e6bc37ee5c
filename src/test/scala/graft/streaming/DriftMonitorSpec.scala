package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.GraftSpecBase

/** Streaming drift monitor: closed-form parity with a plain-Scala
  * counter fold, near-zero scores when the stream matches the
  * reference, loud scores when it shifts, order independence (counter
  * state — no sort needed), cross-batch accumulation, and key
  * isolation — under the RocksDB provider.
  */
class DriftMonitorSpec extends GraftSpecBase {
  import spark.implicits._

  /** Reference ppm for a uniform spread over the given micro values. */
  private def refOf(values: Seq[Long]): Map[Int, Long] = {
    val n = values.size.toLong
    values
      .groupBy(HistQuantiles.bucketOf)
      .map { case (b, vs) => b -> vs.size.toLong * 1000000L / n }
  }

  private def drain(
      batches: Seq[Seq[(String, Long)]],
      ref: Map[Int, Long],
      qname: String
  ): Map[String, Seq[DriftMonitor.DriftScore]] = {
    spark.conf.set(
      "spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
    )
    try {
      implicit val sqlCtx = spark.sqlContext
      val input = MemoryStream[(String, Long)]
      val q = DriftMonitor.perKey(input.toDS(), ref)
        .writeStream.format("memory").queryName(qname).outputMode("update").start()
      batches.foreach { b => input.addData(b: _*); q.processAllAvailable() }
      q.stop()
      spark.table(qname).as[DriftMonitor.DriftScore].collect().toSeq.groupBy(_.key)
    } finally spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }

  test("matching distribution scores near zero; shifted distribution screams") {
    val base = (0 until 200).map(i => (i % 100) * 1000L + 1000L) // values 1k..100k
    val ref  = refOf(base)
    val same = drain(Seq(base.map(("k", _))), ref, "dm1")("k").last
    // same distribution: PSI ~0, KS small (quantization only)
    assert(same.n === 200L)
    assert(math.abs(same.psiMicro) < 30000L, s"psi=${same.psiMicro}")
    assert(same.ksPpm < 50000L, s"ks=${same.ksPpm}")
    // shift everything 16x: different buckets entirely
    val shifted = drain(Seq(base.map(v => ("k", v * 16))), ref, "dm2")("k").last
    assert(shifted.psiMicro > 1000000L, s"psi=${shifted.psiMicro}") // PSI >> 0.25
    assert(shifted.ksPpm > 900000L, s"ks=${shifted.ksPpm}")
  }

  test("emission matches the closed-form kernel on the accumulated counters") {
    val vals = Seq(5L, 5L, 100L, 20000L, 123456L, 5L, 100L)
    val ref  = refOf(Seq(5L, 100L, 20000L))
    val got = drain(Seq(vals.map(("k", _))), ref, "dm3")("k").last
    val counts = new Array[Long](1024)
    vals.foreach(v => counts(HistQuantiles.bucketOf(v)) += 1L)
    assert(got.n === vals.size.toLong)
    assert(got.psiMicro === DriftMonitor.psiMicro(counts, vals.size.toLong, ref))
    assert(got.ksPpm === DriftMonitor.ksPpm(counts, vals.size.toLong, ref))
  }

  test("arrival order and batch split cannot change the final score") {
    val vals = (0 until 300).map(i => (i * 37 % 5000).toLong * 100L)
    val ref  = refOf(vals.take(100))
    val one    = drain(Seq(vals.map(("k", _))), ref, "dm4")("k").last
    val revTwo = drain(Seq(vals.reverse.take(150).map(("k", _)), vals.reverse.drop(150).map(("k", _))), ref, "dm5")("k").last
    assert((one.n, one.psiMicro, one.ksPpm) === ((revTwo.n, revTwo.psiMicro, revTwo.ksPpm)))
  }

  test("scores accumulate across batches (state carries the histogram)") {
    val ref = refOf(Seq(10L))
    val got = drain(Seq(Seq(("k", 10L)), Seq(("k", 10L), ("k", 10L))), ref, "dm6")("k")
    assert(got.map(_.n).max === 3L)
  }

  test("keys are isolated") {
    val ref = refOf(Seq(10L))
    val got = drain(Seq(Seq(("a", 10L), ("b", 1000000L))), ref, "dm7")
    assert(got("a").last.psiMicro < got("b").last.psiMicro)
  }
}
