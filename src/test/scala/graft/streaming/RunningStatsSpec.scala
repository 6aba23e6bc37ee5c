package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.GraftSpecBase

/** transformWithState running aggregates (the Spark-4 arbitrary-state
  * API): per-key moments accumulate across micro-batches under the
  * RocksDB state store, and the last Update-mode emission per key equals
  * a batch aggregation of everything fed.
  */
class RunningStatsSpec extends GraftSpecBase {
  import spark.implicits._

  private def runStream(batches: Seq[Seq[(String, Double)]]): Map[String, (Long, Double)] = {
    spark.conf.set(
      "spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
    )
    try {
      implicit val sqlCtx = spark.sqlContext
      val input = MemoryStream[(String, Double)]
      val out   = RunningStats.perKey(input.toDS())
      val q = out.writeStream.format("memory").queryName("rs").outputMode("update").start()
      batches.foreach { b => input.addData(b: _*); q.processAllAvailable() }
      q.stop()
      // Update mode appends a row per (batch, key); the LAST row per key
      // is the running total
      spark
        .table("rs")
        .as[RunningStats.KeyStats]
        .collect()
        .groupBy(_.key)
        .map { case (k, rows) => k -> { val last = rows.maxBy(_.n); (last.n, last.total) } }
    } finally
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }

  test("per-key moments accumulate across micro-batches under RocksDB state") {
    val b1 = Seq(("a", 1.0), ("a", 2.0), ("b", 10.0))
    val b2 = Seq(("a", 3.0), ("b", 30.0), ("c", 5.0))
    val got = runStream(Seq(b1, b2))
    assert(got === Map("a" -> ((3L, 6.0)), "b" -> ((2L, 40.0)), "c" -> ((1L, 5.0))))
  }

  test("final running stats equal a batch aggregation of all input") {
    val all = (0 until 200).map(i => (s"k${i % 7}", (i % 13).toDouble))
    val (b1, b2, b3) = (all.take(80), all.slice(80, 150), all.drop(150))
    val got = runStream(Seq(b1, b2, b3))
    val expect = all.groupBy(_._1).map { case (k, xs) => k -> ((xs.size.toLong, xs.map(_._2).sum)) }
    assert(got === expect)
  }
}
