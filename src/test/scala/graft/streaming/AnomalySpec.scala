package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.GraftSpecBase

case class Reading(k: String, ms: Long, id: Long, x: Double)

/** Streaming prefix-z-score anomaly detection (B23's streaming twin):
  * flags against the moments of records seen BEFORE arrival; every record
  * folds into state; in-batch arrival order must not matter.
  */
class AnomalySpec extends GraftSpecBase {
  import spark.implicits._

  private def runStream(batches: Seq[Seq[Reading]]): Map[(String, Long), Double] = {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Reading]
    val out = Anomaly
      .zScore[String, Reading](input.toDS(), _.k, _.ms, _.id, _.x, threshold = 3.0, minPrior = 5)
      .map { case (r, z) => (r.k, r.ms, z) }
    val q = out.writeStream.format("memory").queryName("an").outputMode("append").start()
    batches.foreach { b => input.addData(b: _*); q.processAllAvailable() }
    q.stop()
    spark.table("an").as[(String, Long, Double)].collect().map { case (k, ms, z) => (k, ms) -> z }.toMap
  }

  /** The same prefix fold, written once in plain Scala as the oracle. */
  private def prefixFlags(all: Seq[Reading]): Map[(String, Long), Double] = {
    val out = Map.newBuilder[(String, Long), Double]
    all.groupBy(_.k).foreach { case (k, rs) =>
      var n = 0L; var s1 = 0.0; var s2 = 0.0
      rs.sortBy(r => (r.ms, r.id)).foreach { r =>
        if (n >= 5) {
          val mean = s1 / n
          val varP = s2 / n - mean * mean
          if (varP > 0.0) {
            val z = (r.x - mean) / math.sqrt(varP)
            if (math.abs(z) >= 3.0) out += (k, r.ms) -> z
          }
        }
        n += 1; s1 += r.x; s2 += r.x * r.x
      }
    }
    out.result()
  }

  test("spikes flag against prior-state moments; warmup records never flag") {
    // key a: stable around 10 ± 1, then a spike at 100 — z >> 3
    val stable = (0 until 8).map(i => Reading("a", i * 1000L, i.toLong, 10.0 + (i % 3) - 1))
    val spike  = Reading("a", 9000L, 9L, 100.0)
    val got    = runStream(Seq(stable, Seq(spike)))
    assert(got.keySet === Set(("a", 9000L)))
    assert(got(("a", 9000L)) > 3.0)
    // and matches the plain-Scala prefix oracle exactly
    assert(got === prefixFlags(stable :+ spike))
  }

  test("in-batch arrival order does not change emissions") {
    val all = (0 until 30).map { i =>
      val base = if (i % 13 == 7) 60.0 else 10.0 + (i % 5) * 0.5 // periodic outliers
      Reading(if (i % 2 == 0) "x" else "y", i * 500L, i.toLong, base)
    }
    val (b1, b2) = all.splitAt(17)
    assert(runStream(Seq(b1.reverse, b2.reverse)) === prefixFlags(all))
  }
}
