package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.GraftSpecBase

case class Req(k: String, ms: Long, id: Long)

/** Token-bucket admission: bursts clip at capacity, event-time refill
  * restores budget, and emission is identical however the input is
  * chopped into micro-batches.
  */
class RateLimitSpec extends GraftSpecBase {
  import spark.implicits._

  // capacity 2 tokens, refill 1 token/sec
  private def run(batches: Seq[Seq[Req]]): Seq[Long] = {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Req]
    val out = RateLimit.tokenBucket[String, Req](
      input.toDS(), _.k, _.ms, _.id, capacityMilli = 2000L, refillMilliPerSec = 1000L)
    val name = s"rl_${batches.map(_.size).mkString("_")}"
    val q = out.writeStream.format("memory").queryName(name).outputMode("append").start()
    batches.foreach { b => input.addData(b: _*); q.processAllAvailable() }
    q.stop()
    spark.table(name).as[Req].collect().map(_.id).toSeq.sorted
  }

  private val reqs = Seq(
    Req("a", 0, 1), Req("a", 100, 2), Req("a", 200, 3),   // burst: only 2 tokens
    Req("a", 1200, 4),                                    // +1.0 token refilled by 1200ms? 1200-200=1000ms → 1 token
    Req("a", 1300, 5),                                    // 100ms later: 0.1 token — denied
    Req("a", 4300, 6),                                    // +3s → capacity-capped at 2, admit
    Req("b", 0, 7)                                        // independent key budget
  )
  private val expected = Seq(1L, 2L, 4L, 6L, 7L)

  test("bursts clip at capacity and event-time refill restores budget") {
    assert(run(Seq(reqs)) === expected)
  }

  test("admission is micro-batch-boundary independent") {
    val (b1, b2) = reqs.splitAt(4)
    assert(run(Seq(b1, b2)) === expected)
    val singles = reqs.map(Seq(_))
    assert(run(singles) === expected)
  }
}
