package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.GraftSpecBase

case class Click(ct: Timestamp, user: Long, page: String)
case class Buy(bt: Timestamp, buyer: Long, amount: Double)

/** Stream-stream interval join: clicks joined to purchases by the same
  * user within 10 minutes AFTER the click. Both sides are watermarked so
  * Spark bounds the join state — the buffered range per side is
  * watermark delay + interval width, which is what keeps state finite at
  * production volume (an unwatermarked stream-stream join buffers
  * forever).
  */
class StreamJoinSpec extends GraftSpecBase {
  import spark.implicits._

  test("watermarked stream-stream interval join attributes purchases to clicks") {
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[Click]
    val buys   = MemoryStream[Buy]

    val c = clicks.toDF().withWatermark("ct", "5 minutes")
    val b = buys.toDF().withWatermark("bt", "5 minutes")
    val joined = c.join(
      b,
      col("user") === col("buyer") &&
        col("bt") >= col("ct") && col("bt") <= col("ct") + expr("INTERVAL 10 MINUTES")
    ).select(col("user"), col("page"), col("amount"))

    val q = joined.writeStream.format("memory").queryName("ssj").outputMode("append").start()

    val t = (m: Int) => Timestamp.valueOf(f"2024-01-01 01:$m%02d:00")
    clicks.addData(Click(t(0), 1, "home"), Click(t(1), 2, "search"))
    buys.addData(Buy(t(5), 1, 9.99))       // within 10 min of user 1's click
    buys.addData(Buy(t(20), 2, 5.00))      // 19 min after user 2's click — outside
    q.processAllAvailable()
    q.stop()

    val rows = spark.table("ssj").as[(Long, String, Double)].collect().toSet
    assert(rows === Set((1L, "home", 9.99)))
  }
}
