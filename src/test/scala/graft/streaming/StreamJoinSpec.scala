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

  test("interval join emission is micro-batch-boundary independent") {
    // The oracle drains events_stream_join in effectively one AvailableNow
    // batch; this test forces MANY micro-batches (one source file each via
    // maxFilesPerTrigger=1) and asserts the emitted match set is identical
    // to the batch join — i.e. inner-join emission does not depend on how
    // the streams are chopped into batches, which is the property that
    // makes the operator oracle-checkable at all.
    val src  = WorkDirs.fresh(spark, "ssj-multi-src")
    val out  = WorkDirs.fresh(spark, "ssj-multi-out")
    val ckpt = WorkDirs.fresh(spark, "ssj-multi-ckpt")
    val ev   = graft.Tables.events(spark, sf())

    // Stage the source as four files in EVENT-TIME order with distinct
    // mtimes, the arrival order a real stream delivers. (A random file
    // split would hand the source wildly time-disordered batches; the
    // watermark would then — correctly — drop late events, which tests
    // the input contract, not the join.)
    val bounds = ev.select(unix_millis(min("ts")), unix_millis(max("ts"))).head()
    val (lo, hi) = (bounds.getLong(0), bounds.getLong(1))
    val sliceMs  = (hi - lo) / 4 + 1
    (0 to 3).foreach { i =>
      ev.filter(
        unix_millis(col("ts")).between(lo + i * sliceMs, lo + (i + 1) * sliceMs - 1)
      ).coalesce(1).write.mode("append").parquet(src)
      Thread.sleep(1100) // distinct mtimes pin the source's processing order
    }

    val schema = spark.read.parquet(src).schema
    def stream = spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(src)

    val joined = StreamJoins.viewPurchaseAttribution(
      stream.filter(col("event_type") === "view"),
      stream.filter(col("event_type") === "purchase")
    )
    val q = joined.writeStream
      .format("parquet")
      .option("path", out)
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    assert(
      q.recentProgress.count(_.numInputRows > 0) > 1,
      "expected the drain to span multiple micro-batches"
    )

    val streamed = spark.read
      .parquet(out)
      .select("purchase_id", "view_id")
      .as[(Long, Long)]
      .collect()
      .toSet

    val staged = spark.read.parquet(src)
    val batch = StreamJoins
      .viewPurchaseAttribution(
        staged.filter(col("event_type") === "view"),
        staged.filter(col("event_type") === "purchase")
      )
      .select("purchase_id", "view_id")
      .as[(Long, Long)]
      .collect()
      .toSet

    assert(streamed === batch)
    assert(streamed.nonEmpty)
  }

  test("left-outer interval join emits unmatched views on watermark eviction") {
    implicit val sqlCtx = spark.sqlContext
    case class Ev(event_id: Long, user_id: Long, ts: Timestamp)
    val views     = MemoryStream[(Long, Long, Timestamp)]
    val purchases = MemoryStream[(Long, Long, Timestamp)]
    def frame(m: MemoryStream[(Long, Long, Timestamp)]) =
      m.toDF().toDF("event_id", "user_id", "ts")

    val joined = StreamJoins
      .viewPurchaseAttributionOuter(frame(views), frame(purchases), hours = 6, lateness = "1 hour")
      .select(col("view_id"), col("purchase_id"))
    val q = joined.writeStream.format("memory").queryName("ssj_outer").outputMode("append").start()

    val t = (h: Int) => Timestamp.valueOf(f"2024-01-01 $h%02d:00:00")
    views.addData((10L, 1L, t(1)), (11L, 2L, t(1)))   // user 2 never converts
    purchases.addData((20L, 1L, t(2)))                // matches view 10
    q.processAllAvailable()

    // far-future events push both watermarks past view_ts + 6h, forcing
    // the unmatched view out of state as a null-purchase row
    views.addData((12L, 9L, t(23)))
    purchases.addData((21L, 9L, t(23)))
    q.processAllAvailable()
    views.addData((13L, 9L, t(23)))
    purchases.addData((22L, 9L, t(23)))
    q.processAllAvailable()
    q.stop()

    val rows = spark.table("ssj_outer").as[(Long, Option[Long])].collect().toSet
    assert(rows.contains((10L, Some(20L))), s"matched pair missing: $rows")
    assert(rows.contains((11L, None)), s"unmatched view not emitted on eviction: $rows")
    // the matched view must NOT also emit a null row
    assert(!rows.contains((10L, None)), s"matched view wrongly evicted as unmatched: $rows")
  }
}
