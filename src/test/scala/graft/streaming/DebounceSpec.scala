package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.GraftSpecBase

case class Tap(k: String, ms: Long, id: Long)

/** Streaming leading-edge debounce (B72's streaming twin): burst heads
  * emit, followers within the gap are suppressed, and the stored
  * timestamp advances on EVERY record (previous-event rule) — matching
  * the batch `events_debounce` window semantics on the same data.
  */
class DebounceSpec extends GraftSpecBase {
  import spark.implicits._

  private val gap = 5000L

  private def runStream(batches: Seq[Seq[Tap]]): Set[(String, Long)] = {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Tap]
    val out   = Debounce.leadingEdge[String, Tap](input.toDS(), _.k, _.ms, _.id, gap)
    val q     = out.writeStream.format("memory").queryName("db").outputMode("append").start()
    batches.foreach { b => input.addData(b: _*); q.processAllAvailable() }
    q.stop()
    spark.table("db").as[Tap].collect().map(t => (t.k, t.ms)).toSet
  }

  private def batchKept(all: Seq[Tap]): Set[(String, Long)] = {
    val w = Window.partitionBy("k").orderBy(col("ms"), col("id"))
    all
      .toDF()
      .withColumn("prev_ms", lag(col("ms"), 1).over(w))
      .where(col("prev_ms").isNull || col("ms") - col("prev_ms") > gap)
      .select(col("k"), col("ms"))
      .as[(String, Long)]
      .collect()
      .toSet
  }

  test("burst heads emit, followers suppress, state advances on every record") {
    // k=a: 0 (head), 3000 (burst), 6000 (burst: 3000+5000>=6000), 12000 (new head)
    // — 6000 is within gap of 3000 even though 3000 was NOT emitted:
    // the previous-EVENT rule, not previous-kept
    val b1 = Seq(Tap("a", 0, 1), Tap("a", 3000, 2), Tap("b", 100, 3))
    val b2 = Seq(Tap("a", 6000, 4), Tap("a", 12000, 5), Tap("b", 5200, 6))
    val got = runStream(Seq(b1, b2))
    assert(got === Set(("a", 0L), ("a", 12000L), ("b", 100L), ("b", 5200L)))
  }

  test("emission matches the batch events_debounce window semantics") {
    val all = (0 until 40).map { i =>
      Tap(if (i % 2 == 0) "x" else "y", (i / 4) * 3000L + (i % 4) * 900L, i.toLong)
    }
    val (b1, b2) = all.splitAt(23)
    // in-batch arrival order shuffled: the per-key sort must restore it
    assert(runStream(Seq(b1.reverse, b2.reverse)) === batchKept(all))
  }
}
