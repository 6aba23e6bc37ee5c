package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.GraftSpecBase

case class DqRec(id: Long, qty: Double, price: Double)

/** Streaming admission gate (DqGate): clean rows reach the main sink,
  * violators land in quarantine tagged with every rule they broke, and
  * per-batch metrics record rule violation counts. Replay idempotence
  * comes from batch=<id> overwrite partitions (same contract as the CDC
  * enrichment sink, asserted there).
  */
class DqGateSpec extends GraftSpecBase {
  import spark.implicits._

  private val rules = Seq(
    DqGate.Rule("null_id", col("id").isNull),
    DqGate.Rule("qty_range", !col("qty").between(1, 50)),
    DqGate.Rule("price_floor", col("price") <= 0)
  )

  test("gate routes clean vs violating rows and logs per-batch metrics") {
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("dqgate").toString
    val input = MemoryStream[DqRec]

    val q = DqGate.start(
      "dq-test", input.toDF(), rules,
      s"$dir/main", s"$dir/quarantine", s"$dir/metrics", s"$dir/ckpt",
      // MemoryStream data arrives after start — AvailableNow would
      // snapshot an empty source
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0)
    )
    input.addData(
      DqRec(1, 10.0, 5.0),            // clean
      DqRec(2, 99.0, 5.0),            // qty_range
      DqRec(3, 99.0, -1.0)            // qty_range + price_floor
    )
    q.processAllAvailable()
    q.stop()

    val main = spark.read.parquet(s"$dir/main").as[DqRec].collect()
    assert(main.map(_.id).toSeq === Seq(1L))

    val quarantine = spark.read.parquet(s"$dir/quarantine")
      .select(col("id"), array_sort(col("dq_violations")).as("v"))
      .as[(Long, Seq[String])].collect().sortBy(_._1)
    assert(quarantine.toSeq === Seq(
      (2L, Seq("qty_range")),
      (3L, Seq("price_floor", "qty_range"))
    ))

    val metrics = spark.read.parquet(s"$dir/metrics")
      .select("rule", "n_violations", "n_checked")
      .as[(String, Long, Long)].collect().sortBy(_._1)
    // null_id has ZERO violations and must STILL emit its metrics row —
    // "rule passed" is distinguishable from "rule not evaluated".
    assert(metrics.toSeq === Seq(
      ("null_id", 0L, 3L),
      ("price_floor", 1L, 3L),
      ("qty_range", 2L, 3L)
    ))
  }

  test("batch tag column is pure codegen over the rule set") {
    val df = Seq((1L, 10.0, 5.0), (2L, 99.0, -1.0)).toDF("id", "qty", "price")
    val tagged = DqGate.tag(df, rules)
      .select(col("id"), array_sort(col("dq_violations")).as("v"))
      .as[(Long, Seq[String])].collect().sortBy(_._1)
    assert(tagged.toSeq === Seq((1L, Nil), (2L, Seq("price_floor", "qty_range"))))
  }
}
