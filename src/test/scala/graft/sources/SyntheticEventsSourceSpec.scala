package graft.sources

import org.apache.spark.sql.functions._

import graft.GraftSpecBase

/** DSv2 generator source: deterministic rows, column pruning reaching the
  * scan, and event_id range pushdown pruning generated partitions.
  */
class SyntheticEventsSourceSpec extends GraftSpecBase {

  private def load(n: Long, parts: Int = 8) =
    spark.read
      .format("graft-synthetic-events")
      .option("rows", n)
      .option("users", 50)
      .option("partitions", parts)
      .load()

  test("deterministic: two independent reads agree row-for-row; schema is the contract") {
    val a = load(5000).collect().map(_.toString).sorted
    val b = load(5000).collect().map(_.toString).sorted
    assert(a.length === 5000)
    assert(a === b)
    assert(load(10).schema.fieldNames.toSeq ===
      Seq("event_id", "ts", "user_id", "event_type", "value"))
  }

  test("column pruning reaches the scan: the BatchScan carries only projected fields") {
    val d = load(1000).select("user_id", "value")
    val p = d.queryExecution.executedPlan.toString
    // V2 scans print their pruned output inline on the BatchScan node
    assert(p.contains("BatchScan"), p)
    assert(p.contains("user_id") && p.contains("value"), p)
    assert(!p.contains("event_type") && !p.contains("ts#"), p)
    assert(d.distinct().count() > 0)
  }

  test("event_id range pushdown prunes generated partitions") {
    val full     = load(1000000, parts = 100)
    val filtered = full.where(col("event_id") < 10000)
    // the filter narrows the generated range BEFORE partition planning:
    // [0, 10000) is 1% of the nominal table, so the scan prorates its
    // 100 nominal partitions down to a handful
    val scanParts = filtered.rdd.getNumPartitions
    assert(scanParts <= 2, s"pushdown did not prune partitions: $scanParts")
    assert(filtered.count() === 10000)
    // and the unfiltered read keeps its nominal parallelism
    assert(full.rdd.getNumPartitions === 100)
  }

  test("streaming read: micro-batches advance by rowsPerBatch and replay the same rows") {
    val q = spark.readStream
      .format("graft-synthetic-events")
      .option("rows", 100)
      .option("users", 50)
      .option("rowsPerBatch", 30)
      .load()
      .writeStream.format("memory").queryName("syn_stream").outputMode("append")
      .start()
    q.processAllAvailable()
    q.stop()
    val got = spark.table("syn_stream")
    assert(got.count() === 100)
    assert(got.select("event_id").distinct().count() === 100)
    // stream rows equal the batch read bit-for-bit (same pure generator)
    val batch = load(100).collect().map(_.toString).sorted
    assert(got.collect().map(_.toString).sorted === batch)
    // ceil(100 / 30) = 4 micro-batches carried data
    assert(q.recentProgress.count(_.numInputRows > 0) === 4, q.recentProgress.map(_.numInputRows).mkString(","))
  }

  test("generated values are in-contract (types bounded, users modulo)") {
    val d = load(20000)
    val r = d.agg(
      max(col("user_id")).as("mx"),
      min(col("value")).as("mnv"),
      max(col("value")).as("mxv"),
      countDistinct(col("event_type")).as("nt")
    ).head
    assert(r.getAs[Long]("mx") < 50)
    assert(r.getAs[Double]("mnv") >= 0.0 && r.getAs[Double]("mxv") < 100.0)
    assert(r.getAs[Long]("nt") === 5)
  }
}
