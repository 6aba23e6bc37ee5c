package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.GraftSpecBase

case class Purchase(user_id: Long, value: Double)

/** The maintained snapshot must equal the from-scratch aggregate over
  * everything ingested so far, after every micro-batch, for all mergeable
  * kinds at once.
  */
class IncrementalAggSpec extends GraftSpecBase {
  import spark.implicits._
  import IncrementalAgg._

  test("snapshot equals the batch aggregate after every micro-batch") {
    implicit val sqlCtx = spark.sqlContext
    val path = Files.createTempDirectory("inc-agg").toString
    val ckpt = Files.createTempDirectory("inc-ckpt").toString

    val input = MemoryStream[Purchase]
    val q = IncrementalAgg.start(
      input.toDF(),
      keyCols = Seq("user_id"),
      measures = Seq(
        Measure("total", "value", AggKind.Sum),
        Measure("n", "value", AggKind.Count),
        Measure("mx", "value", AggKind.Max),
        Measure("mn", "value", AggKind.Min)
      ),
      path = path,
      checkpoint = ckpt
    )

    var all = Seq.empty[Purchase]
    def check(batch: Purchase*): Unit = {
      input.addData(batch: _*)
      q.processAllAvailable()
      all = all ++ batch
      val got = IncrementalAgg.snapshot(spark, path).get
        .select("user_id", "total", "n", "mx", "mn")
        .as[(Long, Double, Long, Double, Double)].collect().toSet
      val want = all.toDF()
        .groupBy($"user_id")
        .agg(
          org.apache.spark.sql.functions.sum($"value").as("total"),
          org.apache.spark.sql.functions.count($"value").as("n"),
          org.apache.spark.sql.functions.max($"value").as("mx"),
          org.apache.spark.sql.functions.min($"value").as("mn")
        )
        .as[(Long, Double, Long, Double, Double)].collect().toSet
      assert(got === want, s"after ${all.size} rows")
    }

    check(Purchase(1, 10.0), Purchase(2, 5.0))
    check(Purchase(1, 2.5), Purchase(3, 1.0), Purchase(1, 7.5))
    check(Purchase(2, -4.0))
    q.stop()
  }
}
