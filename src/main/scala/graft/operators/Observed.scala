package graft.operators

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** Zero-extra-pass pipeline metrics via `Dataset.observe` (SURVEY.md §2
  * B169): named aggregate metrics (row counts, violation sums, null
  * tallies) are accumulated DURING the job by the engine — no second scan,
  * no `count()` re-run — and collected from the driver-side listener when
  * the action finishes. This is how a 100 TB curation job reports its
  * gate counters without paying for a metrics pass: the alternative
  * (re-aggregating the frame) doubles the scan.
  *
  * `run` attaches a one-shot QueryExecutionListener keyed by the
  * observation name, executes the given action, and returns (action
  * result, metrics row). The listener is always unregistered, and metric
  * delivery is awaited through a latch because Spark fires listeners
  * asynchronously after the action returns.
  */
object Observed {

  def run[T](
      df: DataFrame,
      name: String,
      metrics: Seq[Column]
  )(action: DataFrame => T): (T, Row) = {
    val spark   = df.sparkSession
    val results = TrieMap.empty[String, Row]
    val latch   = new java.util.concurrent.CountDownLatch(1)
    val listener = new QueryExecutionListener {
      override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit = {
        qe.observedMetrics.get(name).foreach { row =>
          results.put(name, row)
          latch.countDown()
        }
      }
      override def onFailure(funcName: String, qe: QueryExecution, exception: Exception): Unit =
        latch.countDown()
    }
    spark.listenerManager.register(listener)
    try {
      val observed = df.observe(name, metrics.head, metrics.tail: _*)
      val out      = action(observed)
      // listeners fire on a separate bus thread after the action returns
      latch.await(30, java.util.concurrent.TimeUnit.SECONDS)
      (out, results.getOrElse(name, Row.empty))
    } finally spark.listenerManager.unregister(listener)
  }
}
