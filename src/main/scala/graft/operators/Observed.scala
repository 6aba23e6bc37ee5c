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
    val failure = new java.util.concurrent.atomic.AtomicReference[Exception](null)
    val latch   = new java.util.concurrent.CountDownLatch(1)
    val listener = new QueryExecutionListener {
      override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit = {
        qe.observedMetrics.get(name).foreach { row =>
          results.put(name, row)
          latch.countDown()
        }
      }
      override def onFailure(funcName: String, qe: QueryExecution, exception: Exception): Unit = {
        // the listener bus is session-global: only release the latch for a
        // failure of OUR observed query (identified by its observation
        // name in the analyzed plan), not any concurrent query's failure
        val ours = qe.analyzed.collectFirst {
          case c: org.apache.spark.sql.catalyst.plans.logical.CollectMetrics if c.name == name => c
        }.isDefined
        if (ours) {
          failure.set(exception)
          latch.countDown()
        }
      }
    }
    spark.listenerManager.register(listener)
    try {
      val observed = df.observe(name, metrics.head, metrics.tail: _*)
      val out      = action(observed)
      // listeners fire on a separate bus thread after the action returns
      val arrived = latch.await(30, java.util.concurrent.TimeUnit.SECONDS)
      Option(failure.get).foreach(e => throw e)
      // a silent Row.empty here would drop gate metrics a caller is
      // deciding on — fail loudly if delivery never happened
      if (!arrived || !results.contains(name))
        throw new IllegalStateException(
          s"observe('$name'): metrics not delivered within 30s (listener bus stalled or observation name mismatch)")
      (out, results(name))
    } finally spark.listenerManager.unregister(listener)
  }
}
