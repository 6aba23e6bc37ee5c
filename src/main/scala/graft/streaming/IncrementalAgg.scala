package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Incrementally-maintained keyed aggregate table (materialized view
  * maintenance over a stream): each micro-batch folds its partial
  * aggregate into the previous snapshot and publishes a new one — the
  * warehouse-side complement of the windowed in-flight aggregations
  * (SURVEY.md §2 B7), for aggregates that must span the whole history
  * without unbounded executor state.
  *
  * Mergeable aggregate kinds only (sum/count/min/max): re-aggregating a
  * union of partials is then exact, any grouping of the input into
  * batches lands on the same table. State lives in the snapshot files,
  * not the state store — executor memory stays O(batch), and the
  * snapshot is a plain parquet table any reader can query mid-stream.
  *
  * Exactly-once: snapshots are versioned by batch id
  * (`path/batch=<id>`, overwrite) — a replayed batch rewrites its own
  * version from the SAME previous version, so the merge is idempotent;
  * readers take the max published version via [[snapshot]].
  */
object IncrementalAgg {

  sealed trait AggKind { def fn: String }
  object AggKind {
    case object Sum   extends AggKind { val fn = "sum" }
    case object Count extends AggKind { val fn = "count" } // merged by sum
    case object Min   extends AggKind { val fn = "min" }
    case object Max   extends AggKind { val fn = "max" }
  }

  /** One maintained measure: `outCol` = kind(valueExpr). */
  final case class Measure(outCol: String, valueCol: String, kind: AggKind)

  private def aggColumns(measures: Seq[Measure], fromPartials: Boolean) =
    measures.map { m =>
      val src = col(m.valueCol)
      val out = col(m.outCol)
      m.kind match {
        case AggKind.Sum   => (if (fromPartials) sum(out) else sum(src)).as(m.outCol)
        case AggKind.Count => (if (fromPartials) sum(out) else count(src)).as(m.outCol)
        case AggKind.Min   => (if (fromPartials) min(out) else min(src)).as(m.outCol)
        case AggKind.Max   => (if (fromPartials) max(out) else max(src)).as(m.outCol)
      }
    }

  private def versionsIn(spark: SparkSession, path: String): Seq[Long] = {
    val p  = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("batch="))
      .map(_.getPath.getName.stripPrefix("batch=").toLong)
  }

  /** Latest published snapshot (empty-schema-safe: None before the first
    * batch).
    */
  def snapshot(spark: SparkSession, path: String): Option[DataFrame] = {
    val vs = versionsIn(spark, path)
    if (vs.isEmpty) None
    else Some(spark.read.parquet(s"$path/batch=${vs.max}"))
  }

  /** Start maintaining `path` from `stream`. */
  def start(
      stream: DataFrame,
      keyCols: Seq[String],
      measures: Seq[Measure],
      path: String,
      checkpoint: String,
      trigger: Trigger = Trigger.ProcessingTime(0L)
  ): StreamingQuery = {
    require(keyCols.nonEmpty && measures.nonEmpty, "need key columns and measures")
    stream.writeStream
      .trigger(trigger)
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark   = batch.sparkSession
        val partial = batch.groupBy(keyCols.map(col): _*).agg(
          aggColumns(measures, fromPartials = false).head,
          aggColumns(measures, fromPartials = false).tail: _*
        )
        // previous snapshot = newest version BELOW this batch id, so a
        // replayed batch re-merges from the same base (idempotent)
        val prevVs = versionsIn(spark, path).filter(_ < batchId)
        val merged = prevVs.sorted.lastOption match {
          case None => partial
          case Some(v) =>
            spark.read.parquet(s"$path/batch=$v")
              .unionByName(partial)
              .groupBy(keyCols.map(col): _*)
              .agg(
                aggColumns(measures, fromPartials = true).head,
                aggColumns(measures, fromPartials = true).tail: _*
              )
        }
        merged.write.mode("overwrite").parquet(s"$path/batch=$batchId")
        ()
      }
      .start()
  }
}
