package graft.tools

import org.apache.spark.sql.functions._

/** Decomposes the bench's streaming-drain time (round-11 brief #4: the
  * r9→r10 throughput drop 80.7k → 62.3k rows/s) into its parts, and A/Bs
  * the plain `batch=<id>` sink against the manifest-committed sink on the
  * SAME 100 k-row fixture:
  *
  *   1. batch-equivalent: the identical work (scan → persist → enrich
  *      broadcast join → 2 parquet writes + DLQ count) WITHOUT the
  *      streaming machinery — the floor any micro-batch pays.
  *   2. plain drain: `Pipelines.startEnrichPipeline` (what Bench times).
  *   3. manifest drain: `Pipelines.startEnrichPipelineManifest` — the
  *      exactly-once commit premium, measured.
  *
  * Each phase best-of-N (stalls only inflate). Usage:
  *   scripts/run-main.sh graft.tools.StreamDrainProfile [sfDir] [trials]
  */
object StreamDrainProfile {
  def main(args: Array[String]): Unit = {
    val sfDir  = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val trials = if (args.length > 1) args(1).toInt else 3
    val spark  = graft.GraftSession.get("graft-drain-profile")
    import graft.streaming.{Pipelines, WorkDirs}

    val srcDir = WorkDirs.fresh(spark, "drain-profile-src")
    graft.cdc.Envelope
      .synthesizeFromEvents(graft.Tables.events(spark, sfDir))
      .repartition(spark.sparkContext.defaultParallelism)
      .write.mode("overwrite").parquet(srcDir)
    val schema = spark.read.parquet(srcDir).schema
    val nRows  = spark.read.parquet(srcDir).count()

    def best(label: String)(body: => Unit): Double = {
      val ts = (1 to trials).map { _ =>
        val t0 = System.nanoTime()
        body
        (System.nanoTime() - t0) / 1e9
      }
      val b = ts.min
      println(f"[drain-profile] $label%-18s best=${b}%.3f s  (${nRows / b}%.0f rows/s)  trials=${ts.map(t => f"$t%.2f").mkString(",")}")
      b
    }

    // 1. batch-equivalent of ONE micro-batch's work
    best("batch-equivalent") {
      val batch = spark.read.schema(schema).parquet(srcDir)
      batch.persist()
      try {
        val (ok, failed) = Pipelines.enrichBatch(
          batch, graft.Tables.customer(spark, sfDir), "c_custkey", Seq("c_name", "c_mktsegment"))
        ok.write.mode("overwrite").parquet(WorkDirs.fresh(spark, "drain-profile-ok") + "/batch=0")
        failed.write.mode("overwrite").parquet(WorkDirs.fresh(spark, "drain-profile-dlq") + "/batch=0")
        failed.count(); ()
      } finally { batch.unpersist(); () }
    }

    // 2. plain drain (what Bench measures)
    best("plain-drain") {
      Pipelines.startEnrichPipeline(
        "drain-profile-plain",
        spark.readStream.schema(schema).parquet(srcDir),
        () => graft.Tables.customer(spark, sfDir), "c_custkey", Seq("c_name", "c_mktsegment"),
        WorkDirs.fresh(spark, "dp-ok"), WorkDirs.fresh(spark, "dp-dlq"), WorkDirs.fresh(spark, "dp-ckpt")
      ).awaitTermination()
    }

    // 3. manifest-committed drain (exactly-once premium)
    best("manifest-drain") {
      Pipelines.startEnrichPipelineManifest(
        "drain-profile-manifest",
        spark.readStream.schema(schema).parquet(srcDir),
        () => graft.Tables.customer(spark, sfDir), "c_custkey", Seq("c_name", "c_mktsegment"),
        WorkDirs.fresh(spark, "dpm-ok"), WorkDirs.fresh(spark, "dpm-dlq"), WorkDirs.fresh(spark, "dpm-ckpt")
      ).awaitTermination()
    }

    spark.stop()
  }
}
