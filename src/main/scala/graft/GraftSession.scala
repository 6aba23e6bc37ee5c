package graft

import org.apache.spark.sql.SparkSession

/** Session factory with the scale-oriented defaults every entry point shares.
  *
  * Tuned for the driver's local[N] harness but written for a real cluster:
  * AQE handles runtime re-planning (skew joins, partition coalescing), the
  * broadcast threshold covers every dimension table in the star schema, and
  * shuffle partitions track the executor thread count instead of the 200
  * default (on a 1000-executor cluster this is overridden by
  * spark.sql.adaptive coalescing anyway).
  */
object GraftSession {
  def cpus: String = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")

  /** Master override for the multi-JVM execution leg: every gate to date ran
    * in ONE JVM (local[N]), where closure serialization, broadcast shipping,
    * task-result transport and the custom TypedImperativeAggregates'
    * serialize/merge paths are structurally unexercised.
    * `SPARK_GRAFT_MASTER=local-cluster[2,2,2048]` runs an in-process
    * master + 2 workers that spawn REAL separate executor JVMs (requires
    * SPARK_HOME so the workers can build the executor classpath — see
    * scripts/localcluster-run.sh).
    */
  def master: String = sys.env.getOrElse("SPARK_GRAFT_MASTER", s"local[$cpus]")

  /** JDK17 add-opens mirrored from build.sbt/run-main.sh — separate executor
    * JVMs need them too (Platform.allocateDirectBuffer, calendar reflection).
    */
  private val AddOpens: String = {
    val pkgs = Seq(
      "java.lang", "java.lang.invoke", "java.lang.reflect", "java.io", "java.net",
      "java.nio", "java.util", "java.util.concurrent", "java.util.concurrent.atomic",
      "sun.nio.ch", "sun.nio.cs", "sun.security.action", "sun.util.calendar")
    pkgs.map(p => s"--add-opens=java.base/$p=ALL-UNNAMED").mkString(" ")
  }

  def builder(appName: String = "graft"): SparkSession.Builder = {
    val b = SparkSession
      .builder()
      .appName(appName)
      .withExtensions(new GraftExtensions)
      .master(master)
    if (master.startsWith("local-cluster")) {
      // Executors are separate processes: ship the library classes and the
      // JDK17 opens; size spark.executor.memory to the worker slot from the
      // master string (default 1g would strand the rest of the slot).
      val classesDir = new java.io.File("target/scala-2.13/classes").getAbsolutePath
      val memMb = "local-cluster\\[\\s*\\d+\\s*,\\s*\\d+\\s*,\\s*(\\d+)".r
        .findFirstMatchIn(master).map(_.group(1)).getOrElse("1024")
      b.config("spark.executor.extraClassPath", classesDir)
        .config("spark.executor.extraJavaOptions", s"$AddOpens -Duser.timezone=UTC")
        .config("spark.executor.memory", s"${memMb}m")
    }
    b
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      // Partition count must track DATA VOLUME, not the constant above:
      // with a fixed 32, a 10× corpus packs 10× the keys into each
      // reduce-side hash-agg and tips it into spill (measured: the sf10
      // probe's copurchase-edge build went 16× for 10× data). Start every
      // exchange at 8×threads and let AQE coalesce down to the advisory
      // size — small inputs still collapse to a handful of partitions,
      // large ones keep per-partition state bounded.
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum", sys.env.getOrElse("SPARK_GRAFT_INITIAL_PARTS", (cpus.toInt * 8).toString))
      // parallelismFirst=true (the Spark default) refuses to coalesce
      // below defaultParallelism. Round 10 traded it for size-first
      // coalescing on a 6-query subset measurement; the round-11 re-audit
      // with wider subsets reversed that call: size-first collapses
      // MID-SIZE shuffles (e.g. q16's ~400 k distinct-triple exchange,
      // ~12 MB — under the 16 MB advisory it runs the final distinct agg
      // on ONE task) and the loss is general, not a q16 quirk. Measured
      // pf=true vs pf=false, 3-trial medians, same host back-to-back:
      // 14-query sf0.1 subset 20.4 vs 28.2 s (q_assoc_rules 1.51 vs
      // 3.10 s, graph_components 4.49 vs 7.42 s, dedup_idf_jaccard 2.81
      // vs 4.24 s — the r10 "regressions" were this knob); 5 heavy
      // queries at sf1 24.2 vs 32.5 s; sf10 graph family a wash (71.0 vs
      // 73.2 s single-trial). Keeping parallelism beats packing bytes on
      // a 32-thread executor, and on a real cluster the advisory below
      // still bounds partition bloat. Env knobs are dev overrides for
      // scale probes, not a user contract.
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", sys.env.getOrElse("SPARK_GRAFT_PF", "true"))
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", sys.env.getOrElse("SPARK_GRAFT_ADVISORY", (16L * 1024 * 1024).toString))
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", (64L * 1024 * 1024).toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.filterPushdown", "true")
      // FileOutputCommitter v2 moves task output into place at task
      // commit instead of double-renaming at job commit — on the
      // streaming micro-batch path (2 sinks × 32 task commits per batch)
      // the v1 job-commit rename fan-out is pure fixed cost per batch.
      // v2's known caveat (partial output visible if the JOB fails
      // mid-commit) is covered here by the idempotent batch=<id>
      // directory overwrite and by the manifest sink's own commit
      // protocol — readers of either sink never trust bare files.
      // Session-global caveat: BATCH parquet writes in this session get v2
      // too, so a failed batch job can leave partially-visible output for
      // a consumer that doesn't re-overwrite. Acceptable here because every
      // batch write in this repo is an overwrite into a fresh/per-run dir
      // (bench/verify/test scratch); a library consumer embedding
      // GraftSession for durable batch ETL should override this back to v1
      // or write through the manifest sink.
      .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version", "2")
      // events.parquet carries TIMESTAMP(NANOS) which Spark's reader
      // rejects; read as raw nanos and convert in the loader (Tables.events)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // timestamp[us] fixture columns are NOT UTC-adjusted (isAdjustedToUTC
      // = false); read them as TimestampType under the UTC session instead
      // of TIMESTAMP_NTZ so epoch_ms semantics match the DuckDB oracle and
      // every time function (unix_millis, window, watermark) stays usable
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
  }

  def get(appName: String = "graft"): SparkSession = {
    val spark = builder(appName).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
