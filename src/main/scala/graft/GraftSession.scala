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

  def builder(appName: String = "graft"): SparkSession.Builder =
    SparkSession
      .builder()
      .appName(appName)
      .withExtensions(new GraftExtensions)
      .master(s"local[$cpus]")
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
      // below defaultParallelism, so with the 8×threads initial count
      // every small-query shuffle still schedules ~threads tiny tasks —
      // the r9 "q16 tax" (10 small queries +1.2-1.8× for the sf10 win).
      // Size-first coalescing reclaims it: tiny shuffles collapse to 1-2
      // partitions, and the 16 MB advisory (vs the 64 MB default, tuned
      // for multi-node clusters) keeps mid-size local shuffles parallel
      // enough. Measured at sf0.1 (same 6-query subset, same host):
      // q16 1.15→1.05 s, q1 0.95→0.90 s, graph_components 4.50→4.29 s,
      // i.e. the small-query tax gone WITHOUT giving back the heavy-query
      // win; 8 MB advisory was uniformly worse. Env knobs are dev
      // overrides for scale probes, not a user contract.
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", sys.env.getOrElse("SPARK_GRAFT_PF", "false"))
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", sys.env.getOrElse("SPARK_GRAFT_ADVISORY", (16L * 1024 * 1024).toString))
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", (64L * 1024 * 1024).toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.filterPushdown", "true")
      // events.parquet carries TIMESTAMP(NANOS) which Spark's reader
      // rejects; read as raw nanos and convert in the loader (Tables.events)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // timestamp[us] fixture columns are NOT UTC-adjusted (isAdjustedToUTC
      // = false); read them as TimestampType under the UTC session instead
      // of TIMESTAMP_NTZ so epoch_ms semantics match the DuckDB oracle and
      // every time function (unix_millis, window, watermark) stays usable
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")

  def get(appName: String = "graft"): SparkSession = {
    val spark = builder(appName).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
