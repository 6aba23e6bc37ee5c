package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions.{coalesce, col, length, lit, struct, sum, to_json}

/** Small-file compaction — the maintenance operator every streaming
  * ingest needs: micro-batches leave a long tail of small files that
  * throttle scan parallelism (task-per-file floor) and NameNode/listing
  * pressure. Rewrite with a row-count-derived partition target so output
  * files land near `targetBytes`.
  *
  * Uses an actual sampled bytes-per-row estimate rather than file sizes:
  * at 100 TB the input listing is the expensive part, and the estimate
  * only has to be right within 2× for healthy files.
  */
object Compaction {

  // backtick-quote so column names containing dots resolve as top-level
  // columns (bare col("a.b") would be parsed as nested-field access)
  private def quoted(name: String) = col("`" + name.replace("`", "``") + "`")

  def compact(
      df: DataFrame,
      outPath: String,
      targetBytes: Long = 128L * 1024 * 1024,
      sampleRows: Int = 10000
  ): Long = {
    val total = df.count()
    if (total == 0) return 0
    // executor-side size estimate: only one scalar crosses to the driver
    // (the sampled rows themselves never do)
    val sampled = df.limit(math.min(sampleRows, Int.MaxValue).toInt)
    val sampleBytes = sampled
      .select(coalesce(sum(length(to_json(struct(df.columns.map(quoted): _*)))).cast("long"), lit(0L)))
      .head()
      .getLong(0)
    val sampleN = math.max(1L, math.min(total, sampleRows.toLong))
    // JSON over-counts vs parquet (no encoding/compression); halve it
    val bytesPerRow = math.max(1L, sampleBytes / sampleN / 2)
    val parts       = math.max(1L, total * bytesPerRow / targetBytes).toInt
    df.repartition(parts).write.mode(SaveMode.Overwrite).parquet(outPath)
    total
  }
}
