package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** CSV/TSV sidecar ingestion — the metadata-manifest format that rides
  * alongside every large corpus (shard manifests, license tables, URL
  * lists). Same contract as [[Jsonl]], different wire format: read as
  * line-delimited text, parse each line with `from_csv` against an
  * explicit schema (never inference), and route unparseable lines to a
  * corrupt branch with the raw line intact — A13's deserialization-DLQ
  * contract over the CSV wire. Arity is STRICT: a row with the wrong
  * field count is corrupt (from_csv's semantics — right for a typed
  * manifest), where JSONL treats a missing key as a null field.
  *
  * Scale shape: identical to JSONL — newline-split text parallelizes a
  * single file across tasks; the parse is a per-row codegen projection.
  * Embedded-newline CSV (quoted multiline fields) is deliberately out of
  * contract: manifests are written newline-free (the serializer side
  * strips them), keeping the splittable single-pass property — multiline
  * CSV forces one-task-per-file parsing, which is the wrong trade for a
  * sidecar format a 100 TB pipeline controls end-to-end.
  */
object Csv {

  /** Read a CSV path: `raw` = the line, `rec` = the parsed struct with
    * `_corrupt_record` set on malformed lines (same PERMISSIVE pattern as
    * [[Jsonl.read]] — an all-null struct is indistinguishable from a
    * legitimately-null row without the marker column).
    */
  def read(
      spark: SparkSession,
      path: String,
      schema: StructType,
      options: Map[String, String] = Map.empty
  ): DataFrame = {
    val parseSchema = schema.add("_corrupt_record", org.apache.spark.sql.types.StringType)
    spark.read.text(path)
      .select(
        col("value").as("raw"),
        from_csv(
          col("value"), parseSchema,
          options ++ Map("mode" -> "PERMISSIVE", "columnNameOfCorruptRecord" -> "_corrupt_record")
        ).as("rec")
      )
  }

  /** Branch into (clean, corrupt) off the same single text scan. */
  def branch(df: DataFrame): (DataFrame, DataFrame) = {
    val corruptMark = col("rec").getField("_corrupt_record")
    val clean = df.where(corruptMark.isNull)
      .select(col("rec.*")).drop("_corrupt_record")
    val corrupt = df.where(corruptMark.isNotNull).select(col("raw"))
    (clean, corrupt)
  }
}
