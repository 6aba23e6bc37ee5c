package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** JSONL corpus ingestion — the de-facto interchange format for LLM
  * training corpora (one JSON document per line). Reads the file as text
  * and parses each line with `from_json` against an explicit schema
  * (never inference — a schema-inference pass over 100 TB is a full
  * extra scan); malformed lines yield a null struct and branch to a
  * corrupt sink with the raw line intact, exactly like the CDC
  * deserialization DLQ (A13) — same null-routing contract, different
  * wire format. (`spark.read.json`'s `_corrupt_record` column is NOT
  * used: Spark rejects queries that filter only that column on a raw
  * file scan unless the parsed result is cached first; the text +
  * `from_json` form keeps single-pass semantics with no cache.)
  *
  * Scale shape: line-delimited text splits on newlines, so a single file
  * parallelizes across tasks (unlike multiline JSON, which is
  * one-task-per-file); gzip inputs should be recompressed to a splittable
  * codec upstream.
  */
object Jsonl {

  /** Read a JSONL path: one row per line, `raw` = the line, `doc` = the
    * parsed struct. Malformed lines set `doc._corrupt_record` (PERMISSIVE
    * `from_json` yields an all-null struct — not a null struct — for bad
    * input, so a plain null check cannot separate them).
    */
  def read(spark: SparkSession, path: String, schema: StructType): DataFrame = {
    val parseSchema = schema.add("_corrupt_record", org.apache.spark.sql.types.StringType)
    spark.read.text(path)
      .select(
        col("value").as("raw"),
        from_json(
          col("value"), parseSchema,
          Map("mode" -> "PERMISSIVE", "columnNameOfCorruptRecord" -> "_corrupt_record")
        ).as("doc")
      )
  }

  /** Branch a JSONL read into (clean, corrupt): clean rows explode the
    * parsed struct to top-level columns; corrupt rows keep only the raw
    * line — the replayable DLQ payload. Both branches filter the same
    * single text scan.
    */
  def branch(df: DataFrame): (DataFrame, DataFrame) = {
    val corruptMark = col("doc").getField("_corrupt_record")
    val clean = df.where(corruptMark.isNull)
      .select(col("doc.*")).drop("_corrupt_record")
    val corrupt = df.where(corruptMark.isNotNull).select(col("raw"))
    (clean, corrupt)
  }
}
