package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated parquet tables (TESTDATA.md).
  *
  * Filters/projections applied by callers push down to the parquet scan —
  * loaders deliberately do nothing beyond `spark.read.parquet` so Catalyst
  * sees the raw relation.
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(spark: SparkSession, dir: String): DataFrame     = table(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame     = table(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame   = table(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame   = table(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame       = table(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame     = table(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame   = table(spark, dir, "lineitem")
  /** events.ts has shipped as TIMESTAMP(NANOS) (readable only as a raw
    * long via spark.sql.legacy.parquet.nanosAsLong) in some fixture
    * generations and TIMESTAMP(MICROS) in others — adapt on the observed
    * schema so both load identically:
    *  - long  → epoch-nanos: integer-divide to micros (`div`, not `/`,
    *    since epoch-nanos exceed double's 2^53 exact-integer range);
    *  - timestamp/timestamp_ntz → already micros; cast unifies NTZ to
    *    TimestampType under the UTC session (a no-op re-interpretation).
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    val raw = table(spark, dir, "events")
    raw.schema("ts").dataType match {
      case LongType => raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampType | TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast("timestamp"))
      case other =>
        throw new IllegalStateException(
          s"events.ts has unsupported type $other — expected LongType (nanos " +
            "fixture generation) or Timestamp[NTZ]Type (micros generation); " +
            "a malformed fixture must fail loudly, not load as nulls")
    }
  }
  def documents(spark: SparkSession, dir: String): DataFrame  = table(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "embeddings")
}
