package graft.sources

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Confluent Schema Registry wire format codec (SURVEY.md §7.1 hard spot
  * #1): Kafka values produced through Confluent serializers carry a 5-byte
  * header — magic byte 0x00 + big-endian 4-byte schema id — before the
  * Avro body. Spark's from_avro/to_avro know nothing about it, so Kafka
  * `value` columns must be stripped/framed around the Avro codec.
  *
  * Pure column expressions over BinaryType (substring/concat are
  * binary-safe and codegen'd) — no UDF, no per-row allocation beyond the
  * slice.
  */
object ConfluentWire {

  /** Avro body (bytes 6..) of a well-formed Confluent frame; null for
    * malformed frames (short buffer or wrong magic) — the null then routes
    * to the deserialization DLQ (A13 pattern: PERMISSIVE decode, corrupt
    * rows out-of-band).
    */
  def payload(value: Column): Column =
    when(isWellFormed(value), substring(value, 6, Int.MaxValue))
      .otherwise(lit(null).cast("binary"))

  /** Big-endian schema id (bytes 2..5) or null if malformed. */
  def schemaId(value: Column): Column =
    when(isWellFormed(value), conv(hex(substring(value, 2, 4)), 16, 10).cast("int"))
      .otherwise(lit(null).cast("int"))

  /** Frame check: length >= 5 and magic byte 0x00. */
  def isWellFormed(value: Column): Column =
    value.isNotNull &&
      length(value) >= 5 &&
      substring(value, 1, 1) === lit(Array[Byte](0))

  /** Prepend the 5-byte header to an Avro body for producing. */
  def frame(body: Column, schemaId: Int): Column = {
    val header = Array[Byte](
      0,
      ((schemaId >> 24) & 0xff).toByte,
      ((schemaId >> 16) & 0xff).toByte,
      ((schemaId >> 8) & 0xff).toByte,
      (schemaId & 0xff).toByte
    )
    concat(lit(header), body)
  }
}
