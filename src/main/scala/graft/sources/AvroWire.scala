package graft.sources

import scala.collection.mutable

import org.apache.avro.Schema
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.avro.io.{DecoderFactory, EncoderFactory}
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Schema Registry client surface — the reference's Debezium topics carry
  * Confluent-framed Avro with auto-registered schemas
  * (transformer application.yml:14-16, docker/connect
  * register-connector.json:15-18). The trait is the lookup contract; the
  * in-memory implementation is the no-network stand-in (this sandbox has
  * zero egress) that a thin HTTP client would replace in production.
  *
  * Executors never talk to the registry: callers resolve a driver-side
  * `snapshot` (id → schema JSON) and ship it with the closure — schema-id
  * sets are tiny and bounded, so the broadcast snapshot is the 100 TB
  * shape (no per-executor lookup storms on a cold cache).
  */
trait SchemaRegistryClient {
  /** Register (idempotently) a schema under a subject; returns its id. */
  def register(subject: String, schemaJson: String): Int

  /** Schema JSON by global id. */
  def byId(id: Int): Option[String]

  /** Latest (id, schema JSON) for a subject. */
  def latest(subject: String): Option[(Int, String)]

  /** Immutable id → schema view for shipping to executors. */
  def snapshot: Map[Int, String]
}

/** Deterministic in-memory registry: ids are assigned 1, 2, … in
  * registration order; re-registering an identical (subject, schema) pair
  * returns the existing id, like the Confluent registry's idempotent
  * POST /subjects/…/versions.
  */
final class InMemorySchemaRegistry extends SchemaRegistryClient {
  private val lock                                     = new Object
  private var nextId                                   = 1
  private val byIdMap                                  = mutable.Map.empty[Int, String]
  private val bySubject                                = mutable.Map.empty[String, List[(Int, String)]]
  private def canonical(schemaJson: String): String    = new Schema.Parser().parse(schemaJson).toString

  override def register(subject: String, schemaJson: String): Int = lock.synchronized {
    val c = canonical(schemaJson)
    bySubject.getOrElse(subject, Nil).find(_._2 == c) match {
      case Some((id, _)) => id
      case None =>
        val id = nextId
        nextId += 1
        byIdMap.put(id, c)
        bySubject.put(subject, (id, c) :: bySubject.getOrElse(subject, Nil))
        id
    }
  }

  override def byId(id: Int): Option[String]               = lock.synchronized(byIdMap.get(id))
  override def latest(subject: String): Option[(Int, String)] =
    lock.synchronized(bySubject.get(subject).flatMap(_.headOption))
  override def snapshot: Map[Int, String]                  = lock.synchronized(byIdMap.toMap)
}

/** Confluent-framed Avro ⇆ DataFrame codec over the core Avro library
  * (the spark-avro connector isn't on this classpath; the wire format and
  * resolution rules are Avro's own, so GenericDatumReader/Writer is the
  * same engine spark-avro wraps).
  *
  * Scope: flat record schemas — primitives (boolean/int/long/float/
  * double/string/bytes) and `[null, T]` unions — which covers the CDC
  * envelope and dimension shapes this engine serves. Schema evolution
  * works through standard Avro resolution: each frame's writer schema is
  * looked up by its header id, the caller's reader schema fills defaults
  * for added fields and drops removed ones.
  *
  * Scale shape: one pass per partition, per-partition reader cache keyed
  * by writer-schema id (no per-row Schema.parse), decoder/output buffers
  * reused across rows, corrupt frames routed — never thrown.
  */
object AvroWire {

  /** Spark schema for a flat Avro record schema. */
  def structTypeFor(schemaJson: String): StructType = {
    val schema = new Schema.Parser().parse(schemaJson)
    require(schema.getType == Schema.Type.RECORD, s"record schema required (got ${schema.getType})")
    StructType(schema.getFields.toArray(Array.empty[Schema.Field]).map { f =>
      val (dt, nullable) = fieldType(f.schema)
      StructField(f.name, dt, nullable)
    })
  }

  private def fieldType(s: Schema): (DataType, Boolean) = s.getType match {
    case Schema.Type.UNION =>
      val branches = s.getTypes.toArray(Array.empty[Schema])
      val nonNull  = branches.filter(_.getType != Schema.Type.NULL)
      require(nonNull.length == 1, s"only [null, T] unions supported (got $s)")
      (fieldType(nonNull.head)._1, true)
    case Schema.Type.BOOLEAN => (BooleanType, false)
    case Schema.Type.INT     => (IntegerType, false)
    case Schema.Type.LONG    => (LongType, false)
    case Schema.Type.FLOAT   => (FloatType, false)
    case Schema.Type.DOUBLE  => (DoubleType, false)
    case Schema.Type.STRING  => (StringType, false)
    case Schema.Type.BYTES   => (BinaryType, false)
    case t                   => throw new IllegalArgumentException(s"unsupported avro type $t")
  }

  /** Decode a Confluent-framed Avro column: appends `schema_id`
    * (null on malformed frame) and `outCol` (struct per the reader
    * schema; null when the frame is malformed, the id is unknown to the
    * snapshot, or the body doesn't decode) — nulls compose with the A13
    * deserialization-DLQ split.
    */
  def decodeRows(
      df: DataFrame,
      schemas: Map[Int, String],
      readerSchemaJson: String,
      valueCol: String = "value",
      outCol: String = "decoded"
  ): DataFrame = {
    val readerStruct = structTypeFor(readerSchemaJson)
    val outSchema    = df.schema.add("schema_id", IntegerType).add(outCol, readerStruct)
    val valueIdx     = df.schema.fieldIndex(valueCol)
    val nFields      = readerStruct.length

    val rdd = df.rdd.mapPartitions { it =>
      val readerSchema = new Schema.Parser().parse(readerSchemaJson)
      val fieldNames   = readerSchema.getFields.toArray(Array.empty[Schema.Field]).map(_.name)
      val readers      = mutable.Map.empty[Int, GenericDatumReader[GenericRecord]]
      var binDecoder: org.apache.avro.io.BinaryDecoder = null

      it.map { row =>
        val bytes = row.get(valueIdx).asInstanceOf[Array[Byte]]
        var sid: Any    = null
        var struct: Any = null
        if (bytes != null && bytes.length >= 5 && bytes(0) == 0) {
          val id = ((bytes(1) & 0xff) << 24) | ((bytes(2) & 0xff) << 16) |
            ((bytes(3) & 0xff) << 8) | (bytes(4) & 0xff)
          sid = id
          schemas.get(id).foreach { writerJson =>
            try {
              val reader = readers.getOrElseUpdate(
                id,
                new GenericDatumReader[GenericRecord](
                  new Schema.Parser().parse(writerJson),
                  readerSchema
                )
              )
              binDecoder = DecoderFactory.get()
                .binaryDecoder(bytes, 5, bytes.length - 5, binDecoder)
              val rec  = reader.read(null, binDecoder)
              val vals = new Array[Any](nFields)
              var i    = 0
              while (i < nFields) {
                vals(i) = fromAvro(rec.get(fieldNames(i)))
                i += 1
              }
              struct = Row.fromSeq(vals.toIndexedSeq)
            } catch { case _: Exception => struct = null }
          }
        }
        Row.fromSeq(row.toSeq ++ Seq(sid, struct))
      }
    }
    df.sparkSession.createDataFrame(rdd, outSchema)
  }

  /** Serialize every row into a Confluent-framed Avro body appended as
    * `outCol` (binary). The record's fields are taken from the DataFrame's
    * columns by name; `schemaId` goes into the 5-byte header. The A12
    * typed-sink path: select the framed column as `value` and produce.
    */
  def encodeRows(
      df: DataFrame,
      schemaJson: String,
      schemaId: Int,
      outCol: String = "avro"
  ): DataFrame = {
    val outSchema = df.schema.add(outCol, BinaryType)
    val fieldIdx: Array[Int] = {
      val s = new Schema.Parser().parse(schemaJson)
      s.getFields.toArray(Array.empty[Schema.Field]).map(f => df.schema.fieldIndex(f.name))
    }

    val rdd = df.rdd.mapPartitions { it =>
      val schema = new Schema.Parser().parse(schemaJson)
      val fields = schema.getFields.toArray(Array.empty[Schema.Field])
      val writer = new GenericDatumWriter[GenericRecord](schema)
      val baos   = new java.io.ByteArrayOutputStream()
      var enc: org.apache.avro.io.BinaryEncoder = null

      it.map { row =>
        baos.reset()
        baos.write(0)
        baos.write((schemaId >> 24) & 0xff)
        baos.write((schemaId >> 16) & 0xff)
        baos.write((schemaId >> 8) & 0xff)
        baos.write(schemaId & 0xff)
        enc = EncoderFactory.get().directBinaryEncoder(baos, enc)
        val rec = new GenericData.Record(schema)
        var i   = 0
        while (i < fields.length) {
          val v = if (row.isNullAt(fieldIdx(i))) null else toAvro(row.get(fieldIdx(i)))
          rec.put(fields(i).name, v)
          i += 1
        }
        writer.write(rec, enc)
        enc.flush()
        Row.fromSeq(row.toSeq :+ baos.toByteArray)
      }
    }
    df.sparkSession.createDataFrame(rdd, outSchema)
  }

  private def fromAvro(v: Any): Any = v match {
    case null                     => null
    case u: org.apache.avro.util.Utf8 => u.toString
    case b: java.nio.ByteBuffer =>
      val arr = new Array[Byte](b.remaining()); b.duplicate().get(arr); arr
    case other => other
  }

  private def toAvro(v: Any): Any = v match {
    case b: Array[Byte] => java.nio.ByteBuffer.wrap(b)
    case other          => other
  }

  /** A13 over Avro: decode with the registry snapshot, split valid rows
    * from corrupt/unknown-schema/incomplete ones (which keep their
    * ORIGINAL key/value bytes for the DLQ) — same contract as
    * [[KafkaCdc.decodeOrDlq]] with from_json.
    */
  def decodeOrDlq(
      raw: DataFrame,
      schemas: Map[Int, String],
      readerSchemaJson: String,
      requiredField: String = "id"
  ): (DataFrame, DataFrame) = {
    val withDecoded = decodeRows(raw, schemas, readerSchemaJson)
    val valid = col("decoded").isNotNull && col(s"decoded.$requiredField").isNotNull
    (
      withDecoded.filter(valid).select(col("key"), col("decoded").as("value")),
      withDecoded.filter(!valid).select(col("key"), col("value"))
    )
  }
}
