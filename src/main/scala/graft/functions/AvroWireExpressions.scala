package graft.functions

import scala.collection.mutable

import org.apache.avro.Schema
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.avro.io.{BinaryDecoder, BinaryEncoder, DecoderFactory, EncoderFactory}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Catalyst expressions for the Confluent-framed Avro wire codec — the
  * fused replacement for the old `df.rdd.mapPartitions` decode/encode
  * round trip (which broke whole-stage codegen at the codec boundary and
  * forced external Row conversions for every column of every row).
  *
  * As expressions the codec runs INSIDE the scan/project stage: only the
  * value bytes are touched, the surrounding columns stay in Tungsten
  * format, and Catalyst remains free to prune/push around the codec.
  * `CodegenFallback` keeps the project inside one WholeStageCodegen span
  * (the generated code calls `eval` through a reference — fine here, the
  * per-row cost is dominated by actual Avro decode work).
  *
  * The `@transient lazy` reader/writer state reproduces the old
  * per-partition amortization: each task deserializes its own expression
  * instance, so parsed schemas, datum readers (cached per writer-schema
  * id), and decode/encode buffers are built once per task and reused
  * across rows — no per-row Schema.parse, no per-row allocation beyond
  * the output copy.
  */
object AvroWireExpressions {

  private[graft] def structTypeForSchema(schema: Schema): StructType = {
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

  /** Avro value → Catalyst value. */
  private[graft] def toCatalyst(v: Any): Any = v match {
    case null                         => null
    case u: org.apache.avro.util.Utf8 => UTF8String.fromString(u.toString)
    case s: String                    => UTF8String.fromString(s)
    case b: java.nio.ByteBuffer =>
      val arr = new Array[Byte](b.remaining()); b.duplicate().get(arr); arr
    case other => other
  }
}

/** Decode one Confluent frame (magic 0x00 + BE schema id + Avro body) into
  * a struct per `readerSchemaJson`, resolving each frame's writer schema
  * from the (driver-snapshotted, closure-shipped) `schemasById` map with
  * standard Avro schema resolution. Null — never an exception — for
  * malformed frames, unknown ids, or undecodable bodies, so the result
  * composes with the A13 deserialization-DLQ split.
  */
case class AvroDecodeExpr(
    child: Expression,
    schemasById: Map[Int, String],
    readerSchemaJson: String
) extends UnaryExpression with CodegenFallback {

  override def dataType: DataType =
    AvroWireExpressions.structTypeForSchema(new Schema.Parser().parse(readerSchemaJson))
  override def nullable: Boolean  = true
  override def prettyName: String = "graft_avro_decode"

  @transient private lazy val readerSchema = new Schema.Parser().parse(readerSchemaJson)
  @transient private lazy val fieldNames =
    readerSchema.getFields.toArray(Array.empty[Schema.Field]).map(_.name)
  @transient private lazy val readers =
    mutable.Map.empty[Int, GenericDatumReader[GenericRecord]]
  @transient private var binDecoder: BinaryDecoder = null
  @transient private var reuse: GenericRecord      = null

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[Array[Byte]]
    if (bytes.length < 5 || bytes(0) != 0) return null
    val id = ((bytes(1) & 0xff) << 24) | ((bytes(2) & 0xff) << 16) |
      ((bytes(3) & 0xff) << 8) | (bytes(4) & 0xff)
    schemasById.get(id) match {
      case None => null
      case Some(writerJson) =>
        try {
          val reader = readers.getOrElseUpdate(
            id,
            new GenericDatumReader[GenericRecord](new Schema.Parser().parse(writerJson), readerSchema)
          )
          binDecoder = DecoderFactory.get().binaryDecoder(bytes, 5, bytes.length - 5, binDecoder)
          reuse = reader.read(reuse, binDecoder)
          val vals = new Array[Any](fieldNames.length)
          var i    = 0
          while (i < fieldNames.length) {
            vals(i) = AvroWireExpressions.toCatalyst(reuse.get(fieldNames(i)))
            i += 1
          }
          new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(vals)
        } catch { case _: Exception => null }
    }
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Encode a struct into an UNFRAMED Avro body per `schemaJson` (compose
  * with [[graft.sources.ConfluentWire.frame]] for the 5-byte header — the
  * header concat is a plain codegen'd binary expression, so only the body
  * serialization needs this expression). Struct fields must be in the
  * record schema's field order (the [[graft.sources.AvroWire.encodeRows]]
  * wrapper builds the struct that way by name).
  */
case class AvroEncodeExpr(child: Expression, schemaJson: String) extends UnaryExpression
    with CodegenFallback {

  override def dataType: DataType = BinaryType
  override def prettyName: String = "graft_avro_encode"

  @transient private lazy val schema = new Schema.Parser().parse(schemaJson)
  @transient private lazy val fields = schema.getFields.toArray(Array.empty[Schema.Field])
  @transient private lazy val sparkFields =
    child.dataType.asInstanceOf[StructType].fields
  @transient private lazy val writer = new GenericDatumWriter[GenericRecord](schema)
  @transient private lazy val baos   = new java.io.ByteArrayOutputStream()
  @transient private var enc: BinaryEncoder = null

  override def nullSafeEval(input: Any): Any = {
    val row = input.asInstanceOf[InternalRow]
    val rec = new GenericData.Record(schema)
    var i   = 0
    while (i < fields.length) {
      val v: Any =
        if (row.isNullAt(i)) null
        else sparkFields(i).dataType match {
          case StringType => row.getUTF8String(i).toString
          case BinaryType => java.nio.ByteBuffer.wrap(row.getBinary(i))
          case dt         => row.get(i, dt)
        }
      rec.put(fields(i).name, v)
      i += 1
    }
    baos.reset()
    enc = EncoderFactory.get().directBinaryEncoder(baos, enc)
    writer.write(rec, enc)
    enc.flush()
    baos.toByteArray
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
