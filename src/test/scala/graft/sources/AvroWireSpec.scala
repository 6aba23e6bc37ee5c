package graft.sources

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.GraftSpecBase

/** Schema Registry round trip over real Avro bytes: register → encode
  * (Confluent frame) → decode by header id → typed columns, including
  * schema evolution via Avro resolution and corrupt-frame DLQ routing —
  * the full wire path the reference's Debezium topics exercise
  * (register-connector.json auto-registration + transformer SpecificRecord
  * consumption), minus only the HTTP transport.
  */
class AvroWireSpec extends GraftSpecBase {
  import spark.implicits._

  private val v1 =
    """{"type":"record","name":"Animal","fields":[
      |  {"name":"id","type":"long"},
      |  {"name":"name","type":["null","string"],"default":null}
      |]}""".stripMargin

  private val v2 =
    """{"type":"record","name":"Animal","fields":[
      |  {"name":"id","type":"long"},
      |  {"name":"name","type":["null","string"],"default":null},
      |  {"name":"color","type":"string","default":"unknown"}
      |]}""".stripMargin

  test("structTypeFor maps flat record schemas with nullable unions") {
    assert(AvroWire.structTypeFor(v1) === StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("name", StringType, nullable = true)
    )))
  }

  test("registry assigns deterministic idempotent ids and tracks latest") {
    val reg = new InMemorySchemaRegistry
    val id1 = reg.register("animals-value", v1)
    assert(reg.register("animals-value", v1) === id1)   // idempotent
    val id2 = reg.register("animals-value", v2)
    assert(id2 !== id1)
    assert(reg.latest("animals-value").map(_._1) === Some(id2))
    assert(reg.byId(id1).isDefined && reg.snapshot.keySet === Set(id1, id2))
  }

  test("encode → decode round-trips through the Confluent frame") {
    val reg = new InMemorySchemaRegistry
    val id1 = reg.register("animals-value", v1)
    val df  = Seq((1L, "Buddy"), (2L, "Rex")).toDF("id", "name")
    val encoded = AvroWire.encodeRows(df, v1, id1)
      .select(col("id").cast("string").cast("binary").as("key"), col("avro").as("value"))
    val decoded = AvroWire.decodeRows(encoded, reg.snapshot, v1)
    val out = decoded.select("schema_id", "decoded.id", "decoded.name")
      .as[(Int, Long, String)].collect().toSet
    assert(out === Set((id1, 1L, "Buddy"), (id1, 2L, "Rex")))
  }

  test("schema evolution: v1-written frames resolve through a v2 reader") {
    val reg = new InMemorySchemaRegistry
    val id1 = reg.register("animals-value", v1)
    val id2 = reg.register("animals-value", v2)
    val old = AvroWire.encodeRows(Seq((1L, "Buddy")).toDF("id", "name"), v1, id1)
      .select(lit(null).cast("binary").as("key"), col("avro").as("value"))
    val neu = AvroWire.encodeRows(
      Seq((2L, "Rex", "brown")).toDF("id", "name", "color"), v2, id2
    ).select(lit(null).cast("binary").as("key"), col("avro").as("value"))
    val (_, readerJson) = reg.latest("animals-value").get
    val out = AvroWire.decodeRows(old.unionByName(neu), reg.snapshot, readerJson)
      .select("decoded.id", "decoded.name", "decoded.color")
      .as[(Long, String, String)].collect().toSet
    // the v1 frame fills v2's added field from its default
    assert(out === Set((1L, "Buddy", "unknown"), (2L, "Rex", "brown")))
  }

  test("round-trip property: random flat schemas and values survive encode→decode") {
    import org.scalacheck.{Gen, Test => SCTest}
    import org.scalacheck.Prop.forAll

    val fieldGen = for {
      t  <- Gen.oneOf("long", "int", "string", "double", "boolean", "float")
      nu <- Gen.oneOf(true, false)
    } yield (t, nu)
    val schemaGen = for {
      n  <- Gen.chooseNum(1, 5)
      fs <- Gen.listOfN(n, fieldGen)
    } yield fs.zipWithIndex.map { case ((t, nu), i) => (s"f$i", t, nu) }

    def valueGen(t: String, nullable: Boolean): Gen[Any] = {
      val base: Gen[Any] = t match {
        case "long"    => Gen.chooseNum(Long.MinValue, Long.MaxValue)
        case "int"     => Gen.chooseNum(Int.MinValue, Int.MaxValue)
        case "string"  => Gen.alphaNumStr
        case "double"  => Gen.chooseNum(-1e6, 1e6) // finite: NaN breaks equality, not the codec
        case "float"   => Gen.chooseNum(-1e6f, 1e6f)
        case "boolean" => Gen.oneOf(true, false)
      }
      if (nullable) Gen.frequency(3 -> base, 1 -> Gen.const(null)) else base
    }

    val caseGen = for {
      fields <- schemaGen
      nRows  <- Gen.chooseNum(1, 8)
      rows   <- Gen.listOfN(nRows, Gen.sequence[List[Any], Any](fields.map { case (_, t, nu) => valueGen(t, nu) }))
    } yield (fields, rows)

    val prop = forAll(caseGen) { case (fields, rows) =>
      val avroFields = fields.map { case (name, t, nu) =>
        if (nu) s"""{"name":"$name","type":["null","$t"],"default":null}"""
        else s"""{"name":"$name","type":"$t"}"""
      }.mkString(",")
      val schemaJson = s"""{"type":"record","name":"R","fields":[$avroFields]}"""
      val structType = AvroWire.structTypeFor(schemaJson)
      val df = spark.createDataFrame(
        spark.sparkContext.parallelize(rows.map(org.apache.spark.sql.Row.fromSeq), 2),
        structType
      )
      val reg = new InMemorySchemaRegistry
      val id  = reg.register("r-value", schemaJson)
      val enc = AvroWire.encodeRows(df, schemaJson, id)
        .select(lit(null).cast("binary").as("key"), col("avro").as("value"))
      val got = AvroWire.decodeRows(enc, reg.snapshot, schemaJson)
        .select("decoded.*").collect().map(_.toSeq).toSet
      got == rows.map(r => r.toSeq: Seq[Any]).toSet
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(15), prop)
    assert(res.passed, res.status.toString)
  }

  test("corrupt frames, unknown ids and incomplete records route to the DLQ") {
    val reg = new InMemorySchemaRegistry
    val id1 = reg.register("animals-value", v1)
    val good = AvroWire.encodeRows(Seq((7L, "Ok")).toDF("id", "name"), v1, id1)
      .select(lit("k1").cast("binary").as("key"), col("avro").as("value"))
    val badMagic  = Seq(("k2", Array[Byte](1, 0, 0, 0, 1, 42))).toDF("key", "value")
      .select(col("key").cast("binary"), col("value"))
    val unknownId = Seq(("k3", Array[Byte](0, 0, 0, 3, 57, 2))).toDF("key", "value")
      .select(col("key").cast("binary"), col("value"))
    val short     = Seq(("k4", Array[Byte](0, 0))).toDF("key", "value")
      .select(col("key").cast("binary"), col("value"))
    val all = good.unionByName(badMagic).unionByName(unknownId).unionByName(short)
    val (ok, dlq) = AvroWire.decodeOrDlq(all, reg.snapshot, v1)
    assert(ok.select("value.id").as[Long].collect().toSeq === Seq(7L))
    assert(dlq.select(col("key").cast("string")).as[String].collect().toSet ===
      Set("k2", "k3", "k4"))
    // DLQ rows keep their ORIGINAL bytes for replay
    assert(dlq.filter(col("key").cast("string") === "k2")
      .select("value").head.getAs[Array[Byte]](0).toSeq === Seq[Byte](1, 0, 0, 0, 1, 42))
  }
}
