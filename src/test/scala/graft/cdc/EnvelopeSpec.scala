package graft.cdc

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalacheck.{Gen, Prop, Test => PropTest}

import graft.GraftSpecBase

/** A3/A4 envelope semantics (reference: AnimalTransformerStream.java:37,
  * AnimalEnrichmentService.java:38-55): tombstones, deletes and
  * null/zero ids are dropped; everything else passes through unchanged.
  */
class EnvelopeSpec extends GraftSpecBase {

  private val payload = StructType(Seq(
    StructField("id", LongType, nullable = true),
    StructField("name", StringType, nullable = true)
  ))
  private val schema = StructType(Seq(
    StructField("key", StructType(Seq(StructField("id", LongType))), nullable = true),
    StructField("value", Envelope.envelopeSchema(payload), nullable = true)
  ))

  private def mkRow(id: java.lang.Long, tombstone: Boolean, delete: Boolean): Row = {
    val after = if (delete) null else Row(id, s"name-$id")
    val value = if (tombstone) null else Row(null, after, if (delete) "d" else "c", 1000L)
    Row(Row(if (id == null) 0L else id.longValue()), value)
  }

  private def extractIds(rows: Seq[Row]): Seq[Long] = {
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows),
      schema
    )
    Envelope.extractAfter(df).select("id").collect().map(_.getLong(0)).toSeq.sorted
  }

  test("tombstone, delete, null-id and zero-id rows are dropped") {
    val rows = Seq(
      mkRow(1L, tombstone = false, delete = false),  // kept
      mkRow(2L, tombstone = true, delete = false),   // tombstone -> dropped
      mkRow(3L, tombstone = false, delete = true),   // delete -> dropped
      mkRow(null, tombstone = false, delete = false),// null id -> dropped
      mkRow(0L, tombstone = false, delete = false)   // zero id -> dropped
    )
    assert(extractIds(rows) === Seq(1L))
  }

  test("property: extract keeps exactly the valid-id non-tombstone non-delete rows") {
    val genRow: Gen[(java.lang.Long, Boolean, Boolean)] = for {
      id   <- Gen.oneOf(Gen.const(null: java.lang.Long), Gen.choose(0L, 5L).map(Long.box))
      tomb <- Gen.prob(0.2)
      del  <- Gen.prob(0.2)
    } yield (id, tomb, del)

    val prop = Prop.forAll(Gen.listOfN(30, genRow)) { specs =>
      val rows = specs.map { case (id, t, d) => mkRow(id, t, d) }
      val expected = specs.collect {
        case (id, false, false) if id != null && id.longValue() != 0L => id.longValue()
      }.sorted
      extractIds(rows) == expected
    }
    val res = PropTest.check(PropTest.Parameters.default.withMinSuccessfulTests(15), prop)
    assert(res.passed, res.status.toString)
  }

  test("synthesizeFromEvents emits the documented deterministic rule set") {
    val events = graft.Tables.events(spark, sf())
    val env = Envelope.synthesizeFromEvents(events)
    val extracted = Envelope.extractAfter(env)
    val expected = events
      .filter(col("event_id") % 97 =!= 0 && col("event_id") % 89 =!= 0 && col("event_id") % 83 =!= 0)
      .count()
    assert(extracted.count() === expected)
  }
}
