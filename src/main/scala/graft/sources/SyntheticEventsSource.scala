package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{Filter, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** A DataSource V2 `TableProvider` that GENERATES the deterministic events
  * stream instead of reading it from parquet — the load-generator /
  * backfill source a pipeline uses for soak tests and replay rehearsals,
  * implemented on the real connector API so the optimizer treats it like
  * any other table:
  *
  *  - **column pruning** (`SupportsPushDownRequiredColumns`): a query
  *    projecting two columns generates only those two — visible as
  *    `ReadSchema` in the scan node;
  *  - **filter pushdown** (`SupportsPushDownFilters`): range predicates on
  *    `event_id` narrow the generated id range BEFORE partitions are
  *    planned, so `WHERE event_id < 1000` over a nominal 10⁹-row table
  *    plans only the partitions covering [0, 1000) — generator-side
  *    partition pruning, the DSv2 analogue of parquet row-group pruning;
  *  - rows are a pure function of `event_id` (the md5-free integer mix
  *    keeps generation codegen-cheap), so any two reads — any partition
  *    count, any pushdown — agree bit-for-bit.
  *
  * Usage: `spark.read.format("graft-synthetic-events")
  * .option("rows", n).option("users", k).option("partitions", p).load()`.
  *
  * Scale shape: planning is O(partitions); each `PartitionReader` streams
  * its id sub-range with O(1) state — a 10⁹-row soak generates with zero
  * shuffle and zero driver memory.
  */
class SyntheticEventsSource extends TableProvider with org.apache.spark.sql.sources.DataSourceRegister {

  override def shortName(): String = "graft-synthetic-events"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    SyntheticEventsSource.Schema

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]
  ): Table = new SyntheticEventsTable(new CaseInsensitiveStringMap(properties))
}

object SyntheticEventsSource {
  val Schema: StructType = StructType(Seq(
    StructField("event_id", LongType, nullable = false),
    StructField("ts", TimestampType, nullable = false),
    StructField("user_id", LongType, nullable = false),
    StructField("event_type", StringType, nullable = false),
    StructField("value", DoubleType, nullable = false)
  ))

  val EventTypes: Array[String] = Array("view", "click", "purchase", "signup", "error")

  /** Fixture epoch: 2024-01-01T00:00:00Z in micros. */
  val EpochUs: Long = 1704067200000000L

  /** Deterministic 64-bit integer mix (splitmix64 finalizer — public
    * domain constant set), the per-field value seed.
    */
  def mix(x: Long): Long = {
    var z = x + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }
}

private class SyntheticEventsTable(options: CaseInsensitiveStringMap)
    extends Table with SupportsRead {
  private val rows     = options.getLong("rows", 1000L)
  private val users    = options.getLong("users", 100L)
  private val parts    = options.getInt("partitions", 8)
  private val perBatch = options.getLong("rowsPerBatch", 1000L)

  override def name(): String = s"graft_synthetic_events($rows)"
  override def schema(): StructType = SyntheticEventsSource.Schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ).asJava

  override def newScanBuilder(o: CaseInsensitiveStringMap): ScanBuilder =
    new SyntheticScanBuilder(rows, users, parts, perBatch)
}

private class SyntheticScanBuilder(rows: Long, users: Long, parts: Int, perBatch: Long)
    extends ScanBuilder
    with SupportsPushDownRequiredColumns
    with SupportsPushDownFilters {

  private var schema: StructType  = SyntheticEventsSource.Schema
  private var lo: Long            = 0L
  private var hi: Long            = rows // exclusive
  private var pushed: Array[Filter] = Array.empty

  override def pruneColumns(requiredSchema: StructType): Unit =
    // keep the source's field order; an empty projection (count(*)) is legal
    schema = StructType(
      SyntheticEventsSource.Schema.fields.filter(f => requiredSchema.fieldNames.contains(f.name))
    )

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (accepted, rejected) = filters.partition {
      case GreaterThan("event_id", v: Long)        => { lo = math.max(lo, v + 1); true }
      case GreaterThanOrEqual("event_id", v: Long) => { lo = math.max(lo, v); true }
      case LessThan("event_id", v: Long)           => { hi = math.min(hi, v); true }
      case LessThanOrEqual("event_id", v: Long)    => { hi = math.min(hi, v + 1); true }
      case _                                       => false
    }
    pushed = accepted
    rejected
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan =
    new SyntheticScan(schema, lo, math.max(lo, hi), users, parts, rows, perBatch)
}

private class SyntheticScan(
    schema: StructType, lo: Long, hi: Long, users: Long, parts: Int, totalRows: Long,
    perBatch: Long)
    extends Scan with Batch {
  override def readSchema(): StructType = schema
  override def toBatch: Batch = this

  /** Streaming read: the same deterministic generator exposed as a
    * MicroBatchStream — offsets are plain row positions, each trigger
    * advances by `rowsPerBatch` until the nominal row count is exhausted
    * (a bounded soak stream; an unbounded one sets rows very high). The
    * generator is a pure function of event_id, so recovery from any
    * committed offset replays identical rows — exactly-once without a
    * write-ahead log.
    */
  override def toMicroBatchStream(checkpointLocation: String): streaming.MicroBatchStream =
    new streaming.MicroBatchStream
      with org.apache.spark.sql.connector.read.streaming.SupportsTriggerAvailableNow {
      import org.apache.spark.sql.connector.read.streaming.{Offset => SOffset}
      private var cur: Long = lo
      // Trigger.AvailableNow support: WITHOUT this interface the engine
      // "falls back to single batch execution" (one giant batch covering
      // the whole id range — the r12 SoakSpec caught it), which defeats
      // both the rowsPerBatch soak contract and the bounded-memory point
      // of micro-batching. The engine calls prepareForTriggerAvailableNow
      // once at start; we pin the drain target to the full remaining
      // range, and latestOffset keeps advancing by rowsPerBatch until it
      // reaches it — so AvailableNow drains EVERYTHING available at
      // start, in bounded chunks, then terminates (the Kafka source's
      // exact semantics).
      private var availableNowEnd: Option[Long] = None
      override def prepareForTriggerAvailableNow(): Unit = availableNowEnd = Some(hi)
      override def reportLatestOffset(): SOffset = SyntheticOffset(availableNowEnd.getOrElse(hi))
      override def initialOffset(): SOffset = SyntheticOffset(lo)
      // SupportsTriggerAvailableNow extends SupportsAdmissionControl, so
      // the engine calls the 2-arg form; rowsPerBatch is the default read
      // limit (the generator's admission-control contract)
      override def getDefaultReadLimit
          : org.apache.spark.sql.connector.read.streaming.ReadLimit =
        org.apache.spark.sql.connector.read.streaming.ReadLimit.maxRows(math.max(1L, perBatch))
      override def latestOffset(
          start: SOffset,
          limit: org.apache.spark.sql.connector.read.streaming.ReadLimit): SOffset = {
        val target = availableNowEnd.getOrElse(hi)
        val step = limit match {
          case r: org.apache.spark.sql.connector.read.streaming.ReadMaxRows => r.maxRows()
          case _                                                            => math.max(1L, perBatch)
        }
        cur = math.min(target, start.asInstanceOf[SyntheticOffset].pos + step)
        SyntheticOffset(cur)
      }
      override def latestOffset(): SOffset = {
        val target = availableNowEnd.getOrElse(hi)
        cur = math.min(target, cur + math.max(1L, perBatch))
        SyntheticOffset(cur)
      }
      override def deserializeOffset(json: String): SOffset = {
        val p = json.toLong
        if (p > cur) cur = p
        SyntheticOffset(p)
      }
      override def commit(end: SOffset): Unit = ()
      override def stop(): Unit = ()
      override def planInputPartitions(start: SOffset, end: SOffset): Array[InputPartition] = {
        val a = start.asInstanceOf[SyntheticOffset].pos
        val b = end.asInstanceOf[SyntheticOffset].pos
        val n = b - a
        val nPart = if (n <= 0) 0 else math.min(parts.toLong, n).toInt
        (0 until nPart).map { i =>
          SyntheticRange(a + n * i / nPart, a + n * (i + 1) / nPart, users): InputPartition
        }.toArray
      }
      override def createReaderFactory(): PartitionReaderFactory =
        new SyntheticReaderFactory(schema)
    }

  override def planInputPartitions(): Array[InputPartition] = {
    val n = hi - lo
    // prorate the nominal partition count to the pushed-down range — the
    // generator-side analogue of partition pruning: a narrow id filter
    // over a huge nominal table plans a handful of partitions
    val prorated = if (totalRows <= 0) parts.toLong else math.max(1L, parts.toLong * n / totalRows)
    val nPart    = if (n <= 0) 0 else math.min(math.min(prorated, parts.toLong), n).toInt
    (0 until nPart).map { i =>
      val a = lo + n * i / nPart
      val b = lo + n * (i + 1) / nPart
      SyntheticRange(a, b, users): InputPartition
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = new SyntheticReaderFactory(schema)
}

private case class SyntheticRange(lo: Long, hi: Long, users: Long) extends InputPartition

private case class SyntheticOffset(pos: Long)
    extends org.apache.spark.sql.connector.read.streaming.Offset {
  override def json(): String = pos.toString
}

private class SyntheticReaderFactory(schema: StructType) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[SyntheticRange]
    new PartitionReader[InternalRow] {
      import SyntheticEventsSource._
      private var id                = p.lo - 1
      private val fieldGen: Array[Long => Any] = schema.fields.map { f =>
        f.name match {
          case "event_id"   => (i: Long) => i
          case "ts"         => (i: Long) => EpochUs + i * 1000000L + (mix(i) & 0xffffL)
          case "user_id"    => (i: Long) => java.lang.Math.floorMod(mix(i * 31 + 7), p.users)
          case "event_type" => (i: Long) =>
            UTF8String.fromString(EventTypes(java.lang.Math.floorMod(mix(i * 17 + 3), EventTypes.length.toLong).toInt))
          case "value"      => (i: Long) => java.lang.Math.floorMod(mix(i * 13 + 11), 10000L) / 100.0
        }
      }
      override def next(): Boolean = { id += 1; id < p.hi }
      override def get(): InternalRow = InternalRow.fromSeq(fieldGen.map(g => g(id)).toIndexedSeq)
      override def close(): Unit = ()
    }
  }
}
