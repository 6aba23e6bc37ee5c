package graft.functions

import java.io.{ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Misra–Gries frequent-items summary as a custom Catalyst aggregate
  * (SURVEY.md §2 B214): k counters per group, one pass, and the classic
  * DETERMINISTIC guarantee that CMS (B208) cannot give — every item with
  * true frequency > n/(k+1) is in the summary, and each kept estimate
  * satisfies `exact − n/(k+1) ≤ est ≤ exact`, with no hash-collision
  * probability involved. The dual of CMS: CMS never undercounts but can
  * overshoot on collisions; MG never overcounts and its undershoot is
  * bounded by construction.
  *
  * Mergeable (Agarwal, Cormode, Huang, Phillips, Wei, Yi — "Mergeable
  * summaries", PODS'12): two k-counter summaries combine by adding
  * counters then subtracting the (k+1)-st largest combined count from
  * every entry and dropping the non-positive ones. The error bound is
  * additive under this merge, so partial summaries built map-side shuffle
  * as k-entry buffers and merge at any tree depth — at 100 TB only
  * k·|groups| counters ever cross the wire, never per-item counts.
  *
  * Order caveat, by design: the summary CONTENT below the guarantee
  * threshold depends on partition/merge order (any MG implementation's
  * does). Deterministic facts — the ones `events_mg_frequent` emits and
  * the oracle checks — are the two theorem clauses above, not the raw
  * counter values. The spec pins both clauses under adversarial orders.
  */
case class MisraGriesLong(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0
) extends TypedImperativeAggregate[java.util.HashMap[Long, Long]] {

  require(k >= 1, s"misra-gries needs k >= 1 counters (got $k)")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean         = false
  override def prettyName: String        = "graft_mg_sketch"

  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("id", LongType), StructField("est", LongType))),
    containsNull = false
  )

  override def createAggregationBuffer(): java.util.HashMap[Long, Long] =
    new java.util.HashMap[Long, Long](k * 2)

  override def update(
      m: java.util.HashMap[Long, Long],
      input: InternalRow
  ): java.util.HashMap[Long, Long] = {
    val v = child.eval(input)
    if (v == null) return m // SQL aggregate convention: nulls don't count
    val id = v.asInstanceOf[Long]
    if (m.containsKey(id)) m.put(id, m.get(id) + 1L)
    else if (m.size() < k) m.put(id, 1L)
    else {
      // no free counter: decrement all k (plus the implicit new item's 1)
      val it = m.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        if (e.getValue == 1L) it.remove() else e.setValue(e.getValue - 1L)
      }
    }
    m
  }

  override def merge(
      m: java.util.HashMap[Long, Long],
      other: java.util.HashMap[Long, Long]
  ): java.util.HashMap[Long, Long] = {
    val it = other.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      if (m.containsKey(e.getKey)) m.put(e.getKey, m.get(e.getKey) + e.getValue)
      else m.put(e.getKey, e.getValue)
    }
    if (m.size() > k) {
      // subtract the (k+1)-st largest combined count from every entry
      val counts = new Array[Long](m.size())
      var i = 0
      val vs = m.values().iterator()
      while (vs.hasNext) { counts(i) = vs.next(); i += 1 }
      java.util.Arrays.sort(counts)
      val cut = counts(m.size() - (k + 1)) // (k+1)-st largest
      val es = m.entrySet().iterator()
      while (es.hasNext) {
        val e = es.next()
        if (e.getValue <= cut) es.remove() else e.setValue(e.getValue - cut)
      }
    }
    m
  }

  override def eval(m: java.util.HashMap[Long, Long]): Any = {
    val entries = new Array[(Long, Long)](m.size())
    var i = 0
    val it = m.entrySet().iterator()
    while (it.hasNext) { val e = it.next(); entries(i) = (e.getKey, e.getValue); i += 1 }
    // stable presentation order: est desc, id asc
    val sorted = entries.sortBy { case (id, est) => (-est, id) }
    new GenericArrayData(sorted.map { case (id, est) =>
      new GenericInternalRow(Array[Any](id, est)): Any
    })
  }

  override def serialize(m: java.util.HashMap[Long, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(m.size())
    val it = m.entrySet().iterator()
    while (it.hasNext) { val e = it.next(); out.writeLong(e.getKey); out.writeLong(e.getValue) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): java.util.HashMap[Long, Long] = {
    val in = new DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val m  = new java.util.HashMap[Long, Long](k * 2)
    val n  = in.readInt()
    var i  = 0
    while (i < n) { m.put(in.readLong(), in.readLong()); i += 1 }
    m
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGriesLong =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGriesLong =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): MisraGriesLong =
    copy(child = newChildren(0))
}

object MisraGries {

  /** array<struct<id,est>> Misra–Gries k-counter summary of the group.
    * Guarantees (any input order, any partitioning):
    * every id with exact count > n/(k+1) appears; est ∈ [exact − n/(k+1), exact].
    */
  def mgSketchLong(item: Column, k: Int): Column =
    ColumnBridge.column(
      MisraGriesLong(ColumnBridge.expression(item), k).toAggregateExpression()
    )
}
