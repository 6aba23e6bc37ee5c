package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Per-payload byte-entropy stats in ONE fused pass over the bytes:
  * returns struct<n: bigint, h_micro: bigint> where n is the byte count
  * and h_micro the Shannon entropy in micro-nats, assembled EXACTLY like
  * the SQL form it replaces (B264, `mm_payload_entropy`):
  *
  *   h_micro = CAST(round(round(ln(n) − Σ c·ln(c)/n, 6) · 10⁶, 0) AS BIGINT)
  *
  * with c the per-byte-value counts. Each rounding step reproduces
  * Spark's `Round` on DoubleType (java BigDecimal.valueOf → setScale
  * HALF_UP → toDouble), so the emitted value is bit-identical to the
  * expression chain the query previously built.
  *
  * Why it exists (r15 optimization): the original plan materialized
  * hex(payload), built a transform() array of n/2 BIGINTs via
  * substring+conv PER BYTE, exploded to one row per byte, and hash-
  * aggregated (doc, byte) before a second per-doc aggregate — the
  * per-byte explode was the dominant cost of the whole query (4.2 s of
  * the r14 sf0.1 bench, the #2 query overall). This expression does the
  * same counting in a long[256] with zero per-byte allocation, the doc's
  * row count never expands, and the only exchange left in the query is
  * the ≤(sources × 2)-row rollup.
  *
  * Σ c·ln(c) is summed in ascending byte-value order — a fixed order,
  * where the old double-sum aggregate's order was partition-dependent;
  * both land on the same round-6 grid (≤256 doubles, relative error
  * ~1e-15 vs the 5e-7 grid step), which is the query's documented
  * determinism argument. Null/empty payloads return null, mirroring the
  * old `WHERE length(hex) >= 2` pre-explode drop.
  */
case class ByteEntropyStats(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("n", LongType, nullable = false),
    StructField("h_micro", LongType, nullable = false)))

  override def nullable: Boolean  = true
  override def prettyName: String = "graft_byte_entropy"

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[Array[Byte]]
    if (bytes.isEmpty) null
    else InternalRow(bytes.length.toLong, ByteEntropyStats.hMicro(bytes))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |if ($c.length == 0) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
         |    new Object[] { (long) $c.length, graft.functions.ByteEntropyStats.hMicro($c) });
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): ByteEntropyStats =
    copy(child = newChild)
}

object ByteEntropyStats {

  /** The exact micro-nat entropy the SQL chain produced; see class doc. */
  def hMicro(bytes: Array[Byte]): Long = {
    val cnt = new Array[Long](256)
    var i   = 0
    while (i < bytes.length) { cnt(bytes(i) & 0xff) += 1; i += 1 }
    val n    = bytes.length.toDouble
    var clnc = 0.0
    var b    = 0
    while (b < 256) {
      val c = cnt(b)
      if (c > 0) clnc += c.toDouble * math.log(c.toDouble)
      b += 1
    }
    val h  = math.log(n) - clnc / n
    val r6 = java.math.BigDecimal.valueOf(h)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    val r0 = java.math.BigDecimal.valueOf(r6 * 1000000.0)
      .setScale(0, java.math.RoundingMode.HALF_UP).doubleValue()
    r0.toLong
  }

  /** struct<n, h_micro> of a binary column's byte entropy; null for null/empty. */
  def byteEntropyStats(payload: Column): Column =
    ColumnBridge.column(ByteEntropyStats(ColumnBridge.expression(payload)))
}
