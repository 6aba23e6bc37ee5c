package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd content-defined chunk boundaries: one pass over a string
  * with a Rabin–Karp rolling hash, emitting every cut position — the
  * g-gram positions whose polynomial hash ≡ 0 (mod `modulus`), shifted
  * by +g to the start of the next chunk.
  *
  * Replaces `text_cdc_chunk_dedup`'s original per-gram
  * `md5(substring(text, p, 8))`: that form explodes one row per
  * position and runs a full md5 (64-byte block setup for an 8-char
  * input, plus hex/conv decoding) per gram — the dominant cost of the
  * whole query. The rolling form is O(1) arithmetic per position inside
  * a fused loop, no explode, no intermediate rows; the explode happens
  * AFTER selection, on the ~chars/64 cut positions instead of every
  * position.
  *
  * Hash domain: Unicode CODE POINTS (matching Spark's and DuckDB's
  * codepoint-based substring/length semantics), base 131, modulus
  * P = 2³¹−1. The per-position value is Σ cp_{p+i}·131^{g−1−i} mod P —
  * an 8-term integer formula an independent engine can evaluate
  * verbatim (the DuckDB oracle does exactly that, non-rolling), so
  * cross-engine parity is preserved while the Spark side pays O(1) per
  * position. All intermediates bounded: h < P ≈ 2.1e9, h·B + cp <
  * 2.9e11, the subtract-leading product < 1.5e14 — no overflow, no
  * BigInt.
  *
  * Content-defined means shift-resistant: the cut decision at p depends
  * only on the g characters at p, so editing a prefix moves earlier
  * cuts but leaves every later cut at the same CONTENT position — the
  * property that makes chunk-level dedup robust to insertions, and the
  * property the spec pins.
  */
case class ChunkCuts(child: Expression, g: Int, modulus: Int) extends UnaryExpression {

  require(g >= 2 && g <= 64, s"gram size must be in [2, 64] (got $g)")
  require(modulus >= 2, s"modulus must be >= 2 (got $modulus)")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_chunk_cuts"

  private val P: Long   = 2147483647L // 2^31 - 1
  private val B: Long   = 131L
  private val BG1: Long = { // B^(g-1) mod P, for removing the leading char
    var acc = 1L
    var i   = 0
    while (i < g - 1) { acc = acc * B % P; i += 1 }
    acc
  }

  override def nullSafeEval(input: Any): Any = {
    val cps = input.asInstanceOf[UTF8String].toString.codePoints().toArray
    val n   = cps.length
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    if (n >= g) {
      var h = 0L
      var i = 0
      while (i < g) { h = (h * B + cps(i)) % P; i += 1 }
      if (h % modulus == 0) out += (1L + g) // cut after the gram at p=1
      var p = 1 // 0-based window start; valid while the window fits
      while (p + g <= n) {
        h = ((h + P - cps(p - 1) * BG1 % P) % P * B + cps(p + g - 1)) % P
        if (h % modulus == 0) out += (p + 1 + g).toLong // 1-based p+g
        p += 1
      }
    }
    new GenericArrayData(out.toArray)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val cps  = ctx.freshName("cps")
      val n    = ctx.freshName("n")
      val h    = ctx.freshName("h")
      val i    = ctx.freshName("i")
      val p    = ctx.freshName("p")
      val out  = ctx.freshName("out")
      val cnt  = ctx.freshName("cnt")
      val arr  = ctx.freshName("arr")
      s"""
         |int[] $cps = $c.toString().codePoints().toArray();
         |int $n = $cps.length;
         |long[] $out = new long[$n >= $g ? $n - $g + 1 : 0];
         |int $cnt = 0;
         |if ($n >= $g) {
         |  long $h = 0L;
         |  for (int $i = 0; $i < $g; $i++) { $h = ($h * ${B}L + $cps[$i]) % ${P}L; }
         |  if ($h % ${modulus}L == 0L) { $out[$cnt++] = ${1L + g}L; }
         |  for (int $p = 1; $p + $g - 1 < $n; $p++) {
         |    $h = (($h + ${P}L - $cps[$p - 1] * ${BG1}L % ${P}L) % ${P}L * ${B}L + $cps[$p + $g - 1]) % ${P}L;
         |    if ($h % ${modulus}L == 0L) { $out[$cnt++] = (long) ($p + 1 + $g); }
         |  }
         |}
         |long[] $arr = java.util.Arrays.copyOf($out, $cnt);
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($arr);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): ChunkCuts =
    copy(child = newChild)
}

object ChunkCuts {

  /** array<long> of 1-based next-chunk start positions for the string. */
  def chunkCuts(text: Column, g: Int, modulus: Int): Column =
    ColumnBridge.column(ChunkCuts(ColumnBridge.expression(text), g, modulus))
}

/** Every g-gram's rolling hash (the same base-131/mod-2³¹−1 polynomial
  * as ChunkCuts), as one array per string — for consumers that need the
  * full per-position hash SEQUENCE (winnowing's window-min selection)
  * rather than just the boundary positions. One O(len) fused pass;
  * the SQL-expression alternative (8 × substring+ascii per position)
  * re-seeks the UTF8String from the start on every call — O(len²) per
  * document, measured as the dominant cost of `text_winnowing_overlap`
  * before this expression existed.
  */
case class GramHashes(child: Expression, g: Int) extends UnaryExpression {

  require(g >= 2 && g <= 64, s"gram size must be in [2, 64] (got $g)")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_gram_hashes"

  private val P: Long   = 2147483647L
  private val B: Long   = 131L
  private val BG1: Long = {
    var acc = 1L
    var i   = 0
    while (i < g - 1) { acc = acc * B % P; i += 1 }
    acc
  }

  override def nullSafeEval(input: Any): Any = {
    val cps = input.asInstanceOf[UTF8String].toString.codePoints().toArray
    val n   = cps.length
    if (n < g) return new GenericArrayData(Array.empty[Long])
    val out = new Array[Long](n - g + 1)
    var h   = 0L
    var i   = 0
    while (i < g) { h = (h * B + cps(i)) % P; i += 1 }
    out(0) = h
    var p = 1
    while (p + g <= n) {
      h = ((h + P - cps(p - 1) * BG1 % P) % P * B + cps(p + g - 1)) % P
      out(p) = h
      p += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val cps = ctx.freshName("cps")
      val n   = ctx.freshName("n")
      val h   = ctx.freshName("h")
      val i   = ctx.freshName("i")
      val p   = ctx.freshName("p")
      val out = ctx.freshName("out")
      s"""
         |int[] $cps = $c.toString().codePoints().toArray();
         |int $n = $cps.length;
         |long[] $out = new long[$n >= $g ? $n - $g + 1 : 0];
         |if ($n >= $g) {
         |  long $h = 0L;
         |  for (int $i = 0; $i < $g; $i++) { $h = ($h * ${B}L + $cps[$i]) % ${P}L; }
         |  $out[0] = $h;
         |  for (int $p = 1; $p + $g <= $n; $p++) {
         |    $h = (($h + ${P}L - $cps[$p - 1] * ${BG1}L % ${P}L) % ${P}L * ${B}L + $cps[$p + $g - 1]) % ${P}L;
         |    $out[$p] = $h;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): GramHashes =
    copy(child = newChild)
}

object GramHashes {

  /** array<long>: the rolling hash of every g-gram, index i = 1-based position i+1. */
  def gramHashes(text: Column, g: Int): Column =
    ColumnBridge.column(GramHashes(ColumnBridge.expression(text), g))
}
