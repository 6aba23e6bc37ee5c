package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Every character n-gram of a string, as one array per row, in ONE
  * O(bytes) pass over the UTF-8 buffer (r15).
  *
  * Replaces the `explode(sequence(1, length(s) − n + 1))` +
  * `substring(s, i, n)` shape used by the char-gram family
  * (`text_lm_score`, `text_char_entropy`, `text_kn_continuation`,
  * `text_lm_holdout_ppl`, `text_conditional_entropy`,
  * `text_jsd_sources`): `substring` on a UTF8String must scan from the
  * START of the buffer to find the i-th character's byte offset (UTF-8
  * is variable-width), so per-position substrings cost O(len²) byte
  * scans per document — the same disease `GramHashes` cured for
  * winnowing. Here the per-character byte offsets are computed once and
  * each gram is a byte-range slice.
  *
  * Gram identity is EXACTLY the substring form's: both slice by
  * CODEPOINT positions (Spark's length()/substring() count UTF-8
  * characters), so every downstream count, group key, and join key is
  * unchanged. Callers that relied on substring's end-clamping for
  * short strings (the `greatest(len−1, 1)` + clamp idiom emitting the
  * whole string when len < n) keep that behavior explicitly with
  * `when(length(s) >= n, charNGrams(s, n)).otherwise(array(s))`.
  */
case class CharNGrams(child: Expression, n: Int) extends UnaryExpression {

  require(n >= 1 && n <= 64, s"gram size must be in [1, 64] (got $n)")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_char_ngrams"

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(CharNGrams.grams(input.asInstanceOf[UTF8String], n))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  graft.functions.CharNGrams.grams($c, $n));
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): CharNGrams =
    copy(child = newChild)
}

object CharNGrams {

  /** All n-grams as UTF8String byte-range slices; one pass, no UTF-16
    * round trip. Shared by interpreted eval and codegen.
    */
  def grams(s: UTF8String, n: Int): Array[UTF8String] = {
    val bytes = s.getBytes
    // byte offset of every character start, plus the terminal offset
    val offs = new Array[Int](s.numChars() + 1)
    var i = 0
    var p = 0
    while (p < bytes.length) {
      offs(i) = p
      p += UTF8String.numBytesForFirstByte(bytes(p))
      i += 1
    }
    offs(i) = bytes.length
    val chars = i
    if (chars < n) return Array.empty[UTF8String]
    val out = new Array[UTF8String](chars - n + 1)
    var g = 0
    while (g + n <= chars) {
      out(g) = UTF8String.fromBytes(
        java.util.Arrays.copyOfRange(bytes, offs(g), offs(g + n)))
      g += 1
    }
    out
  }

  /** array<string> of every character n-gram; empty for len < n. */
  def charNGrams(text: Column, n: Int): Column =
    ColumnBridge.column(CharNGrams(ColumnBridge.expression(text), n))
}
