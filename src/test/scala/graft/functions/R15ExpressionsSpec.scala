package graft.functions

import org.apache.spark.sql.functions._
import org.apache.spark.sql.Row

import graft.GraftSpecBase

/** Pins the r15 optimization expressions to the SQL shapes they
  * replaced: `CharNGrams` must emit exactly the
  * `explode(sequence) + substring(s, i, n)` gram stream (codepoint
  * slicing, order included), and `ByteEntropyStats` must emit exactly
  * the hex-explode → (doc, byte) count → round-6/micro entropy chain.
  * Both comparisons run THROUGH Spark so codegen paths are exercised.
  */
class R15ExpressionsSpec extends GraftSpecBase {

  private val texts = Seq(
    "",                       // empty: no grams
    "a",                      // shorter than n
    "ab",
    "abc",
    "the quick brown fox jumps over the lazy dog",
    "aaa aaa aaa",            // repeats: duplicate grams must all appear
    "naïve café — über",      // multi-byte UTF-8
    "𝄞 clef 𝄢 and αβγδ",      // supplementary-plane codepoints
    "x" * 500                 // long run
  )

  private def gramsVia(expr2: String, n: Int): Seq[(Int, Seq[String])] = {
    import spark.implicits._
    texts.zipWithIndex.map { case (t, i) => (i, t) }.toDF("id", "s")
      .where(length(col("s")) >= n)
      .select(col("id"), explode(org.apache.spark.sql.functions.expr(expr2)).as("g"))
      .groupBy(col("id")).agg(collect_list(col("g")).as("gs"))
      .collect().map(r => (r.getInt(0), r.getSeq[String](1).toSeq)).sortBy(_._1).toSeq
  }

  private def gramsViaCharNGrams(n: Int): Seq[(Int, Seq[String])] = {
    import spark.implicits._
    texts.zipWithIndex.map { case (t, i) => (i, t) }.toDF("id", "s")
      .where(length(col("s")) >= n)
      .select(col("id"), explode(CharNGrams.charNGrams(col("s"), n)).as("g"))
      .groupBy(col("id")).agg(collect_list(col("g")).as("gs"))
      .collect().map(r => (r.getInt(0), r.getSeq[String](1).toSeq)).sortBy(_._1).toSeq
  }

  test("CharNGrams equals the sequence+substring gram stream for n = 1, 2, 3, 8") {
    for (n <- Seq(1, 2, 3, 8)) {
      val legacy = gramsVia(
        s"transform(sequence(1, length(s) - ${n - 1}), i -> substring(s, i, $n))", n)
      val fast = gramsViaCharNGrams(n)
      assert(fast === legacy, s"n=$n")
    }
  }

  test("CharNGrams: empty for len < n; whole-string fallback idiom matches substring clamp") {
    import spark.implicits._
    val rows = Seq("", "a", "ab").toDF("s")
      .select(
        col("s"),
        explode(
          when(length(col("s")) >= 2, CharNGrams.charNGrams(col("s"), 2))
            .otherwise(array(col("s")))).as("b"))
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    // substr(s, 1, 2) clamps: "" -> "", "a" -> "a", "ab" -> "ab"
    assert(rows === Seq(("", ""), ("a", "a"), ("ab", "ab")))
  }

  test("ByteEntropyStats equals the hex-explode entropy chain; null for empty/null") {
    import spark.implicits._
    val payloads: Seq[Array[Byte]] = Seq(
      Array[Byte](0),
      Array[Byte](0, 0, 0, 0),
      Array[Byte](1, 2, 3, 4, 5),
      Array.tabulate(256)(_.toByte),                       // uniform: H = ln 256
      Array.fill(64)(42.toByte),                           // constant: H = 0
      "the quick brown fox".getBytes("UTF-8"),
      Array.tabulate(1000)(i => (i * 31 + 7).toByte),
      Array[Byte](-1, -128, 127, 0, -1, -1)                // sign-bit bytes → 0..255
    )
    val df = payloads.zipWithIndex.map { case (p, i) => (i, p) }.toDF("id", "payload")

    val legacy = df
      .select(col("id"), expr("hex(payload)").as("hx"))
      .where(length(col("hx")) >= 2)
      .select(col("id"),
        explode(expr(
          "transform(sequence(1, length(hx) div 2), i -> CAST(conv(substring(hx, 2 * i - 1, 2), 16, 10) AS BIGINT))"))
          .as("byte"))
      .groupBy(col("id"), col("byte")).agg(count(lit(1)).as("c"))
      .groupBy(col("id"))
      .agg(sum(col("c")).as("n"),
        sum(expr("CAST(c AS DOUBLE) * ln(CAST(c AS DOUBLE))")).as("clnc"))
      .select(col("id"), col("n"),
        expr("CAST(round(round(ln(CAST(n AS DOUBLE)) - clnc / CAST(n AS DOUBLE), 6) * 1000000, 0) AS BIGINT)")
          .as("h_micro"))
      .collect().map(r => (r.getInt(0), (r.getLong(1), r.getLong(2)))).toMap

    val fast = df
      .select(col("id"), ByteEntropyStats.byteEntropyStats(col("payload")).as("st"))
      .where(col("st").isNotNull)
      .select(col("id"), col("st.n"), col("st.h_micro"))
      .collect().map(r => (r.getInt(0), (r.getLong(1), r.getLong(2)))).toMap

    assert(fast === legacy)

    // null / empty payloads yield a null struct (the old WHERE dropped them)
    val nulls = Seq((0, Array.emptyByteArray), (1, null.asInstanceOf[Array[Byte]]))
      .toDF("id", "payload")
      .select(ByteEntropyStats.byteEntropyStats(col("payload")).as("st"))
      .collect().map(_.isNullAt(0)).toSeq
    assert(nulls === Seq(true, true))
  }

  test("ByteEntropyStats known values: constant payload H=0, uniform 256 H=ln(256)") {
    val zero = ByteEntropyStats.hMicro(Array.fill(64)(7.toByte))
    assert(zero === 0L)
    val uni = ByteEntropyStats.hMicro(Array.tabulate(256)(_.toByte))
    // ln(256) = 5.545177444..., round-6 → 5.545177 → 5545177 micro-nats
    assert(uni === 5545177L)
  }
}
