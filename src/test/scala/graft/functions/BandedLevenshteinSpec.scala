package graft.functions

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

import graft.GraftSpecBase

/** The banded kernel must agree with the full DP wherever the full
  * distance is ≤ k, and clamp to k+1 above — including under common
  * prefix/suffix stripping, unequal lengths, and unicode chars.
  */
class BandedLevenshteinSpec extends GraftSpecBase {

  private def full(a: String, b: String): Int = {
    val dp = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length) {
      val cost = if (a(i - 1) == b(j - 1)) 0 else 1
      dp(i)(j) = math.min(math.min(dp(i - 1)(j) + 1, dp(i)(j - 1) + 1), dp(i - 1)(j - 1) + cost)
    }
    dp(a.length)(b.length)
  }

  private def banded(a: String, b: String, k: Int): Int =
    BandedLevenshtein.compute(UTF8String.fromString(a), UTF8String.fromString(b), k)

  test("agrees with the full DP, clamped at k+1, over a deterministic corpus") {
    val rng = new scala.util.Random(421)
    val alphabet = "abcde"
    val words = Seq.fill(300)((0 to rng.nextInt(12)).map(_ => alphabet(rng.nextInt(5))).mkString)
    for (a <- words.take(60); b <- words.take(60); k <- 0 to 3) {
      val expect = math.min(full(a, b), k + 1)
      assert(banded(a, b, k) === expect, s"a=$a b=$b k=$k")
    }
  }

  test("edge cases: empty strings, equality, affix stripping, unicode") {
    assert(banded("", "", 2) === 0)
    assert(banded("", "abc", 2) === 3)       // clamped: true distance 3 = k+1
    assert(banded("abc", "abc", 0) === 0)
    assert(banded("Customer#000000123", "Customer#000000124", 2) === 1)
    assert(banded("Customer#0000x0123", "Customer#000000123", 2) === 1)
    assert(banded("héllo wörld", "hello wörld", 2) === 1)
    assert(banded("abcdefgh", "hgfedcba", 2) === 3)  // way off → clamp
  }

  test("column form matches built-in levenshtein under the threshold filter") {
    import spark.implicits._
    val df = graft.Tables
      .customer(spark, sf())
      .select(
        col("c_name").as("a"),
        concat(substring(col("c_name"), 1, 10), lit("x"), substring(col("c_name"), 12, 1000)).as("b")
      )
    val cmp = df
      .select(
        levenshtein(col("a"), col("b")).as("exact"),
        BandedLevenshtein.column(col("a"), col("b"), 2).as("band")
      )
      .where(col("exact") <= 2)
      .where(col("exact") =!= col("band"))
    assert(cmp.count() === 0)
    // and the codegen path actually produced values
    val sample = df.select(BandedLevenshtein.column(col("a"), col("b"), 2)).as[Int].head()
    assert(sample === 1)
  }
}
