package graft.functions

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Test => SCTest}
import org.scalacheck.Prop.forAll

import graft.GraftSpecBase

/** The rolling-hash chunk boundary expression: bit-parity with the
  * non-rolling 8-term polynomial (the form the DuckDB oracle runs),
  * interpreted-vs-codegen agreement, shift-resistance (the
  * content-defined property), and edge cases.
  */
class ChunkCutsSpec extends GraftSpecBase {
  import spark.implicits._

  private val P = 2147483647L
  private val B = 131L

  /** Non-rolling reference: hash every window independently. */
  private def refCuts(s: String, g: Int, m: Int): Seq[Long] = {
    val cps = s.codePoints().toArray
    (0 to cps.length - g).flatMap { p =>
      var h = 0L
      var i = 0
      while (i < g) { h = (h * B + cps(p + i)) % P; i += 1 }
      if (h % m == 0) Some((p + 1 + g).toLong) else None
    }
  }

  private def viaExpr(texts: Seq[String], g: Int, m: Int): Seq[Seq[Long]] = {
    val out = texts.toDF("t")
      .select(ChunkCuts.chunkCuts(col("t"), g, m).as("cuts"))
      .as[Seq[Long]]
      .collect()
      .toSeq
    out
  }

  test("matches the non-rolling polynomial on fixture documents") {
    val texts = graft.Tables.documents(spark, sf())
      .select(col("text")).as[String].take(50).toSeq
    val got = viaExpr(texts, 8, 64)
    texts.zip(got).foreach { case (t, cuts) =>
      assert(cuts === refCuts(t, 8, 64), s"mismatch for doc of length ${t.length}")
    }
  }

  test("property: rolling == non-rolling for random strings, g, and modulus") {
    val gen = for {
      g <- Gen.choose(2, 12)
      m <- Gen.oneOf(2, 16, 64, 101)
      s <- Gen.listOfN(120, Gen.alphaNumChar).map(_.mkString)
    } yield (g, m, s)
    val r = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(12),
      forAll(gen) { case (g, m, s) =>
        viaExpr(Seq(s), g, m).head == refCuts(s, g, m)
      }
    )
    assert(r.passed, r.status.toString)
  }

  test("shift-resistance: cuts after an inserted prefix land at the same content positions") {
    val body   = "the quick brown fox jumps over the lazy dog, again and again and again, for many pages of text"
    val prefix = "INSERTED HEADER LINE !!! "
    val a = viaExpr(Seq(body), 8, 16).head
    val b = viaExpr(Seq(prefix + body), 8, 16).head
    // every cut of the original body must reappear shifted by the prefix
    // length (cuts inside the first window of the joined region may differ)
    val shifted = b.map(_ - prefix.length).filter(_ > 8)
    a.filter(_ > 8).foreach { cut =>
      assert(shifted.contains(cut), s"cut $cut lost after prefix insertion")
    }
  }

  test("GramHashes: rolling sequence matches per-window recomputation, incl. edge cases") {
    val texts = graft.Tables.documents(spark, sf())
      .select(col("text")).as[String].take(20).toSeq ++ Seq("", "short", "exactly8")
    val got = texts.toDF("t")
      .select(GramHashes.gramHashes(col("t"), 8).as("hs"))
      .as[Seq[Long]].collect().toSeq
    texts.zip(got).foreach { case (t, hs) =>
      val cps = t.codePoints().toArray
      val ref = (0 to cps.length - 8).map { p =>
        var h = 0L; var i = 0
        while (i < 8) { h = (h * B + cps(p + i)) % P; i += 1 }
        h
      }
      assert(hs === ref, s"gram hash mismatch for '${t.take(20)}...'")
    }
  }

  test("SQL front door: graft_chunk_cuts and graft_gram_hashes registered") {
    Seq("the quick brown fox jumps over the lazy dog").toDF("t").createOrReplaceTempView("cc_in")
    val cuts = spark.sql("SELECT graft_chunk_cuts(t, 8, 4) AS c FROM cc_in")
      .as[Seq[Long]].head()
    assert(cuts === refCuts("the quick brown fox jumps over the lazy dog", 8, 4))
    val nHashes = spark.sql("SELECT size(graft_gram_hashes(t, 8)) FROM cc_in").as[Int].head()
    assert(nHashes === "the quick brown fox jumps over the lazy dog".length - 7)
  }

  test("edge cases: short and empty strings cut nowhere; null propagates") {
    assert(viaExpr(Seq("", "short"), 8, 64) === Seq(Seq.empty, Seq.empty))
    val n = Seq[Option[String]](None).toDF("t")
      .select(ChunkCuts.chunkCuts(col("t"), 8, 64).as("c"))
      .collect()
    assert(n.head.isNullAt(0))
  }
}
