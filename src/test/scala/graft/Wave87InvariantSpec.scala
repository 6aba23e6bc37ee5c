package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Certification invariants for batch 61 (B314–B317). */
class Wave87InvariantSpec extends GraftSpecBase {

  private def run(name: String): DataFrame =
    SparkEntry.queries(name)(spark, sf())

  test("events_attribution_markov: removal only lowers conversion; shares form a distribution") {
    val rows = run("events_attribution_markov").collect()
    assert(rows.nonEmpty)
    val pFull = rows.head.getAs[Long]("p_conv_full_ppm")
    assert(pFull > 0L && pFull <= 1000000L)
    rows.foreach { r =>
      val pc  = r.getAs[Long]("p_conv_removed_ppm")
      val eff = r.getAs[Long]("removal_effect_ppm")
      // monotone: rerouting a channel's in-links to NULL cannot raise p
      assert(pc <= pFull, s"${r.getAs[String]("channel")}: removal raised conversion $pc > $pFull")
      assert(eff >= 0L && eff <= 1000000L)
      assert(r.getAs[Long]("p_conv_full_ppm") === pFull, "p_full must repeat identically per row")
    }
    val shareSum = rows.map(_.getAs[Long]("attribution_share_ppm")).sum
    assert(shareSum >= 999990L - rows.length && shareSum <= 1000000L, s"share mass $shareSum")
  }

  test("q_join_order_surface: connected starts beat the cartesian start; final rows agree") {
    val rows = run("q_join_order_surface").collect()
    assert(rows.length === 3)
    val byOrder = rows.map(r => r.getAs[String]("join_order") -> r.getAs[Long]("inter1_rows")).toMap
    val cart = byOrder("(C×L)⋈O")
    byOrder.filterKeys(_ != "(C×L)⋈O").foreach { case (o, n) =>
      assert(n < cart, s"$o intermediate $n not below cartesian $cart")
    }
    assert(rows.map(_.getAs[Long]("final_rows")).distinct.length === 1)
    assert(rows.exists(_.getAs[Long]("blowup_milli") === 1000L), "best order must read 1000 milli")
  }

  test("text_conditional_entropy: conditioning never increases entropy") {
    val rows = run("text_conditional_entropy").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val h1 = r.getAs[Long]("h_unigram_micro")
      val h2 = r.getAs[Long]("h_cond_micro")
      // H(C2|C1) ≤ H(C) up to the per-term micro-snap (≤1 micro per
      // charset² term)
      assert(h2 <= h1 + 2000L, s"${r.getAs[String]("source")}: H_cond $h2 above H_uni $h1")
      assert(h1 > 0L, "text sources must have positive unigram entropy")
      val g = r.getAs[Long]("gain_ppm")
      assert(g >= -2000L && g <= 1000000L)
    }
  }

  test("mm_scene_cuts: cut counts bounded by the frame count") {
    val rows = run("mm_scene_cuts").collect()
    assert(rows.nonEmpty)
    val nDocs = Tables.documents(spark, sf()).count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum === nDocs)
    rows.foreach { r =>
      // 16 frames → at most 15 adjacent jumps
      assert(r.getAs[Long]("max_cuts") <= 15L)
      val mean = r.getAs[Long]("mean_cuts_milli")
      assert(mean >= 0L && mean <= 15000L)
    }
  }
}
