package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Certification invariants for batch 60 (B310–B313). */
class Wave86InvariantSpec extends GraftSpecBase {

  private def run(name: String): DataFrame =
    SparkEntry.queries(name)(spark, sf())

  test("graph_hits_scores: ppm-normalized, and the concentration family shapes the authorities") {
    val rows = run("graph_hits_scores").collect()
    assert(rows.length === 20)
    val hubSum  = rows.map(_.getAs[Long]("hub_ppm")).sum
    val authSum = rows.map(_.getAs[Long]("auth_ppm")).sum
    // floor division loses at most 1 ppm per node per normalization
    assert(hubSum > 999900L && hubSum <= 1000000L, s"hub mass $hubSum")
    assert(authSum > 999900L && authSum <= 1000000L, s"auth mass $authSum")
    // the n_chars%7 family concentrates in-links on src0..src6 — their
    // mean authority must beat the others' (non-uniformity is the point)
    val (targets, rest) = rows.partition(r => (3 to 6).map(i => s"src$i").contains(r.getAs[String]("node")) ||
      (0 to 2).map(i => s"src$i").contains(r.getAs[String]("node")))
    val tMean = targets.map(_.getAs[Long]("auth_ppm")).sum / targets.length
    val rMean = rest.map(_.getAs[Long]("auth_ppm")).sum / rest.length
    assert(tMean > rMean, s"concentration-family auth mean $tMean not above rest $rMean")
  }

  test("text_textrank_sentences: best sentence exists in its doc, ranks are positive ppm") {
    val rows = run("text_textrank_sentences").collect()
    assert(rows.length === 20)
    rows.foreach { r =>
      assert(r.getAs[String]("summary").nonEmpty)
      val ppm = r.getAs[Long]("rank_ppm")
      // damped PageRank floor: rank ≥ 150000/sn > 0; and a single-sentence
      // doc scores the full mass
      assert(ppm > 0L && ppm <= 1000000L, s"doc ${r.getAs[Long]("doc_id")} rank $ppm")
      assert(r.getAs[Long]("best_sid") >= 0L)
    }
  }

  test("embed_cluster_purity: majority shares bounded below by chance, purity consistent") {
    val rows = run("embed_cluster_purity").collect()
    assert(rows.length === 8)
    val n = rows.map(_.getAs[Long]("n_vecs")).sum
    rows.foreach { r =>
      val p = r.getAs[Long]("purity_ppm")
      // majority share of L labels can never fall below 1/L
      assert(p * 8 >= 1000000L - 8L, s"cluster ${r.getAs[Long]("cluster")} purity $p below 1/8")
      assert(p <= 1000000L)
      val nmi = r.getAs[Double]("nmi")
      assert(nmi >= -0.001 && nmi <= 1.0)
    }
    // overall purity is the n-weighted mean of per-cluster majorities
    val weighted = rows.map(r => r.getAs[Long]("purity_ppm") * r.getAs[Long]("n_vecs")).sum / n
    val overall  = rows.head.getAs[Long]("overall_purity_ppm")
    assert(math.abs(weighted - overall) <= 8L, s"overall $overall vs weighted $weighted")
  }

  test("events_attribution_ushape: every conversion path distributes exactly 1000 milli") {
    val rows = run("events_attribution_ushape").collect()
    assert(rows.nonEmpty)
    val totalMilli = rows.map(_.getAs[Long]("credit_milli_sum")).sum
    // integer bookkeeping: credits per conversion sum to exactly 1000,
    // so the corpus total is a multiple of 1000
    assert(totalMilli % 1000L === 0L, s"total credit $totalMilli not a multiple of 1000")
    val shareSum = rows.map(_.getAs[Long]("share_ppm")).sum
    assert(shareSum > 999990L && shareSum <= 1000000L)
  }
}
