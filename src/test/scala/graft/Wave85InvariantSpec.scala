package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Certification invariants for batch 59 (B306–B309). */
class Wave85InvariantSpec extends GraftSpecBase {

  private def run(name: String): DataFrame =
    SparkEntry.queries(name)(spark, sf())

  test("embed_pq_train_iter: one Lloyd iteration never increases quantization error") {
    val rows = run("embed_pq_train_iter").collect()
    assert(rows.length === 8)
    rows.foreach { r =>
      val before = r.getAs[Long]("err_before")
      val after  = r.getAs[Long]("err_after")
      val n      = r.getAs[Long]("n_points")
      // Lloyd monotonicity with ≤1-micro-per-dim centroid flooring slack
      assert(after <= before + 8 * n,
        s"subspace ${r.getAs[Long]("subspace")}: error rose $before -> $after")
      assert(after > 0L && before > 0L)
    }
  }

  test("text_rake_keyphrases: scores sorted, phrases stopword-free and within the length cap") {
    val rows = run("text_rake_keyphrases").orderBy(col("rank")).collect()
    assert(rows.length === 20)
    val scores = rows.map(_.getAs[Long]("score_micro"))
    assert(scores.sliding(2).forall(p => p(0) >= p(1)))
    rows.foreach { r =>
      val words = r.getAs[String]("phrase").split(" ")
      assert(words.length === r.getAs[Long]("n_words").toInt && words.length <= 4)
      assert(!words.exists(operators.TextAnalysis.Stopwords.contains(_)),
        s"stopword inside phrase '${r.getAs[String]("phrase")}'")
      assert(r.getAs[Long]("n_occurrences") >= 1L)
    }
  }

  test("embed_jl_distortion: the 16-dim Rademacher projection concentrates around unit ratio") {
    val r = run("embed_jl_distortion").head()
    assert(r.getAs[Long]("n_pairs") >= 100L)
    val mean = r.getAs[Long]("mean_ratio_ppm")
    // JL: mean of ~n_pairs ratios, each sd≈√(2/16)≈35% ⇒ mean within ±10%
    assert(mean > 900000L && mean < 1100000L, s"mean distortion ratio $mean ppm")
    assert(r.getAs[Long]("min_ratio_ppm") <= mean && mean <= r.getAs[Long]("max_ratio_ppm"))
  }

  test("events_concurrency_littles_law: sweep-line area equals the duration sum exactly") {
    val r = run("events_concurrency_littles_law").head()
    // L·T = Σdur is an algebraic identity — the two INDEPENDENT routes
    // (sweep-line area vs direct sum) must agree to the millisecond
    assert(r.getAs[Long]("area_ms") === r.getAs[Long]("sum_dur_ms"))
    assert(r.getAs[Long]("littles_ratio_ppm") === 1000000L)
    val peak = r.getAs[Long]("peak_concurrency")
    assert(peak >= 1L && peak <= r.getAs[Long]("n_users"))
    assert(r.getAs[Long]("span_ms") > 0L)
  }
}
