package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Certification invariants for batch 57 (B298–B301) that the oracle
  * compare cannot see: the DuckDB gate proves both engines AGREE; these
  * prove the operators' semantic claims HOLD on the fixture.
  */
class Wave83InvariantSpec extends GraftSpecBase {

  private def run(name: String): DataFrame =
    SparkEntry.queries(name)(spark, sf())

  test("text_dsir_weights: ranks contiguous and weights sorted; English scores highest toward the English target") {
    val rows = run("text_dsir_weights").orderBy(col("rank")).collect()
    assert(rows.length === 50)
    assert(rows.map(_.getAs[Long]("rank")).toSeq === (1L to 50L))
    val w = rows.map(_.getAs[Long]("logw_micros"))
    assert(w.sliding(2).forall(p => p(0) >= p(1)), "logw not non-increasing in rank")
    // the semantic truth of DSIR: with target = the en slice, en docs in
    // the top-50 must average a higher importance weight than the rest
    val (en, other) = rows.partition(_.getAs[String]("lang") == "en")
    assert(en.nonEmpty, "no en docs in the DSIR top-50")
    val enMean    = en.map(_.getAs[Long]("logw_micros")).sum.toDouble / en.length
    val otherMean = other.map(_.getAs[Long]("logw_micros")).sum.toDouble / math.max(other.length, 1)
    assert(other.isEmpty || enMean > otherMean,
      s"en mean $enMean not above non-en mean $otherMean — target distribution inverted?")
  }

  test("mm_aspect_buckets: every image assigned exactly once; waste bounded by the bucket grid") {
    val rows = run("mm_aspect_buckets").collect()
    val nDocs = Tables.documents(spark, sf()).count()
    assert(rows.map(_.getAs[Long]("n_images")).sum === nDocs, "assignment not a partition of the corpus")
    rows.foreach { r =>
      val mean = r.getAs[Long]("mean_waste_ppm")
      val max  = r.getAs[Long]("max_waste_ppm")
      assert(mean >= 0L && mean <= max && max < 1000000L)
      // the 9-bucket grid spans aspect 0.25..4 against staged dims in
      // 0.2..5 — nearest-bucket crop waste stays under 30%
      assert(max < 300000L, s"bucket ${r.getAs[Long]("bucket_id")} max waste $max ≥ 30%")
    }
  }

  test("sim_hard_negatives: triplets respect the semi-hard margin and never reuse the positive") {
    val rows = run("sim_hard_negatives").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val pos = r.getAs[Double]("pos_cos")
      val neg = r.getAs[Double]("neg_cos")
      assert(pos - neg >= 0.05 - 1e-9, s"margin ${pos - neg} below the 0.05 band")
      assert(r.getAs[Long]("margin_ppm") >= 50000L - 1L)
      val ids = Set(r.getAs[Long]("vec_id"), r.getAs[Long]("pos_id"), r.getAs[Long]("neg_id"))
      assert(ids.size === 3, s"anchor/pos/neg not distinct: $ids")
    }
  }

  test("events_ab_sequential: always-valid p is a running min in (0,1], flags consistent") {
    val rows = run("events_ab_sequential").orderBy(col("day_ms")).collect()
    assert(rows.nonEmpty)
    val pSeq = rows.map(_.getAs[Double]("p_seq"))
    assert(pSeq.sliding(2).forall(p => p(0) >= p(1)), "p_seq not monotone non-increasing")
    rows.foreach { r =>
      val pd = r.getAs[Double]("p_day")
      val ps = r.getAs[Double]("p_seq")
      assert(pd > 0.0 && pd <= 1.0 && ps > 0.0 && ps <= pd + 1e-12)
      assert(r.getAs[Boolean]("significant") === (ps < 0.05))
    }
    val na = rows.map(_.getAs[Long]("n_a"))
    val nb = rows.map(_.getAs[Long]("n_b"))
    assert(na.sliding(2).forall(p => p(0) <= p(1)) && nb.sliding(2).forall(p => p(0) <= p(1)),
      "cumulative arm counts must be non-decreasing")
  }
}
