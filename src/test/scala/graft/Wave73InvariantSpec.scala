package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Certification invariants for batches 47–50 that the oracle compare
  * cannot see: the DuckDB gate proves both engines AGREE, but an
  * identity that silently broke would agree on both sides — these
  * assert the identities/separations HOLD.
  */
class Wave73InvariantSpec extends GraftSpecBase {

  private def run(name: String): DataFrame =
    SparkEntry.queries(name)(spark, sf())

  test("q_ivm_join_delta: the delta algebra matches the recompute on every priority") {
    val out = run("q_ivm_join_delta").collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getAs[Long]("ivm_matches_recompute") === 1L,
        s"IVM identity broke for ${r.getAs[String]("o_orderpriority")}")
    }
  }

  test("text_unicode_confusables: honest zero on real docs, 100% on staged") {
    run("text_unicode_confusables").collect().foreach { r =>
      if (r.getAs[Long]("is_staged") === 0L)
        assert(r.getAs[Long]("n_docs_flagged") === 0L, s"ASCII fixture flagged in ${r.getAs[String]("source")}")
      else {
        assert(r.getAs[Long]("flag_rate_ppm") === 1000000L, "staged Cyrillic copies must all flag")
        assert(r.getAs[Long]("chars_folded") > 0L)
      }
    }
  }

  test("mm_payload_entropy: planted blobs all flag, text payloads never do") {
    run("mm_payload_entropy").collect().foreach { r =>
      if (r.getAs[Long]("is_staged") === 0L)
        assert(r.getAs[Long]("n_flagged") === 0L, s"text flagged as blob in ${r.getAs[String]("source")}")
      else assert(r.getAs[Long]("flag_rate_ppm") === 1000000L, "staged blobs must all flag")
    }
  }

  test("q_coordinated_sample: zero orphans by construction; independent sampling orphans most facts") {
    val r = run("q_coordinated_sample").head()
    assert(r.getAs[Long]("orphans_coordinated") === 0L)
    // 10% independent dim sample strands ~90% of sampled facts; assert
    // the qualitative gap, not the exact rate (fixture-dependent)
    assert(r.getAs[Long]("independent_orphan_ppm") > 500000L)
  }

  test("q_weighted_quantiles: quantiles monotone in q, within the value domain") {
    val rows = run("q_weighted_quantiles").orderBy(col("q")).collect()
    val wq   = rows.map(_.getAs[Long]("weighted_qty"))
    val uq   = rows.map(_.getAs[Long]("unweighted_qty"))
    assert(wq.sliding(2).forall(p => p(0) <= p(1)), s"weighted not monotone: ${wq.mkString(",")}")
    assert(uq.sliding(2).forall(p => p(0) <= p(1)), s"unweighted not monotone: ${uq.mkString(",")}")
    assert((wq ++ uq).forall(q => q >= 1L && q <= 50L))
  }

  test("graph_clustering_coeff: transitivity and bucket averages in [0, 1e6]; triangle count consistent") {
    import spark.implicits._
    val out = run("graph_clustering_coeff").cache()
    try {
      val rows = out.collect()
      assert(rows.forall(r => r.getAs[Long]("avg_c_ppm") >= 0L && r.getAs[Long]("avg_c_ppm") <= 1000000L))
      val g = rows.head.getAs[Long]("global_transitivity_ppm")
      assert(g >= 0L && g <= 1000000L)
      // the per-edge and per-corner consumers of orientedTriangles must
      // agree on the total triangle count: Σ common_neighbors over
      // support-edges counts each triangle 3 times
      val edgeSide = run("graph_jaccard_neighbors")
        .agg(sum("common_neighbors")).as[Long].head() / 3
      assert(rows.head.getAs[Long]("n_triangles") === edgeSide,
        s"corner-credit and edge-credit disagree: ${rows.head.getAs[Long]("n_triangles")} vs $edgeSide")
    } finally { out.unpersist(); () }
  }

  test("q_t_closeness: distances in [0, 1e6], t is the max, classes cover all rows") {
    import spark.implicits._
    val out  = run("q_t_closeness").cache()
    try {
      val rows = out.collect()
      assert(rows.forall(r => r.getAs[Long]("tv_ppm") >= 0L && r.getAs[Long]("tv_ppm") <= 1000000L))
      val tMax = rows.head.getAs[Long]("t_max_ppm")
      assert(rows.map(_.getAs[Long]("tv_ppm")).max === tMax)
      val covered = out.agg(sum("n_rows")).as[Long].head()
      assert(covered === Tables.orders(spark, sf()).count())
    } finally { out.unpersist(); () }
  }

  test("events_type_correlation: correlations in [-1e6, 1e6], full pair matrix") {
    val rows = run("events_type_correlation").collect()
    val types = rows.flatMap(r => Seq(r.getAs[String]("type_a"), r.getAs[String]("type_b"))).distinct
    assert(rows.length === types.length * (types.length - 1) / 2, "missing pairs")
    assert(rows.forall { r =>
      val p = r.getAs[Long]("pearson_micro"); p >= -1000000L && p <= 1000000L
    })
  }
}
