package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Invariants the oracle hash can't see for the round-11 wave
  * (B258–B263): cross-query consistency (Louvain's Q-before must equal
  * B239's modularity on the same partition), theorem-class monotonicity
  * (rerank recall in shortlist size), and conservation laws. Properties
  * that are NOT theorems (e.g. Q monotone under simultaneous moves, KN
  * beating MLE) are deliberately absent — the queries report those as
  * data.
  */
class Wave70InvariantSpec extends GraftSpecBase {

  private def run(name: String): DataFrame =
    SparkEntry.queries(name)(spark, sf())

  test("graph_louvain_pass: node conservation, Q bounds, q_before matches B239") {
    import spark.implicits._
    val out = run("graph_louvain_pass").cache()
    try {
      val head = out.head()
      val qb   = head.getAs[Long]("q_before_ppm")
      val qa   = head.getAs[Long]("q_after_ppm")
      assert(qb >= -1000000L && qb <= 1000000L, s"q_before out of [-1,1]: $qb")
      assert(qa >= -1000000L && qa <= 1000000L, s"q_after out of [-1,1]: $qa")
      // every graph node lands in exactly one community
      val edges = operators.GraphOps.copurchaseEdges(Tables.lineitem(spark, sf()), 2L)
      val nNodes = edges.select(col("u").as("n"))
        .union(edges.select(col("v").as("n"))).distinct().count()
      assert(out.agg(sum("n_nodes")).as[Long].head() === nNodes)
      // the pass's starting Q is B239's modularity of the same partition
      val b239 = run("graph_brand_modularity").select(col("q_ppm")).as[Long].head()
      assert(qb === b239, s"louvain q_before $qb != modularity q_ppm $b239")
    } finally { out.unpersist(); () }
  }

  test("sim_hamming_rerank: recall monotone in shortlist size, bounded by 1") {
    val rows = run("sim_hamming_rerank")
      .orderBy(col("shortlist_size"))
      .collect()
    assert(rows.length === 3)
    val recalls = rows.map(_.getAs[Long]("recall_ppm"))
    assert(recalls.forall(r => r >= 0L && r <= 1000000L))
    // a larger shortlist can only add candidates the rerank may keep
    assert(recalls.sliding(2).forall(p => p(0) <= p(1)),
      s"recall not monotone in S: ${recalls.mkString(",")}")
    assert(rows.forall(_.getAs[Long]("n_truth") === rows.head.getAs[Long]("n_truth")))
  }

  test("events_topk_merge_daily: visible counts never exceed exact, ranks well-formed") {
    val out  = run("events_topk_merge_daily").collect()
    // sf0.001 has fewer than 20 users total — the exact top-k is capped
    // by the population, not padded
    assert(out.length <= 20 && out.nonEmpty)
    assert(out.map(_.getAs[Long]("exact_rank")).sorted === (1L to out.length.toLong).toArray)
    out.foreach { r =>
      assert(r.getAs[Long]("n_merged_visible") <= r.getAs[Long]("n_exact"),
        s"merge created mass for user ${r.getAs[Long]("user_id")}")
      val flag = r.getAs[Long]("in_merged_topk")
      assert(flag === 0L || flag === 1L)
      // found in the merge exactly when some daily top-20 saw the user
      assert((r.getAs[Long]("days_visible") > 0) === (r.getAs[Long]("merged_rank") > 0))
    }
  }

  test("graph_assortativity: correlation in [-1, 1], pair count symmetric") {
    val r = run("graph_assortativity").head()
    val a = r.getAs[Long]("assortativity_micro")
    assert(a >= -1000000L && a <= 1000000L, s"assortativity out of range: $a")
    assert(r.getAs[Long]("n_pairs") % 2 === 0L, "symmetrized pair count must be even")
  }

  test("text_kn_continuation: NLLs positive, path counts within bigram totals") {
    run("text_kn_continuation").collect().foreach { r =>
      assert(r.getAs[Long]("nll_mle_micro") >= 0L)
      assert(r.getAs[Long]("nll_kn_micro") >= 0L)
      assert(
        r.getAs[Long]("n_backoff") + r.getAs[Long]("n_ctx_oov") <= r.getAs[Long]("n_bigrams"))
      assert(
        r.getAs[Long]("kn_gain_micro") ===
          r.getAs[Long]("nll_mle_micro") - r.getAs[Long]("nll_kn_micro"))
    }
  }

  test("events_holt_linear: non-negative errors, floor-division consistency") {
    run("events_holt_linear").collect().foreach { r =>
      val n = r.getAs[Long]("n_eval")
      assert(n >= 1L)
      val sae = r.getAs[Long]("holt_sae_milli")
      assert(sae >= 0L && r.getAs[Long]("naive_sae_milli") >= 0L)
      val mae = r.getAs[Long]("holt_mae_milli")
      assert(mae === sae / n, "mae must be the floored sae/n")
    }
  }
}
