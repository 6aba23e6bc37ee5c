package graft

import org.apache.spark.sql.functions._

/** Semantic invariants of the round-10 B238–B242 batch that the
  * row-hash oracle can't express:
  *  - the bootstrap CI is ordered and user-conserving (n_a + n_b equals
  *    the distinct purchase-user count; resampling never invents users);
  *  - modularity is bounded (|Q| ≤ 1) and the within-edge masses are
  *    conserved against the edge list;
  *  - the stationary vector is a distribution (non-negative, sums to
  *    1e6 minus bounded floor loss) even though no engine-side
  *    normalization step enforces it;
  *  - Bloom pruning never false-negatives (true ⊆ combined ⊆ each
  *    pruner's admit set);
  *  - compound ANN recall is internally consistent (found ≤ true ≤ k).
  */
class Wave49InvariantSpec extends GraftSpecBase {

  import spark.implicits._

  private def run(name: String) = SparkEntry.queries(name)(spark, sf())

  test("events_bootstrap_ci: ordered interval, user conservation") {
    val r = run("events_bootstrap_ci").collect()
    assert(r.length === 1)
    val row = r.head
    val lo  = row.getAs[Long]("ci_lo_milli")
    val hi  = row.getAs[Long]("ci_hi_milli")
    assert(lo <= hi, s"interval inverted: [$lo, $hi]")
    val users = Tables.events(spark, sf())
      .where(col("event_type") === "purchase")
      .select(col("user_id")).distinct().count()
    assert(row.getAs[Long]("n_a") + row.getAs[Long]("n_b") === users)
  }

  test("graph_brand_modularity: bounded Q, conserved edge masses") {
    val out = run("graph_brand_modularity")
    val q   = out.select(col("q_ppm")).as[Long].head()
    assert(q >= -1000000L && q <= 1000000L, s"Q out of [-1, 1]: $q ppm")
    val edges = operators.GraphOps
      .copurchaseEdges(Tables.lineitem(spark, sf()), 2L)
      .join(Tables.part(spark, sf()).select(col("p_partkey").as("u"), col("p_brand").as("bu")), Seq("u"))
      .join(Tables.part(spark, sf()).select(col("p_partkey").as("v"), col("p_brand").as("bv")), Seq("v"))
    val m = edges.count()
    val sums = out.agg(sum("e_within").as("ew"), sum("d_sum").as("ds")).head()
    assert(sums.getAs[Long]("ew") === edges.where(col("bu") === col("bv")).count())
    // every edge contributes exactly 2 degree-mass units
    assert(sums.getAs[Long]("ds") === 2L * m)
  }

  test("events_markov_stationary: non-negative distribution with bounded floor loss") {
    val out  = run("events_markov_stationary").collect()
    val pis  = out.map(_.getAs[Long]("stationary_ppm"))
    assert(pis.forall(_ >= 0L))
    val total = pis.sum
    // provable worst case, not the optimistic one: each of the 16 power
    // iterations can floor away up to ~(2k-1) ppm — k-1 row-normalization
    // floors inside p_ppm contribute to each state PLUS the per-state
    // iteration floor — and the uniform start loses the 1e6 mod k
    // remainder (< k). The earlier 17·k allowance was tighter than the
    // arithmetic guarantees and could fail on a fixture where flooring
    // bites harder even though the query is correct.
    val k = out.length.toLong
    assert(total <= 1000000L, s"mass created: $total")
    assert(total >= 1000000L - 16L * (2L * k - 1L) - k, s"too much floor loss: $total")
  }

  test("q_bloom_skipping_gain: no pruner false-negatives") {
    val bad = run("q_bloom_skipping_gain")
      .where(
        col("files_true") > col("files_combined") ||
          col("files_combined") > col("files_bloom") ||
          col("files_combined") > col("files_minmax"))
      .count()
    assert(bad === 0L)
  }

  test("sim_ivf_pq_compound: found <= true <= k") {
    val bad = run("sim_ivf_pq_compound")
      .where(col("n_found") > col("n_true") || col("n_true") > 10)
      .count()
    assert(bad === 0L)
  }

  test("dedup_planted_recall: found bounded by planted, recall in [0, 1e6]") {
    val out = run("dedup_planted_recall")
    assert(out.count() === 3L)
    val bad = out.where(
      col("n_found") > col("n_planted") ||
        col("recall_ppm") < 0 || col("recall_ppm") > 1000000L).count()
    assert(bad === 0L)
  }

  test("events_markov_holdout_acc: hits bounded by support, test split conserved") {
    val out = run("events_markov_holdout_acc")
    val bad = out.where(col("n_correct") > col("n_test")).count()
    assert(bad === 0L)
    // every test transition lands in exactly one (prev, predicted) row
    val ev = Tables.events(spark, sf())
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val bounds = ev.agg(
      expr("date_add(min(to_date(ts)), CAST(datediff(max(to_date(ts)), min(to_date(ts))) div 2 AS INT))")
        .as("dmid"))
    val nTest = ev
      .select(col("ts"), lag(col("event_type"), 1).over(w).as("prev_type"))
      .where(col("prev_type").isNotNull)
      .crossJoin(bounds)
      .where(to_date(col("ts")) > col("dmid"))
      .count()
    val total = out.agg(sum("n_test")).as[Long].head()
    assert(total === nTest)
  }

  test("events_ab_power: MDE shrinks as 1/sqrt(n) across the multiplier rows") {
    val rows = run("events_ab_power").orderBy(col("n_mult").asc).collect()
    val mde = rows.map(_.getAs[Double]("mde_abs"))
    assert(mde.sliding(2).forall { case Array(a, b) => b < a }, mde.mkString(","))
    // 4x traffic halves the MDE (exactly, up to the round-6 snap)
    assert(math.abs(mde(2) - mde(0) / 2.0) < 2e-6, s"${mde(0)} vs ${mde(2)}")
  }
}
