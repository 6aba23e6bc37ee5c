package graft.tools

/** Plan audit: flags anti-patterns (nested-loop / cartesian joins,
  * missing pushdown) across every registered query. Run:
  *   runMain graft.tools.PlanAudit <sfDir>
  */
object PlanAudit {

  /** Queries where a nested-loop join is the intended plan:
    *  - q22_idle_customers: scalar-subquery pattern — a 1-row aggregate
    *    broadcast; the "loop" runs once per probe row against one row.
    *  - sim_topk_cosine: exhaustive brute-force baseline — every
    *    (query, corpus) pair must be scored by definition; corpus streams
    *    partition-parallel against the broadcast query set, which IS the
    *    scalable all-pairs plan (the bucketed variants avoid it).
    *  - text_tfidf_top: the corpus doc count N joins in as a 1-row
    *    broadcast (the scalar-subquery pattern again) — one value against
    *    the per-term df side.
    *  - q15_top_supplier: the global max revenue is a 1-row broadcast
    *    cross-joined back onto the per-supplier aggregate (deliberately
    *    replacing a single-partition global window).
    *  - q_mixture_weights / q_skew_profile / q_dq_checks: the same 1-row
    *    totals-aggregate broadcast, crossed back over per-group rows
    *    (mixture shares, heavy-hitter shares, orphan-rule n_checked).
    *  - events_decay_score: the max-ts decay anchor is a 1-row aggregate
    *    broadcast-crossed over the event scan (scalar-subquery pattern).
    */
  private val intendedNestedLoop =
    Set(
      "q22_idle_customers", "sim_topk_cosine", "text_tfidf_top", "q15_top_supplier",
      "q_mixture_weights", "q_skew_profile", "q_dq_checks", "events_decay_score",
      // 1-row totals/node-count broadcasts (B27 pattern)
      "text_pmi_collocations", "graph_pagerank",
      // brute-force scored base with broadcast queries (B4's documented trade)
      "sim_rrf_fusion", "sim_negative_sample",
      // 1-row bounds/totals/level broadcasts (B27 pattern)
      "events_gap_fill", "q_fair_share", "events_ab_test", "events_srm_check", "q_assoc_rules", "q_source_drift", "q_partition_skew", "q_reco_fallback", "q_fk_audit", "q_join_estimate", "events_user_holdout", "q_benford_audit", "q_rfm_segments", "q_chi2_contingency", "q_consistent_hash", "q_apportionment", "events_power_users",
      // rounds 9-10, reviewed: 1-row totals/bounds broadcasts (the same
      // scalar-subquery pattern — a single aggregate row crossed over a
      // bounded per-group table; shapes pinned per-query in PlanAuditSpec)
      "q_histogram", "events_heatmap", "events_cuped", "events_late_profile",
      "graph_degree_stats", "cdc_vacuum_plan", "corpus_rebalance_plan",
      "corpus_temperature_mix", "dedup_mixture_impact", "events_mg_frequent",
      "q_salt_plan", "events_lift_table",
      // bounds/predicate-grid broadcasts: a 1-row bounds aggregate crossed
      // over the scan plus a 16-row predicate grid crossed over ≤64 file
      // boxes — both sides constant-bounded
      "q_zorder_pruning_gain",
      // bounded-grid zero-fill: the types × ≤1024-bucket crossJoin the
      // KS/PSI drift lenses need (a type missing a bucket still moves the
      // complement's CDF) — grid size is value-domain-bounded, never data-
      // bounded
      "events_ks_drift", "events_psi_drift",
      // rounds 9-10, reviewed: broadcast of a CONSTANT-size model or probe
      // set (centroid tables of √n rows, ≤128-row codebooks, ≤50 query
      // vectors, ≤types² sketch arrays) against a streaming corpus scan —
      // the documented B4 brute-force/IVF trade; the corpus side never
      // self-joins
      "sim_ivf_topk", "sim_ivf_balance", "sim_ivf_incremental",
      "sim_filtered_topk", "sim_ann_recall", "sim_pq_recall",
      "sim_recall_vs_probes", "sim_truncation_recall", "events_kmv_overlap",
      "embed_binarize_recall", "sim_ivf_pq_compound",
      // round-10 B244, reviewed: 1-row entry-vertex broadcast over the
      // 10-query frontier plus the bruteForceTopK certification pass
      // (broadcast bounded probes) — the documented B4 trade
      "sim_nsw_greedy",
      // power-iteration scalars: 1-row n / L∞-norm / sign / eigenvalue
      // aggregates crossed over the 4096-row covariance and 64-row
      // iterate — every loop side is dimension-bounded, never data-bounded
      "embed_pca_top_component",
      // round-10 B238-B240, reviewed: 1-row scalar broadcasts only — the
      // bootstrap's point/CI-bound rows (64-row replicate table), the
      // modularity totals m/Q (each a 1-row aggregate crossed over ≤|brands|
      // rows), and the chain's state count / TV scalar (≤|types| rows)
      "events_bootstrap_ci", "graph_brand_modularity", "events_markov_stationary",
      // round-10 B241, reviewed: a 1-row max-id broadcast over the scan plus
      // the 16-probe broadcast range-checked against ≤64 file boxes — both
      // loop sides constant-bounded (B234's predicate-grid pattern)
      "q_bloom_skipping_gain",
      // round-10 B243, reviewed: each merge round crosses the 1-row winning
      // pair over the vocabulary table — the scalar-subquery pattern; the
      // vocab side is word-type-bounded (Heaps), never corpus-sized
      "text_bpe_train",
      // round-10 B246-B247, reviewed: 1-row stat/bounds broadcasts — the
      // power table crosses a 4-row literal with one aggregate row; the DiD
      // midpoint and the four 1-row cells cross over each other
      "events_ab_power", "events_did",
      // round-10 B249, reviewed: 1-row midpoint-bounds and majority-class
      // broadcasts crossed over the transition stream / ≤types rows
      "events_markov_holdout_acc",
      // round-10 B251, reviewed: the 5-literal nested-level fan-out over the
      // token stream (constant ×5), the ≤sources-row rank broadcast, and
      // 1-row beta/anchor broadcasts — every loop side constant-bounded
      "text_heaps_law",
      // round-10 B252, reviewed: 1-row layer-total broadcasts (span agg,
      // dropped-member agg, corpus total) crossed over 1-row readouts
      "dedup_yield_by_granularity",
      // round-10 B257, reviewed: the 3-literal tau explode crossed over the
      // already-bounded near-dup pair list (B180's one-pass-sweep pattern)
      "mm_phash_threshold_sweep",
      // round 11, reviewed: 1-row aggregate broadcasts (m / Q / n_moved /
      // type-total) crossed over bounded per-community or per-source
      // tables (graph_louvain_pass, text_kn_continuation), and the 3-row
      // shortlist-size grid non-equi-joined over the bounded Hamming
      // shortlist (sim_hamming_rerank) — every non-equi side is
      // constant-bounded, the corpus side never self-joins
      "graph_louvain_pass", "text_kn_continuation", "sim_hamming_rerank",
      // round 14 (B258 level), reviewed: graph_louvain_pass's exact
      // pattern — 1-row aggregate broadcasts (m / n_moved_l2 / the two Q
      // readouts) crossed onto the ≤community-count supergraph readout;
      // pass 2 itself is equi-joins over the community-bounded tables
      "graph_louvain_level",
      // round 15 (B258 convergence), reviewed: the same 1-row broadcast
      // family per level — m / n_moved / q_ppm aggregates crossed onto
      // community-bounded level readouts, plus the 1-row convergence
      // cutoff crossed onto the ≤9-row level curve; every merge/contract
      // join is an equi-join over supergraph-bounded tables
      "graph_louvain_converge",
      // round 11 batch 46, reviewed: 1-row aggregate broadcasts (the
      // 64-row dim-sum square total; the user-count total over the
      // bounded count-histogram) crossed over 1-row/bounded sides
      "embed_isotropy_score", "events_gini_concentration",
      // 1-row Σxy aggregate broadcast crossed onto the 1-row degree sums
      "graph_assortativity",
      // round 11 batch 49, reviewed: 1-row sample-size/orphan-count and
      // quantile-threshold broadcasts; the clustering coefficient's
      // global-transitivity 1-row cross over the ≤64-bucket rollup
      "q_coordinated_sample", "q_weighted_quantiles", "graph_clustering_coeff",
      // round 11 batch 50, reviewed: the bounded classes × 5-priority
      // zero-fill grid + 1-row t-max broadcast (B98's pattern), and the
      // |types| × calendar-days grid with 1-row stat broadcasts
      "q_t_closeness", "events_type_correlation",
      // round 11 batch 51, reviewed: the sources × bounded-charset
      // zero-fill grid (B98 pattern) and the 4-literal rich-club
      // threshold grid against the degree-joined edge list (B180's
      // one-pass sweep) — every cross side constant/charset-bounded
      "text_jsd_sources", "graph_rich_club",
      // round 12 batch 53, reviewed: sim_dot_vs_cosine_rank is the
      // documented bruteForceTopK trade (10 broadcast probes non-equi-
      // joined over one streaming corpus scan, both rankings from the
      // same scan); graph_partition_cut crosses a 1-row max-key
      // aggregate and a 3-literal P grid over the edge list (B180's
      // one-pass sweep + the scalar-subquery pattern)
      "sim_dot_vs_cosine_rank", "graph_partition_cut",
      // round 12 batch 54, reviewed: the 8-literal K grid non-equi-joined
      // over the word-type-bounded vocabulary (B180 sweep), a 1-row
      // max-id broadcast for the planted-copy staging, and the 4-literal
      // canary grid crossed over the scan — every loop side constant- or
      // vocab-bounded, the corpus never self-joins
      "text_ngram_coverage_curve", "embed_exact_dup", "text_canary_contamination",
      // round 13 batch 56, reviewed: the key-level and row-level drift
      // totals are each ONE aggregate row crossed over each other before
      // the 3-literal W explode (scalar-subquery pattern, both sides
      // 1-row by construction)
      "cdc_watermark_survivor_drift",
      // round 13 batches 57-62, reviewed: 1-row aggregate broadcasts
      // (vocab totals, the 64-double moment arrays, HITS/entropy
      // normalizers, count products, the doc-id half threshold) crossed
      // over bounded or row-local sides (dsir, whitening, littles, hits,
      // join-order, cluster-purity, term-drift); the 9-row aspect-bucket
      // grid crossed over the corpus for a row-local argmin (B180's
      // bounded-grid sweep); and sim_nn_descent_round's 50-anchor ×
      // corpus exact-truth cross — the documented bruteForceTopK audit
      // trade (sample bounded, the corpus never self-joins)
      "text_dsir_weights", "embed_whitening_gain",
      "events_concurrency_littles_law", "graph_hits_scores",
      "q_join_order_surface", "embed_cluster_purity", "text_term_drift",
      "mm_aspect_buckets", "sim_nn_descent_round"
    )

  /** The sweep itself, callable from the CLI main AND from the test
    * suite (round-11 brief #6: the standalone gate went stale mid-round
    * twice in r10 — inside `sbt test` the allowlist can't drift from the
    * registry unnoticed). Returns `name -> issues` for every flagged
    * query; empty = clean.
    */
  def sweep(spark: org.apache.spark.sql.SparkSession, sfDir: String): Seq[(String, Seq[String])] =
    graft.SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val plan = fn(spark, sfDir).queryExecution.executedPlan.toString
      val issues = Seq(
        "BroadcastNestedLoopJoin" -> (plan.contains("BroadcastNestedLoopJoin") && !intendedNestedLoop(name)),
        "CartesianProduct"        -> plan.contains("CartesianProduct")
      ).collect { case (tag, true) => tag }
      if (issues.isEmpty) Nil else Seq(name -> issues)
    }

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = graft.GraftSession.builder("graft-plan-audit").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val flagged = sweep(spark, sfDir)
    flagged.foreach { case (name, issues) => println(s"FLAG $name: ${issues.mkString(", ")}") }
    println(s"audit done: ${flagged.size} flagged of ${graft.SparkEntry.queries.size}")
    spark.stop()
    if (flagged.nonEmpty) sys.exit(1)
  }
}
