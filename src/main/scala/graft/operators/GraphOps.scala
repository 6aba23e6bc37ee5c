package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Shared graph construction for the co-purchase family (SURVEY.md §2
  * B148/B154): the support-pruned "bought together" edge list.
  *
  * Plan shape: ONE hash-agg groups each order's distinct parts into a
  * sorted array (collect_set dedups in the same pass — no separate
  * DISTINCT shuffle), pairs are generated row-side from that bounded
  * array (per-order line counts are bounded by order size, so the
  * explode is O(lines²) per order with a small constant), and a second
  * hash-agg counts pair support. Two shuffles total — the previous
  * distinct + self-join + count form carried three, plus a 6M×6M join at
  * sf1 (measured 2.3 s → 0.9 s at sf0.1 for the degree query when this
  * replaced it).
  */
object GraphOps {

  /** Undirected support-≥minSupport co-purchase edges (u < v).
    *
    * The support count is a hash-agg over the exploded pair stream whose
    * keys are MOSTLY UNIQUE (a pair rarely repeats), which makes Spark's
    * map-side partial aggregation pure overhead: each map task builds a
    * millions-of-keys hash map that reduces nothing and tips into
    * sort-spill once the corpus outgrows the task count (the sf10 probe
    * measured the stage at 17.6× for 10× data — AQE's parallelism-first
    * coalescing pins task counts at core count regardless of volume). So
    * the pairs are explicitly hash-repartitioned on (u, v) first: the
    * exchange satisfies the aggregation's required distribution, the
    * planner emits a SINGLE-level HashAggregate, and per-task agg state
    * is pairs/N instead of pairs/cores. N derives from the scan's
    * statistics (bytes/16 MB), so the plan keeps scaling where a
    * constant — 32 or 256 — would re-create the spill at the next decade.
    * (Same sf10: 132 s → 28 s for the support stage.)
    */
  def copurchaseEdges(lineitem: DataFrame, minSupport: Long): DataFrame =
    // Session-cached eager materialization (r14 diet): eleven graph
    // queries consume this exact edge list per session, and a real
    // deployment lands it in storage once per fact snapshot. The pinned
    // table is the SUPPORT-PRUNED edge list (small — support ≥ 2 cuts
    // TPC-H's mostly-unique pairs hard). Plan-keyed via sameResult +
    // minSupport; see SessionStageCache. r16: derives from the shared
    // pair-count stage below instead of re-running the basket build.
    SessionStageCache.getOrCompute(lineitem, s"copurchaseEdges:$minSupport") {
      copurchasePairCounts(lineitem)
        .where(col("n_orders") >= minSupport)
        .select(col("u"), col("v"))
        .localCheckpoint(true)
    }

  /** The same two-hash-agg pair build with the support count kept:
    * (u, v, n_orders), u < v. Shared by the graph family (via
    * `copurchaseEdges`) and the basket-analysis queries (B66 top pairs,
    * B94 association rules), which previously carried their own
    * distinct + self-join + count form — three shuffles and an
    * every-pair join the array form does row-side.
    *
    * r16 (§2.4, the r15 verdict's cohort/basket-subtree ask): session-
    * cached. THREE independent paths built this identical table per
    * session — the edge-list stage above, B66's top-20, and B94's rule
    * mining — i.e. the fact-table basket aggregation and the pair
    * explode+count ran three times. A real deployment lands pair
    * supports once per fact snapshot (they are the input to rule mining,
    * the top-k, AND the pruned graph). The pinned table is pair-support-
    * sized (basket-bounded, u < v), and the build cost is metered and
    * attributed by the bench like every other stage.
    */
  def copurchasePairCounts(lineitem: DataFrame): DataFrame = {
    // key on the (orderkey, partkey) projection so callers passing the
    // full fact table and callers passing the projection hit ONE entry
    val proj = lineitem.select(col("l_orderkey"), col("l_partkey"))
    SessionStageCache.getOrCompute(proj, "copurchasePairCounts") {
      copurchasePairCountsBuild(proj).localCheckpoint(true)
    }
  }

  /** The UNCACHED pair-support build pipeline — the plan PlanAuditSpec
    * pins (the cached entry above is a Scan ExistingRDD leaf with no
    * build plan to audit).
    */
  private[graft] def copurchasePairCountsBuild(lineitem: DataFrame): DataFrame = {
    val proj = lineitem.select(col("l_orderkey"), col("l_partkey"))
    pairCountsFromBaskets(basketArrays(proj), statsSource = proj)
  }

  /** Parent-pointer hierarchy flattening by POINTER DOUBLING (B71's
    * engine, factored out in r14 so depth robustness is testable in
    * isolation): from (id, parent) rows — a root points at itself — to
    * every node's ROOT ancestor and depth. Each round jumps every node
    * twice as far (`jump' = jump(jump)`, accumulating depth), so rounds
    * are O(log depth), never O(depth) like row-at-a-time recursion. Runs
    * to FIXPOINT (no node still pointing at a non-root), so a hierarchy
    * of ANY depth flattens correctly — a fixed round count silently
    * returns non-root "roots" past depth 2^rounds. Each round
    * localCheckpoints to keep the self-referencing lineage linear;
    * `maxRounds` (default 48, i.e. depth ≤ 2⁴⁸) fails loudly on a
    * parent-pointer CYCLE, which would otherwise loop forever.
    *
    * At 100 TB both join sides bucket on the jump key and the per-round
    * Exchange disappears; the convergence probe is one limit(1) count on
    * the already-checkpointed round output.
    */
  def flattenHierarchy(
      nodes: DataFrame,
      idCol: String,
      parentCol: String,
      maxRounds: Int = 48
  ): DataFrame = {
    val roots = nodes
      .where(col(parentCol) === col(idCol))
      .select(col(idCol).as("anc"))
    var flat = nodes
      .select(
        col(idCol).as("id"),
        col(parentCol).as("anc"),
        when(col(parentCol) === col(idCol), 0L).otherwise(1L).as("d"))
      .localCheckpoint(true)
    var rounds = 0
    while (flat.join(roots, Seq("anc"), "left_anti").limit(1).count() > 0) {
      rounds += 1
      require(
        rounds <= maxRounds,
        s"flattenHierarchy: no fixpoint after $maxRounds doubling rounds — parent-pointer cycle?")
      flat = flat.as("a")
        .join(flat.select(col("id").as("anc"), col("anc").as("anc2"), col("d").as("d2")), Seq("anc"))
        .select(col("id"), col("anc2").as("anc"), (col("d") + col("d2")).as("d"))
        .localCheckpoint(true)
    }
    flat.select(col("id"), col("anc").as("root"), col("d").as("depth"))
  }

  /** One hash-agg: each order's distinct parts as a sorted array —
    * collect_set dedups in the same pass, so consumers that also need
    * per-part basket counts or the basket total (B94) derive them from
    * THIS table instead of re-aggregating the fact table (at sf10 the
    * extra distinct pass was the association-rule query's dominant
    * cost).
    */
  def basketArrays(lineitem: DataFrame): DataFrame =
    lineitem
      .groupBy(col("l_orderkey"))
      .agg(sort_array(collect_set(col("l_partkey"))).as("pks"))

  /** Pair support counts from a (possibly persisted) basket table.
    * `statsSource` supplies the size statistics for the explicit
    * repartition width — pass the raw fact table when available (a
    * persisted basket table's stats are estimates).
    */
  def pairCountsFromBaskets(baskets: DataFrame, statsSource: DataFrame): DataFrame = {
    val scanBytes = statsSource.queryExecution.optimizedPlan.stats.sizeInBytes
    val cores     = baskets.sparkSession.sparkContext.defaultParallelism
    val nPart = scanBytes
      .max(BigInt(1))./(BigInt(16L * 1024 * 1024))
      .min(BigInt(4096))
      .max(BigInt(cores))
      .toInt
    baskets
      .select(
        explode(
          flatten(
            transform(
              col("pks"),
              (x, i) =>
                transform(
                  slice(col("pks"), i + lit(2), greatest(size(col("pks")) - i - 1, lit(0))),
                  y => struct(x.as("u"), y.as("v"))
                )
            )
          )
        ).as("p")
      )
      .select(col("p.u").as("u"), col("p.v").as("v"))
      .repartition(nPart, col("u"), col("v"))
      .groupBy(col("u"), col("v"))
      .agg(count(lit(1)).as("n_orders"))
  }

  /** Every triangle of an undirected (u < v) edge list, enumerated
    * EXACTLY ONCE via the degree-ordered orientation — the web-scale
    * standard (and the r10→r11 fix that took neighbor-Jaccard from
    * Σ deg² to Σ outdeg² ≤ O(m^1.5): a hub's wedges are generated at
    * its LOW-degree neighbors). Each edge is oriented toward its
    * higher-(degree, id) endpoint; wedges form at each triangle's
    * lowest corner as ordered out-neighbor pairs; one equi-join against
    * the oriented edges closes them. Returns (x, y, z) with x the
    * lowest-(degree, id) corner and y before z in that order. Shared by
    * the neighbor-Jaccard (B229) and clustering-coefficient (B273)
    * queries; callers should pass a materialized (checkpointed) edge
    * list — this plan consumes it three times.
    */
  def orientedTriangles(edges: DataFrame): DataFrame = {
    val adj = edges
      .select(col("u").as("node"), col("v").as("nb"))
      .union(edges.select(col("v").as("node"), col("u").as("nb")))
    val deg = adj.groupBy(col("node")).agg(count(lit(1)).as("dg"))
    val ranked = edges
      .join(deg.select(col("node").as("u"), col("dg").as("du")), Seq("u"))
      .join(deg.select(col("node").as("v"), col("dg").as("dv")), Seq("v"))
      .select(
        col("u"), col("v"),
        struct(col("du").as("d"), col("u").as("n")).as("ru"),
        struct(col("dv").as("d"), col("v").as("n")).as("rv"))
    val oriented = ranked.select(
      when(col("ru") < col("rv"), col("u")).otherwise(col("v")).as("tail"),
      when(col("ru") < col("rv"), col("rv")).otherwise(col("ru")).as("head"))
    oriented
      .select(col("tail").as("x"), col("head").as("lo"))
      .join(oriented.select(col("tail").as("x"), col("head").as("hi")), Seq("x"))
      .filter(col("lo") < col("hi"))
      .join(
        oriented.select(col("tail").as("t2"), col("head").as("h2")),
        col("lo.n") === col("t2") && col("hi") === col("h2"),
        "left_semi")
      .select(col("x"), col("lo.n").as("y"), col("hi.n").as("z"))
  }
}
