package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-15 depth additions (r14 verdict #4): multi-level Louvain TO
  * CONVERGENCE — B258's level step iterated until modularity stops
  * improving, emitting the per-level curve. Registered under B258
  * beside `graph_louvain_pass` and `graph_louvain_level`.
  */
object QueriesExt90 {

  /** Hard level bound: each level runs on the previous level's
    * supergraph, and the matching merge at least halves whatever is
    * still merging, so on any graph where pass 1 contracts at all the
    * hierarchy bottoms out in a handful of levels; 8 keeps the plan (and
    * the DuckDB oracle's unrolled CTE chain) statically bounded while
    * being exactly where both fixtures plateau (sf0.001 stalls at
    * level 7; sf0.01 reaches its flat-Q stall row at level 8).
    */
  private val MaxLevels = 8

  /** Eager materialization + STATS-RESET barrier for a level-boundary
    * frame. `Dataset.localCheckpoint` alone is not enough here: the
    * `LogicalRDD` it produces PRESERVES the origin plan's `Statistics`
    * (`originStats`), so chaining checkpointed levels compounds
    * sizeInBytes multiplicatively — each level's leaves inherit the
    * previous level's join-product estimate, the BigInt digit count
    * grows exponentially with level, and by level ~7 the optimizer
    * (stats visitor under `InjectRuntimeFilter`/join selection) is
    * multiplying million-bit integers: planning went from ~2 s to 55 s+
    * per level on the SMALLEST fixture. Rebuilding the frame from the
    * checkpointed RDD drops `originStats` (the new leaf reports the
    * default size), so every level plans against flat leaves. All
    * barrier frames are supergraph-sized (bounded by community count),
    * so the external-row round-trip is immaterial at any corpus scale.
    */
  private def flat(df: DataFrame): DataFrame = {
    val c = df.localCheckpoint(true)
    c.sparkSession.createDataFrame(c.rdd, c.schema)
  }

  /** `graph_louvain_converge` — full multi-level Louvain on the
    * co-purchase graph: B258's node-level refinement pass (level 1),
    * then REPEATED community contraction + weighted singleton-argmax
    * passes (levels 2..8), stopping at the first level whose modularity
    * does not improve on the previous one. Emits the LEVEL CURVE — one
    * row per executed level with the community count, move count, and
    * exact modularity (ppm) after that level — the readout that says
    * where the hierarchy stopped paying.
    *
    * Honest-readout note (simultaneous-move oscillation): every pass
    * moves ALL nodes at once, so at a plateau two symmetric supernodes
    * can keep swapping labels forever — n_moved can stay positive while
    * Q is exactly flat. The stopping rule is therefore on Q alone
    * (first MERGE level ℓ≥2 with q_ppm(ℓ) ≤ q_ppm(ℓ−1) is the last
    * emitted level), and the curve deliberately SHOWS the stall row,
    * oscillating moves included, rather than hiding it. Level 1 is
    * exempt from the stop rule: the simultaneous refinement pass is the
    * algorithm's mandatory step and is known non-monotone (this fixture:
    * Q dips 2172→2138 ppm across pass 1, then the merge levels climb).
    *
    * Merge-level semantics (weighted graph with self-loops, all BIGINT-
    * exact): after contraction every supernode is a singleton, and the
    * textbook merge gain scaled by 4m² is ΔQ ∝ 4m·w(C,D) − 2·k_C·k_D.
    * A free simultaneous argmax is label-UNSTABLE here (on a dense
    * supergraph every singleton's best move is positive, all labels
    * rotate at once, and Q collapses — measured on both fixtures), so
    * merge levels use MUTUAL-BEST-PAIR MATCHING instead: C merges with
    * D iff each is the other's highest-positive-gain neighbor, taking
    * the smaller label (heavy-edge matching, the standard multilevel-
    * partitioning agglomeration). Matched pairs are disjoint and
    * modularity's community terms are additive, so each merge level
    * RAISES Q by exactly the sum of its pairs' positive gains —
    * monotone by construction, which is what lets "iterate until Q
    * stops improving" terminate meaningfully.
    * Modularity is computed on each level's CONTRACTED graph
    * (Q = Σ_f [4m·w_self(f) − k_f²] / 4m², self-loops carrying all
    * internal weight), which equals base-graph modularity under the
    * composed assignment — the contraction invariance that makes
    * multi-level Louvain correct (Wave89InvariantSpec pins it for level
    * 1; Wave90InvariantSpec pins the curve's monotonicity + mass
    * conservation here).
    *
    * Scale shape: level 1 is B258's bounded plan over the session-cached
    * edge list; every later level is supergraph-sized work (two keyed
    * aggs + a community-keyed argmax over ≤ |communities| rows, each
    * level localCheckpointed so the lineage stays flat). The driver
    * never holds data: levels are a STATIC 8-step unroll of tiny-table
    * DataFrame ops, and the convergence filter is computed as a 1-row
    * broadcast join, not a collect. At 100 TB the level-1 pass dominates
    * end-to-end cost exactly as in the single-level query; the
    * convergence loop adds only community-bounded work.
    */
  private def graphLouvainConverge(s: SparkSession, dir: String): DataFrame = {
    val (edges, picked) = QueriesExt70.louvainPass1(s, dir)
    val m1 = edges.agg(count(lit(1)).as("m")) // 1 row

    // Q on a contracted graph from (kc: community degrees, wSelf:
    // internal weights): Σ(4m·w_self − kc²)·1e6 div 4m² — DECIMAL(38,0)
    // route, div → BIGINT, mirroring the DuckDB HUGEINT // BIGINT cast.
    def qPpm(wSelf: DataFrame, kc: DataFrame): DataFrame =
      kc.join(wSelf, Seq("c"), "left").na.fill(0L, Seq("w_self"))
        .crossJoin(broadcast(m1))
        .agg(
          sum(expr(
            "4 * CAST(m AS DECIMAL(38,0)) * w_self - CAST(kc AS DECIMAL(38,0)) * kc")).as("num"),
          max(col("m")).as("mm"))
        .select(expr("num * 1000000 div (4 * CAST(mm AS DECIMAL(38,0)) * mm)").as("q_ppm"))

    // contract the BASE edge list under a node assignment (node, k, c)
    def contractBase(asg: DataFrame): (DataFrame, DataFrame, DataFrame) = {
      val ce = edges
        .join(asg.select(col("node").as("u"), col("c").as("cu")), Seq("u"))
        .join(asg.select(col("node").as("v"), col("c").as("cv")), Seq("v"))
        .select(col("cu"), col("cv"))
        .localCheckpoint(true)
      val wSelf = flat(ce.where(col("cu") === col("cv"))
        .groupBy(col("cu").as("c")).agg(count(lit(1)).as("w_self")))
      val wCross = flat(ce.where(col("cu") =!= col("cv"))
        .select(least(col("cu"), col("cv")).as("ca"), greatest(col("cu"), col("cv")).as("cb"))
        .groupBy(col("ca"), col("cb")).agg(count(lit(1)).as("w")))
      val kc = flat(asg.groupBy(col("c")).agg(sum(col("k")).as("kc")))
      (wSelf, wCross, kc)
    }

    // One MATCHING-based merge pass on a supergraph → (sn, fc, k_c).
    // Each supernode picks its best strictly-positive-gain neighbor
    // (singleton ΔQ ∝ 4m·w(C,D) − 2·k_C·k_D); a merge applies ONLY when
    // the pick is MUTUAL, and the pair takes the smaller label. Mutual
    // pairs are disjoint, modularity's community terms are additive, and
    // each pair's gain is positive — so Q is PROVABLY monotone through
    // merge levels (heavy-edge-matching-style agglomeration, the
    // standard multilevel-partitioning device), unlike the free
    // simultaneous argmax, which label-rotates on dense supergraphs
    // (every supernode moves, Q collapses — measured on both fixtures).
    def mergePass(wCross: DataFrame, kc: DataFrame): DataFrame = {
      val nb2 = wCross.select(col("ca").as("sn"), col("cb").as("cand"), col("w"))
        .unionByName(wCross.select(col("cb").as("sn"), col("ca").as("cand"), col("w")))
      val best = nb2
        .join(kc.select(col("c").as("sn"), col("kc").as("k_c")), Seq("sn"))
        .join(kc.select(col("c").as("cand"), col("kc").as("k_d")), Seq("cand"))
        .crossJoin(broadcast(m1))
        .withColumn("score", expr("4 * m * w - 2 * k_c * k_d"))
        .where(col("score") > 0)
        .withColumn(
          "rn",
          row_number().over(Window.partitionBy(col("sn"))
            .orderBy(col("score").desc, col("cand").asc)))
        .filter(col("rn") === 1)
        .select(col("sn"), col("cand").as("pick"))
        .localCheckpoint(true)
      val mutual = best
        .join(best.select(col("sn").as("pick"), col("pick").as("pick2")), Seq("pick"))
        .where(col("pick2") === col("sn"))
        .select(col("sn"), least(col("sn"), col("pick")).as("fc"))
      flat(kc.select(col("c").as("sn"), col("kc").as("k_c"))
        .join(mutual, Seq("sn"), "left")
        .select(col("sn"), coalesce(col("fc"), col("sn")).as("fc"), col("k_c")))
    }

    // contract a SUPERGRAPH under a pass's picks
    def contractSuper(wSelf: DataFrame, wCross: DataFrame, pickedL: DataFrame)
        : (DataFrame, DataFrame, DataFrame) = {
      val mapping = pickedL.select(col("sn"), col("fc"))
      val crossM = wCross
        .join(mapping.select(col("sn").as("ca"), col("fc").as("fa")), Seq("ca"))
        .join(mapping.select(col("sn").as("cb"), col("fc").as("fb")), Seq("cb"))
        .select(col("fa"), col("fb"), col("w"))
        .localCheckpoint(true)
      val selfIn = wSelf.join(mapping.select(col("sn").as("c"), col("fc")), Seq("c"))
        .groupBy(col("fc").as("c")).agg(sum(col("w_self")).as("w"))
      val crossIn = crossM.where(col("fa") === col("fb"))
        .groupBy(col("fa").as("c")).agg(sum(col("w")).as("w"))
      val wSelf2 = flat(selfIn.unionByName(crossIn)
        .groupBy(col("c")).agg(sum(col("w")).as("w_self")))
      val wCross2 = flat(crossM.where(col("fa") =!= col("fb"))
        .select(least(col("fa"), col("fb")).as("ca"), greatest(col("fa"), col("fb")).as("cb"), col("w"))
        .groupBy(col("ca"), col("cb")).agg(sum(col("w")).as("w")))
      val kc2 = flat(pickedL.groupBy(col("fc").as("c")).agg(sum(col("k_c")).as("kc")))
      (wSelf2, wCross2, kc2)
    }

    def statsRow(level: Long, nMoved: DataFrame, wSelf: DataFrame, kc: DataFrame): DataFrame =
      kc.agg(count(lit(1)).as("n_communities"))
        .crossJoin(broadcast(nMoved))
        .crossJoin(broadcast(qPpm(wSelf, kc)))
        .select(lit(level).as("level"), col("n_communities"), col("n_moved"), col("q_ppm"))

    val zeroMoved = s.range(1).select(lit(0L).as("n_moved"))

    // level 0: the initial brand-seeded partition, contracted (Q baseline)
    val asg0 = picked.select(col("node"), col("k"), col("comm").as("c"))
    val (wSelf0, _, kc0) = contractBase(asg0)
    var rows = Seq(statsRow(0L, zeroMoved, wSelf0, kc0))

    // level 1: the node-level refinement pass, contracted
    val asg1 = picked.select(col("node"), col("k"), col("newcomm").as("c"))
    val moved1 = picked.agg(
      sum(when(col("newcomm") =!= col("comm"), 1L).otherwise(0L)).as("n_moved"))
    var (wSelfC, wCrossC, kcC) = contractBase(asg1)
    rows :+= statsRow(1L, moved1, wSelfC, kcC)

    // levels 2..MaxLevels: matching merge + contraction on the supergraph
    var lvl = 2
    while (lvl <= MaxLevels) {
      val p = mergePass(wCrossC, kcC)
      val movedL = p.agg(sum(when(col("fc") =!= col("sn"), 1L).otherwise(0L)).as("n_moved"))
      val next = contractSuper(wSelfC, wCrossC, p)
      wSelfC = next._1; wCrossC = next._2; kcC = next._3
      rows :+= statsRow(lvl.toLong, movedL, wSelfC, kcC)
      lvl += 1
    }

    // convergence filter: emit levels 0..ca where ca is the first MERGE
    // level (ℓ≥2) whose Q fails to improve on its predecessor (else
    // MaxLevels) — computed as a 1-row broadcast, no driver-side data.
    // Level 1 is exempt from the stop rule: the simultaneous-move
    // refinement pass is the algorithm's mandatory step and is known
    // non-monotone (on this fixture Q dips 2172→2138 ppm — the two-node
    // swap oscillation), so gating on it would stop every run at level 1.
    val curve = rows.reduce(_ unionByName _)
    val prev  = curve.select(col("level").as("lp"), col("q_ppm").as("q_prev"))
    val conv = curve.join(prev, col("level") === col("lp") + 1)
      .where(col("q_ppm") <= col("q_prev") && col("level") >= 2)
      .agg(min(col("level")).as("ca"))
      .select(coalesce(col("ca"), lit(MaxLevels.toLong)).as("ca"))
    curve.crossJoin(broadcast(conv))
      .where(col("level") <= col("ca"))
      .select(col("level"), col("n_communities"), col("n_moved"), col("q_ppm"))
  }

  // ---- DuckDB oracle: the same static unroll, generated per level ------

  /** weighted pass + contraction + stats CTE block for level `l`
    * (reading supergraph CTEs suffixed with `p = l-1`).
    */
  private def levelBlockSql(l: Int): String = {
    val p = l - 1
    s"""cand$l AS (
       |  SELECT ca AS sn, cb AS cand, w FROM wcross$p
       |  UNION ALL SELECT cb AS sn, ca AS cand, w FROM wcross$p),
       |best$l AS MATERIALIZED (
       |  SELECT sn, cand AS pick FROM (
       |    SELECT c2.sn, c2.cand,
       |      row_number() OVER (PARTITION BY c2.sn
       |        ORDER BY (4 * m.m * c2.w - 2 * ka.kc * kb.kc) DESC, c2.cand ASC) AS rn
       |    FROM cand$l c2 JOIN kc$p ka ON ka.c = c2.sn JOIN kc$p kb ON kb.c = c2.cand, m
       |    WHERE 4 * m.m * c2.w - 2 * ka.kc * kb.kc > 0) WHERE rn = 1),
       |mut$l AS (
       |  SELECT a.sn, least(a.sn, a.pick) AS fc
       |  FROM best$l a JOIN best$l b ON b.sn = a.pick AND b.pick = a.sn),
       |picked$l AS MATERIALIZED (
       |  SELECT k.c AS sn, coalesce(mu.fc, k.c) AS fc, k.kc AS k_c
       |  FROM kc$p k LEFT JOIN mut$l mu ON mu.sn = k.c),
       |crossm$l AS MATERIALIZED (
       |  SELECT pu.fc AS fa, pv.fc AS fb, wc.w FROM wcross$p wc
       |    JOIN picked$l pu ON pu.sn = wc.ca JOIN picked$l pv ON pv.sn = wc.cb),
       |wself$l AS MATERIALIZED (
       |  SELECT c, CAST(sum(w) AS BIGINT) AS w_self FROM (
       |    SELECT p2.fc AS c, ws.w_self AS w FROM wself$p ws JOIN picked$l p2 ON p2.sn = ws.c
       |    UNION ALL SELECT fa AS c, w FROM crossm$l WHERE fa = fb)
       |  GROUP BY 1),
       |wcross$l AS MATERIALIZED (
       |  SELECT least(fa, fb) AS ca, greatest(fa, fb) AS cb, CAST(sum(w) AS BIGINT) AS w
       |  FROM crossm$l WHERE fa != fb GROUP BY 1, 2),
       |kc$l AS MATERIALIZED (SELECT fc AS c, CAST(sum(k_c) AS BIGINT) AS kc FROM picked$l GROUP BY 1),
       |mv$l AS (SELECT CAST(sum(CASE WHEN fc != sn THEN 1 ELSE 0 END) AS BIGINT) AS n_moved FROM picked$l),
       |st$l AS (
       |  SELECT CAST($l AS BIGINT) AS level,
       |    (SELECT CAST(count(*) AS BIGINT) FROM kc$l) AS n_communities,
       |    (SELECT n_moved FROM mv$l) AS n_moved,
       |    (SELECT CAST(sum(4 * CAST(m.m AS HUGEINT) * coalesce(w.w_self, 0) - CAST(k.kc AS HUGEINT) * k.kc)
       |        * 1000000 // (4 * CAST(max(m.m) AS HUGEINT) * max(m.m)) AS BIGINT)
       |     FROM kc$l k LEFT JOIN wself$l w ON w.c = k.c, m) AS q_ppm)""".stripMargin
  }

  private val graphLouvainConvergeSql = {
    val levelBlocks = (2 to MaxLevels).map(levelBlockSql).mkString(",\n")
    val curveUnion = (0 to MaxLevels).map(l => s"SELECT * FROM st$l").mkString("\n  UNION ALL ")
    s"""WITH pp AS MATERIALIZED (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
       |e0 AS MATERIALIZED (
       |  SELECT a.l_partkey AS u, b.l_partkey AS v
       |  FROM pp a JOIN pp b ON b.l_orderkey = a.l_orderkey AND a.l_partkey < b.l_partkey
       |  GROUP BY 1, 2 HAVING count(*) >= 2),
       |adj AS MATERIALIZED (
       |  SELECT u AS node, v AS nb FROM e0 UNION ALL SELECT v AS node, u AS nb FROM e0),
       |deg AS MATERIALIZED (SELECT node, count(*) AS k FROM adj GROUP BY 1),
       |nodes AS MATERIALIZED (
       |  SELECT d.node, d.k, p.p_brand AS comm FROM deg d JOIN part p ON p.p_partkey = d.node),
       |m AS (SELECT count(*) AS m FROM e0),
       |sigma AS (SELECT comm AS c, CAST(sum(k) AS BIGINT) AS sigma FROM nodes GROUP BY 1),
       |nbc AS (
       |  SELECT a.node, n2.comm AS cand, count(*) AS k_uc
       |  FROM adj a JOIN nodes n2 ON n2.node = a.nb GROUP BY 1, 2),
       |cands AS (
       |  SELECT node, cand, CAST(sum(k_uc) AS BIGINT) AS k_uc FROM (
       |    SELECT node, cand, k_uc FROM nbc
       |    UNION ALL SELECT node, comm AS cand, 0 AS k_uc FROM nodes)
       |  GROUP BY 1, 2),
       |scored AS (
       |  SELECT c.node, n.k, n.comm, c.cand,
       |    4 * m.m * c.k_uc - 2 * n.k * (s.sigma - CASE WHEN c.cand = n.comm THEN n.k ELSE 0 END) AS score
       |  FROM cands c JOIN nodes n ON n.node = c.node JOIN sigma s ON s.c = c.cand, m),
       |pickedn AS MATERIALIZED (
       |  SELECT node, k, comm, newcomm FROM (
       |    SELECT node, k, comm, cand AS newcomm, row_number() OVER (PARTITION BY node
       |      ORDER BY score DESC, (cand = comm) DESC, cand ASC) AS rn
       |    FROM scored) WHERE rn = 1),
       |ce0 AS MATERIALIZED (
       |  SELECT au.comm AS cu, av.comm AS cv FROM e0
       |    JOIN pickedn au ON au.node = e0.u JOIN pickedn av ON av.node = e0.v),
       |wself0 AS MATERIALIZED (SELECT cu AS c, CAST(count(*) AS BIGINT) AS w_self FROM ce0 WHERE cu = cv GROUP BY 1),
       |kc0 AS MATERIALIZED (SELECT comm AS c, CAST(sum(k) AS BIGINT) AS kc FROM pickedn GROUP BY 1),
       |st0 AS (
       |  SELECT CAST(0 AS BIGINT) AS level,
       |    (SELECT CAST(count(*) AS BIGINT) FROM kc0) AS n_communities,
       |    CAST(0 AS BIGINT) AS n_moved,
       |    (SELECT CAST(sum(4 * CAST(m.m AS HUGEINT) * coalesce(w.w_self, 0) - CAST(k.kc AS HUGEINT) * k.kc)
       |        * 1000000 // (4 * CAST(max(m.m) AS HUGEINT) * max(m.m)) AS BIGINT)
       |     FROM kc0 k LEFT JOIN wself0 w ON w.c = k.c, m) AS q_ppm),
       |ce1 AS MATERIALIZED (
       |  SELECT au.newcomm AS cu, av.newcomm AS cv FROM e0
       |    JOIN pickedn au ON au.node = e0.u JOIN pickedn av ON av.node = e0.v),
       |wself1 AS MATERIALIZED (SELECT cu AS c, CAST(count(*) AS BIGINT) AS w_self FROM ce1 WHERE cu = cv GROUP BY 1),
       |wcross1 AS MATERIALIZED (
       |  SELECT least(cu, cv) AS ca, greatest(cu, cv) AS cb, CAST(count(*) AS BIGINT) AS w
       |  FROM ce1 WHERE cu != cv GROUP BY 1, 2),
       |kc1 AS MATERIALIZED (SELECT newcomm AS c, CAST(sum(k) AS BIGINT) AS kc FROM pickedn GROUP BY 1),
       |st1 AS (
       |  SELECT CAST(1 AS BIGINT) AS level,
       |    (SELECT CAST(count(*) AS BIGINT) FROM kc1) AS n_communities,
       |    (SELECT CAST(sum(CASE WHEN newcomm != comm THEN 1 ELSE 0 END) AS BIGINT) FROM pickedn) AS n_moved,
       |    (SELECT CAST(sum(4 * CAST(m.m AS HUGEINT) * coalesce(w.w_self, 0) - CAST(k.kc AS HUGEINT) * k.kc)
       |        * 1000000 // (4 * CAST(max(m.m) AS HUGEINT) * max(m.m)) AS BIGINT)
       |     FROM kc1 k LEFT JOIN wself1 w ON w.c = k.c, m) AS q_ppm),
       |$levelBlocks,
       |curve AS MATERIALIZED (
       |  $curveUnion),
       |conv AS (
       |  SELECT coalesce(min(c.level), CAST($MaxLevels AS BIGINT)) AS ca
       |  FROM curve c JOIN curve p ON p.level = c.level - 1
       |  WHERE c.q_ppm <= p.q_ppm AND c.level >= 2)
       |SELECT level, n_communities, n_moved, q_ppm
       |FROM curve, conv WHERE level <= conv.ca""".stripMargin
  }

  private[graft] def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "graph_louvain_converge" -> (graphLouvainConverge _)
  )

  private[graft] def oracleSql: Map[String, String] = Map(
    "graph_louvain_converge" -> graphLouvainConvergeSql
  )
}
