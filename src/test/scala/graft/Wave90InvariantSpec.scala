package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Certification invariants for the r15 depth addition: multi-level
  * Louvain to convergence (B258, `graph_louvain_converge`).
  */
class Wave90InvariantSpec extends GraftSpecBase {

  private def run(name: String): DataFrame =
    SparkEntry.queries(name)(spark, sf())

  test("graph_louvain_converge: curve is contiguous from level 0 and includes the merge levels") {
    val rows = run("graph_louvain_converge").collect().sortBy(_.getAs[Long]("level"))
    val levels = rows.map(_.getAs[Long]("level")).toSeq
    // levels 0 (brand baseline), 1 (refinement pass), and at least one
    // merge level are always emitted; the stop rule can only truncate
    // at a merge level (ℓ≥2)
    assert(levels.take(3) === Seq(0L, 1L, 2L), s"got levels $levels")
    assert(levels === (0L until levels.size.toLong))
    assert(levels.size <= 9) // MaxLevels = 8 → at most levels 0..8
    // level 0 is the untouched seed partition
    assert(rows.head.getAs[Long]("n_moved") === 0L)
  }

  test("graph_louvain_converge: communities never increase and Q climbs through the merge levels") {
    val rows = run("graph_louvain_converge").collect().sortBy(_.getAs[Long]("level"))
    val ncomm = rows.map(_.getAs[Long]("n_communities")).toSeq
    assert(ncomm.zip(ncomm.tail).forall { case (a, b) => b <= a },
      s"community count must be non-increasing, got $ncomm")
    val q = rows.map(_.getAs[Long]("q_ppm")).toSeq
    q.foreach(v => assert(math.abs(v) <= 1000000L))
    // merge levels strictly improve Q except possibly the LAST emitted
    // row (the stall row the stop rule keeps visible); if the curve ran
    // to the hard bound, the last row may be improving too
    val mergePairs = rows.sliding(2).collect {
      case Array(a, b) if b.getAs[Long]("level") >= 2L =>
        (b.getAs[Long]("level"), a.getAs[Long]("q_ppm"), b.getAs[Long]("q_ppm"))
    }.toSeq
    mergePairs.dropRight(1).foreach { case (lvl, qp, qc) =>
      assert(qc > qp, s"interior merge level $lvl must improve Q ($qp -> $qc)")
    }
    // the fixture genuinely contracts: at least one merge level moves
    assert(rows.filter(_.getAs[Long]("level") >= 2L).map(_.getAs[Long]("n_moved")).sum > 0L)
  }

  test("graph_louvain_converge: level-1 row matches the single-level query (contraction invariance)") {
    val curve = run("graph_louvain_converge").collect().sortBy(_.getAs[Long]("level"))
    val level = run("graph_louvain_level").head()
    // q after pass 1 computed here on the level-1 contracted graph ==
    // q_pass1_ppm of graph_louvain_level (same partition, same 4m²/ppm
    // arithmetic, just via the contraction-invariant route). The merge
    // levels deliberately DIVERGE from graph_louvain_level's free
    // simultaneous pass 2 (matching is label-stable; the free argmax
    // rotates), so only the shared level-1 state is cross-pinned.
    assert(curve(1).getAs[Long]("q_ppm") === level.getAs[Long]("q_pass1_ppm"))
    // matched merges are pairwise: each merge level can at most halve
    // the community count, and every move is into a mutual partner
    val byLevel = curve.map(r => r.getAs[Long]("level") -> r).toMap
    (2L to curve.last.getAs[Long]("level")).foreach { l =>
      val moved = byLevel(l).getAs[Long]("n_moved")
      val prevC = byLevel(l - 1).getAs[Long]("n_communities")
      assert(moved * 2 <= prevC, s"level $l moved $moved of $prevC — more than a matching allows")
    }
  }
}
