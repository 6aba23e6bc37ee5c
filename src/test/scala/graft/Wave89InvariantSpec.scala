package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Certification invariants for the r14 depth additions: the full
  * Louvain level (B258, `graph_louvain_level`).
  */
class Wave89InvariantSpec extends GraftSpecBase {

  private def run(name: String): DataFrame =
    SparkEntry.queries(name)(spark, sf())

  test("graph_louvain_level: mass conservation across contraction and level-2 moves") {
    val rows = run("graph_louvain_level").collect()
    assert(rows.nonEmpty)
    // base nodes are conserved: Σ n_base_nodes = the co-purchase graph's
    // node count
    val edges = operators.GraphOps.copurchaseEdges(Tables.lineitem(spark, sf()), 2L)
    val nNodes = edges.select(col("u").as("n"))
      .unionByName(edges.select(col("v").as("n"))).distinct().count()
    assert(rows.map(_.getAs[Long]("n_base_nodes")).sum === nNodes)
    // supernodes are conserved: Σ n_supernodes = pass-1 community count
    val (_, picked) = QueriesExt70.louvainPass1(spark, sf())
    val nComms = picked.select(col("newcomm")).distinct().count()
    assert(rows.map(_.getAs[Long]("n_supernodes")).sum === nComms)
    // level-2 moves are bounded by the supernode count, and the
    // 1-row-broadcast columns are constant across rows
    val moved = rows.map(_.getAs[Long]("n_moved_l2")).distinct
    assert(moved.length === 1 && moved.head >= 0L && moved.head <= nComms)
    assert(rows.map(_.getAs[Long]("q_pass1_ppm")).distinct.length === 1)
    assert(rows.map(_.getAs[Long]("q_level_ppm")).distinct.length === 1)
    // modularity stays in [-1, 1] ppm bounds
    rows.take(1).foreach { r =>
      assert(math.abs(r.getAs[Long]("q_pass1_ppm")) <= 1000000L)
      assert(math.abs(r.getAs[Long]("q_level_ppm")) <= 1000000L)
    }
  }

  test("graph_louvain_level: contraction invariance — q_pass1 equals the base-graph Q of pass 1") {
    // the level query computes pass-1 modularity ON THE CONTRACTED graph
    // (self-loops + weighted degrees); graph_louvain_pass computes the
    // SAME partition's Q on the base graph — the classic contraction
    // invariance says the integers match exactly (identical e_in/d_sum/m
    // per community, identical div arithmetic)
    val level = run("graph_louvain_level").head()
    val pass  = run("graph_louvain_pass").head()
    assert(level.getAs[Long]("q_pass1_ppm") === pass.getAs[Long]("q_after_ppm"))
  }

  test("graph_louvain_level: the level contracts (no more final communities than supernodes)") {
    val rows = run("graph_louvain_level").collect()
    val nFinal = rows.length.toLong
    val nSuper = rows.map(_.getAs[Long]("n_supernodes")).sum
    assert(nFinal <= nSuper)
    // on this fixture the second pass genuinely merges (moves > 0) —
    // pinned so a scoring regression that freezes every supernode in
    // place fails loudly rather than shipping a no-op level
    assert(rows.head.getAs[Long]("n_moved_l2") > 0L)
  }
}
