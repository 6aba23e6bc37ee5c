package graft.operators

import graft.GraftSpecBase

/** Pins the r14 depth-robustness upgrade of B71's pointer-doubling
  * flattener (`GraphOps.flattenHierarchy`): correct roots/depths PAST
  * the old fixed-5-round cap (depth ≤ 32), and the loud failure on a
  * parent-pointer cycle that a fixpoint loop would otherwise chase
  * forever.
  */
class HierarchyDepthSpec extends GraftSpecBase {
  import spark.implicits._

  test("flattens a 40-deep chain exactly (past the old 32-level cap)") {
    // chain 0 <- 1 <- 2 <- ... <- 40 plus a second root 100 with one child
    val nodes = ((0L to 40L).map(i => (i, math.max(i - 1, 0L))) ++ Seq((100L, 100L), (101L, 100L)))
      .toDF("id", "parent")
    val flat = GraphOps.flattenHierarchy(nodes, "id", "parent")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    (0L to 40L).foreach { i => assert(flat(i) === ((0L, i)), s"node $i") }
    assert(flat(100L) === ((100L, 0L)))
    assert(flat(101L) === ((100L, 1L)))
  }

  test("depth is exact at the doubling boundaries (2^k and 2^k + 1)") {
    // boundaries are where an off-by-one in the jump accumulation hides
    val n = 65L // covers 32, 33, 64, 65
    val nodes = (0L to n).map(i => (i, math.max(i - 1, 0L))).toDF("id", "parent")
    val flat = GraphOps.flattenHierarchy(nodes, "id", "parent")
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    Seq(31L, 32L, 33L, 63L, 64L, 65L).foreach { i => assert(flat(i) === i, s"depth of node $i") }
  }

  test("a parent-pointer cycle fails loudly instead of looping") {
    // 2-cycle with no root reachable: 1 -> 2 -> 1
    val nodes = Seq((1L, 2L), (2L, 1L)).toDF("id", "parent")
    val e = intercept[IllegalArgumentException] {
      GraphOps.flattenHierarchy(nodes, "id", "parent", maxRounds = 8)
    }
    assert(e.getMessage.contains("cycle"))
  }
}
