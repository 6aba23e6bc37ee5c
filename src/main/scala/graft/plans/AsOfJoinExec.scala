package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Ascending, Attribute, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection
}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}
import org.apache.spark.sql.execution.metric.SQLMetrics

/** Physical as-of join: a single partition-local merge of two sorted
  * streams.
  *
  * Scale shape: `requiredChildDistribution` co-partitions both sides on
  * the key (EnsureRequirements inserts compatible hash exchanges — or
  * none, if an upstream shuffle/bucketing already satisfies it) and
  * `requiredChildOrdering` demands (key, ts) sort within partitions. The
  * merge itself is then one forward pass over each side per partition —
  * O(n+m), no candidate explosion, build rows never buffered beyond the
  * single remembered last-match. Contrast with the composed form
  * (AsOfJoin.asOf), which unions both sides into one shuffle+sort and
  * window-scans; here the probe side's columns never widen and each side
  * sorts only its own rows.
  *
  * Keys and timestamps are required LongType (checked at construction in
  * AsOfJoin.asOfNative) — the CDC surface this engine serves keys by id
  * and epoch-millis.
  *
  * `forward` flips the direction (earliest build row with ts >= probe ts);
  * `tolerance` nulls out matches farther than the given time units from
  * the probe (both directions). Both compose with the same one-pass merge.
  */
case class AsOfJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKey: Attribute,
    leftTs: Attribute,
    rightKey: Attribute,
    rightTs: Attribute,
    rightValues: Seq[Attribute],
    forward: Boolean,
    tolerance: Option[Long]
) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ rightValues.map(_.withNullability(true))

  override lazy val metrics = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows")
  )

  override def requiredChildDistribution: Seq[Distribution] =
    Seq(ClusteredDistribution(Seq(leftKey)), ClusteredDistribution(Seq(rightKey)))

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTs, Ascending))
  )

  override def outputPartitioning: Partitioning = left.outputPartitioning

  // probe order is preserved — downstream sorts on (key, ts) are elided
  override def outputOrdering: Seq[SortOrder] =
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending))

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan,
      newRight: SparkPlan
  ): AsOfJoinExec = copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val numOutputRows = longMetric("numOutputRows")
    val pKeyIdx = left.output.indexWhere(_.exprId == leftKey.exprId)
    val pTsIdx  = left.output.indexWhere(_.exprId == leftTs.exprId)
    val bKeyIdx = right.output.indexWhere(_.exprId == rightKey.exprId)
    val bTsIdx  = right.output.indexWhere(_.exprId == rightTs.exprId)
    require(pKeyIdx >= 0 && pTsIdx >= 0 && bKeyIdx >= 0 && bTsIdx >= 0, "as-of columns not found in child output")
    val valueExprs = rightValues
    val rightOut   = right.output
    val nValues    = rightValues.length

    val isForward = forward
    val tol       = tolerance

    left.execute().zipPartitions(right.execute()) { (probeIter, buildIter) =>
      val valueProj = UnsafeProjection.create(valueExprs, rightOut)
      val nullVals  = new GenericInternalRow(nValues)
      val joiner    = new JoinedRow
      // emit UnsafeRows: parents (shuffles, direct collect) assume the
      // UnsafeRow contract from SparkPlan output — JoinedRow would CCE
      val resultProj = UnsafeProjection.create(output, output)

      new Iterator[InternalRow] {
        // the single remembered build state (backward mode): latest values
        // at-or-before the probe for matchKey, and their timestamp (for
        // the tolerance check)
        private var matchKey: Long            = 0L
        private var matchTs: Long             = 0L
        private var matchValid: Boolean       = false
        private var matchVals: InternalRow    = null
        // one-row lookahead into the build side
        private var pending: InternalRow      = null
        private var pendingKey: Long          = 0L
        private var pendingTs: Long           = 0L

        private def loadPending(): Boolean = {
          while (pending == null && buildIter.hasNext) {
            val r = buildIter.next()
            if (!r.isNullAt(bKeyIdx) && !r.isNullAt(bTsIdx)) {
              pending = r
              pendingKey = r.getLong(bKeyIdx)
              pendingTs = r.getLong(bTsIdx)
            } // null-keyed build rows can never match — skip
          }
          pending != null
        }

        /** Backward: consume build rows up to and including (pk, pts); the
          * last consumed row with key == pk becomes the remembered match.
          * Rows with key < pk are discarded — probes are sorted, so no
          * later probe can want them.
          */
        private def advanceBackward(pk: Long, pts: Long): Unit = {
          var go = true
          while (go && loadPending()) {
            if (pendingKey < pk || (pendingKey == pk && pendingTs <= pts)) {
              if (pendingKey == pk) {
                matchKey = pk
                matchTs = pendingTs
                matchValid = true
                // copy: UnsafeProjection reuses its buffer and the child
                // iterator may reuse the row
                matchVals = valueProj(pending).copy()
              }
              pending = null
            } else go = false
          }
        }

        /** Forward: discard build rows strictly before the probe (key < pk,
          * or same key with ts < pts) — probe timestamps ascend, so no
          * later probe can want them either. The lookahead row is then the
          * earliest at-or-after candidate; it is NOT consumed (the next
          * probe may need it too).
          */
        private def advanceForward(pk: Long, pts: Long): Unit = {
          var go = true
          while (go && loadPending()) {
            if (pendingKey < pk || (pendingKey == pk && pendingTs < pts)) pending = null
            else go = false
          }
        }

        override def hasNext: Boolean = probeIter.hasNext

        override def next(): InternalRow = {
          val p = probeIter.next()
          numOutputRows += 1
          val joined =
            if (p.isNullAt(pKeyIdx) || p.isNullAt(pTsIdx)) {
              joiner(p, nullVals)
            } else {
              val pk  = p.getLong(pKeyIdx)
              val pts = p.getLong(pTsIdx)
              if (isForward) {
                advanceForward(pk, pts)
                val ok = pending != null && pendingKey == pk &&
                  tol.forall(t => pendingTs - pts <= t)
                if (ok) joiner(p, valueProj(pending)) else joiner(p, nullVals)
              } else {
                advanceBackward(pk, pts)
                val ok = matchValid && matchKey == pk &&
                  tol.forall(t => pts - matchTs <= t)
                if (ok) joiner(p, matchVals) else joiner(p, nullVals)
              }
            }
          resultProj(joined)
        }
      }
    }
  }
}
