package graft.plans

import org.apache.spark.sql.catalyst.expressions.Attribute
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}

/** Logical as-of join (SURVEY.md §2 B9, custom-operator form): for every
  * probe (left) row, attach the nearest build (right) values at or before
  * (`backward`: latest `rightTs <= leftTs`) or at or after (`forward`:
  * earliest `rightTs >= leftTs`) the probe timestamp for the same key;
  * probe rows with no qualifying build row — including matches farther
  * than `tolerance` time units away, when set — get nulls (left-outer
  * semantics).
  *
  * This is the whole-operator Catalyst route — logical node, planner
  * strategy (AsOfJoinStrategy), physical merge exec (AsOfJoinExec) —
  * reserved for exactly this case: semantics the built-in operators can
  * only express with a blow-up (the composed form unions both sides and
  * window-scans; a naive form range-joins). The node is constructed
  * post-analysis from resolved children (AsOfJoin.asOfNative), so all
  * attributes are already bound.
  */
case class AsOfJoinPlan(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKey: Attribute,
    leftTs: Attribute,
    rightKey: Attribute,
    rightTs: Attribute,
    rightValues: Seq[Attribute],
    forward: Boolean = false,
    tolerance: Option[Long] = None
) extends BinaryNode {

  require(tolerance.forall(_ >= 0L), s"as-of tolerance must be >= 0 (got $tolerance)")

  // build values are nullable in the output: probe rows with no
  // at-or-before build row emit null
  override def output: Seq[Attribute] =
    left.output ++ rightValues.map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan,
      newRight: LogicalPlan
  ): AsOfJoinPlan = copy(left = newLeft, right = newRight)
}
