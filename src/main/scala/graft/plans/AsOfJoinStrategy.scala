package graft.plans

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy}

/** Planner strategy mapping the logical as-of join to its merge exec —
  * injected via SparkSessionExtensions.injectPlannerStrategy
  * (GraftExtensions), the supported extension point.
  */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case p: AsOfJoinPlan =>
      AsOfJoinExec(
        planLater(p.left),
        planLater(p.right),
        p.leftKey,
        p.leftTs,
        p.rightKey,
        p.rightTs,
        p.rightValues,
        p.forward,
        p.tolerance
      ) :: Nil
    case _ => Nil
  }
}
