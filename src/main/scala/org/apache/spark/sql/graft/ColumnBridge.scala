package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 made `Column` an opaque ColumnNode wrapper; the lift between a
  * Catalyst `Expression` and a `Column` (`classic.ExpressionUtils`) is
  * `private[sql]`. This bridge lives inside the org.apache.spark.sql
  * package tree solely to re-export those two lifts for graft's custom
  * expressions — no other Spark internals are touched.
  */
object ColumnBridge {
  def column(e: Expression): Column     = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
