package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Narrow bridge into Spark's `private[sql]` Column<->Expression helpers
  * (org.apache.spark.sql.classic.ExpressionUtils, public Spark source).
  * Lives under org.apache.spark.sql so the package-private object is
  * visible; the rest of the engine goes through this one indirection.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
