package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 made Column ↔ Expression conversion `private[sql]`
  * (Spark Connect column-node refactor). This bridge re-exports the two
  * conversions custom Catalyst expressions need; it lives under
  * `org.apache.spark.sql` purely for access, contains no logic, and is the
  * supported pattern for libraries that register native expressions. */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
