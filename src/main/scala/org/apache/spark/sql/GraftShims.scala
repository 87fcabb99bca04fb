package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge between Catalyst `Expression`s and the public `Column` API.
  * Spark 4 moved Column construction behind `private[sql]`
  * (`classic.ExpressionUtils`); extension libraries conventionally
  * bridge from inside the package — this object is the only file that
  * lives outside the `graft` namespace.
  */
object GraftShims {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
