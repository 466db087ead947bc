package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge for constructing a public [[Column]] from a Catalyst
  * [[Expression]] (the constructor is `private[sql]` in Spark 4.x).
  * Lives in the org.apache.spark.sql package solely for access; the
  * library's own code is all under `graft.*`. */
object GraftColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
