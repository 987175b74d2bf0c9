package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to the sql-private Column ⇄ Expression converters (Spark 4
  * decoupled Column from Catalyst). Same technique used by public Spark
  * extension libraries; the two calls below are the entire private-API
  * surface this project touches.
  */
object GraftShims {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
