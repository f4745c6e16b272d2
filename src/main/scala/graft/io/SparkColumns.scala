package org.apache.spark.sql.graftio

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge to the `private[sql]` Column <-> catalyst Expression
  * conversions (Spark 4 moved `Column(expr)` behind the Connect
  * ColumnNode layer). Lets graft define native codegen'd expressions
  * (see `graft.functions.VecMath`) and use them in DataFrame code. */
object Columns {
  def of(e: Expression): Column = ExpressionUtils.column(e)
  def exprOf(c: Column): Expression = ExpressionUtils.expression(c)
}
