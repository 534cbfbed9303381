package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/**
 * Minimal bridge to `private[sql]` Column↔Expression conversions
 * (Spark 4 removed the public `Column.expr` / `new Column(expr)` that
 * Spark 3 extensions used). Lives in the spark.sql package solely to
 * access `classic.ExpressionUtils`; no Spark internals are modified.
 */
object GraftShims {
  def toColumn(e: Expression): Column = classic.ExpressionUtils.column(e)
  def toExpression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
