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

  /** Non-blocking read of an [[Observation]]'s metrics (the public
    * `get` blocks forever when the observed frame never participated
    * in an action — e.g. a job source the transform didn't consume).
    * Empty map until the first action that covers the observed plan
    * completes. When the optimizer folds the observed subtree to an
    * empty relation (zero-row incremental batch), the metrics Row can
    * arrive WITHOUT a schema — that specific shape means "no rows
    * observed" and maps to the empty result. Any other failure (a
    * genuine bug in the listener path) propagates instead of being
    * silently reported as zero rows. */
  def observedOrEmpty(o: Observation): Map[String, Any] =
    o.getRowOrEmpty match {
      case None => Map.empty
      case Some(row) if row.schema == null => Map.empty
      case Some(row) => row.schema.fieldNames.zip(row.toSeq).toMap
    }
}
