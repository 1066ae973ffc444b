package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/**
 * Column <-> catalyst Expression bridge. Spark 4 made the converters
 * `private[sql]` (org.apache.spark.sql.classic.ExpressionUtils), so custom
 * Catalyst expressions (graft.text.RollingHash) reach them through this
 * package-located shim — the standard pattern for Spark extension libraries.
 */
object GraftSqlBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Eagerly convert a functions-API Column into a catalyst expression tree
    * (UnresolvedFunction nodes the analyzer then resolves). The plain
    * `expression` wrapper defers conversion inside an opaque
    * ColumnNodeExpression, which never resolves when returned from a
    * FunctionRegistry builder. */
  def analyzableExpression(c: Column): Expression =
    classic.ColumnNodeToExpressionConverter(c.node)
}
