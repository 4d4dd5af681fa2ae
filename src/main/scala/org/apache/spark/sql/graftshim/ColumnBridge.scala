package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 made the Column↔Expression bridge `private[sql]`
  * (classic.ExpressionUtils). Custom native expressions still need it to be
  * exposed as `Column`s — this shim lives in the sql package hierarchy for
  * access, nothing more. */
object ColumnBridge {
  def toColumn(e: Expression): Column = ExpressionUtils.column(e)
  def toExpression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Eagerly CONVERT the Column's node tree to catalyst expressions
    * (unresolved functions become `UnresolvedFunction`s the analyzer then
    * resolves) instead of wrapping it in a lazy `ColumnNodeExpression`.
    * Required when handing a Column-composed tree to a place that never
    * runs the column-node conversion — e.g. a FunctionRegistry builder
    * (the wrapper would survive to codegen and die Unevaluable there). */
  def toResolvableExpression(c: Column): Expression =
    org.apache.spark.sql.classic.ColumnNodeToExpressionConverter(c.node)
}
