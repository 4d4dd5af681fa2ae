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

  /** Execute a (resolved) logical plan as a DataFrame — the
    * `classic.Dataset.ofRows` bridge, `private[sql]` since Spark 4. Used by
    * optimizer rules that need a driver-side auxiliary job over a sub-plan
    * (e.g. MERGE source key bounds), the same pattern the public lake
    * engines use for their find-touched-files passes. */
  def ofRows(
      session: org.apache.spark.sql.SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      session.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** `RowLevelOperationTable` is `private[sql]`: unwrap the operation a
    * row-level rewrite is bound to (None for any other table). */
  def rowLevelOperationOf(t: org.apache.spark.sql.connector.catalog.Table)
      : Option[org.apache.spark.sql.connector.write.RowLevelOperation] =
    t match {
      case r: org.apache.spark.sql.connector.write.RowLevelOperationTable =>
        Some(r.operation)
      case _ => None
    }

  /** The underlying table of a `RowLevelOperationTable` wrapper (identity
    * for any other table). */
  def unwrapRowLevelTable(t: org.apache.spark.sql.connector.catalog.Table)
      : org.apache.spark.sql.connector.catalog.Table = t match {
    case r: org.apache.spark.sql.connector.write.RowLevelOperationTable =>
      r.table
    case _ => t
  }

  /** Eagerly CONVERT the Column's node tree to catalyst expressions
    * (unresolved functions become `UnresolvedFunction`s the analyzer then
    * resolves) instead of wrapping it in a lazy `ColumnNodeExpression`.
    * Required when handing a Column-composed tree to a place that never
    * runs the column-node conversion — e.g. a FunctionRegistry builder
    * (the wrapper would survive to codegen and die Unevaluable there). */
  def toResolvableExpression(c: Column): Expression =
    org.apache.spark.sql.classic.ColumnNodeToExpressionConverter(c.node)
}
