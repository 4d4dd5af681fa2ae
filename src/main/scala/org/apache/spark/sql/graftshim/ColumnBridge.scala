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

  /** Resolve `c` against a relation of exactly `schema`'s attributes,
    * replace RuntimeReplaceable nodes, cast to `dt`, and BIND references by
    * ordinal — yielding an executor-evaluable expression over
    * `InternalRow`s of `schema`. Used by the streaming sink to re-derive a
    * hidden-partitioning table's generated column per row (no optimizer
    * rule runs over a streaming epoch's write plan, so the recompute must
    * live in the writer). The analysis pass applies the same implicit casts
    * and session-timezone bindings the SQL funnel would. */
  def bindToSchema(
      session: org.apache.spark.sql.SparkSession,
      schema: org.apache.spark.sql.types.StructType,
      c: Column,
      dt: org.apache.spark.sql.types.DataType): Expression = {
    import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeSeq, BindReferences, Cast, RuntimeReplaceable}
    import org.apache.spark.sql.catalyst.plans.logical.{LocalRelation, Project}
    val attrs = org.apache.spark.sql.catalyst.types.DataTypeUtils
      .toAttributes(schema)
    val probe = ofRows(session, LocalRelation(attrs)).select(c.as("__g"))
    val analyzed = probe.queryExecution.analyzed match {
      case Project(Seq(al: Alias), _) => al.child
      case other => throw new IllegalStateException(
        s"graftshim: unexpected bind analysis shape: $other")
    }
    val replaced = analyzed.transformUp {
      case r: RuntimeReplaceable => r.replacement
    }
    val cast =
      if (replaced.dataType == dt) replaced
      else Cast(replaced, dt,
        Some(session.sessionState.conf.sessionLocalTimeZone))
    BindReferences.bindReference(cast, AttributeSeq(attrs))
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
