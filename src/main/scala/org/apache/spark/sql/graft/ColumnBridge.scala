package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into Spark's `private[sql]` Column↔Expression converters so the
  * engine can expose custom Catalyst expressions as ordinary `Column`s
  * (Spark 4 removed the public `Column(expr)` constructor).
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Convert a DSL-built Column into a concrete Catalyst expression tree.
    * `ExpressionUtils.expression` defers conversion inside an Unevaluable
    * `ColumnNodeExpression` wrapper — fine when Spark's own resolution
    * walks it, but opaque to the analyzer when returned from a
    * FunctionRegistry builder (codegen then dies on the unresolved
    * wrapper). This converter emits real `UnresolvedFunction` nodes the
    * analyzer resolves normally.
    */
  def catalystExpression(c: Column): Expression =
    org.apache.spark.sql.classic.ColumnNodeToExpressionConverter(c.node)
}
