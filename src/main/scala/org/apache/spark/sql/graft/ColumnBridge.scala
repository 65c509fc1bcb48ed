package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Catalyst-expression bridge for the engine's native
  * expressions (Spark 4's `Column` wraps a ColumnNode; the conversion
  * helpers live behind `private[sql]`, so this one-file shim in the sql
  * package re-exports just the two needed). Lets graft.functions build
  * codegen'd custom expressions as plain `Column`s without requiring a
  * session function registry. */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
