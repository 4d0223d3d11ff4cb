package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal bridge into the `private[sql]` Column factory: Spark 4 routes
  * Column construction through ColumnNode and no longer exposes a public
  * Expression→Column path, but a first-class custom Expression (PolyHash)
  * must be usable WITHOUT session-level function registration — the
  * driver's harness may build its own sessions. This subpackage sits
  * inside org.apache.spark.sql's access scope solely to re-export that
  * one factory; nothing else from the internals is touched. */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
