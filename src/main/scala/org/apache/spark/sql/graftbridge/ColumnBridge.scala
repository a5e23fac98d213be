package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ↔ Expression bridge. Spark 4's unified Column API hides the
  * catalyst expression behind `private[sql]` ExpressionUtils; placing this
  * one-file shim in an `org.apache.spark.sql` subpackage is the standard
  * way third-party native expressions get wrapped as user-facing Columns.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
