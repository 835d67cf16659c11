package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge to Spark's `private[sql]` Column ⇄ Expression converters.
  *
  * Spark 4 hides the classic `Column(expr)` constructor behind the
  * sql-api split; the sanctioned escape hatch for extension libraries
  * that build Catalyst expressions directly (graft's broadcast-backed
  * Bloom probe cannot go through the function registry — it carries a
  * `Broadcast` handle, not a pure expression tree) is a shim inside an
  * `org.apache.spark.sql` subpackage. Nothing else in graft may import
  * from here except through these two methods.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
