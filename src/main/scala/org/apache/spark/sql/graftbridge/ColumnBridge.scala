package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 moved the Column ↔ Catalyst-Expression bridge behind
  * `private[sql]` (`classic.ExpressionUtils`); custom native expressions
  * still need it to surface as `Column`s. This shim lives inside the
  * `org.apache.spark.sql` namespace to re-export the two conversions —
  * the standard pattern for third-party Spark extension libraries. */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
