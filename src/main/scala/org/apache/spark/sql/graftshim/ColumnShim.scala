package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge between catalyst [[Expression]]s and the public [[Column]] API.
  *
  * Spark 4 moved Column<->Expression conversion behind
  * `org.apache.spark.sql.classic.ExpressionUtils`, which is
  * `private[sql]`; extension libraries conventionally reach it via a shim
  * in the `org.apache.spark.sql` package tree. This is the only place the
  * library steps outside Spark's public surface.
  */
object ColumnShim {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
