package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into Spark 4's Column↔Expression conversion, which is
  * `private[sql]` since the Spark Connect column-node refactor.
  * Lives under `org.apache.spark.sql` solely to satisfy that
  * visibility; everything else in this library is in `graft.*`.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
