package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression bridge. Spark 4 made these converters
  * `private[sql]` (`org.apache.spark.sql.classic.ExpressionUtils`), so
  * libraries that ship custom Catalyst expressions need one object inside
  * the `org.apache.spark.sql` package tree to lift them into the public
  * Column API. This is the only file in the repo outside the `graft`
  * package, and it contains no logic.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
