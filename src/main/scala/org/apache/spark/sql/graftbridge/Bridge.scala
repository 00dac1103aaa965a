package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ↔ Expression bridge. Spark 4 made `ExpressionUtils`
  * `private[sql]`; living in an `org.apache.spark.sql` subpackage is the
  * sanctioned extension-library route to it (no internals are modified —
  * this only re-exports the two converters custom Expressions need). */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
