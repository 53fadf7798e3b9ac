package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column <-> Expression bridge. Spark 4 made the Column/Expression
  * conversions private[sql] (Connect-compatible Column nodes); a library
  * contributing native Catalyst expressions to the DataFrame API needs this
  * two-liner inside the org.apache.spark.sql package, exactly like other
  * Catalyst-extending libraries do. No Spark internals are modified.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
