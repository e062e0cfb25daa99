package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge between the public Column API and catalyst Expressions.
  *
  * Spark 4 made `Column` connect-agnostic and moved the classic
  * Expression<->Column conversions behind `private[sql]`
  * (`org.apache.spark.sql.classic.ExpressionUtils`). Libraries shipping
  * native Catalyst expressions use a shim in an `org.apache.spark.sql`
  * subpackage to reach it — the standard OSS pattern for Spark-4-compatible
  * expression libraries.
  */
object ColumnShim {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
