package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Classic-mode bridge between the public Column API and Catalyst
  * expressions. Spark 4 made the converters `private[sql]`; exposing them
  * from a child package of org.apache.spark.sql is the standard extension-
  * library pattern for classic (non-connect) deployments.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
