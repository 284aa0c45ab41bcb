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

  /** DSv2 Predicate → V1 Filter translation (PredicateUtils is
    * `private[sql]` in Spark 4) — used by SupportsDeleteV2.
    */
  def predicatesToV1(
      predicates: Array[org.apache.spark.sql.connector.expressions.filter.Predicate])
      : Array[org.apache.spark.sql.sources.Filter] =
    org.apache.spark.sql.internal.connector.PredicateUtils.toV1(predicates)

  /** DataFrame over an already-analyzed logical plan (Dataset.ofRows is
    * `private[sql]` in Spark 4) — used to execute the source side of a
    * rewritten MERGE command.
    */
  def ofRows(spark: org.apache.spark.sql.SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** Connector literal from a Catalyst-internal value (`LiteralValue`
    * is `private[sql]` in Spark 4) — used to report column defaults
    * through the v2 Column API.
    */
  def literalValue(v: Any, dt: org.apache.spark.sql.types.DataType)
      : org.apache.spark.sql.connector.expressions.Literal[Any] =
    org.apache.spark.sql.connector.expressions.LiteralValue(v, dt)

  /** Register a SQL function on a LIVE session (extensions normally apply
    * only at session build time; this installs into the session's
    * function registry directly).
    */
  def registerFunction(spark: org.apache.spark.sql.SparkSession,
      name: org.apache.spark.sql.catalyst.FunctionIdentifier,
      info: org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
      builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry.registerFunction(name, info, builder)
}
