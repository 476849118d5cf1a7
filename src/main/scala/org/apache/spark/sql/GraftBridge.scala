package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Minimal `private[sql]`-access bridge so the graft library can wrap
  * its custom Catalyst expressions as public `Column`s and register
  * SQL functions on a live session. The same pattern every public
  * Spark extension library uses for Expression-backed Columns.
  */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)

  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  def functionRegistry(spark: SparkSession)
      : org.apache.spark.sql.catalyst.analysis.FunctionRegistry =
    spark.asInstanceOf[classic.SparkSession].sessionState.functionRegistry

  /** Current-database table names straight off the session catalog —
    * driver-side metadata, no Dataset materialization. */
  def catalogTableNames(spark: SparkSession): Seq[String] =
    spark.asInstanceOf[classic.SparkSession].sessionState.catalog
      .listTables(spark.catalog.currentDatabase).map(_.table)
}
