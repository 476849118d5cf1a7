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

  /** Eager local checkpoint that DECLARES the frame's physical layout
    * (r17): `Dataset.localCheckpoint` captures
    * `executedPlan.outputPartitioning` into its `LogicalRDD`, but
    * under AQE the adaptive root reports `UnknownPartitioning`, so a
    * carefully laid-out frame (hash-clustered + sorted) re-enters the
    * planner layout-less and every consumer pays the Exchange + Sort
    * again (measured: the r17 evt base checkpointed to
    * `UnknownPartitioning(0)`). This twin materializes the same
    * checkpointed RDD and constructs the `LogicalRDD` with the
    * partitioning/ordering the caller just produced — exactly what
    * the non-AQE checkpoint would have captured.
    *
    * CONTRACT (caller-verified): the input plan must END in
    * `repartition(n, partCols)` (a REPARTITION_BY_NUM shuffle — AQE
    * never coalesces or skew-splits a user-numbered repartition, so
    * the RDD's layout IS HashPartitioning(partCols, n)) followed by
    * `sortWithinPartitions(orderCols)` (ascending, nulls first). The
    * method asserts the partition count matches `n` and refuses to
    * declare a layout the RDD provably does not have. */
  def localCheckpointWithLayout(df: Dataset[Row], n: Int,
      partCols: Seq[String], orderCols: Seq[String]): DataFrame = {
    val ds = df.asInstanceOf[classic.Dataset[Row]]
    val spark = ds.sparkSession
    val qe = ds.queryExecution
    val rdd = qe.toRdd.map(_.copy())
    rdd.localCheckpoint()
    rdd.count() // eager: materialize the blocks now
    require(rdd.getNumPartitions == n,
      s"localCheckpointWithLayout: RDD has ${rdd.getNumPartitions} " +
        s"partitions, caller declared $n — plan must end in repartition(n, cols)")
    val output = qe.analyzed.output
    val byName = output.map(a => a.name -> a).toMap
    val part = catalyst.plans.physical.HashPartitioning(
      partCols.map(byName(_)), n)
    val ord = orderCols.map(c => catalyst.expressions.SortOrder(
      byName(c), catalyst.expressions.Ascending))
    classic.Dataset.ofRows(spark,
      execution.LogicalRDD(output, rdd, part, ord, isStreaming = false)(spark))
  }
}
