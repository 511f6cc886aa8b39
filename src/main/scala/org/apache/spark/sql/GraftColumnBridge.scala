package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to the `private[sql]` Column<->Expression converters, needed to
  * expose custom Catalyst expressions (graft.functions.MinHashSignature)
  * through the public Column API in Spark 4's ColumnNode world.
  */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Bridge to `private[sql]` Dataset.ofRows: lets the registry lints run
    * a query's window/sort SUBTREE as its own DataFrame (e.g. the
    * key-totality check executes each Window node's child to prove the
    * order keys determine the row). */
  def ofRows(spark: SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
