package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge to `private[sql]` Column↔Expression converters — the only
  * supported way to wrap a custom Catalyst `Expression` as a public
  * `Column` in Spark 4.x (where `Column` holds a `ColumnNode`, not an
  * `Expression`). Lives in an `org.apache.spark.sql` subpackage purely
  * for visibility; no Spark internals are modified.
  */
object Shims {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Build a DataFrame from a raw logical plan (`Dataset.ofRows` is
    * `private[sql]`) — how a custom logical node like
    * `graft.plans.AsOfJoinPlan` enters the public Dataset API.
    */
  def ofRows(spark: org.apache.spark.sql.SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** The analyzed logical plan behind a DataFrame — the child a
    * custom logical node composes over.
    */
  def logicalPlan(df: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    df.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
      .queryExecution.analyzed

  /** Drain the async listener bus so task metrics collected by a
    * SparkListener are complete before reading them (`listenerBus` is
    * `private[spark]`; used by the graft.Scaling artifact generator).
    */
  def flushListenerBus(sc: org.apache.spark.SparkContext): Unit =
    sc.listenerBus.waitUntilEmpty()
}
