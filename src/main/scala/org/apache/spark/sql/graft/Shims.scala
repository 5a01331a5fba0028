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

  /** Drain the async listener bus so task metrics collected by a
    * SparkListener are complete before reading them (`listenerBus` is
    * `private[spark]`; used by the graft.Scaling artifact generator).
    */
  def flushListenerBus(sc: org.apache.spark.SparkContext): Unit =
    sc.listenerBus.waitUntilEmpty()
}
