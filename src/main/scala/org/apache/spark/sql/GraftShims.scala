package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge between graft's custom Catalyst `Expression`s and the public
  * `Column` API. Spark 4's `ExpressionUtils` is `private[sql]`, so the
  * shim lives in the `org.apache.spark.sql` package (standard extension
  * idiom for Spark libraries adding native expressions). */
object GraftShims {
  def toColumn(e: Expression): Column = classic.ExpressionUtils.column(e)
  def toExpression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Non-blocking read of an [[Observation]]'s metrics: empty map until an
    * action over the observed plan completes. `Observation.get` BLOCKS
    * forever if the registering action never fires its listener, so loop
    * code must probe with this instead (`getOrEmpty` is `private[sql]`). */
  def observationResults(o: Observation): Map[String, Any] = o.getOrEmpty
}
