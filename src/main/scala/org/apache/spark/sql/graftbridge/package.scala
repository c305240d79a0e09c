package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Minimal bridge into the `private[sql]` Column↔Expression converters —
  * the supported way to expose a custom Catalyst [[Expression]] as a
  * user-facing [[Column]] in Spark 4.x without going through the session
  * function registry. */
package object graftbridge {
  def toColumn(e: Expression): Column = classic.ExpressionUtils.column(e)
  def toExpression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Whether `key` was explicitly SET on this session (RuntimeConfig
    * .getOption can't tell: it yields the registered default for unset
    * confs). Needed to fill in a missing conf without overriding a
    * deliberate caller choice. */
  def isConfSet(spark: SparkSession, key: String): Boolean =
    spark.sessionState.conf.getAllConfs.contains(key)
}
