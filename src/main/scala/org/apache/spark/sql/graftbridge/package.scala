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

  /** Release the storage blocks behind a `localCheckpoint`-ed Dataset.
    * `Dataset.unpersist` canNOT do this: it talks to the CacheManager
    * (`.cache()` entries), while a local checkpoint persists its RDD
    * directly in the block manager — the blocks otherwise linger until
    * ContextCleaner GC. Walks the analyzed plan for `LogicalRDD` leaves
    * (package-private, hence this bridge) and unpersists each. */
  def releaseCheckpoint(df: Dataset[_], blocking: Boolean = false): Unit =
    df.queryExecution.analyzed.foreach {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        lr.rdd.unpersist(blocking)
      case _ => ()
    }
}
