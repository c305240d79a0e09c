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

  /** Register a session-scoped SQL function backed by a native Catalyst
    * expression builder (the same mechanism Spark's own builtins use —
    * full codegen, no UDF serialization). Session registry entries shadow
    * builtins of the same name, which [[graft.SqlCompat]] exploits for
    * arity-dispatching overrides (`datediff`, `regexp_replace`). */
  def registerSqlFunction(spark: SparkSession, name: String,
      builder: Seq[Expression] => Expression): Unit = {
    import org.apache.spark.sql.catalyst.FunctionIdentifier
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier(name),
      new catalyst.expressions.ExpressionInfo("graft.SqlCompat", name),
      builder)
  }

  /** The builtin builder for `name`, for compat overrides that delegate
    * non-compat arities back to Spark's own implementation. */
  def builtinSqlBuilder(name: String): Seq[Expression] => Expression = {
    import org.apache.spark.sql.catalyst.FunctionIdentifier
    import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
    FunctionRegistry.builtin
      .lookupFunctionBuilder(FunctionIdentifier(name))
      .getOrElse(throw new IllegalArgumentException(s"no builtin $name"))
  }

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

  /** Stable identity of a frame's ANALYZED plan (cosmetic differences —
    * alias ids, etc. — hash equal). Used to memoize per-relation
    * validation work (e.g. the dedup serving index's signature-width
    * check) across repeated reads of the same table. */
  def semanticHash(df: Dataset[_]): Int =
    df.queryExecution.analyzed.semanticHash()
}
