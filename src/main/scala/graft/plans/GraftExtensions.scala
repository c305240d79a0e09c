package graft.plans

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.{ArrayCosineSim, ArrayDotProduct}

/** SQL-surface registration for graft's custom Catalyst expressions (so
  * `spark.sql("SELECT array_dot(a, b)")` works, not just the Column API).
  *
  * Two entry points:
  *  - at session build time: `SparkSession.builder().withExtensions(new
  *    GraftExtensions)` or `spark.sql.extensions=graft.plans.GraftExtensions`
  *  - on a live session: `GraftExtensions.install(spark)` (withExtensions
  *    is ignored by getOrCreate once a session exists)
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.registrations.foreach(ext.injectFunction)
    // dialect bridge: ASOF JOIN + UNION-fixpoint recursion ([[GraftSqlParser]])
    ext.injectParser((_, delegate) => new GraftSqlParser(delegate))
  }
}

object GraftExtensions {
  private val registrations: Seq[
      (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (new FunctionIdentifier("array_dot"),
      new ExpressionInfo(classOf[ArrayDotProduct].getName, "array_dot"),
      (exprs: Seq[Expression]) => ArrayDotProduct(exprs(0), exprs(1))),
    (new FunctionIdentifier("array_cosine"),
      new ExpressionInfo(classOf[ArrayCosineSim].getName, "array_cosine"),
      (exprs: Seq[Expression]) => ArrayCosineSim(exprs(0), exprs(1))))

  /** Register on an already-running session. */
  def install(spark: SparkSession): Unit =
    registrations.foreach { case (ident, info, builder) =>
      spark.sessionState.functionRegistry
        .registerFunction(ident, info, builder)
    }
}
