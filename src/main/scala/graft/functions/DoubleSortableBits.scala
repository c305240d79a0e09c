package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, LongType}

/** Order-preserving IEEE-754 bit image of a double: a LONG whose
  * UNSIGNED order equals the SQL double sort order
  * (-Inf < finite < +Inf < NaN, all NaNs canonicalized together).
  * Standard radix-sort key construction: negative bit patterns flip
  * entirely, non-negative ones flip the sign bit.
  *
  * The quantile scan-selection operator
  * ([[graft.operators.Ranking.exactQuantilesByGroupScan]]) buckets on
  * the TOP BITS of this image in its very first pass: a monotone,
  * DATA-INDEPENDENT binning that needs no prior min/max, so one scan
  * both counts groups and brackets every target rank inside a
  * half-exponent-wide bin — collapsing the dedicated refinement round
  * for real-world value distributions. Codegen'd and null-intolerant
  * like any arithmetic primitive. */
case class DoubleSortableBits(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == DoubleType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"double_sortable_bits requires a double input, got " +
        child.dataType.simpleString)

  override def nullSafeEval(v: Any): Any = {
    // `+ 0.0d` canonicalizes -0.0 to +0.0 (SQL comparisons treat them as
    // equal, so they must share a bin) and leaves every other value —
    // including NaN and ±Inf — unchanged. doubleToLongBits (not Raw):
    // canonicalizes every NaN payload so all NaNs share one bin.
    val b = java.lang.Double.doubleToLongBits(v.asInstanceOf[Double] + 0.0d)
    if (b < 0) ~b else b ^ java.lang.Long.MIN_VALUE
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val bits = ctx.freshName("bits")
      s"""long $bits = java.lang.Double.doubleToLongBits($v + 0.0d);
         |${ev.value} = ($bits < 0L) ? ~$bits : ($bits ^ java.lang.Long.MIN_VALUE);
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): DoubleSortableBits = copy(child = newChild)

  override def prettyName: String = "double_sortable_bits"
}
