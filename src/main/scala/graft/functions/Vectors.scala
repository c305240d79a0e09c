package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<double>` columns (C2 similarity surface).
  *
  * The dot product is a custom codegen'd Catalyst [[ArrayDotProduct]]
  * expression (a tight primitive loop in whole-stage codegen) rather than
  * a Scala UDF (per-row serialization) or the `zip_with`+`aggregate`
  * higher-order form (per-element lambda frames). Summation is a
  * sequential left-to-right double fold, so results are deterministic and
  * bit-identical to the DuckDB oracle's `list_dot_product`.
  */
object Vectors {

  /** Codegen'd sequential dot product of two array<double> columns. */
  def dot(a: Column, b: Column): Column =
    org.apache.spark.sql.graftbridge.toColumn(ArrayDotProduct(
      org.apache.spark.sql.graftbridge.toExpression(a),
      org.apache.spark.sql.graftbridge.toExpression(b)))

  /** The pure higher-order-function formulation (kept as the portable
    * fallback and for differential testing against [[ArrayDotProduct]]). */
  def dotHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y),
      lit(0.0), (acc, x) => acc + x)

  /** L2 norm. */
  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity — the fused one-pass codegen'd
    * [[ArrayCosineSim]] (the composed `dot/(norm*norm)` form walks each
    * array three times; equal-length vectors give bit-identical
    * results). */
  def cosine(a: Column, b: Column): Column =
    org.apache.spark.sql.graftbridge.toColumn(ArrayCosineSim(
      org.apache.spark.sql.graftbridge.toExpression(a),
      org.apache.spark.sql.graftbridge.toExpression(b)))

  /** The composed three-pass formulation (portable fallback; kept for
    * differential testing against the fused expression). */
  def cosineComposed(a: Column, b: Column): Column =
    dot(a, b) / (norm(a) * norm(b))

  /** Cast a float array column (parquet `list<float>`) to array<double> so
    * all arithmetic happens in double — matches the DuckDB oracle exactly. */
  def asDouble(a: Column): Column = transform(a, x => x.cast("double"))
}
