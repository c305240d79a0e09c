package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<double>` columns (C2 similarity surface).
  *
  * Built on Spark's higher-order functions (`zip_with` + `aggregate`) —
  * these stay inside whole-stage codegen, unlike a Scala UDF which would
  * force per-row serialization. The fold is sequential left-to-right,
  * which also makes the double summation order deterministic (needed for
  * oracle parity and stable top-k cuts).
  */
object Vectors {

  /** Sequential-fold dot product of two array<double> columns. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y),
      lit(0.0), (acc, x) => acc + x)

  /** L2 norm. */
  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity = dot / (||a|| * ||b||). */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Cast a float array column (parquet `list<float>`) to array<double> so
    * all arithmetic happens in double — matches the DuckDB oracle exactly. */
  def asDouble(a: Column): Column = transform(a, x => x.cast("double"))
}
