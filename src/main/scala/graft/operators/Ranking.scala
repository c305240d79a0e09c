package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed ranking operators — the scale paths for global-window
  * queries (q29's exact ntile funnels every row through one task, which
  * is correct but single-threaded by construction).
  *
  * `approxNtile` is the standard two-phase shape: one pass computes the
  * (n-1) approximate tile boundaries with `approx_percentile` (a
  * partial-aggregable sketch — merged on the driver in O(sketch), never
  * O(rows)), then a codegen'd range lookup assigns each row its tile in
  * a narrow map. No global sort, no single-task window: the only
  * exchange is the sketch aggregation's partial→final step.
  */
object Ranking {

  /** Approximate n-tile assignment over `orderCol`: returns `df` plus
    * `tileCol` ∈ [1, n]. Rows equal to a boundary land in the lower tile
    * (matching SQL ntile's "earlier rows fill earlier tiles" bias as
    * closely as a value-based split can).
    *
    * `accuracy` is `approx_percentile`'s inverse-epsilon knob: boundary
    * rank error ≤ rows/accuracy. At accuracy 10⁴ a 10⁹-row corpus
    * misplaces at most 10⁻⁴ of rows per boundary — and the sketch stays
    * a few KB per partition regardless of scale. */
  def approxNtile(df: DataFrame, orderCol: String, n: Int,
                  tileCol: String = "tile",
                  accuracy: Int = 10000): DataFrame = {
    require(n >= 1, "ntile needs n >= 1")
    if (n == 1) return df.withColumn(tileCol, lit(1L))
    val pcts = (1 until n).map(_.toDouble / n)
    val bounds = df.agg(
      percentile_approx(col(orderCol),
        array(pcts.map(lit): _*), lit(accuracy)).as("bs"))
    // boundaries are a tiny (n-1)-element array: broadcast-joined in,
    // tile = 1 + #boundaries strictly below the row's value
    val tile = lit(1) + aggregate(col("bs"),
      lit(0), (acc, b) => acc + when(col(orderCol) > b, 1).otherwise(0))
    df.crossJoin(broadcast(bounds))
      .withColumn(tileCol, tile.cast("long"))
      .drop("bs")
  }
}
