package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mergeable-sketch surface (SURVEY §2.5 C5 approximate analytics — the
  * distinct/top-k questions the reference answers with exact Athena SQL
  * over its modest data, reference `README.md:21`, re-expressed as the
  * estimators a 100-TB deployment actually runs): the sketches that
  * replace exact distinct/frequency computation when the exact
  * answer would shuffle the whole key space. Every sketch here is an
  * Apache DataSketches binary that MERGES associatively — the property
  * that makes them 100-TB operators: partial sketches build map-side,
  * the exchange carries one small buffer per partition, and sketches
  * persisted per partition/day can be unioned later without touching
  * rows again (the lambda-architecture path).
  */
object Sketches {

  /** Approximate distinct count per group via HLL sketches
    * (`lgConfigK` trades memory for accuracy; 12 ≈ 1.6% rel. error,
    * 4 KB per sketch). */
  def hllDistinct(df: DataFrame, groupCol: String, valueCol: String,
                  lgConfigK: Int = 12): DataFrame =
    df.groupBy(col(groupCol))
      .agg(hll_sketch_estimate(
        hll_sketch_agg(col(valueCol), lit(lgConfigK))).as("approx_nd"))

  /** Build one persistable HLL sketch per group — the artifact to store
    * alongside a partition so later queries union sketches instead of
    * re-scanning rows. */
  def hllSketches(df: DataFrame, groupCol: String, valueCol: String,
                  lgConfigK: Int = 12): DataFrame =
    df.groupBy(col(groupCol))
      .agg(hll_sketch_agg(col(valueCol), lit(lgConfigK)).as("sketch"))

  /** Union previously-built sketches (e.g. daily artifacts) into a
    * combined distinct estimate per group — no raw data touched. */
  def hllUnionEstimate(sketches: DataFrame, groupCol: String,
                       sketchCol: String = "sketch"): DataFrame =
    sketches.groupBy(col(groupCol))
      .agg(hll_sketch_estimate(hll_union_agg(col(sketchCol)))
        .as("approx_nd"))

  /** Heavy hitters: estimated frequency of each requested item via one
    * Count-Min sketch pass (`eps`/`confidence` size the sketch; the
    * estimate only ever over-counts). The sketch builds distributedly
    * (partial + merge); only the finished few-KB buffer reaches the
    * driver, where the per-item point estimates are read out. Returns
    * (item, approx_count). */
  def itemFrequency(df: DataFrame, valueCol: String, items: Seq[String],
                    eps: Double = 0.001, confidence: Double = 0.99,
                    seed: Int = 42): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val bytes = df.agg(count_min_sketch(col(valueCol), lit(eps),
        lit(confidence), lit(seed)).as("cms"))
      .first().getAs[Array[Byte]]("cms")
    val cms = org.apache.spark.util.sketch.CountMinSketch.readFrom(
      new java.io.ByteArrayInputStream(bytes))
    items.map(i => (i, cms.estimateCount(i))).toDF(valueCol, "approx_count")
  }
}
