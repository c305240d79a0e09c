package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.catalyst.util.QuantileSummaries
import org.apache.spark.sql.expressions.Aggregator
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

  /** Mergeable quantile sketch per group — the quantile twin of
    * [[hllSketches]]: a persistable binary artifact (Greenwald-Khanna
    * summaries, the exact structure inside Spark's `approx_percentile`/
    * `approxQuantile`) built map-side and merged associatively, so the
    * exchange carries one ~KB buffer per partition instead of the
    * O(distinct values) map of exact `percentile` (q64's declared-exact
    * contract — this is its 100-TB path). Sketches persisted per
    * partition/day union later via [[quantileUnionEstimate]] without
    * touching rows again. Rank error ≤ `relativeError` · n. */
  def quantileSketch(df: DataFrame, groupCol: String, valueCol: String,
                     relativeError: Double = 0.01): DataFrame = {
    val agg = udaf(new QuantileSketchAgg(relativeError), Encoders.DOUBLE)
    df.groupBy(col(groupCol))
      .agg(agg(col(valueCol).cast("double")).as("sketch"))
  }

  /** Union previously-built quantile sketches (e.g. daily artifacts) and
    * read out the `pcts` quantile estimates per group — no raw data
    * touched. Returns (group, quantiles array<double>, aligned with
    * `pcts`). */
  def quantileUnionEstimate(sketches: DataFrame, groupCol: String,
                            pcts: Seq[Double],
                            sketchCol: String = "sketch"): DataFrame = {
    val agg = udaf(new QuantileUnionEstimateAgg(pcts), Encoders.BINARY)
    sketches.groupBy(col(groupCol))
      .agg(agg(col(sketchCol)).as("quantiles"))
  }

  /** One-pass convenience: build + query in a single aggregation (no
    * persisted artifact). Same error bound as [[quantileSketch]]. */
  def approxQuantiles(df: DataFrame, groupCol: String, valueCol: String,
                      pcts: Seq[Double],
                      relativeError: Double = 0.01): DataFrame =
    quantileUnionEstimate(
      quantileSketch(df, groupCol, valueCol, relativeError), groupCol, pcts)

  private[operators] def serializeQS(qs: QuantileSummaries): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.ObjectOutputStream(bos)
    out.writeObject(qs); out.close()
    bos.toByteArray
  }

  private[operators] def deserializeQS(bytes: Array[Byte]): QuantileSummaries =
    new java.io.ObjectInputStream(new java.io.ByteArrayInputStream(bytes))
      .readObject().asInstanceOf[QuantileSummaries]

  private[operators] def mergeQS(a: QuantileSummaries,
                                 b: QuantileSummaries): QuantileSummaries = {
    val (ac, bc) = (a.compress(), b.compress())
    if (ac.count == 0) bc else if (bc.count == 0) ac else ac.merge(bc)
  }

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
    // cast to STRING before sketching: the readout side hashes the
    // Seq[String] items through the string path, and a sketch built
    // over (say) longs hashes a different byte stream — every lookup
    // would return collision noise near 0 with no error
    val bytes = df.agg(count_min_sketch(col(valueCol).cast("string"),
        lit(eps), lit(confidence), lit(seed)).as("cms"))
      .first().getAs[Array[Byte]]("cms")
    val cms = org.apache.spark.util.sketch.CountMinSketch.readFrom(
      new java.io.ByteArrayInputStream(bytes))
    items.map(i => (i, cms.estimateCount(i))).toDF(valueCol, "approx_count")
  }
}

/** Builds one mergeable Greenwald-Khanna summary per group and emits it
  * as a java-serialized binary — the persistable artifact. Nulls are
  * skipped (SQL aggregate semantics). */
private[operators] class QuantileSketchAgg(relativeError: Double)
    extends Aggregator[java.lang.Double, QuantileSummaries, Array[Byte]] {
  override def zero: QuantileSummaries =
    new QuantileSummaries(QuantileSummaries.defaultCompressThreshold,
      relativeError)
  override def reduce(b: QuantileSummaries,
                      a: java.lang.Double): QuantileSummaries =
    if (a == null) b else b.insert(a)
  override def merge(b1: QuantileSummaries,
                     b2: QuantileSummaries): QuantileSummaries =
    Sketches.mergeQS(b1, b2)
  override def finish(b: QuantileSummaries): Array[Byte] =
    Sketches.serializeQS(b.compress())
  override def bufferEncoder: Encoder[QuantileSummaries] =
    Encoders.javaSerialization[QuantileSummaries]
  override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
}

/** Merges serialized quantile sketches and reads out the requested
  * quantiles — the union side of the artifact pattern. Empty input
  * (zero rows / all-null sketches) yields NaNs, never a throw. */
private[operators] class QuantileUnionEstimateAgg(pcts: Seq[Double])
    extends Aggregator[Array[Byte], QuantileSummaries, Seq[Double]] {
  require(pcts.nonEmpty && pcts.forall(p => p >= 0 && p <= 1),
    "percentiles must be within [0, 1]")
  override def zero: QuantileSummaries =
    new QuantileSummaries(QuantileSummaries.defaultCompressThreshold,
      QuantileSummaries.defaultRelativeError)
  override def reduce(b: QuantileSummaries,
                      bytes: Array[Byte]): QuantileSummaries =
    if (bytes == null) b else Sketches.mergeQS(b, Sketches.deserializeQS(bytes))
  override def merge(b1: QuantileSummaries,
                     b2: QuantileSummaries): QuantileSummaries =
    Sketches.mergeQS(b1, b2)
  override def finish(b: QuantileSummaries): Seq[Double] = {
    val c = b.compress()
    pcts.map(p => c.query(p).getOrElse(Double.NaN))
  }
  override def bufferEncoder: Encoder[QuantileSummaries] =
    Encoders.javaSerialization[QuantileSummaries]
  override def outputEncoder: Encoder[Seq[Double]] = ExpressionEncoder[Seq[Double]]()
}
