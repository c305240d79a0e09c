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

  // ---------------------------------------------------------------
  // Portable Count-Min sketch (Cormode & Muthukrishnan 2005) — the
  // ORACLE-CHECKABLE twin of [[itemFrequency]]: the same depth×width
  // counter matrix, but built from md5-nibble hashes expressible in
  // plain SQL on any engine and read out DISTRIBUTEDLY (a join against
  // the counter frame, never a driver collect). [[itemFrequency]]
  // stays the production primitive for point lookups of a few items;
  // this face is the one whose every counter and estimate a
  // differential harness can replay bit-for-bit.
  // ---------------------------------------------------------------

  /** Bucket of hash row `j`: the FIRST md5 nibble of the salted value
    * — width is fixed at 16 (one nibble); widen by folding more
    * nibbles if a deployment needs it. One digest per (value, row). */
  private def cmsBucket(j: Int, ref: String): String =
    s"(instr('0123456789abcdef', substr(md5(concat('cms$j:', $ref)), 1, 1)) - 1)"

  private def cmsRows(depth: Int, ref: String): String =
    (0 until depth).map(j =>
      s"named_struct('j', $j, 'b', ${cmsBucket(j, ref)})")
      .mkString("array(", ", ", ")")

  /** The depth×16 counter matrix over a value stream (one row per
    * occurrence, multiplicity counts): `(j, b, c)`. This is the whole
    * scale story of the sketch — the aggregate's key space is FIXED
    * (depth·16 cells), so the map-side partial collapses each input
    * partition to ≤ depth·16 rows and the exchange is metadata-sized
    * no matter how many trillions of tokens stream through. Counter
    * matrices from disjoint slices MERGE by cell-wise addition (union
    * + re-aggregate), the lambda-architecture property. */
  def cmsCounters(items: DataFrame, valueCol: String,
                  depth: Int = 4): DataFrame =
    items
      .select(explode(expr(cmsRows(depth, valueCol))).as("jb"))
      .groupBy(col("jb.j").as("j"), col("jb.b").as("b"))
      .agg(count(lit(1)).as("c"))

  /** Point estimates for every row of `values`: est = min over the
    * depth rows of the addressed counters (never under the true
    * count). The counter join is hinted broadcast — the counter frame
    * is a FIXED depth·16 cells, a bounded domain at any corpus size
    * (q12's rule: hint only what is bounded by construction). */
  def cmsEstimate(values: DataFrame, valueCol: String,
                  counters: DataFrame, depth: Int = 4): DataFrame =
    values
      .select(col(valueCol), explode(expr(cmsRows(depth, valueCol))).as("jb"))
      .select(col(valueCol), col("jb.j").as("j"), col("jb.b").as("b"))
      .join(broadcast(counters), Seq("j", "b"))
      .groupBy(col(valueCol))
      .agg(min(col("c")).as("est"))

  // ---------------------------------------------------------------
  // Bloom filter (Bloom 1970) — the broadcast decontamination screen:
  // k salted md5 positions over a FIXED m = 4096-bit array packed
  // into 64 longs. At 100 TB the filter is built once from the small
  // side (an eval/benchmark suite), broadcast to every executor, and
  // the corpus scan tests membership with pure bit arithmetic — zero
  // joins, zero exchange on the corpus side. False positives only
  // (quantified by [[graft.queries.PipelineQueries.q215]]'s audit
  // face); false negatives never — the property that makes a Bloom
  // PRE-screen sound: only flagged rows proceed to the exact join.
  // ---------------------------------------------------------------

  /** 12-bit position of hash `i` (0..4095): first three md5 nibbles of
    * the salted value. */
  private[operators] def bloomPos(i: Int, ref: String): String = {
    def nib(k: Int) =
      s"(instr('0123456789abcdef', substr(md5(concat('bf$i:', $ref)), $k, 1)) - 1)"
    s"(${nib(1)}*256 + ${nib(2)}*16 + ${nib(3)})"
  }

  /** Build the packed filter: ONE row with `bf` = array of 64 longs
    * (4096 bits). The bit-set aggregate has a fixed 64-row key space
    * (map-side partials collapse every partition to ≤ 64 rows); the
    * final collect_list is over those 64 metadata-sized rows — the
    * bounded-collect exemption (bpeSegment's K-row rule), not a data
    * collect. Filters from disjoint slices merge by cell-wise OR. */
  def bloomBits(items: DataFrame, valueCol: String, k: Int = 3): DataFrame = {
    val pos = items.select(explode(expr(
      (0 until k).map(i => bloomPos(i, valueCol))
        .mkString("array(", ", ", ")"))).as("pos"))
    val words = pos
      .groupBy(expr("pos div 64").as("w"))
      .agg(expr("bit_or(shiftleft(1L, cast(pos % 64 as int)))").as("bits"))
    items.sparkSession.range(64).toDF("w")
      .join(words, Seq("w"), "left")
      .select(col("w"), coalesce(col("bits"), lit(0L)).as("bits"))
      .agg(expr(
        "transform(sort_array(collect_list(struct(w, bits))), z -> z.bits)")
        .as("bf"))
  }

  /** Screen an `(idCol, itemCol)` frame against a built/committed
    * filter: per id, total items and Bloom-positive items. The filter
    * crosses in as a broadcast 1-row frame; the membership test is
    * row-level bit arithmetic — `element_at` on the packed words —
    * so the corpus side stays narrow until its own per-id rollup.
    * The k digests are row-level projections (codegen CSE dedups
    * them — q203's pathology only bites inside transform lambdas). */
  def bloomScreen(items: DataFrame, idCol: String, itemCol: String,
                  bits: DataFrame, k: Int = 3): DataFrame =
    hitRows(items, itemCol, bits, k)
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_items"),
        sum(when(col("__hit"), 1L).otherwise(0L)).as("n_bloom"))

  /** One-pass AUDIT variant: [[bloomScreen]] plus exact membership
    * against the reference item set, folded into the SAME aggregate —
    * per id `(n_items, n_bloom, n_exact)`, so the false-positive rate
    * (n_bloom − n_exact) falls out without a second corpus pass. The
    * reference join is |reference|-bounded and unhinted (the filter
    * was built FROM the reference, so it is small by construction —
    * AQE broadcasts it). */
  def bloomScreenAudit(items: DataFrame, idCol: String, itemCol: String,
                       bits: DataFrame, ref: DataFrame,
                       k: Int = 3): DataFrame =
    hitRows(items, itemCol, bits, k)
      .join(ref.select(col(itemCol)).distinct()
        .withColumn("__inRef", lit(1L)), Seq(itemCol), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_items"),
        sum(when(col("__hit"), 1L).otherwise(0L)).as("n_bloom"),
        sum(coalesce(col("__inRef"), lit(0L))).as("n_exact"))

  /** The shared membership-test projection: items × broadcast filter,
    * `__hit` = AND over the k bit tests. */
  private def hitRows(items: DataFrame, itemCol: String, bits: DataFrame,
                      k: Int): DataFrame = {
    val tests = (0 until k).map { i =>
      val p = s"__p$i"
      s"((element_at(bf, cast($p div 64 + 1 as int)) & " +
        s"shiftleft(1L, cast($p % 64 as int))) != 0)"
    }.mkString(" AND ")
    (0 until k)
      .foldLeft(items.crossJoin(broadcast(bits))) { (df, i) =>
        df.withColumn(s"__p$i", expr(bloomPos(i, itemCol)))
      }
      .withColumn("__hit", expr(tests))
  }

  private val BloomStoreMarker = "_graft_bloomstore_committed"

  /** Persist the packed filter under [[graft.sources.Stores]]'
    * versioned-commit protocol — the decontamination contract a
    * pipeline lands once from its benchmark suite and screens every
    * ingest batch against (committed state only, so screening
    * decisions can never drift with batch composition). */
  def saveBloomStore(items: DataFrame, valueCol: String, path: String,
                     k: Int = 3): Unit =
    graft.sources.Stores.commitVersioned(items.sparkSession, path,
        BloomStoreMarker) { dir =>
      bloomBits(items, valueCol, k)
        .write.mode("overwrite").parquet(s"$dir/bits")
    }

  /** Screen a batch against a COMMITTED [[saveBloomStore]] artifact.
    * Refuses an uncommitted/torn store. */
  def bloomServe(spark: org.apache.spark.sql.SparkSession, path: String,
                 items: DataFrame, idCol: String, itemCol: String,
                 k: Int = 3): DataFrame = {
    val dir = graft.sources.Stores
      .resolveCommitted(spark, path, BloomStoreMarker)
      .getOrElse(throw new IllegalArgumentException(
        s"requirement failed: bloom store at $path has no commit " +
          s"marker ($BloomStoreMarker) — it is mid-build, torn, or " +
          "absent; rebuild with saveBloomStore"))
    bloomScreen(items, idCol, itemCol,
      spark.read.parquet(s"$dir/bits"), k)
  }

  /** [[bloomScreenAudit]] against a COMMITTED store — the q218 face's
    * one-pass serve+audit. Refuses an uncommitted/torn store. */
  def bloomServeAudit(spark: org.apache.spark.sql.SparkSession,
                      path: String, items: DataFrame, idCol: String,
                      itemCol: String, ref: DataFrame,
                      k: Int = 3): DataFrame = {
    val dir = graft.sources.Stores
      .resolveCommitted(spark, path, BloomStoreMarker)
      .getOrElse(throw new IllegalArgumentException(
        s"requirement failed: bloom store at $path has no commit " +
          s"marker ($BloomStoreMarker) — it is mid-build, torn, or " +
          "absent; rebuild with saveBloomStore"))
    bloomScreenAudit(items, idCol, itemCol,
      spark.read.parquet(s"$dir/bits"), ref, k)
  }

  /** Pay-once build for the q218 face. */
  def ensureBloomStore(items: DataFrame, valueCol: String, path: String,
                       k: Int = 3): Unit =
    graft.sources.Stores.ensureCommitted(items.sparkSession, path,
      BloomStoreMarker)(saveBloomStore(items, valueCol, path, k))

  private val CmsStoreMarker = "_graft_cmsstore_committed"

  /** Persist the counter matrix under [[graft.sources.Stores]]'
    * versioned-commit protocol — the frequency contract a pipeline
    * estimates once over its reference corpus and scores every batch
    * against (rare-token detection, OOV screening) without re-counting
    * the corpus. The landed artifact is depth·16 rows. */
  def saveCmsStore(items: DataFrame, valueCol: String, path: String,
                   depth: Int = 4): Unit =
    graft.sources.Stores.commitVersioned(items.sparkSession, path,
        CmsStoreMarker) { dir =>
      cmsCounters(items, valueCol, depth)
        .write.mode("overwrite").parquet(s"$dir/counters")
    }

  /** Estimate batch values against a COMMITTED [[saveCmsStore]]
    * artifact. Refuses an uncommitted/torn store. */
  def cmsServe(spark: org.apache.spark.sql.SparkSession, path: String,
               values: DataFrame, valueCol: String,
               depth: Int = 4): DataFrame = {
    val dir = graft.sources.Stores
      .resolveCommitted(spark, path, CmsStoreMarker)
      .getOrElse(throw new IllegalArgumentException(
        s"requirement failed: CMS store at $path has no commit " +
          s"marker ($CmsStoreMarker) — it is mid-build, torn, or " +
          "absent; rebuild with saveCmsStore"))
    cmsEstimate(values, valueCol,
      spark.read.parquet(s"$dir/counters"), depth)
  }

  /** Pay-once build for the q221 face. */
  def ensureCmsStore(items: DataFrame, valueCol: String, path: String,
                     depth: Int = 4): Unit =
    graft.sources.Stores.ensureCommitted(items.sparkSession, path,
      CmsStoreMarker)(saveCmsStore(items, valueCol, path, depth))

  // ---------------------------------------------------------------
  // Portable HyperLogLog (Flajolet, Fusy, Gandouet & Meunier 2007) —
  // the oracle-checkable twin of [[hllDistinct]] (which stays the
  // production primitive on its DataSketches binary): m = 16
  // registers addressed by the first md5 nibble, ρ from the 32-bit
  // value in nibbles 2–9 via pure integer CASE logic, the harmonic
  // sum over EXACT dyadic terms 2^-M (order-free in IEEE — every
  // partial sum of 16 such terms is exactly representable), α₁₆ =
  // 0.673 and the small-range linear-counting branch as literal
  // constants on both faces. Register tables from disjoint slices
  // MERGE by cell-wise max — the same lambda-architecture property
  // as the CMS counter matrix.
  // ---------------------------------------------------------------

  /** Per-group register table `(groupCol, j, mj)` — ALL 16 registers
    * present (absent = 0) via a spine join, so downstream estimate
    * arithmetic never depends on which registers happened to fill.
    * The aggregate's key space is |groups|·16 — map-side partials
    * collapse every partition to it regardless of stream size. */
  def hllRegisters(items: DataFrame, groupCol: String,
                   valueCol: String): DataFrame = {
    val regs = items
      .withColumn("__m", md5(col(valueCol)))
      .select(col(groupCol),
        expr(TextHashes.hllRegister("__m")).as("j"),
        expr(TextHashes.hllRho("__m")).as("rho"))
      .groupBy(col(groupCol), col("j"))
      .agg(max(col("rho")).as("mj"))
    items.select(col(groupCol)).distinct()
      .crossJoin(items.sparkSession.range(16).select(col("id").cast("int").as("j")))
      .join(regs, Seq(groupCol, "j"), "left")
      .select(col(groupCol), col("j"),
        coalesce(col("mj"), lit(0)).as("mj"))
  }

  private val HllStoreMarker = "_graft_hllstore_committed"

  /** Land per-SLICE register tables (e.g. one per ingested day) as ONE
    * committed store — the merge-on-read distinct pattern: each slice
    * is sketched once at ingest, and any later distinct question over
    * any union of slices is answered by [[hllServe]]'s cell-wise max +
    * estimate, never by re-scanning rows. All slices land under one
    * versioned commit (q208's torn-pair rule: a reader can never see
    * day N's registers without day N−1's). */
  def saveHllStore(slices: Seq[DataFrame], groupCol: String,
                   valueCol: String, path: String): Unit = {
    require(slices.nonEmpty, "saveHllStore needs at least one slice")
    graft.sources.Stores.commitVersioned(slices.head.sparkSession, path,
        HllStoreMarker) { dir =>
      slices.zipWithIndex.foreach { case (sl, i) =>
        hllRegisters(sl, groupCol, valueCol)
          .write.mode("overwrite").parquet(s"$dir/slice=$i")
      }
    }
  }

  /** Merge-on-read distinct estimate from a COMMITTED [[saveHllStore]]
    * artifact: union every slice's registers, cell-wise max, estimate
    * — by the merge property (spec'd in SketchesSpec) this equals the
    * single-pass sketch of the concatenated stream bit-for-bit.
    * Refuses an uncommitted/torn store. */
  def hllServe(spark: org.apache.spark.sql.SparkSession, path: String,
               groupCol: String): DataFrame = {
    val dir = graft.sources.Stores
      .resolveCommitted(spark, path, HllStoreMarker)
      .getOrElse(throw new IllegalArgumentException(
        s"requirement failed: HLL store at $path has no commit " +
          s"marker ($HllStoreMarker) — it is mid-build, torn, or " +
          "absent; rebuild with saveHllStore"))
    val merged = spark.read.parquet(s"$dir/slice=*")
      .groupBy(col(groupCol), col("j"))
      .agg(max(col("mj")).as("mj"))
    hllEstimate(merged, groupCol)
  }

  /** Pay-once build for the q222 face. */
  def ensureHllStore(slices: => Seq[DataFrame], spark: org.apache.spark.sql.SparkSession,
                     groupCol: String, valueCol: String,
                     path: String): Unit =
    graft.sources.Stores.ensureCommitted(spark, path,
      HllStoreMarker)(saveHllStore(slices, groupCol, valueCol, path))

  /** Distinct estimate per group from a [[hllRegisters]] table:
    * harmonic-mean raw estimate with Flajolet's small-range
    * linear-counting correction (`raw ≤ 2.5m` and empty registers
    * present → m·ln(m/V)). Every input to the float ops is an exact
    * integer or dyadic, so the estimate is engine-bit-identical. */
  def hllEstimate(registers: DataFrame, groupCol: String): DataFrame =
    registers
      .groupBy(col(groupCol))
      .agg(
        sum(lit(1.0) / expr("cast(1L << mj as double)")).as("z"),
        sum(when(col("mj") === 0, 1L).otherwise(0L)).as("v_empty"))
      .select(col(groupCol), col("v_empty"),
        (lit(0.673) * lit(256.0) / col("z")).as("raw"))
      .withColumn("est",
        when(col("raw") <= 40.0 && col("v_empty") > 0,
          lit(16.0) * log(lit(16.0) / col("v_empty")))
          .otherwise(col("raw")))
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
