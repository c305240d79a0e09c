package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Fixed-point product quantization (round 17, r16 verdict #2; Jégou,
  * Douze & Schmid 2011, "Product Quantization for Nearest Neighbor
  * Search"): split each d-dim embedding into `m` subspaces of `dsub`
  * dims, train an independent `k`-centroid codebook per subspace
  * (Lloyd rounds under [[Linalg.kmeansQuantized]]'s exact-integer
  * contract), encode every vector as its `m` nearest-centroid codes
  * (m·log₂k bits — 8 subspaces × 16 centroids = 8 half-bytes against
  * 256 float bytes, the 64× compression a 100-TB vector store actually
  * ships), and search by ASYMMETRIC DISTANCE COMPUTATION: the probe
  * precomputes one |m|×|k| lookup table of exact subspace distances
  * and every candidate's distance is m table lookups summed — no
  * vector arithmetic ever touches the corpus at query time.
  *
  * **Fixed-point contract** (the q216/q223/q224 discipline — what lets
  * a DuckDB oracle replay codebook training, encoding, AND search
  * bit-for-bit): vectors quantize to floor(x·1000) BIGINT; distances
  * are exact BIGINT squared-L2 sums; argmin ties break to the smallest
  * cid (min-struct ≡ row_number); centroid updates are exact
  * floor(Σe/n); empty clusters keep their previous centroid; seeding
  * is the k actually-smallest vector ids (TakeOrdered + 0-based rank,
  * q224's r16-fixed rule) — the SAME k seed vectors provide every
  * subspace's seeds.
  *
  * **Scale shape.** All `m` codebooks train in ONE Lloyd loop: the
  * subvector frame keys cells by (sub, cid, dim), so the per-round
  * update collapses map-side to the FIXED m·k·dsub cell space (1,024
  * cells at the contract geometry — q214's argument) and assignment is
  * a broadcast join against the m·k-row codebook frame with an
  * (id, sub)-keyed argmin partial; nothing exchanges the corpus.
  * Encoding is the same assignment shape (n·m code rows out). Search
  * broadcasts the |probes|·m·k LUT (probe batches are bounded — q115's
  * audit discipline) and the (probe, cand) ADC rollup partial-
  * aggregates map-side. The committed store ([[saveStore]]) lands
  * codebooks AND codes under ONE versioned commit (q208's torn-pair
  * rule: codes must never be read against a codebook generation they
  * were not encoded with), so serving never re-reads, re-encodes, or
  * even re-sees the raw vector corpus. */
object Pq {

  /** Quantized subvector frame: `(__id, sub, e)` — sub 0-based,
    * e = dsub BIGINT components at the 1e3 fixed point. */
  private def subvecs(vecs: DataFrame, idCol: String, vecCol: String,
                      m: Int, dsub: Int): DataFrame =
    vecs
      .select(col(idCol).as("__id"),
        expr(s"transform($vecCol, x -> cast(floor(cast(x as double) * 1000) as bigint))")
          .as("q"))
      .select(col("__id"), posexplode(expr(
        s"transform(sequence(1, $m), s -> slice(q, cast((s - 1) * $dsub + 1 as int), $dsub))"))
        .as(Seq("__s0", "e")))
      .select(col("__id"), col("__s0").cast("int").as("sub"), col("e"))

  private val dist = expr(
    "aggregate(zip_with(e, c, (a, b) -> (a - b) * (a - b)), 0L, (acc, x) -> acc + x)")

  /** One assignment pass: nearest codebook entry per (vector, sub)
    * under the exact-integer distance + smallest-cid tie rule. */
  private def assign(sv: DataFrame, cents: DataFrame): DataFrame =
    sv.join(broadcast(cents), Seq("sub"))
      .select(col("__id"), col("sub"), col("e"), col("cid"), dist.as("dist"))
      .groupBy(col("__id"), col("sub"))
      .agg(min(struct(col("dist"), col("cid"))).as("mn"),
        first(col("e")).as("e"))
      .select(col("__id"), col("sub"), col("e"), col("mn.cid").as("cid"))

  /** Train all `m` codebooks in one Lloyd loop — `(sub, cid, c)` with
    * `c` the dsub-wide exact-integer centroid. */
  def trainCodebooks(vecs: DataFrame, idCol: String, vecCol: String,
                     m: Int = 8, dsub: Int = 8, k: Int = 16,
                     iterations: Int = 2): DataFrame = {
    val sv = subvecs(vecs, idCol, vecCol, m, dsub).localCheckpoint(true)
    val seedIds = vecs.select(col(idCol).as("__id"))
      .orderBy(col("__id")).limit(k)
      .withColumn("cid",
        (row_number().over(Window.orderBy(col("__id"))) - 1).cast("int"))
    val nSeeds = seedIds.count()
    require(nSeeds == k,
      s"trainCodebooks: corpus has only $nSeeds rows, cannot seed k=$k")
    var cents: DataFrame = sv.join(broadcast(seedIds), Seq("__id"))
      .select(col("sub"), col("cid"), col("e").as("c"))
    for (_ <- 1 to iterations) {
      val cells = assign(sv, cents)
        .select(col("sub"), col("cid"), posexplode(col("e")).as(Seq("d", "ev")))
        .groupBy(col("sub"), col("cid"), col("d"))
        .agg(floor(sum(col("ev")) * lit(1.0) / count(lit(1)))
          .cast("long").as("cv"))
      val newC = cells.groupBy(col("sub"), col("cid"))
        .agg(expr("transform(sort_array(collect_list(struct(d, cv))), z -> z.cv)")
          .as("cNew"))
      cents = cents.join(newC, Seq("sub", "cid"), "left")
        .select(col("sub"), col("cid"),
          coalesce(col("cNew"), col("c")).as("c"))
    }
    // the codebook frame is m·k rows and almost always multi-consumed
    // (encode + probe LUT both read it — q185's sibling-consumer rule:
    // unpinned, the whole Lloyd chain would re-run per consumer)
    cents.localCheckpoint(true)
  }

  /** Encode each vector as its `m` nearest-centroid codes —
    * `(idCol, sub, code)`. */
  def encode(vecs: DataFrame, idCol: String, vecCol: String,
             codebooks: DataFrame, m: Int = 8, dsub: Int = 8): DataFrame =
    assign(subvecs(vecs, idCol, vecCol, m, dsub), codebooks)
      .select(col("__id").as(idCol), col("sub"), col("cid").as("code"))

  /** The probe-side ADC lookup table — `(probe, sub, code, pd)`:
    * exact subspace distance from each probe subvector to each
    * codebook entry (|probes|·m·k rows, broadcast-sized for bounded
    * probe batches). */
  private def lut(probes: DataFrame, probeIdCol: String, vecCol: String,
                  codebooks: DataFrame, m: Int, dsub: Int): DataFrame =
    subvecs(probes, probeIdCol, vecCol, m, dsub)
      .join(broadcast(codebooks), Seq("sub"))
      .select(col("__id").as("probe"), col("sub"),
        col("cid").as("code"), dist.as("pd"))

  /** ADC top-k search of an ENCODED corpus: `(probe, rk, cand, adc)` —
    * each candidate's distance is the sum of its m codes' LUT entries
    * (exact BIGINT), ranked per probe by (adc, cand). The codes frame
    * never sees vector arithmetic; the rank filter prunes map-side
    * (WindowGroupLimit). */
  def searchCodes(codes: DataFrame, candIdCol: String,
                  probes: DataFrame, probeIdCol: String, vecCol: String,
                  codebooks: DataFrame, m: Int = 8, dsub: Int = 8,
                  topK: Int = 3): DataFrame = {
    val w = Window.partitionBy(col("probe"))
      .orderBy(col("adc").asc, col(candIdCol).asc)
    codes
      .join(broadcast(lut(probes, probeIdCol, vecCol, codebooks, m, dsub)),
        Seq("sub", "code"))
      .groupBy(col("probe"), col(candIdCol))
      .agg(sum(col("pd")).as("adc"))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= topK)
      .select(col("probe"), col("rk"), col(candIdCol), col("adc"))
  }

  /** Train + encode + search in one call (the inline contract face —
    * [[saveStore]]/[[searchStore]] is the deploy shape). */
  def search(corpus: DataFrame, candIdCol: String,
             probes: DataFrame, probeIdCol: String, vecCol: String,
             codebooks: DataFrame, m: Int = 8, dsub: Int = 8,
             topK: Int = 3): DataFrame =
    searchCodes(encode(corpus, candIdCol, vecCol, codebooks, m, dsub),
      candIdCol, probes, probeIdCol, vecCol, codebooks, m, dsub, topK)

  private val PqStoreMarker = "_graft_pqstore_committed"

  /** Land codebooks + encoded corpus under ONE versioned commit
    * (q208's torn-pair rule: codes are meaningless against any other
    * codebook generation). Build pays the corpus pass once; serving
    * reads 1-byte-per-subspace codes and never the raw vectors. */
  def saveStore(corpus: DataFrame, idCol: String, vecCol: String,
                path: String, m: Int = 8, dsub: Int = 8, k: Int = 16,
                iterations: Int = 2): Unit = {
    val spark = corpus.sparkSession
    graft.sources.Stores.commitVersioned(spark, path, PqStoreMarker) { dir =>
      val cb = trainCodebooks(corpus, idCol, vecCol, m, dsub, k, iterations)
        .localCheckpoint(true)
      cb.select(col("sub"), col("cid"), col("c"))
        .write.mode("overwrite").parquet(s"$dir/codebooks")
      encode(corpus, idCol, vecCol, cb, m, dsub)
        .toDF("cand", "sub", "code")
        .write.mode("overwrite").parquet(s"$dir/codes")
    }
  }

  /** ADC search served from a COMMITTED [[saveStore]] artifact:
    * identical results to the inline [[search]] (the q212/q228 hash
    * discipline), with the corpus pass deleted — per batch the store
    * side is one column-pruned codes scan + the broadcast LUT join.
    * Refuses an uncommitted/torn store. */
  def searchStore(spark: SparkSession, path: String,
                  probes: DataFrame, probeIdCol: String, vecCol: String,
                  m: Int = 8, dsub: Int = 8, topK: Int = 3): DataFrame = {
    val dir = graft.sources.Stores
      .resolveCommitted(spark, path, PqStoreMarker)
      .getOrElse(throw new IllegalArgumentException(
        s"requirement failed: PQ store at $path has no commit marker " +
          s"($PqStoreMarker) — it is mid-build, torn, or absent; " +
          "rebuild with saveStore"))
    val cb = spark.read.parquet(s"$dir/codebooks")
    val codes = spark.read.parquet(s"$dir/codes")
    searchCodes(codes, "cand", probes, probeIdCol, vecCol, cb, m, dsub,
      topK)
  }

  /** Pay-once build for the q235 face. `corpus` is BY-NAME: under
    * trust-committed serving ([[graft.sources.Stores.TrustConf]]) a
    * fresh process must be able to serve a committed store without
    * even CONSTRUCTING the corpus frame (its parquet may be archived
    * or gone — `StoresTrustSpec` serves against a deleted corpus). */
  def ensureStore(spark: SparkSession, corpus: => DataFrame,
                  idCol: String, vecCol: String,
                  path: String, m: Int = 8, dsub: Int = 8, k: Int = 16,
                  iterations: Int = 2): Unit =
    graft.sources.Stores.ensureCommitted(spark, path, PqStoreMarker)(
      saveStore(corpus, idCol, vecCol, path, m, dsub, k, iterations))
}
