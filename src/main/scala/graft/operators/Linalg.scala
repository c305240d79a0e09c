package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Fixed-point distributed numeric linear algebra (round 16 — the
  * second new operator class of the round, after [[Graphs]]' iterative
  * graph computation): the top principal component of an embedding
  * corpus by power iteration (von Mises & Pollaczek-Geiringer 1929;
  * the anisotropy diagnostic an embedding pipeline checks before
  * trusting cosine similarity — Ethayarajh 2019's observation that a
  * dominant direction makes all cosines look alike).
  *
  * **Why fixed-point.** A float PCA is not differentially testable:
  * covariance entries are float sums (partition-order ulps) and the
  * iteration amplifies them. Here every stage is exact integers:
  *  1. embeddings quantize to e = floor(x·1000) (BIGINT);
  *  2. the covariance numerator C = n·Σe_j e_k − (Σe_j)(Σe_k) is an
  *     exact integer identity (no mean subtraction, no float);
  *  3. C scales down by an exact floor(C/1e7) to keep the iteration
  *     inside double-exact range;
  *  4. each iteration is w = C″v (exact BIGINT dot products) followed
  *     by v′ = floor(w·1e4 / max|w|) — renormalized to 1e4 fixed
  *     point. All floor(a·1.0/b) divisions sit in the safe zone
  *     (products < 2^53, quotient ulp ≪ 1/divisor), so the result is
  *     bit-identical on any engine, partitioning, or summation order.
  * The quantization defines the operator's contract (a deterministic
  * variant, like [[Graphs.textRank]]'s) — loadings converge to the
  * true component's direction to ~1e-3, ample for the anisotropy
  * decision the diagnostic feeds.
  *
  * **Scale shape.** The Gram pass is a per-row OUTER-PRODUCT
  * GENERATE — each vector explodes its own d² = 4,096 (j, k, e_j·e_k)
  * structs in a narrow lambda and the (j,k) aggregate collapses
  * map-side to the fixed cell space (q214's argument): ZERO joins,
  * zero exchange on the corpus side, the sketch-build shape. The
  * first cut self-joined the (id, dim, e) frame on the id instead —
  * and the ×10/×30 probe caught the planner BROADCASTING one n·d side
  * (flat shuffle records for the wrong reason: a data-sized broadcast
  * is an OOM at 1000×, exactly what the probes exist to catch).
  * Iterations run entirely on d- and d²-row frames. */
object Linalg {

  /** Top principal component of `vecCol` (array<float>, fixed width):
    * `(dim, v_fp, loading)` — 1-based dim, the exact BIGINT 1e4
    * fixed-point component, and loading = v_fp/1e4 rounded to 4.
    * Sign is iteration-determined (v₀ = all-ones) and deterministic.
    *
    * Width boundary: the Gram generate materializes one flat d²-long
    * array per row (~32 KB at the contract d=64) — fine through
    * d≈256, but at d≥512 the per-row array is multi-MB and the
    * escape hatch is a j-BLOCKED generate (emit d·B cells per pass
    * over ⌈d/B⌉ passes); build it when a d≥512 fixture exists. */
  def topComponent(vecs: DataFrame, idCol: String, vecCol: String,
                   iterations: Int = 6): DataFrame = {
    // Round-19 execution rewrite (optimization guide §1.2 "the
    // distributed algorithm", §2.4 "remove shuffles outright"; values
    // bit-identical — same quantization, same integer identities, same
    // double idioms, re-proven by the oracle at both SFs):
    //
    //  * The Gram pass is ONE scan with a fixed-size per-partition
    //    accumulator (n, Σe_j per dim, Σe_j·e_k per cell) merged by
    //    exact integer addition — MLlib RowMatrix.computeGramianMatrix's
    //    shape. The previous form exploded n·d² = 8.2 M (sf0.1) rows
    //    through a Generate into a d²-key hash aggregate: profiled at
    //    2.5 s in ONE task, plus 27 satellite jobs and 3.3 s of driver
    //    re-planning gaps from the 6-iteration join tree (the captured
    //    q223 before-plan is 0.5 MB of operators). Long addition is
    //    commutative/associative, so any partitioning or merge order
    //    yields the identical matrix.
    //  * The power iterations run on the DRIVER over the d²-cell
    //    matrix (32 KB at the contract d = 64 — metadata-bounded, the
    //    TextPipeline K-row merge-table precedent; the corpus never
    //    leaves the executors). Each step replays the engine
    //    expressions exactly: w_j = Σ_k c_jk·v_k in wrapping Long
    //    arithmetic with SQL null-skipping sums, v′ =
    //    floor(w·10000.0 / wmax) in the same IEEE doubles, null when
    //    wmax is 0/null — bit-for-bit what the joined-frame form
    //    computed, without 6 rounds of tiny exchanges+broadcasts.
    //
    // Width boundary unchanged (d ≥ 512 wants a blocked accumulator);
    // driver state is d² longs — fine through d ≈ 2048.
    val spark = vecs.sparkSession
    val q = graft.Tables.withParallelismFloor(
      vecs.select(col(idCol).as("__id"), col(vecCol)), idCol)
      .select(expr(
        s"transform($vecCol, x -> cast(floor(cast(x as double) * 1000) as bigint))")
        .as("e"))
    // (d, cnt_j, s_j, p_jk flattened row-major) — grown on first use;
    // ragged widths accumulate per-row like the exploded form did
    // (cnt_j counts rows carrying dim j, null elements skip sums)
    type Acc = (Int, Array[Long], Array[Long], Array[Long])
    val zero: Acc = (0, Array.empty, Array.empty, Array.empty)
    def grow(a: Acc, d: Int): Acc =
      if (a._1 >= d) a
      else {
        val (d0, c0, s0, p0) = a
        val c = java.util.Arrays.copyOf(c0, d)
        val s = java.util.Arrays.copyOf(s0, d)
        val p = new Array[Long](d * d)
        var j = 0
        while (j < d0) {
          System.arraycopy(p0, j * d0, p, j * d, d0); j += 1
        }
        (d, c, s, p)
      }
    val seqOp = (acc0: Acc, row: org.apache.spark.sql.Row) => {
      val e = row.getSeq[Any](0)
      val dr = e.length
      val acc = grow(acc0, dr)
      val (d, cnt, s, p) = acc
      val v = new Array[Long](dr)
      val nn = new Array[Boolean](dr)
      var j = 0
      while (j < dr) {
        val x = e(j)
        if (x != null) { v(j) = x.asInstanceOf[Long]; nn(j) = true }
        j += 1
      }
      j = 0
      while (j < dr) {
        cnt(j) += 1
        if (nn(j)) {
          val ej = v(j)
          s(j) += ej
          val base = j * d
          var k = 0
          while (k < dr) {
            if (nn(k)) p(base + k) += ej * v(k)
            k += 1
          }
        }
        j += 1
      }
      acc
    }
    val combOp = (a0: Acc, b0: Acc) => {
      if (a0._1 == 0) b0
      else if (b0._1 == 0) a0
      else {
        val a = grow(a0, b0._1); val b = grow(b0, a0._1)
        val (d, ca, sa, pa) = a
        var j = 0
        while (j < d) {
          ca(j) += b._2(j); sa(j) += b._3(j); j += 1
        }
        var i = 0
        while (i < d * d) { pa(i) += b._4(i); i += 1 }
        a
      }
    }
    val (d, cnt, s, p) =
      q.rdd.treeAggregate(zero)(seqOp, combOp)
    // c_jk = floor((cnt_j·p_jk − s_j·s_k) · 1.0 / 1e7) — the exact
    // expression the frame form evaluated (wrapping Long products,
    // double division, floor, cast)
    val c = Array.tabulate(d * d) { i =>
      val j = i / d; val k = i % d
      math.floor((cnt(j) * p(i) - s(j) * s(k)) * 1.0 / 1.0e7).toLong
    }
    // v₀ = 10000 on every dim the matrix carries
    var v: Array[java.lang.Long] =
      Array.tabulate(d)(j => if (cnt(j) > 0) java.lang.Long.valueOf(10000L)
                             else null)
    val present = Array.tabulate(d)(j => cnt(j) > 0)
    for (_ <- 1 to iterations) {
      // w_j = SQL sum over k of c_jk·v_k: null terms are SKIPPED, the
      // sum is null only when every term is null
      val w: Array[java.lang.Long] = Array.tabulate(d) { j =>
        if (!present(j)) null
        else {
          var any = false; var acc = 0L; var k = 0
          while (k < d) {
            if (present(k) && v(k) != null) {
              acc += c(j * d + k) * v(k).longValue(); any = true
            }
            k += 1
          }
          if (any) java.lang.Long.valueOf(acc) else null
        }
      }
      // wmax = max(abs(w)) skipping nulls; null when all null
      var wm: java.lang.Long = null
      var j = 0
      while (j < d) {
        if (w(j) != null) {
          val a = math.abs(w(j).longValue())
          if (wm == null || a > wm.longValue()) wm = java.lang.Long.valueOf(a)
        }
        j += 1
      }
      // v′ = floor(w·10000.0 / (wm = 0 ? null : wm)) — null divisor or
      // null w propagates
      v = Array.tabulate(d) { j =>
        if (!present(j)) null
        else if (w(j) == null || wm == null || wm.longValue() == 0L) null
        else java.lang.Long.valueOf(math.floor(
          w(j).longValue() * 10000.0 / wm.longValue().toDouble).toLong)
      }
    }
    // loading = round(v/10000.0, 4) + 0.0 — Spark's HALF_UP
    // BigDecimal.valueOf round on doubles, replicated verbatim
    val rows = (0 until d).filter(present).map { j =>
      val vf = v(j)
      val loading: java.lang.Double =
        if (vf == null) null
        else java.lang.Double.valueOf(
          java.math.BigDecimal.valueOf(vf.longValue() / 10000.0)
            .setScale(4, java.math.RoundingMode.HALF_UP)
            .doubleValue() + 0.0)
      org.apache.spark.sql.Row(j + 1, vf, loading)
    }
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("dim",
        org.apache.spark.sql.types.IntegerType, nullable = false),
      org.apache.spark.sql.types.StructField("v_fp",
        org.apache.spark.sql.types.LongType, nullable = true),
      org.apache.spark.sql.types.StructField("loading",
        org.apache.spark.sql.types.DoubleType, nullable = true)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), schema)
  }

  /** Fixed-point Lloyd k-means (Lloyd 1957/1982) — the estimate stage
    * SemDeDup-class semantic dedup consumes (q183's centroids are
    * its output in production): `iterations` rounds of assign →
    * integer-mean update over floor(x·1000)-quantized vectors, then
    * `(cid, dim, c, n_members)` — the centroid table plus final
    * membership counts.
    *
    * The fixed-point contract (q216/[[topComponent]]'s rule): squared
    * L2 distances are exact BIGINT sums, argmin ties break to the
    * smallest cid (min over (dist, cid) structs ≡ the oracle's
    * row_number), centroid updates are the shared floor(Σe·1.0/n)
    * double idiom — identical on both engines unconditionally, and
    * equal to the exact integer floor while |Σe| < 2⁵³ (~4.5·10¹²
    * members per cell at the 1e3 quantization — the r17-stated bound,
    * see Pq.trainQuantized), and
    * empty clusters keep their previous centroid — every state is an
    * exact integer, bit-identical on any engine. Seeding is the k
    * smallest ids — the ACTUAL k smallest (TakeOrdered over the id,
    * cid = 0-based rank among the seeds), not an `id < k` predicate
    * that silently under-seeds any id space not densely numbered from
    * 0 — with a loud `require` when the corpus has fewer than k rows
    * (deterministic; k-means++ adds nothing a differential contract
    * can use).
    *
    * Scale shape: assignment is a broadcast cross join against the
    * K-row centroid frame with a NARROW zip_with/aggregate distance
    * fold (n·K rows, no exchange before the per-vector argmin
    * partial); the update explode's (cid, dim) aggregate collapses
    * map-side to the FIXED K·d cell space (q214's argument); the
    * quantized corpus frame is checkpoint-pinned once and re-read per
    * round (q185's rule). */
  def kmeansQuantized(vecs: DataFrame, idCol: String, vecCol: String,
                      k: Int = 8, iterations: Int = 2): DataFrame = {
    val (q, cents) = lloydQuantized(vecs, idCol, vecCol, k, iterations)
    val spark = vecs.sparkSession
    val counts = assignPackedQ(q, packedCentroidsDf(spark, cents))
      .groupBy(col("cid")).agg(count(lit(1)).as("n_members"))
    // centroid table as a LOCAL relation (cid, dim, c) — K·d rows of
    // metadata; the membership-counts join is the only distributed
    // consumer left
    val centRows: Seq[org.apache.spark.sql.Row] =
      for (i <- cents.indices; d <- cents(i).indices)
        yield org.apache.spark.sql.Row(i, (d + 1).toLong, cents(i)(d))
    val centSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("cid",
        org.apache.spark.sql.types.IntegerType, nullable = false),
      org.apache.spark.sql.types.StructField("dim",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("c",
        org.apache.spark.sql.types.LongType, nullable = false)))
    spark.createDataFrame(
        java.util.Arrays.asList(centRows: _*), centSchema)
      .join(counts, Seq("cid"), "left")
      .select(col("cid"), col("dim"), col("c"),
        coalesce(col("n_members"), lit(0L)).as("n_members"))
  }

  /** The trained centroids alone, as ONE LOCAL `(cid, c array<bigint>)`
    * relation — identical values to [[kmeansQuantized]]'s centroid
    * table (the membership-counts pass is the contract face's output,
    * not the quantizer's), in the coarse-quantizer shape IVF-ADC
    * consumers broadcast (q242's sweep, trained-coarse stores). Skips
    * the counts assignment pass those consumers never read — Catalyst
    * cannot prune it through the contract face's left join. */
  private[graft] def kmeansCoarseLocal(vecs: DataFrame, idCol: String,
      vecCol: String, k: Int = 8, iterations: Int = 2): DataFrame = {
    val (_, cents) = lloydQuantized(vecs, idCol, vecCol, k, iterations)
    val spark = vecs.sparkSession
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("cid", IntegerType, nullable = false),
      StructField("c", ArrayType(LongType, containsNull = true),
        nullable = false)))
    spark.createDataFrame(java.util.Arrays.asList(
      cents.indices.map(i =>
        org.apache.spark.sql.Row(i, cents(i).toSeq)): _*), schema)
  }

  /** The Lloyd loop itself — returns the pinned quantized frame and
    * the trained centroid matrix (driver METADATA: K·d longs).
    *
    * Round-19 driver-iteration (guide §1.2 "the distributed
    * algorithm"; the q223 PCA / BPE merge-loop / Ann.trainCentroids
    * precedent): ONE job per Lloyd round — the broadcast-argmin
    * assignment (array_min over (dist, cid) structs ≡
    * min(struct(dist, cid)), zero exchange) fuses into the (cid, d)
    * cell aggregate, whose result is the FIXED K·d cell space (512
    * rows at the contract geometry). The centroid update — the
    * engine's floor(Σe·1.0/n) double idiom, empty clusters keep their
    * previous centroid — replays on the driver bit-for-bit:
    * (double)Σ × 1.0 / (double)n under IEEE-754 IS the engine
    * expression. The previous form paid a second groupBy + a join + a
    * checkpoint per round, and consumers re-planned a distributed
    * centroid subtree under every broadcast. */
  private def lloydQuantized(vecs: DataFrame, idCol: String,
      vecCol: String, k: Int, iterations: Int)
      : (DataFrame, Array[Array[Long]]) = {
    // scan-parallelism floor (round 19, guide §2.5): spread an
    // unsplittable tiny input before the quantize + per-row distance
    // folds; self-disabling at real volumes. LAZY pin: the seed
    // TakeOrdered computes every partition (per-partition top-k
    // heaps), so the first job fully materializes the frame.
    val q = graft.Tables.withParallelismFloor(vecs, idCol)
      .select(col(idCol).as("__id"),
        expr(s"transform($vecCol, x -> cast(floor(cast(x as double) * 1000) as bigint))")
          .as("e"))
      .localCheckpoint(false)
    val spark = vecs.sparkSession
    // seeds = the k actually-smallest ids, resolved in ONE TakeOrdered
    // collect of the seed VECTORS — k·d longs of metadata
    // (TakeOrderedAndProject — k rows off per-partition heaps, never a
    // global sort). A `__id < k` filter would silently under-seed
    // sparse or offset id spaces.
    val seedRows = q.orderBy(col("__id")).limit(k).collect()
    require(seedRows.length == k,
      s"kmeansQuantized: corpus has only ${seedRows.length} rows, " +
        s"cannot seed k=$k")
    var cents: Array[Array[Long]] =
      seedRows.map(_.getSeq[Long](1).toArray)
    for (_ <- 1 to iterations) {
      val cells = assignPackedQ(q, packedCentroidsDf(spark, cents))
        .select(col("cid"), posexplode(col("e")).as(Seq("d", "ev")))
        .groupBy(col("cid"), col("d"))
        .agg(sum(col("ev")).as("s"), count(lit(1)).as("n"))
        .collect()
      val next = cents.map(_.clone())
      cells.foreach { r =>
        require(!r.isNullAt(2),
          "kmeansQuantized: null component sum — quantized vectors " +
            "must not contain null elements")
        next(r.getInt(0))(r.getInt(1)) =
          math.floor(r.getLong(2).toDouble * 1.0 / r.getLong(3)).toLong
      }
      cents = next
    }
    (q, cents)
  }

  /** Per-row argmin against a packed centroid-array frame — zero
    * exchange (round 19, guide §2.4). */
  private def assignPackedQ(q: DataFrame, packed: DataFrame): DataFrame =
    q.crossJoin(broadcast(packed))
      .select(col("__id"), col("e"), expr(
        """array_min(transform(__cbs, s -> struct(
          |  aggregate(zip_with(e, s.c, (a, b) -> (a - b) * (a - b)),
          |    0L, (acc, x) -> acc + x) as d,
          |  s.cid as cid))).cid"""
          .stripMargin).as("cid"))

  /** The packed build side as a LOCAL relation: one row, `__cbs` the
    * cid-ascending (cid, c) struct array — exactly `sort_array(
    * collect_list(struct(cid, c)))` over the same centroids (cid is
    * unique, so the lexicographic sort is the cid sort). */
  private def packedCentroidsDf(spark: SparkSession,
                                cents: Array[Array[Long]]): DataFrame = {
    import org.apache.spark.sql.types._
    val entry = StructType(Seq(
      StructField("cid", IntegerType, nullable = false),
      StructField("c", ArrayType(LongType, containsNull = true),
        nullable = false)))
    val schema = StructType(Seq(
      StructField("__cbs", ArrayType(entry, containsNull = false),
        nullable = false)))
    spark.createDataFrame(java.util.Arrays.asList(
      org.apache.spark.sql.Row(cents.indices.map(i =>
        org.apache.spark.sql.Row(i, cents(i).toSeq)))), schema)
  }

  /** Per-cluster embedding outlier census — the hygiene pass run
    * before an embedding corpus feeds dedup/retrieval (a vector far
    * from every centroid is mojibake, truncation, or a modality mixup;
    * its cosine neighborhoods are noise): assign each quantized vector
    * to its nearest centroid (the [[kmeansQuantized]] distance/tie
    * contract), then flag members whose distance sits more than 3σ
    * ABOVE the cluster mean (one-sided — the sign guard matters: the
    * squared form alone also flags vectors 3σ BELOW the mean, i.e.
    * near-clones of the centroid seed, which are the opposite of
    * outliers) — with the WHOLE test in exact integers via the
    * n²-scaled cross-multiply
    *
    *   n·d − Σd > 0  AND  (n·d − Σd)² > 9 · (n·Σd² − (Σd)²)
    *
    * (≡ d − μ > 3σ, both sides ×n²). Distances scale down by an
    * exact floor(dist/1000) first so every product stays < 2^53 (the
    * bound analysis lives in the q229 face doc). Returns per cluster
    * `(cid, n, mean_d, n_outliers)` — mean_d under the floor idiom.
    *
    * Scale shape: assignment is [[kmeansQuantized]]'s broadcast
    * cross join (argmin partial n-keyed); the stats and the flag
    * join-back are |K|-row frames; nothing n·K-sized exchanges. */
  def embeddingOutliers(vecs: DataFrame, idCol: String, vecCol: String,
                        centroids: DataFrame): DataFrame = {
    // scan-parallelism floor (round 19, guide §2.5) — as kmeansQuantized
    val q = graft.Tables.withParallelismFloor(vecs, idCol)
      .select(col(idCol).as("__id"),
      expr(s"transform($vecCol, x -> cast(floor(cast(x as double) * 1000) as bigint))")
        .as("e"))
    // per-row argmin over the packed broadcast centroids (round 19,
    // guide §2.4 — kmeansQuantized's rationale): array_min over
    // (dist, cid) structs ≡ min(struct(dist, cid)), zero exchange
    val packed = centroids.groupBy()
      .agg(expr("sort_array(collect_list(struct(cid, c)))").as("__cbs"))
    val assigned = q.crossJoin(broadcast(packed))
      .select(col("__id"), expr(
        """array_min(transform(__cbs, s -> struct(
          |  aggregate(zip_with(e, s.c, (a, b) -> (a - b) * (a - b)),
          |    0L, (acc, x) -> acc + x) as d,
          |  s.cid as cid)))"""
          .stripMargin).as("m"))
      .select(col("__id"), col("m.cid").as("cid"),
        floor(col("m.d") / lit(1000.0)).cast("long").as("dp"))
    val stats = assigned.groupBy(col("cid"))
      .agg(count(lit(1)).as("n"), sum(col("dp")).as("sd"),
        sum(col("dp") * col("dp")).as("sdd"))
    assigned.join(stats, "cid")
      .withColumn("__out",
        col("n") * col("dp") - col("sd") > 0 &&
          (col("n") * col("dp") - col("sd")) *
            (col("n") * col("dp") - col("sd")) >
            lit(9L) * (col("n") * col("sdd") - col("sd") * col("sd")))
      .groupBy(col("cid"))
      .agg(count(lit(1)).as("n"),
        (floor(sum(col("dp")) * lit(10000.0) / count(lit(1))) / 10000.0)
          .as("mean_d"),
        sum(when(col("__out"), 1L).otherwise(0L)).as("n_outliers"))
  }
}
