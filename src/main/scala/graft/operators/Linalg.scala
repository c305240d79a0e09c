package graft.operators

import org.apache.spark.sql.DataFrame
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
    val q = vecs.select(expr(
      s"transform($vecCol, x -> cast(floor(cast(x as double) * 1000) as bigint))")
      .as("e"))
    val sums = q
      .select(posexplode(col("e")).as(Seq("__p", "ev")))
      .select((col("__p") + 1).as("j"), col("ev"))
      .groupBy(col("j"))
      .agg(sum(col("ev")).as("sj"), count(lit(1)).as("cnt"))
    // per-row outer product: d² plain longs per vector (one flat
    // array — struct-free, the 0-based position recovers (j, k)
    // arithmetically after the generate), no join
    val prods = q
      .select(size(col("e")).as("__d"), posexplode(expr(
        """flatten(transform(sequence(1, size(e)), j ->
          |  transform(e, x -> element_at(e, j) * x)))"""
          .stripMargin)).as(Seq("__p0", "prod")))
      .select(expr("cast(__p0 div __d + 1 as int)").as("j"),
        expr("cast(__p0 % __d + 1 as int)").as("k"), col("prod"))
      .groupBy(col("j"), col("k"))
      .agg(sum(col("prod")).as("p"))
    // C = n·Σ e_j e_k − (Σ e_j)(Σ e_k), scaled by an exact floor —
    // the covariance numerator as one integer identity; the C″ frame
    // is d² rows, checkpoint-pinned (every iteration consumes it —
    // q185's sibling-consumer rule)
    val cMat = prods
      .join(sums.select(col("j"), col("sj"), col("cnt")), "j")
      .join(sums.select(col("j").as("k"), col("sj").as("sk")), "k")
      .select(col("j"), col("k"),
        floor((col("cnt") * col("p") - col("sj") * col("sk")) *
          lit(1.0) / lit(1.0e7)).cast("long").as("c"))
      .localCheckpoint(true)
    // v₀ derives from the PINNED matrix (not from the corpus-scanning
    // sums frame — that would re-run the tokenize-class scan inside
    // the first iteration's join)
    var v = cMat.select(col("j")).distinct()
      .select(col("j").as("k"), lit(10000L).as("v"))
    for (_ <- 1 to iterations) {
      val w = cMat.join(v, "k")
        .groupBy(col("j"))
        .agg(sum(col("c") * col("v")).as("w"))
      val wmax = w.agg(max(abs(col("w"))).as("wm"))
      v = w.crossJoin(broadcast(wmax))
        .select(col("j").as("k"),
          floor(col("w") * lit(10000.0) /
            when(col("wm") === 0, lit(null)).otherwise(col("wm")))
            .cast("long").as("v"))
    }
    v.select(col("k").as("dim"), col("v").as("v_fp"),
      (round(col("v") / 10000.0, 4) + 0.0).as("loading"))
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
    val q = vecs.select(col(idCol).as("__id"),
        expr(s"transform($vecCol, x -> cast(floor(cast(x as double) * 1000) as bigint))")
          .as("e"))
      .localCheckpoint(true)
    val dist = expr(
      "aggregate(zip_with(e, c, (a, b) -> (a - b) * (a - b)), 0L, (acc, x) -> acc + x)")
    def assign(cents: DataFrame): DataFrame =
      q.crossJoin(broadcast(cents))
        .select(col("__id"), col("e"), col("cid"), dist.as("dist"))
        .groupBy(col("__id"))
        .agg(min(struct(col("dist"), col("cid"))).as("m"),
          first(col("e")).as("e"))
        .select(col("__id"), col("e"), col("m.cid").as("cid"))
    // seeds = the k actually-smallest ids (TakeOrderedAndProject — k
    // rows off per-partition heaps, never a global sort); the window
    // ranks only the k-row seed frame. A `__id < k` filter would
    // silently under-seed sparse or offset id spaces.
    val seeds = q.orderBy(col("__id")).limit(k)
      .withColumn("cid",
        (row_number().over(Window.orderBy(col("__id"))) - 1).cast("int"))
    val nSeeds = seeds.count()
    require(nSeeds == k,
      s"kmeansQuantized: corpus has only $nSeeds rows, cannot seed k=$k")
    var cents: DataFrame = seeds.select(col("cid"), col("e").as("c"))
    for (_ <- 1 to iterations) {
      val cells = assign(cents)
        .select(col("cid"), posexplode(col("e")).as(Seq("d", "ev")))
        .groupBy(col("cid"), col("d"))
        .agg(floor(sum(col("ev")) * lit(1.0) / count(lit(1)))
          .cast("long").as("cv"))
      val newC = cells.groupBy(col("cid"))
        .agg(expr("transform(sort_array(collect_list(struct(d, cv))), z -> z.cv)")
          .as("cNew"))
      cents = cents.join(newC, Seq("cid"), "left")
        .select(col("cid"), coalesce(col("cNew"), col("c")).as("c"))
    }
    val counts = assign(cents)
      .groupBy(col("cid")).agg(count(lit(1)).as("n_members"))
    cents
      .select(col("cid"), posexplode(col("c")).as(Seq("d", "cv")))
      .select(col("cid"), (col("d") + 1).cast("long").as("dim"),
        col("cv").as("c"))
      .join(counts, Seq("cid"), "left")
      .select(col("cid"), col("dim"), col("c"),
        coalesce(col("n_members"), lit(0L)).as("n_members"))
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
    val q = vecs.select(col(idCol).as("__id"),
      expr(s"transform($vecCol, x -> cast(floor(cast(x as double) * 1000) as bigint))")
        .as("e"))
    val dist = expr(
      "aggregate(zip_with(e, c, (a, b) -> (a - b) * (a - b)), 0L, (acc, x) -> acc + x)")
    val assigned = q.crossJoin(broadcast(centroids))
      .select(col("__id"), col("cid"), dist.as("dist"))
      .groupBy(col("__id"))
      .agg(min(struct(col("dist"), col("cid"))).as("m"))
      .select(col("__id"), col("m.cid").as("cid"),
        floor(col("m.dist") / lit(1000.0)).cast("long").as("dp"))
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
