package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Vectors

/** IVF-style approximate nearest-neighbor search (builder mandate:
  * "an IVF or LSH-bucketed variant as the scale path"; complements the
  * sign-LSH bucketing in [[Dedup.embeddingCosine]] and q54).
  *
  * Classic inverted-file (IVF) layout: a small set of coarse centroids
  * partitions the corpus into inverted lists (each vector is assigned to
  * its nearest centroid); a query probes only the `nprobe` nearest lists
  * instead of scanning the corpus. At 100 TB the shapes are:
  *
  *  - **assignment** — centroids are tiny (K ≤ a few thousand) and
  *    broadcast; each corpus vector scores all K in one narrow pass and
  *    keeps the argmax via a partial-aggregatable `max(struct)` — the
  *    exchange carries one row per vector, never the n×K cross product.
  *  - **inverted lists** — the assigned corpus partitions by centroid id
  *    (the list id IS the shuffle key), so a probe's candidate scan
  *    touches `nprobe` partitions, not the corpus.
  *  - **search** — the probe set (a query batch, ≪ corpus) is broadcast;
  *    scoring joins lists to probes by centroid id map-side, then a
  *    per-probe top-k window over only the probed lists' rows.
  *
  * Centroids come from [[trainCentroids]] (sampled k-means, in-engine)
  * or any caller-supplied frame (a hash-sample, a fixed pivot set);
  * the search operators take them as a DataFrame either way, so the
  * query contract stays deterministic and oracle-checkable.
  */
object Ann {

  /** Assign every vector to its nearest centroid by cosine (ties broken
    * toward the smallest centroid id). Output: `idCol`, `cidCol`, and the
    * vector as `array<double>` in `vecOut`.
    *
    * One broadcast + one narrow score pass + one partial-aggregated
    * exchange of |vectors| rows — no window, no n×K shuffle. */
  def ivfAssign(vectors: DataFrame, idCol: String, vecCol: String,
                centroids: DataFrame, cidCol: String, cvecCol: String,
                vecOut: String = "__v"): DataFrame = {
    val v = vectors.select(col(idCol), Vectors.asDouble(col(vecCol)).as(vecOut))
    val c = centroids.select(col(cidCol).as("__cid"),
      Vectors.asDouble(col(cvecCol)).as("__cv"))
    v.crossJoin(broadcast(c))
      .select(col(idCol), col(vecOut),
        struct(Vectors.cosine(col(vecOut), col("__cv")).as("sim"),
          (-col("__cid")).as("negcid"), col("__cid").as("cid")).as("__sc"))
      // max(struct) is partial-aggregatable: argmax by (sim, -cid) — the
      // map side reduces n×K scored rows to one per vector pre-shuffle
      .groupBy(col(idCol))
      .agg(max(col("__sc")).as("__best"), first(col(vecOut)).as(vecOut))
      .select(col(idCol), col("__best.cid").as(cidCol), col(vecOut))
  }

  /** Narrow argmax-cosine assignment (round 14): the centroid frame
    * collapses to ONE broadcast row carrying a cid-sorted array of
    * (cid, vector) structs, and every corpus row picks its nearest
    * centroid with a per-row `aggregate` fold — NO exchange, no n×K
    * row inflation, no struct-max aggregate (the struct form demotes
    * to SortAggregate and ships full vectors through the shuffle; this
    * form keeps the whole assignment inside the scan's codegen stage).
    *
    * Tie semantics are [[ivfAssign]]'s exactly: the fold walks
    * centroids in ascending cid with STRICT improvement, so equal
    * similarities keep the smallest cid. Same output columns. Use this
    * when downstream does NOT need the output pre-partitioned by id;
    * [[ivfAssign]]'s exchange-based form remains for consumers that
    * immediately aggregate per id. */
  def assignNarrow(vectors: DataFrame, idCol: String, vecCol: String,
                   centroids: DataFrame, cidCol: String, cvecCol: String,
                   vecOut: String = "__v"): DataFrame = {
    val cRow = centroids
      .select(struct(col(cidCol).cast("long").as("cid"),
        Vectors.asDouble(col(cvecCol)).as("cv")).as("__c"))
      .agg(sort_array(collect_list(col("__c"))).as("__cents"))
    val init = struct(lit(Double.NegativeInfinity).as("sim"),
      lit(Long.MaxValue).as("cid"))
    val pick = aggregate(col("__cents"), init,
      (acc, c) => {
        val s = Vectors.cosine(col(vecOut), c.getField("cv"))
        when(s > acc.getField("sim"),
          struct(s.as("sim"), c.getField("cid").as("cid")))
          .otherwise(acc)
      })
    vectors
      .select(col(idCol), Vectors.asDouble(col(vecCol)).as(vecOut))
      .crossJoin(broadcast(cRow))
      .select(col(idCol), pick.getField("cid").as(cidCol), col(vecOut))
  }

  /** Sampled k-means centroid training for the IVF index — the
    * in-engine answer to "where do centroids come from". Spherical
    * (cosine) Lloyd iterations, built to the same discipline as
    * [[ivfAssign]] and `Dedup.ccDelta`:
    *
    *  - **sample** — training runs over a deterministic hash sample of
    *    the corpus (`sampleFraction`): k-means needs cluster SHAPE, not
    *    every row, so 100 TB trains on a few GB. The filter is a narrow
    *    `pmod(hash(id))` predicate — reproducible, no `rand()`.
    *  - **init** — deterministic farthest-point seeding: seed 1 is the
    *    smallest-`md5(id)` sample row, each next seed the vector LEAST
    *    similar to its nearest chosen seed (ties to the smallest
    *    md5(id)), walked DRIVER-SIDE over a bounded md5-ordered pool
    *    of max(4096, 16k) sample rows — O(pool·k) flops, ~1 MB (round
    *    11; the per-seed Spark-job form was O(n·k²) and dominated the
    *    whole build at k≥100). On clustered data this lands roughly
    *    one seed per cluster, where hash-ordered seeding routinely
    *    merges clusters and strands duplicates (k-means++ without the
    *    randomness, the determinism contract every operator here
    *    keeps).
    *  - **iterate** — each Lloyd round broadcasts the current centroids
    *    (k × dim doubles — driver metadata), assigns via
    *    [[ivfAssign]]'s partial-agg argmax (the exchange carries one
    *    row per sampled vector), and re-estimates means with a
    *    (cid, dimension) partial aggregation whose exchange carries
    *    k × dim partial sums per partition — never vectors. The driver
    *    loop holds only k × dim doubles and stops early once the max
    *    centroid shift drops below `tol`.
    *  - **empty clusters** keep their previous centroid (deterministic,
    *    no re-seeding randomness).
    *
    * Means are L2-normalized each round (cosine assignment is
    * scale-invariant; normalizing keeps magnitudes stable). Per-round
    * double-summation order follows Spark's partition merge order, so
    * centroid bits can differ at the ulp level across runs — assignment
    * and recall are insensitive to that; exact-hash contracts should
    * pin centroids explicitly (q79 does).
    *
    * Returns one row per centroid: `cid` (0..k-1, long), `vecCol`
    * (array<double>) — plugs straight into [[ivfAssign]]/[[ivfSearch]]. */
  def trainCentroids(vectors: DataFrame, idCol: String, vecCol: String,
                     k: Int, iters: Int = 5,
                     sampleFraction: Double = 1.0,
                     tol: Double = 1e-6): DataFrame = {
    require(k >= 1 && iters >= 1, "need k >= 1 and iters >= 1")
    require(sampleFraction > 0 && sampleFraction <= 1,
      s"sampleFraction must be in (0, 1], got $sampleFraction")
    val spark = vectors.sparkSession
    import spark.implicits._
    val denom = 1000000L
    val keep = (sampleFraction * denom).toLong
    val sampled = vectors
      .select(col(idCol), Vectors.asDouble(col(vecCol)).as("__v"))
      .filter(pmod(hash(col(idCol)), lit(denom)) < keep)
      .localCheckpoint(false) // iterated over: pin ONE materialization (lazy, r19)
    def normalized(v: Array[Double]): Array[Double] = {
      val n = math.sqrt(v.map(x => x * x).sum)
      if (n == 0) v else v.map(_ / n)
    }
    val nSample = sampled.count()
    require(nSample >= k,
      s"sample has only $nSample rows — need at least k=$k")
    // Farthest-point seeding over a bounded DRIVER-SIDE pool (round
    // 11). The r10 form ran k−1 SEQUENTIAL top-1 jobs, each a
    // crossJoin of the whole sample against the grown seed set —
    // O(n·k²) cosines plus k job overheads, measured 20+ minutes at
    // n=150k, k=240 (the serving probe's m30 build; seeding, not
    // Lloyd, was ~all of it). Seeding needs cluster GEOMETRY, not
    // every row: a deterministic md5-ordered pool of max(4096, 16k)
    // rows (pseudo-random but reproducible — the same order the old
    // first-seed rule used) seeds in O(pool·k) driver flops, ~1 MB
    // pool memory at k=240/dim=64. Whenever the pool covers the whole
    // sample — every test, every small corpus — seed 1 and the
    // argmin walk are IDENTICAL to the old job-per-seed form (ties
    // now break on md5(id), the pool order, rather than raw id — same
    // determinism contract); on larger corpora the seeds come from
    // the pool, which is what sampleFraction already meant. Lloyd
    // below is untouched: assignment and mean-update stay distributed
    // partial aggregations over the FULL sample.
    val poolCap = math.min(nSample, math.max(4096L, 16L * k)).toInt
    val pool: Array[Array[Double]] = sampled
      .select(md5(col(idCol).cast("string")).as("__h"), col("__v"))
      .orderBy(col("__h").asc)
      .limit(poolCap)
      .collect()
      .map(_.getSeq[Double](1).toArray)
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var dot = 0.0; var aa = 0.0; var bb = 0.0; var i = 0
      while (i < a.length) {
        dot += a(i) * b(i); aa += a(i) * a(i); bb += b(i) * b(i); i += 1
      }
      dot / (math.sqrt(aa) * math.sqrt(bb)) // ArrayCosineSim's formula
    }
    val chosen = scala.collection.mutable.ArrayBuffer(0) // smallest md5
    val near = pool.map(v => cos(v, pool(0)))
    while (chosen.length < k) {
      var best = 0
      var i = 1
      while (i < pool.length) {
        // strict <: ties keep the earliest pool row (smallest md5)
        if (near(i) < near(best)) best = i
        i += 1
      }
      chosen += best
      i = 0
      while (i < pool.length) {
        val c = cos(pool(i), pool(best))
        if (c > near(i)) near(i) = c
        i += 1
      }
    }
    var cents: Array[Array[Double]] =
      chosen.map(i => normalized(pool(i))).toArray
    val dim = cents.head.length
    var it = 0
    var shift = Double.MaxValue
    while (it < iters && shift > tol) {
      val centDf = cents.zipWithIndex
        .map { case (v, i) => (i.toLong, v.toSeq) }.toSeq
        .toDF("cid", "__cv")
      // round 14: the narrow per-row argmax replaces ivfAssign here —
      // identical tie semantics, and the per-round |sample|-row argmax
      // exchange disappears (the mean-update below partial-aggregates
      // straight off the scan)
      val assigned = assignNarrow(sampled, idCol, "__v", centDf, "cid",
        "__cv", vecOut = "__v")
      // mean update: (cid, dimension) partial sums — k × dim per
      // partition cross the exchange, k × dim rows reach the driver
      val sums = assigned
        .select(col("cid"), posexplode(col("__v")).as(Seq("__d", "__x")))
        .groupBy(col("cid"), col("__d"))
        .agg(sum(col("__x")).as("s"), count(lit(1)).as("n"))
        .collect()
      val byCid = sums.groupBy(_.getLong(0))
      val next = cents.zipWithIndex.map { case (prev, ci) =>
        byCid.get(ci.toLong) match {
          case Some(rows) =>
            val mean = Array.fill(dim)(0.0)
            rows.foreach { r =>
              mean(r.getInt(1)) = r.getLong(3) match {
                case 0L => 0.0
                case n => r.getDouble(2) / n
              }
            }
            normalized(mean)
          case None => prev // empty cluster: keep its centroid
        }
      }
      shift = cents.zip(next).map { case (a, b) =>
        math.sqrt(a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum)
      }.max
      cents = next
      it += 1
    }
    cents.zipWithIndex.map { case (v, i) => (i.toLong, v.toSeq) }.toSeq
      .toDF("cid", vecCol)
  }

  /** IVF search: for each probe, the top-`k` candidates by cosine among
    * the `nprobe` nearest inverted lists. Output: `probe`, `cand`, `sim`
    * (rounded to `simScale` digits — ranking happens on the rounded value
    * so results are reproducible across engines), `rank` (1-based).
    *
    * Recall is approximate by design: a true neighbor assigned to an
    * unprobed list is missed — raise `nprobe` to trade cost for recall
    * (`nprobe` = K is exhaustive search).
    *
    * `broadcastProbes` (default true) pins the documented "probe batch
    * ≪ corpus" shape: the probed (probe, list) pairs broadcast into the
    * list join. Probing with a LARGE frame under that hint is a driver
    * OOM — pass false and the probes meet the lists through a plain
    * equi-join on the list id instead (AQE still broadcasts when
    * runtime stats say they fit; both paths are value-identical,
    * asserted in AnnSpec). */
  def ivfSearch(candidates: DataFrame, candIdCol: String,
                probes: DataFrame, probeIdCol: String,
                centroids: DataFrame, cidCol: String,
                vecCol: String, nprobe: Int, k: Int,
                simScale: Int = 4,
                broadcastProbes: Boolean = true): DataFrame = {
    require(nprobe >= 1 && k >= 1, s"nprobe/k must be >= 1")
    val lists = ivfAssign(candidates, candIdCol, vecCol,
      centroids, cidCol, vecCol, vecOut = "__vc")
    val c = centroids.select(col(cidCol).as("__cid"),
      Vectors.asDouble(col(vecCol)).as("__cv"))
    val probeLists = probeAssignments(probes, probeIdCol, vecCol, c, nprobe)
      .withColumnRenamed("__cid", cidCol)
    val wk = Window.partitionBy(col(probeIdCol))
      .orderBy(col("sim").desc, col(candIdCol).asc)
    val probeSide = if (broadcastProbes) broadcast(probeLists) else probeLists
    lists.join(probeSide, cidCol)
      .select(col(probeIdCol), col(candIdCol),
        round(Vectors.cosine(col("__vp"), col("__vc")), simScale).as("sim"))
      .withColumn("rank", row_number().over(wk).cast("long"))
      .filter(col("rank") <= k)
  }

  /** Per-probe top-`nprobe` list assignments `(probeIdCol, __vp, __cid)`
    * — the shared probe-routing step of [[ivfSearch]] and
    * [[searchIndex]] (one definition so the two can't drift). The probe
    * batch is ≪ corpus by contract, so the per-probe window is cheap
    * and the result broadcasts into the list join. `c` must carry
    * (`__cid`, `__cv`). */
  private def probeAssignments(probes: DataFrame, probeIdCol: String,
                               vecCol: String, c: DataFrame,
                               nprobe: Int): DataFrame = {
    val wp = Window.partitionBy(col(probeIdCol))
      .orderBy(col("__psim").desc, col("__cid").asc)
    probes
      .select(col(probeIdCol), Vectors.asDouble(col(vecCol)).as("__vp"))
      .crossJoin(broadcast(c))
      .withColumn("__psim", Vectors.cosine(col("__vp"), col("__cv")))
      .withColumn("__pr", row_number().over(wp))
      .filter(col("__pr") <= nprobe)
      .select(col(probeIdCol), col("__vp"), col("__cid"))
  }

  /** Commit-marker filename for a persisted index. Written LAST by
    * [[saveIndex]] (after both data directories), deleted FIRST on
    * rebuild — [[searchIndex]] refuses an unmarked index, so a crash
    * (or reader racing a rebuild) between the two directory writes can
    * never serve new lists against stale centroids. Content records the
    * storage format (`quantized=`) so the serve path picks the matching
    * scorer without a caller-supplied flag that could drift. */
  private val IndexMarker = "_graft_index_committed"

  /** Whether the index at `path` carries a commit marker — the
    * publishable-artifact predicate ([[graft.sources.Catalog
    * .publishIndex]] refuses to advertise a torn/mid-build index). */
  def indexCommitted(spark: org.apache.spark.sql.SparkSession,
                     path: String): Boolean = {
    val marker = new org.apache.hadoop.fs.Path(
      new org.apache.hadoop.fs.Path(path), IndexMarker)
    marker.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .exists(marker)
  }

  /** Persist an IVF index: the assignment pass runs ONCE at build time
    * and the inverted lists land parquet-PARTITIONED BY list id, so a
    * later [[searchIndex]] scan of `nprobe` lists partition-prunes to
    * exactly those directories — serve-time IO ∝ probed lists, never the
    * corpus. The build-once/serve-many shape every standing ANN
    * deployment uses ([[ivfSearch]] re-assigns per call, the right shape
    * only for one-shot audits). Layout: `<path>/centroids` (cid `__cid`,
    * vector `__cv`) + `<path>/lists` (id `__id`, partition column
    * `__cid`, and either `__vc` array<double> or — with
    * `quantize = true` — `__vq` array<tinyint> + `__scale` double, the
    * q111 symmetric int8 quantizer: 8× narrower elements, and cosine is
    * scale-invariant so serving never multiplies the scale back (it is
    * stored for reconstruction/debug only). The recall cost of the
    * quantized ranking is exactly what q139 audits.) The
    * [[IndexMarker]] commit file is deleted before and written after
    * the two directory writes, so readers never see a torn index. */
  def saveIndex(candidates: DataFrame, candIdCol: String,
                centroids: DataFrame, cidCol: String,
                vecCol: String, path: String,
                quantize: Boolean = false): Unit = {
    val spark = candidates.sparkSession
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val marker = new org.apache.hadoop.fs.Path(root, IndexMarker)
    // invalidate FIRST: from here to the final rename the index is
    // formally uncommitted and searchIndex refuses it
    if (fs.exists(marker)) fs.delete(marker, false)
    val assigned = ivfAssign(candidates, candIdCol, vecCol,
        centroids, cidCol, vecCol, vecOut = "__vc")
      .select(col(candIdCol).as("__id"), col("__vc"),
        col(cidCol).as("__cid"))
    val listRows =
      if (!quantize) assigned
      else assigned
        .withColumn("__amax",
          expr("aggregate(__vc, 0D, (acc, x) -> greatest(acc, abs(x)))"))
        .withColumn("__vq", expr(
          "transform(__vc, x -> cast(floor(x * 127.0D / nullif(__amax, 0D) + 0.5D) as tinyint))"))
        .select(col("__id"), col("__vq"),
          (col("__amax") / 127.0d).as("__scale"), col("__cid"))
    listRows.write.partitionBy("__cid").mode("overwrite")
      .parquet(s"$path/lists")
    centroids
      .select(col(cidCol).as("__cid"),
        Vectors.asDouble(col(vecCol)).as("__cv"))
      .write.mode("overwrite").parquet(s"$path/centroids")
    // commit: tmp + rename (the Lake.mergeInto manifest discipline)
    val tmp = new org.apache.hadoop.fs.Path(root, IndexMarker + ".tmp")
    val out = fs.create(tmp, true)
    try out.write(s"v1 quantized=$quantize"
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    if (!fs.rename(tmp, marker))
      throw new IllegalStateException(
        s"could not commit index marker at $marker")
  }

  /** Search a [[saveIndex]] artifact: value-identical to [[ivfSearch]]
    * over the same corpus/centroids (asserted in AnnSpec) but the
    * assignment cost is gone and the list scan carries a partition
    * filter on the probed ids — the centroid table is the only thing
    * read in full (broadcast-sized by construction). Refuses an index
    * without the [[IndexMarker]] commit file (mid-build or torn). On a
    * `quantize = true` index the probe vectors go through the SAME q111
    * quantizer and ranking runs on int8-vs-int8 cosine — bit-compatible
    * with q139's audit ranking. Output columns: (`probeIdCol`, `cand`,
    * `sim`, `rank`). */
  def searchIndex(spark: org.apache.spark.sql.SparkSession, path: String,
                  probes: DataFrame, probeIdCol: String, vecCol: String,
                  nprobe: Int, k: Int, simScale: Int = 4): DataFrame = {
    require(nprobe >= 1 && k >= 1, s"nprobe/k must be >= 1")
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val marker = new org.apache.hadoop.fs.Path(root, IndexMarker)
    require(fs.exists(marker),
      s"index at $path has no commit marker ($IndexMarker) — it is " +
        "mid-build, torn, or pre-dates the commit protocol; rebuild " +
        "with saveIndex")
    val quantized = {
      val in = fs.open(marker)
      val content =
        try scala.io.Source.fromInputStream(in, "UTF-8").mkString
        finally in.close()
      content.contains("quantized=true")
    }
    val c = spark.read.parquet(s"$path/centroids")
    // the routing result is |probes|·nprobe rows — metadata by the
    // probe-batch contract — and feeds BOTH the IN-list and the serve
    // join, so it is computed ONCE, collected, and re-shipped as a
    // local frame: no second probe scan, and (unlike a localCheckpoint,
    // whose blocks the returned frame would pin for the session's
    // lifetime) nothing stays resident after the call
    val routed = probeAssignments(probes, probeIdCol, vecCol, c, nprobe)
    val probeRows = routed.collect()
    val probeLists = spark.createDataFrame(
      spark.sparkContext.parallelize(probeRows.toIndexedSeq, 1),
      routed.schema)
    val probed = probeRows
      .map(r => r.get(r.fieldIndex("__cid"))).distinct
    // Serve-time listing must be O(probed lists), not O(nlist) —
    // round 11. `spark.read.parquet(s"$path/lists")` builds a file
    // index over EVERY list partition dir (and the old schema
    // inference did it a second time): the serving probe measured the
    // serve wall growing 0.49 s → 1.55 s from nlist=8 to 240 with
    // CONSTANT probed data — pure driver-side listing, and the term
    // that buries a 100k-list index on an object store. Instead the
    // probed partition DIRECTORIES are addressed directly (Hive-escaped
    // `__cid=` names, existence-checked — an empty list has no dir)
    // under a `basePath`, so the listing touches nprobe·|probes| dirs.
    // The IN filter stays as the semantic gate; it prunes nothing
    // beyond the path selection.
    //
    // Partition-column typing: numeric-LOOKING string centroid ids
    // ("01", "1e3") would coerce to int/double under inference and
    // silently break the IN filter and the probe join — the explicit
    // read schema appends __cid with the centroid table's dtype, and
    // partition values parse as that type. The file schema itself
    // comes from ONE probed dir (single-dir listing).
    val cidType = c.schema("__cid").dataType
    val esc = (v: Any) => org.apache.spark.sql.catalyst.catalog
      .ExternalCatalogUtils.escapePathName(String.valueOf(v))
    val probedPaths = probed.toIndexedSeq
      .map(v => new org.apache.hadoop.fs.Path(
        s"$path/lists", s"__cid=${esc(v)}"))
      .filter(fs.exists(_))
      .map(_.toString)
    val lists =
      if (probedPaths.isEmpty) {
        // every probed list is empty (no dir was ever written for it):
        // fall back to the full-index read — it returns zero rows and
        // keeps the downstream plan shape; rare enough that the O(nlist)
        // listing does not matter
        val inferred = spark.read.parquet(s"$path/lists").schema
        val listSchema = org.apache.spark.sql.types.StructType(
          inferred.map(f =>
            if (f.name == "__cid") f.copy(dataType = cidType) else f))
        spark.read.schema(listSchema).parquet(s"$path/lists")
          .filter(col("__cid").isin(probed.toIndexedSeq: _*))
      } else {
        val listSchema = spark.read.parquet(probedPaths.head).schema
          .add("__cid", cidType)
        spark.read.option("basePath", s"$path/lists").schema(listSchema)
          .parquet(probedPaths: _*)
          .filter(col("__cid").isin(probed.toIndexedSeq: _*))
      }
    val scored =
      if (!quantized)
        lists.join(broadcast(probeLists), "__cid")
          .select(col(probeIdCol), col("__id").as("cand"),
            round(Vectors.cosine(col("__vp"), col("__vc")), simScale)
              .as("sim"))
      else
        lists.join(broadcast(probeLists
            .withColumn("__pamax",
              expr("aggregate(__vp, 0D, (acc, x) -> greatest(acc, abs(x)))"))
            .withColumn("__qp", expr(
              "transform(__vp, x -> cast(floor(x * 127.0D / nullif(__pamax, 0D) + 0.5D) as double))"))),
            "__cid")
          .select(col(probeIdCol), col("__id").as("cand"),
            round(Vectors.cosine(col("__qp"),
              expr("transform(__vq, x -> cast(x as double))")), simScale)
              .as("sim"))
    val wk = Window.partitionBy(col(probeIdCol))
      .orderBy(col("sim").desc, col("cand").asc)
    scored
      .withColumn("rank", row_number().over(wk).cast("long"))
      .filter(col("rank") <= k)
  }
}
