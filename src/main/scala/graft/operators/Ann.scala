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
  * Centroid choice is the caller's (k-means elsewhere, a hash-sample, or
  * a fixed pivot set); the operator takes them as a DataFrame so the
  * contract stays deterministic and oracle-checkable.
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

  /** IVF search: for each probe, the top-`k` candidates by cosine among
    * the `nprobe` nearest inverted lists. Output: `probe`, `cand`, `sim`
    * (rounded to `simScale` digits — ranking happens on the rounded value
    * so results are reproducible across engines), `rank` (1-based).
    *
    * Recall is approximate by design: a true neighbor assigned to an
    * unprobed list is missed — raise `nprobe` to trade cost for recall
    * (`nprobe` = K is exhaustive search). */
  def ivfSearch(candidates: DataFrame, candIdCol: String,
                probes: DataFrame, probeIdCol: String,
                centroids: DataFrame, cidCol: String,
                vecCol: String, nprobe: Int, k: Int,
                simScale: Int = 4): DataFrame = {
    require(nprobe >= 1 && k >= 1, s"nprobe/k must be >= 1")
    val lists = ivfAssign(candidates, candIdCol, vecCol,
      centroids, cidCol, vecCol, vecOut = "__vc")
    val c = centroids.select(col(cidCol).as("__cid"),
      Vectors.asDouble(col(vecCol)).as("__cv"))
    // probe batch ≪ corpus: a per-probe top-nprobe window here is cheap,
    // and the result broadcasts into the list join below
    val wp = Window.partitionBy(col(probeIdCol))
      .orderBy(col("__psim").desc, col("__cid").asc)
    val probeLists = probes
      .select(col(probeIdCol), Vectors.asDouble(col(vecCol)).as("__vp"))
      .crossJoin(broadcast(c))
      .withColumn("__psim", Vectors.cosine(col("__vp"), col("__cv")))
      .withColumn("__pr", row_number().over(wp))
      .filter(col("__pr") <= nprobe)
      .select(col(probeIdCol), col("__vp"), col("__cid").as(cidCol))
    val wk = Window.partitionBy(col(probeIdCol))
      .orderBy(col("sim").desc, col(candIdCol).asc)
    lists.join(broadcast(probeLists), cidCol)
      .select(col(probeIdCol), col(candIdCol),
        round(Vectors.cosine(col("__vp"), col("__vc")), simScale).as("sim"))
      .withColumn("rank", row_number().over(wk).cast("long"))
      .filter(col("rank") <= k)
  }
}
