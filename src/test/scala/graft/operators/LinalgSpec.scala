package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Fixed-point power iteration (Linalg): recovers a PLANTED dominant
  * direction, and the component satisfies the eigen-residual check on
  * the true double covariance. Cross-engine bit-identity is the
  * differential gate's job (q223). */
class LinalgSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def cos(a: Array[Double], b: Array[Double]): Double = {
    val dot = a.zip(b).map { case (x, y) => x * y }.sum
    dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
  }

  test("recovers a planted dominant direction") {
    val d = 8
    val u = Array.tabulate(d)(i => (i + 1).toDouble)
    val un = math.sqrt(u.map(x => x * x).sum)
    val dir = u.map(_ / un)
    // deterministic pseudo-noise; signal dominates (scale 0.4 vs 0.05)
    def noise(i: Int, j: Int) =
      0.05 * math.sin(i * 37 + j * 11)
    val vecs = (0 until 200).map { i =>
      val s = 0.4 * math.cos(i * 0.37)
      (i.toLong, Array.tabulate(d)(j => (s * dir(j) + noise(i, j)).toFloat))
    }.toDF("vec_id", "embedding")
    val v = Linalg.topComponent(vecs, "vec_id", "embedding")
      .orderBy("dim").collect().map(_.getDouble(2))
    val c = math.abs(cos(v, dir))
    assert(c >= 0.95, s"planted-direction cosine $c, loadings ${v.toSeq}")
  }

  test("kmeans recovers planted well-separated clusters with exact counts") {
    val d = 8
    // three centers far apart vs noise; ids 0,1,2 seed one per cluster
    val centers = Array(
      Array.fill(d)(0.3), Array.fill(d)(-0.3),
      Array.tabulate(d)(j => if (j % 2 == 0) 0.3 else -0.3))
    val vecs = (0 until 180).map { i =>
      val c = centers(i % 3)
      (i.toLong, Array.tabulate(d)(j =>
        (c(j) + 0.02 * math.sin(i * 13 + j * 7)).toFloat))
    }.toDF("vec_id", "embedding")
    val out = Linalg.kmeansQuantized(vecs, "vec_id", "embedding", k = 3)
      .collect()
    val counts = out.groupBy(_.getInt(0))
      .map { case (cid, rs) => cid -> rs.head.getLong(3) }
    assert(counts == Map(0 -> 60L, 1 -> 60L, 2 -> 60L), s"got $counts")
    // each centroid sits on its planted center (quantized 1e3 scale)
    out.groupBy(_.getInt(0)).foreach { case (cid, rs) =>
      val cent = rs.sortBy(_.getLong(1)).map(_.getLong(2))
      val planted = centers(cid).map(x => math.floor(x * 1000))
      cent.zip(planted).foreach { case (c, p) =>
        assert(math.abs(c - p) <= 25,
          s"cid $cid centroid $c vs planted $p")
      }
    }
  }

  test("kmeansCoarseLocal == kmeansQuantized centroids (round-19 " +
      "driver-iteration twin: same seeds, rounds, floor means, ties)") {
    val vecs = (0 until 60).map { i =>
      (i.toLong, Array.tabulate(6)(j =>
        (math.sin(i * 13 + j * 7) * 2.0).toFloat))
    }.toDF("vec_id", "embedding")
    val full = Linalg.kmeansQuantized(vecs, "vec_id", "embedding",
        k = 4, iterations = 2)
      .groupBy(col("cid"))
      .agg(expr("transform(sort_array(collect_list(struct(dim, c))), z -> z.c)")
        .as("c"))
      .select(col("cid").cast("int").as("cid"), col("c"))
    val coarse = Linalg.kmeansCoarseLocal(vecs, "vec_id", "embedding",
      k = 4, iterations = 2)
    assert(coarse.exceptAll(full).count() == 0 &&
      full.exceptAll(coarse).count() == 0,
      "the local coarse face must carry exactly the contract centroids")
  }

  test("embeddingOutliers flags a planted far vector, one-sided: " +
      "seed near-clones are NOT outliers") {
    val d = 8
    // cluster 0: 60 tight members + 1 planted far vector; cluster 1:
    // 30 tight members including near-clones of the seed
    val vecs = ((0 until 2).map(i => (i.toLong,
        Array.fill(d)((0.3 * (1 - 2 * i)).toFloat))) ++
      (2 until 62).map(i => (i.toLong,
        Array.tabulate(d)(j => (0.3 + 0.02 * math.sin(i + j)).toFloat))) ++
      Seq((62L, Array.fill(d)(0.9f))) ++ // far from both centroids but nearest 0
      (63 until 93).map(i => (i.toLong,
        Array.tabulate(d)(j => (-0.3 - 0.001 * (i % 3)).toFloat)))
      ).toDF("vec_id", "embedding")
    val cents = vecs.filter(col("vec_id") < 2)
      .select(col("vec_id").cast("int").as("cid"),
        expr("transform(embedding, x -> cast(floor(cast(x as double) * 1000) as bigint))")
          .as("c"))
    val out = Linalg.embeddingOutliers(vecs, "vec_id", "embedding", cents)
      .collect().map(r => r.getInt(0) -> r.getLong(3)).toMap
    assert(out(0) == 1L,
      s"the planted far vector must be cluster 0's one outlier, got $out")
    assert(out(1) == 0L,
      s"seed near-clones must not count as outliers, got $out")
  }

  test("component satisfies the eigen-residual check on the true covariance") {
    val rows = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select(col("vec_id"), col("embedding")).collect()
      .map(_.getSeq[Float](1).map(_.toDouble).toArray)
    val d = rows.head.length
    val n = rows.length
    val mean = Array.tabulate(d)(j => rows.map(_(j)).sum / n)
    val cmat = Array.tabulate(d, d)((j, k) =>
      rows.map(r => (r(j) - mean(j)) * (r(k) - mean(k))).sum)
    val v = Linalg.topComponent(
        graft.Tables.embeddings(spark, "/root/testdata/sf0.001"),
        "vec_id", "embedding")
      .orderBy("dim").collect().map(_.getDouble(2))
    val cv = Array.tabulate(d)(j => (0 until d).map(k => cmat(j)(k) * v(k)).sum)
    // C·v must align with v — the eigenvector property, tolerant of
    // the 1e-3-class quantization the fixed-point contract defines
    val c = math.abs(cos(cv, v))
    assert(c >= 0.98, s"eigen-residual cosine $c")
  }
}
