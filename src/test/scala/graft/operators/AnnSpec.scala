package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** IVF ANN on planted geometry: assignment is the argmax-cosine centroid
  * with deterministic tie-breaks, search returns exactly the brute-force
  * top-k when every list is probed, and restricting nprobe prunes the
  * candidate set to the probed lists only. */
class AnnSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // axis-aligned clusters: centroid 0 = +x, centroid 1 = +y
  private val cents = Seq(
    (0L, Array(1.0f, 0.0f, 0.0f)),
    (1L, Array(0.0f, 1.0f, 0.0f)))

  private val cands = Seq(
    (10L, Array(0.9f, 0.1f, 0.0f)),   // x-cluster
    (11L, Array(0.8f, 0.2f, 0.0f)),   // x-cluster
    (12L, Array(0.1f, 0.9f, 0.0f)),   // y-cluster
    (13L, Array(0.2f, 0.8f, 0.0f)))   // y-cluster

  test("ivfAssign puts each vector on its argmax-cosine centroid") {
    val out = Ann.ivfAssign(
        cands.toDF("id", "v"), "id", "v",
        cents.toDF("cid", "v"), "cid", "v")
      .select("id", "cid").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(10L -> 0L, 11L -> 0L, 12L -> 1L, 13L -> 1L))
  }

  test("ivfAssign breaks exact ties toward the smaller centroid id") {
    val diag = Seq((20L, Array(1.0f, 1.0f, 0.0f))).toDF("id", "v")
    val out = Ann.ivfAssign(diag, "id", "v",
        cents.toDF("cid", "v"), "cid", "v")
      .select("cid").head().getLong(0)
    assert(out == 0L)
  }

  test("ivfSearch with nprobe=K equals brute-force top-k") {
    val probes = Seq((1L, Array(0.7f, 0.3f, 0.0f))).toDF("pid", "v")
    val ivf = Ann.ivfSearch(cands.toDF("id", "v"), "id",
        probes, "pid", cents.toDF("cid", "v"), "cid", "v",
        nprobe = 2, k = 4)
      .orderBy("rank").select("id").as[Long].collect().toSeq
    val brute = cands.toDF("id", "v")
      .crossJoin(broadcast(probes.select(
        graft.functions.Vectors.asDouble(col("v")).as("vp"))))
      .select(col("id"),
        round(graft.functions.Vectors.cosine(
          graft.functions.Vectors.asDouble(col("v")), col("vp")), 4).as("sim"))
      .orderBy(col("sim").desc, col("id").asc)
      .select("id").as[Long].collect().toSeq
    assert(ivf == brute)
  }

  test("ivfSearch parity: non-broadcast probe path matches the broadcast path") {
    val probes = Seq((1L, Array(0.7f, 0.3f, 0.0f)),
      (2L, Array(0.1f, 0.95f, 0.0f))).toDF("pid", "v")
    def run(bcast: Boolean) = Ann.ivfSearch(cands.toDF("id", "v"), "id",
        probes, "pid", cents.toDF("cid", "v"), "cid", "v",
        nprobe = 2, k = 4, broadcastProbes = bcast)
      .orderBy("pid", "rank")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).toSeq
    assert(run(bcast = true) == run(bcast = false),
      "broadcast and shuffled probe joins must return identical results")
  }

  // ---- sampled k-means centroid training ------------------------------

  test("trainCentroids beats fixed pivots on planted-cluster recall (sf0.01)") {
    val e = graft.Tables.embeddings(spark, "/root/testdata/sf0.01")
    val probes = e.filter(col("vec_id") < 30)
      .select(col("vec_id").as("probe"), col("embedding"))
    val cands = e.filter(col("vec_id") >= 30)
      .select(col("vec_id").as("cand"), col("embedding"))
    // the data plants 10 label clusters; train k=10 on the corpus side
    val trained = Ann.trainCentroids(cands, "cand", "embedding",
      k = 10, iters = 5)
    // baseline = q79's scheme: the first k corpus vectors as pivots
    val fixed = e.filter(col("vec_id").between(30, 39))
      .select((col("vec_id") - 30).as("cid"),
        graft.functions.Vectors.asDouble(col("embedding")).as("embedding"))
    val brute = cands
      .crossJoin(broadcast(probes.select(col("probe").as("p2"),
        graft.functions.Vectors.asDouble(col("embedding")).as("vp"))))
      .select(col("p2"), col("cand"),
        graft.functions.Vectors.cosine(
          graft.functions.Vectors.asDouble(col("embedding")), col("vp")).as("sim"))
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("p2"))
          .orderBy(col("sim").desc, col("cand").asc)))
      .filter(col("rk") <= 10)
      .select(col("p2"), col("cand"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toSet
    def recall(cents: org.apache.spark.sql.DataFrame): Double = {
      val hits = Ann.ivfSearch(cands, "cand", probes, "probe",
          cents, "cid", "embedding", nprobe = 2, k = 10)
        .select(col("probe"), col("cand"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toSet
      hits.intersect(brute).size.toDouble / brute.size
    }
    val rTrained = recall(trained)
    val rFixed = recall(fixed)
    // self-calibrating ceiling: centroids built from the PLANTED labels
    // (the noise level of this synthetic data caps nprobe=2 recall well
    // below 1 — label-mean centroids measure that cap, and k-means
    // optimizing the actual geometry may legitimately beat them)
    val oracleCents = e.filter(col("vec_id") >= 30)
      .select(col("label").cast("long").as("cid"),
        posexplode(graft.functions.Vectors.asDouble(col("embedding")))
          .as(Seq("d", "x")))
      .groupBy("cid", "d").agg(avg("x").as("m"))
      .groupBy("cid")
      .agg(expr("transform(sort_array(collect_list(struct(d, m))), s -> s.m)")
        .as("embedding"))
    val rOracle = recall(oracleCents)
    assert(rTrained > rFixed,
      s"trained centroids must beat fixed pivots: $rTrained <= $rFixed")
    assert(rTrained >= rOracle * 0.9,
      s"k-means should probe at least as well as label-derived centroids: " +
        s"trained=$rTrained oracle=$rOracle fixed=$rFixed")
  }

  test("trainCentroids assignment never plans a cartesian product") {
    val e = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val cents = Ann.trainCentroids(e, "vec_id", "embedding", k = 4, iters = 2)
    assert(cents.count() == 4)
    // the per-iteration shape IS ivfAssign: assert on it with the
    // trained centroids (broadcast K-row side, partial-agg argmax)
    val assign = Ann.ivfAssign(e, "vec_id", "embedding",
      cents, "cid", "embedding")
    val plan = assign.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"),
      s"centroid scoring must broadcast the K-row side:\n$plan")
    // every sampled vector got a list
    assert(assign.count() == e.count())
  }

  test("trainCentroids empty-cluster and sample guards hold") {
    val few = Seq((1L, Array(1.0f, 0.0f)), (2L, Array(0.99f, 0.01f)),
      (3L, Array(0.98f, 0.02f))).toDF("id", "v")
    // k=3 over 3 near-identical vectors: clusters collapse, some stay
    // empty after round 1 — training must still return k centroids
    val cents = Ann.trainCentroids(few, "id", "v", k = 3, iters = 3)
    assert(cents.count() == 3)
    // sample smaller than k fails loudly, not with a silent short frame
    val err = intercept[IllegalArgumentException] {
      Ann.trainCentroids(few, "id", "v", k = 3, iters = 1,
        sampleFraction = 0.01)
    }
    assert(err.getMessage.contains("need at least k"))
  }

  test("ivfSearch with nprobe=1 only scans the probe's nearest list") {
    // probe sits in the x-cluster: with nprobe=1 no y-cluster id appears,
    // even though k exceeds the list size
    val probes = Seq((1L, Array(0.95f, 0.05f, 0.0f))).toDF("pid", "v")
    val ids = Ann.ivfSearch(cands.toDF("id", "v"), "id",
        probes, "pid", cents.toDF("cid", "v"), "cid", "v",
        nprobe = 1, k = 10)
      .select("id").as[Long].collect().toSet
    assert(ids == Set(10L, 11L))
  }

  test("persisted index: searchIndex equals ivfSearch, and the list " +
      "scan partition-prunes to the probed lists") {
    val e = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val cs = e.filter(col("vec_id") < 4)
      .select(col("vec_id").as("cid"), col("embedding"))
    val corpus = e.filter(col("vec_id") >= 10)
      .select(col("vec_id").as("id"), col("embedding"))
    val probes = e.filter(col("vec_id").between(4, 9))
      .select(col("vec_id").as("probe"), col("embedding"))
    val path = java.nio.file.Files
      .createTempDirectory("graft_ivf_idx").toString
    Ann.saveIndex(corpus, "id", cs, "cid", "embedding", path)

    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getAs[Long]("probe"), r.getAs[Long](1),
        r.getAs[Double]("sim"), r.getAs[Long]("rank"))).toSet
    val live = Ann.ivfSearch(corpus, "id", probes, "probe",
      cs, "cid", "embedding", nprobe = 2, k = 3)
    val idx = Ann.searchIndex(spark, path, probes, "probe", "embedding",
      nprobe = 2, k = 3)
    assert(canon(idx) == canon(live),
      "index-served search must be value-identical to the one-shot path")

    // serve-time IO is partition-pruned: with one probe and nprobe=1 the
    // list scan carries a static partition filter, and every row it
    // actually reads comes from ONE list directory
    val one = probes.orderBy("probe").limit(1)
    val oneResult = Ann.searchIndex(spark, path, one, "probe",
      "embedding", nprobe = 1, k = 3)
    val plan = oneResult.queryExecution.executedPlan.toString
    // the scan line renders as "PartitionFilters: [__cid IN (…)]" — the
    // static pruning that makes serve-time IO ∝ probed lists
    val scanLine = plan.linesIterator
      .find(l => l.contains("PartitionFilters") && l.contains("lists"))
    assert(scanLine.exists(_.contains("__cid")),
      s"probed-list IN filter must reach the parquet scan as a partition filter:\n$plan")
    // and the candidates actually served all come from the one probed list
    val servedLists = oneResult.join(
        spark.read.parquet(s"$path/lists").select(col("__id").as("cand"),
          col("__cid")), "cand")
      .select("__cid").distinct().count()
    assert(servedLists == 1,
      "one probe at nprobe=1 must be served from exactly one inverted list")
  }

  test("searchIndex refuses an index without the commit marker") {
    val path = java.nio.file.Files
      .createTempDirectory("graft_ivf_torn").toString
    val corpus = Seq((10L, Array(0.9f, 0.1f, 0.0f))).toDF("id", "v")
    Ann.saveIndex(corpus, "id", cents.toDF("cid", "v"), "cid", "v", path)
    // simulate a crash between the two directory writes: the marker is
    // gone, the data dirs look plausible — serving must refuse, not
    // silently route against a possibly-torn pairing
    assert(new java.io.File(path, "_graft_index_committed").delete())
    val probes = Seq((1L, Array(1.0f, 0.0f, 0.0f))).toDF("pid", "v")
    val err = intercept[IllegalArgumentException] {
      Ann.searchIndex(spark, path, probes, "pid", "v", nprobe = 1, k = 1)
    }
    assert(err.getMessage.contains("commit marker"))
  }

  test("numeric-looking STRING centroid ids survive the partition round-trip") {
    // partition-column type inference would read __cid="01" back as the
    // int 1 and the centroid join would silently drop every candidate;
    // the explicit read schema pins the centroid table's string dtype
    val scents = Seq(("01", Array(1.0f, 0.0f, 0.0f)),
      ("2", Array(0.0f, 1.0f, 0.0f))).toDF("cid", "v")
    val path = java.nio.file.Files
      .createTempDirectory("graft_ivf_strcid").toString
    Ann.saveIndex(cands.toDF("id", "v"), "id", scents, "cid", "v", path)
    val probes = Seq((1L, Array(0.95f, 0.05f, 0.0f))).toDF("pid", "v")
    val got = Ann.searchIndex(spark, path, probes, "pid", "v",
        nprobe = 1, k = 10)
      .select("cand").as[Long].collect().toSet
    assert(got == Set(10L, 11L),
      s"string-cid list ('01') must serve its x-cluster candidates: $got")
  }

  test("quantized index: recall@3 on q139's probes equals q139's audit, " +
      "and the lists are ~4x smaller than float storage") {
    val sf = "/root/testdata/sf0.001"
    val e = graft.Tables.embeddings(spark, sf)
    val corpus = e.filter(col("vec_id") >= 10)
      .select(col("vec_id").as("id"), col("embedding"))
    val probes = e.filter(col("vec_id").between(4, 9))
      .select(col("vec_id").as("probe"), col("embedding"))
    // ONE centroid => every probe scans the whole corpus, so the
    // quantized serve ranking is exactly q139's brute-force quantized
    // ranking (same rounding, same cand-asc tie-break)
    val onec = e.filter(col("vec_id") === 0)
      .select(lit(0L).as("cid"), col("embedding"))
    val qPath = java.nio.file.Files
      .createTempDirectory("graft_ivf_q").toString
    val fPath = java.nio.file.Files
      .createTempDirectory("graft_ivf_f").toString
    Ann.saveIndex(corpus, "id", onec, "cid", "embedding", qPath,
      quantize = true)
    Ann.saveIndex(corpus, "id", onec, "cid", "embedding", fPath)
    val served = Ann.searchIndex(spark, qPath, probes, "probe",
        "embedding", nprobe = 1, k = 3)
      .select(col("probe"), col("cand"))
    // exact float top-3 (q139's etop): the recall reference
    val wB = org.apache.spark.sql.expressions.Window
      .partitionBy(col("probe")).orderBy(col("sim").desc, col("cand").asc)
    val exact = probes.select(col("probe"),
        graft.functions.Vectors.asDouble(col("embedding")).as("vp"))
      .crossJoin(corpus.select(col("id").as("cand"),
        graft.functions.Vectors.asDouble(col("embedding")).as("vc")))
      .select(col("probe"), col("cand"),
        round(graft.functions.Vectors.cosine(col("vp"), col("vc")), 4)
          .as("sim"))
      .withColumn("rk", row_number().over(wB)).filter(col("rk") <= 3)
      .select(col("probe"), col("cand"))
    val servedRecall = served.join(exact, Seq("probe", "cand"))
      .groupBy("probe").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val audit = graft.queries.CurationQueries.q139(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(audit.keySet.forall(p =>
        servedRecall.getOrElse(p, 0L) == audit(p)),
      s"quantized-index recall must equal the q139 audit: " +
        s"served=$servedRecall audit=$audit")
    def bytes(dir: String): Long = {
      def walk(f: java.io.File): Long =
        if (f.isDirectory) f.listFiles().map(walk).sum else f.length()
      walk(new java.io.File(dir, "lists"))
    }
    val (qb, fb) = (bytes(qPath), bytes(fPath))
    assert(qb * 3 < fb,
      s"int8 lists must be ~4x smaller than float lists: $qb vs $fb")
  }
}
