package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Product quantization: planted per-subspace structure must be
  * recovered (codebooks on the planted centers, codes = the planted
  * combination, ADC top-1 = a same-combination candidate), the
  * committed store must serve bit-identically to the inline path, and
  * the seeding contract must fail loudly on short corpora.
  * Cross-engine bit-identity is the differential gate's job
  * (q231–q235). */
class PqSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  // 40 vectors over m=2 subspaces of dsub=2; each subspace draws from
  // two well-separated planted centers (A = +0.3, B = -0.3 per dim)
  // with tiny deterministic noise. Seeds (ids 0, 1) land in different
  // clusters of BOTH subspaces: vec 0 = (A, A), vec 1 = (B, B).
  private def center(up: Boolean) = if (up) 0.3 else -0.3
  private def planted(i: Int): (Boolean, Boolean) =
    (i % 2 == 0, i % 3 == 0)
  private lazy val corpus = {
    import spark.implicits._
    (0 until 40).map { i =>
      val (s0, s1) = planted(i)
      val noise = 0.01 * math.sin(i * 7.0)
      (i.toLong, Array(
        (center(s0) + noise).toFloat, (center(s0) - noise).toFloat,
        (center(s1) + noise).toFloat, (center(s1) - noise).toFloat))
    }.toDF("vec_id", "embedding")
  }

  test("trainCodebooks recovers planted per-subspace centers; encode " +
      "assigns the planted combination") {
    val cb = Pq.trainCodebooks(corpus, "vec_id", "embedding",
      m = 2, dsub = 2, k = 2)
    val cents = cb.collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getSeq[Long](2)).toMap
    assert(cents.size == 4, s"2 subs x 2 cids, got ${cents.keySet}")
    // seed 0 = A-combo, seed 1 = B-combo, so cid 0 ~ +300, cid 1 ~ -300
    for (sub <- 0 to 1; cid <- 0 to 1) {
      val want = if (cid == 0) 300.0 else -300.0
      cents((sub, cid)).foreach(c =>
        assert(math.abs(c - want) <= 25,
          s"sub $sub cid $cid centroid $c vs planted $want"))
    }
    val codes = Pq.encode(corpus, "vec_id", "embedding", cb,
        m = 2, dsub = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getInt(2)).toMap
    (0 until 40).foreach { i =>
      val (s0, s1) = planted(i)
      assert(codes((i.toLong, 0)) == (if (s0) 0 else 1),
        s"vec $i sub 0")
      assert(codes((i.toLong, 1)) == (if (s1) 0 else 1),
        s"vec $i sub 1")
    }
  }

  test("ADC search: top-1 candidate shares the probe's planted " +
      "combination; ranks are (adc, cand)-deterministic") {
    import spark.implicits._
    val cb = Pq.trainCodebooks(corpus, "vec_id", "embedding",
      m = 2, dsub = 2, k = 2)
    // probes exactly on two combos: (A, A) and (B, A)
    val probes = Seq(
      (100L, Array(0.3f, 0.3f, 0.3f, 0.3f)),
      (101L, Array(-0.3f, -0.3f, 0.3f, 0.3f))
    ).toDF("probe", "embedding")
    val top = Pq.search(
        corpus.toDF("cand", "embedding"), "cand", probes, "probe",
        "embedding", cb, m = 2, dsub = 2, topK = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val (a0, a1) = planted(top(100L).toInt)
    assert(a0 && a1, s"probe 100 expects an (A,A) candidate, got $top")
    val (b0, b1) = planted(top(101L).toInt)
    assert(!b0 && b1, s"probe 101 expects a (B,A) candidate, got $top")
  }

  test("committed store serves bit-identically to the inline path; " +
      "an uncommitted store is refused") {
    import spark.implicits._
    val path = java.nio.file.Files
      .createTempDirectory("graft_pqspec").toString + "/store"
    val probes = Seq(
      (100L, Array(0.3f, 0.3f, 0.3f, 0.3f)),
      (101L, Array(-0.3f, -0.3f, -0.3f, -0.3f))
    ).toDF("probe", "embedding")
    intercept[IllegalArgumentException] {
      Pq.searchStore(spark, path, probes, "probe", "embedding")
        .collect()
    }
    Pq.saveStore(corpus.toDF("cand", "embedding"), "cand", "embedding",
      path, m = 2, dsub = 2, k = 2)
    val cb = Pq.trainCodebooks(corpus, "vec_id", "embedding",
      m = 2, dsub = 2, k = 2)
    val inline = Pq.search(corpus.toDF("cand", "embedding"), "cand",
        probes, "probe", "embedding", cb, m = 2, dsub = 2)
      .collect().map(_.toSeq).toSet
    val served = Pq.searchStore(spark, path, probes, "probe",
        "embedding")
      .collect().map(_.toSeq).toSet
    assert(served == inline, "store-served ADC must equal inline")
  }

  test("IVF-ADC: probes search only their coarse cluster; the committed " +
      "store serves identically with PARTITION-pruned codes scans") {
    import spark.implicits._
    // two well-separated coarse clusters: even ids ~ +0.5, odd ~ -0.5
    val ivfCorpus = (0 until 40).map { i =>
      val s = if (i % 2 == 0) 0.5 else -0.5
      (i.toLong, Array.tabulate(4)(j =>
        (s + 0.02 * math.sin(i * 11 + j * 3)).toFloat))
    }.toDF("cand", "embedding")
    val coarse = Seq(
      (0, Seq(500L, 500L, 500L, 500L)),
      (1, Seq(-500L, -500L, -500L, -500L))).toDF("cid", "c")
    val probes = Seq(
      (100L, Array(0.5f, 0.5f, 0.5f, 0.5f)),
      (101L, Array(-0.5f, -0.5f, -0.5f, -0.5f))).toDF("probe", "embedding")
    val inline = Pq.ivfAdcSearch(ivfCorpus, "cand", probes, "probe",
      "embedding", coarse, m = 2, dsub = 2, k = 2, nprobe = 1)
    val rows = inline.collect()
    rows.filter(_.getLong(0) == 100L).foreach(r =>
      assert(r.getLong(2) % 2 == 0,
        s"probe 100 must only see even-id (cluster-0) candidates: $r"))
    rows.filter(_.getLong(0) == 101L).foreach(r =>
      assert(r.getLong(2) % 2 == 1,
        s"probe 101 must only see odd-id (cluster-1) candidates: $r"))
    val path = java.nio.file.Files
      .createTempDirectory("graft_ivfadc").toString + "/store"
    Pq.saveIvfAdcStore(ivfCorpus, "cand", "embedding", coarse, path,
      m = 2, dsub = 2, k = 2)
    val served = Pq.searchIvfAdcStore(spark, path, probes, "probe",
      "embedding", nprobe = 1)
    assert(served.collect().map(_.toSeq).toSet ==
      rows.map(_.toSeq).toSet, "store-served IVF-ADC must equal inline")
    // the codes scan must carry the probed-list PARTITION filter —
    // serve-time IO is the probed directories only
    val plan = served.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("cid"),
      s"probed lists must push down as partition filters:\n$plan")
  }

  // two well-separated coarse clusters shared by the r18 tests:
  // even ids ~ +0.5, odd ~ -0.5
  private lazy val ivfCorpus = {
    import spark.implicits._
    (0 until 40).map { i =>
      val s = if (i % 2 == 0) 0.5 else -0.5
      (i.toLong, Array.tabulate(4)(j =>
        (s + 0.02 * math.sin(i * 11 + j * 3)).toFloat))
    }.toDF("cand", "embedding")
  }

  test("TRAINED-coarse composition (r17 verdict #3): kmeansQuantized " +
      "centroids feed ivfAdcSearch and probes stay in their cluster") {
    import spark.implicits._
    val coarse = Linalg.kmeansQuantized(ivfCorpus, "cand", "embedding",
        k = 2, iterations = 2)
      .groupBy(col("cid"))
      .agg(expr("transform(sort_array(collect_list(struct(dim, c))), z -> z.c)")
        .as("c"))
      .select(col("cid").cast("int").as("cid"), col("c"))
    // the trained centroids must actually separate the planted clusters
    val cents = coarse.collect()
      .map(r => r.getInt(0) -> r.getSeq[Long](1)).toMap
    assert(cents.size == 2)
    assert(cents.values.exists(_.forall(_ > 300)) &&
      cents.values.exists(_.forall(_ < -300)),
      s"k-means must land one centroid per planted cluster: $cents")
    val probes = Seq(
      (100L, Array(0.5f, 0.5f, 0.5f, 0.5f)),
      (101L, Array(-0.5f, -0.5f, -0.5f, -0.5f))).toDF("probe", "embedding")
    val rows = Pq.ivfAdcSearch(ivfCorpus, "cand", probes, "probe",
      "embedding", coarse, m = 2, dsub = 2, k = 2, nprobe = 1).collect()
    assert(rows.count(_.getLong(0) == 100L) == 3)
    rows.filter(_.getLong(0) == 100L).foreach(r =>
      assert(r.getLong(2) % 2 == 0,
        s"probe 100 must only see even-id candidates: $r"))
    rows.filter(_.getLong(0) == 101L).foreach(r =>
      assert(r.getLong(2) % 2 == 1,
        s"probe 101 must only see odd-id candidates: $r"))
  }

  test("ivfAdcCandidates sweep frame: candidate sets nest by lrk, " +
      "nprobe = nlist reaches the whole corpus, and filtering the one " +
      "frame replays the per-nprobe search") {
    import spark.implicits._
    val coarse = Seq(
      (0, Seq(500L, 500L, 500L, 500L)),
      (1, Seq(-500L, -500L, -500L, -500L))).toDF("cid", "c")
    val probes = Seq(
      (100L, Array(0.5f, 0.5f, 0.5f, 0.5f)),
      (101L, Array(-0.5f, -0.5f, -0.5f, -0.5f))).toDF("probe", "embedding")
    val cf = Pq.ivfAdcCandidates(ivfCorpus, "cand", probes, "probe",
        "embedding", coarse, m = 2, dsub = 2, k = 2, maxNprobe = 2)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getInt(3)))).toMap
    // nprobe = nlist = 2: every (probe, cand) pair is present
    assert(cf.size == 2 * 40, s"full sweep must cover the corpus: ${cf.size}")
    // lrk = 1 is exactly the probe's own planted cluster
    val near100 = cf.collect { case ((100L, c), (_, 1)) => c }
    assert(near100.size == 20 && near100.forall(_ % 2 == 0),
      s"probe 100's rank-1 list must be the even cluster: $near100")
    // filtering the frame at lrk <= 1 + ranking == ivfAdcSearch nprobe=1
    val direct = Pq.ivfAdcSearch(ivfCorpus, "cand", probes, "probe",
        "embedding", coarse, m = 2, dsub = 2, k = 2, nprobe = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    val replayed = cf.toSeq.filter(_._2._2 <= 1)
      .groupBy(_._1._1).flatMap { case (p, cs) =>
        cs.sortBy { case ((_, c), (adc, _)) => (adc, c) }.take(3)
          .zipWithIndex.map { case (((_, c), (adc, _)), i) =>
            (p, (i + 1).toLong, c, adc) }
      }.toSet
    assert(replayed == direct,
      "lrk-filtered sweep frame must replay the per-nprobe search")
  }

  test("ivfAdcRerank (q245): with R covering the probed list, the " +
      "refine stage returns the EXACT quantized ranking within it — " +
      "code distortion cannot misrank past the re-rank") {
    import spark.implicits._
    val coarse = Seq(
      (0, Seq(500L, 500L, 500L, 500L)),
      (1, Seq(-500L, -500L, -500L, -500L))).toDF("cid", "c")
    val probes = Seq(
      (100L, Array(0.5f, 0.5f, 0.5f, 0.5f))).toDF("probe", "embedding")
    val got = Pq.ivfAdcRerank(ivfCorpus, "cand", probes, "probe",
        "embedding", coarse, m = 2, dsub = 2, k = 2, nprobe = 1,
        shortlist = 20, topK = 3)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    // scalar truth: exact quantized distance to every even-id (cluster
    // 0) candidate, top-3 by (dist, cand)
    def qz(x: Double) = math.floor(x * 1000).toLong
    val pv = Array(0.5f, 0.5f, 0.5f, 0.5f).map(x => qz(x.toDouble))
    val expect = (0 until 40).filter(_ % 2 == 0).map { i =>
      val s = 0.5
      val v = Array.tabulate(4)(j =>
        qz((s + 0.02 * math.sin(i * 11 + j * 3)).toFloat.toDouble))
      (i.toLong, v.zip(pv).map { case (a, b) => (a - b) * (a - b) }.sum)
    }.sortBy { case (c, d) => (d, c) }.take(3)
      .zipWithIndex.map { case ((c, d), r) => ((r + 1).toLong, c, d) }
    assert(got.toSeq == expect,
      s"refined ranking must be the exact within-list ranking: " +
        s"got ${got.toSeq}, want $expect")
  }

  test("serve-time listing is bounded by PROBED dirs, not nlist " +
      "(r17 verdict #1): at nlist = 240 the served scan's file index " +
      "holds only the probed lists' directories") {
    import spark.implicits._
    // 240 planted coarse cells along one axis; 4 corpus vectors per cell
    val nlist = 240
    val bigCoarse = (0 until nlist).map(c =>
      (c, Seq.tabulate(4)(j => (c * 100 + j).toLong))).toDF("cid", "c")
    val bigCorpus = (0 until nlist * 4).map { i =>
      val c = i % nlist
      (i.toLong, Array.tabulate(4)(j =>
        ((c * 100 + j) / 1000.0 + 0.001 * (i / nlist)).toFloat))
    }.toDF("cand", "embedding")
    val path = java.nio.file.Files
      .createTempDirectory("graft_ivfadc240").toString + "/store"
    Pq.saveIvfAdcStore(bigCorpus, "cand", "embedding", bigCoarse, path,
      m = 2, dsub = 2, k = 2)
    val probes = Seq(
      (100L, Array.tabulate(4)(j => ((7 * 100 + j) / 1000.0).toFloat)),
      (101L, Array.tabulate(4)(j => ((123 * 100 + j) / 1000.0).toFloat))
    ).toDF("probe", "embedding")
    val served = Pq.searchIvfAdcStore(spark, path, probes, "probe",
      "embedding", nprobe = 2)
    // inputFiles reads the plan's FILE INDEX (pre-pruning): with direct
    // probed-dir addressing it holds only nprobe·|probes| dirs; the
    // O(nlist) form would list all 240
    val dirs = served.inputFiles
      .flatMap(_.split('/').find(_.startsWith("cid="))).distinct
    assert(dirs.length <= 4 && dirs.nonEmpty,
      s"file index must hold only probed dirs, got ${dirs.length}: " +
        dirs.mkString(","))
    // and the probed lists are the right ones — the top hit is the
    // probe's own cell, everything comes from its ≤ 2 probed cells
    // (float fuzz can make the second-nearest cell 6 or 8)
    val rows = served.collect()
    assert(rows.nonEmpty)
    val top100 = rows.find(r => r.getLong(0) == 100L && r.getLong(1) == 1L)
    assert(top100.exists(_.getLong(2) % nlist == 7),
      s"probe 100's top hit must be its own cell: $top100")
    rows.filter(_.getLong(0) == 100L).foreach(r =>
      assert(Set(6L, 7L, 8L).contains(r.getLong(2) % nlist),
        s"probe 100 candidates must come from its probed cells: $r"))
  }

  test("seeding fails loudly when the corpus has fewer than k rows") {
    import spark.implicits._
    val tiny = (0 until 3).map(i =>
      (i.toLong, Array(0.1f, 0.2f, 0.3f, 0.4f))).toDF("vec_id", "embedding")
    val ex = intercept[IllegalArgumentException] {
      Pq.trainCodebooks(tiny, "vec_id", "embedding",
        m = 2, dsub = 2, k = 16)
    }
    assert(ex.getMessage.contains("cannot seed"))
  }

  test("TRAINED coarse round-trips through the committed store (r18 " +
      "verdict #4): the artifact is coarse-agnostic — kmeansQuantized " +
      "centroids commit and serve identically to the inline path, with " +
      "planted-cluster isolation intact through the store") {
    import spark.implicits._
    val coarse = Linalg.kmeansQuantized(ivfCorpus, "cand", "embedding",
        k = 2, iterations = 2)
      .groupBy(col("cid"))
      .agg(expr("transform(sort_array(collect_list(struct(dim, c))), z -> z.c)")
        .as("c"))
      .select(col("cid").cast("int").as("cid"), col("c"))
      .localCheckpoint(true) // save + inline twin both consume it
    val probes = Seq(
      (100L, Array(0.5f, 0.5f, 0.5f, 0.5f)),
      (101L, Array(-0.5f, -0.5f, -0.5f, -0.5f))).toDF("probe", "embedding")
    val path = java.nio.file.Files
      .createTempDirectory("graft_ivfadc_trained").toString + "/store"
    Pq.saveIvfAdcStore(ivfCorpus, "cand", "embedding", coarse, path,
      m = 2, dsub = 2, k = 2)
    val inline = Pq.ivfAdcSearch(ivfCorpus, "cand", probes, "probe",
        "embedding", coarse, m = 2, dsub = 2, k = 2, nprobe = 1)
      .collect().map(_.toSeq).toSet
    val served = Pq.searchIvfAdcStore(spark, path, probes, "probe",
      "embedding", nprobe = 1).collect()
    assert(served.map(_.toSeq).toSet == inline,
      "trained-coarse store serve must equal the trained-coarse inline")
    // planted isolation survives the store path: each probe only ever
    // sees its own k-means cluster's candidates
    served.filter(_.getLong(0) == 100L).foreach(r =>
      assert(r.getLong(2) % 2 == 0,
        s"probe 100 must only see even-id candidates: $r"))
    served.filter(_.getLong(0) == 101L).foreach(r =>
      assert(r.getLong(2) % 2 == 1,
        s"probe 101 must only see odd-id candidates: $r"))
  }

  test("IVFADC+R store face (r18 verdict #2): withVectors commits the " +
      "refine vectors alongside the codes; searchIvfAdcStoreRerank " +
      "equals the inline ivfAdcRerank; a store without vectors refuses " +
      "rerank serving") {
    import spark.implicits._
    val coarse = Seq(
      (0, Seq(500L, 500L, 500L, 500L)),
      (1, Seq(-500L, -500L, -500L, -500L))).toDF("cid", "c")
    val probes = Seq(
      (100L, Array(0.5f, 0.5f, 0.5f, 0.5f)),
      (101L, Array(-0.5f, -0.5f, -0.5f, -0.5f))).toDF("probe", "embedding")
    val base = java.nio.file.Files
      .createTempDirectory("graft_ivfadcr").toString
    Pq.saveIvfAdcStore(ivfCorpus, "cand", "embedding", coarse,
      s"$base/withvecs", m = 2, dsub = 2, k = 2, withVectors = true)
    val inline = Pq.ivfAdcRerank(ivfCorpus, "cand", probes, "probe",
        "embedding", coarse, m = 2, dsub = 2, k = 2, nprobe = 1,
        shortlist = 5, topK = 3)
      .collect().map(_.toSeq).toSet
    val served = Pq.searchIvfAdcStoreRerank(spark, s"$base/withvecs",
        probes, "probe", "embedding", nprobe = 1, shortlist = 5,
        topK = 3)
      .collect().map(_.toSeq).toSet
    assert(served == inline,
      "store-served IVFADC+R must equal the inline rerank bit-for-bit")
    // a codes-only store refuses rerank serving with an explicit message
    Pq.saveIvfAdcStore(ivfCorpus, "cand", "embedding", coarse,
      s"$base/novecs", m = 2, dsub = 2, k = 2)
    val ex = intercept[IllegalArgumentException] {
      Pq.searchIvfAdcStoreRerank(spark, s"$base/novecs", probes,
        "probe", "embedding").collect()
    }
    assert(ex.getMessage.contains("withVectors"),
      s"refusal must name the rebuild option: ${ex.getMessage}")
  }

  test("ivfAdcRerankCandidates sweep frame (q247): filtering srk <= R " +
      "and re-ranking replays ivfAdcRerank at R — one refine frame " +
      "serves the whole R sweep") {
    import spark.implicits._
    val coarse = Seq(
      (0, Seq(500L, 500L, 500L, 500L)),
      (1, Seq(-500L, -500L, -500L, -500L))).toDF("cid", "c")
    val probes = Seq(
      (100L, Array(0.5f, 0.5f, 0.5f, 0.5f)),
      (101L, Array(-0.5f, -0.5f, -0.5f, -0.5f))).toDF("probe", "embedding")
    val rf = Pq.ivfAdcRerankCandidates(ivfCorpus, "cand", probes,
        "probe", "embedding", coarse, m = 2, dsub = 2, k = 2,
        nprobe = 1, maxShortlist = 10)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3)))
    assert(rf.length == 2 * 10, s"2 probes x shortlist 10: ${rf.length}")
    for (rCap <- Seq(3, 5, 10)) {
      val direct = Pq.ivfAdcRerank(ivfCorpus, "cand", probes, "probe",
          "embedding", coarse, m = 2, dsub = 2, k = 2, nprobe = 1,
          shortlist = rCap, topK = 3)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3))).toSet
      val replayed = rf.toSeq.filter(_._3 <= rCap)
        .groupBy(_._1).toSeq.flatMap { case (p, cs) =>
          cs.sortBy { case (_, c, _, d) => (d, c) }.take(3)
            .zipWithIndex.map { case ((_, c, _, d), i) =>
              (p, (i + 1).toLong, c, d) }
        }.toSet
      assert(replayed == direct,
        s"srk-filtered frame must replay ivfAdcRerank at R = $rCap")
    }
  }

  test("geometry travels WITH the artifact (r18 ADVICE #2): a store " +
      "built at m = 2 serves correctly with NO caller geometry, and a " +
      "pre-round-19 commit marker is refused with an explicit rebuild " +
      "message (r18 ADVICE #1)") {
    import spark.implicits._
    val base = java.nio.file.Files
      .createTempDirectory("graft_pq_geom").toString
    val probes = Seq(
      (100L, Array(0.3f, 0.3f, 0.3f, 0.3f))).toDF("probe", "embedding")
    // the m = 2 store serves through the geometry file — no caller arg
    // exists to get wrong anymore
    Pq.saveStore(corpus.toDF("cand", "embedding"), "cand", "embedding",
      s"$base/v2", m = 2, dsub = 2, k = 2)
    assert(Pq.searchStore(spark, s"$base/v2", probes, "probe",
      "embedding").collect().nonEmpty)
    // a legacy-marker store (pre-round-19 layout: row-form codes,
    // caller geometry) is refused loudly, never fed to the packed fold
    val legacyDir = new java.io.File(s"$base/legacy")
    legacyDir.mkdirs()
    java.nio.file.Files.writeString(java.nio.file.Paths.get(
      s"$base/legacy/_graft_pqstore_committed"), "v1")
    val ex = intercept[IllegalArgumentException] {
      Pq.searchStore(spark, s"$base/legacy", probes, "probe",
        "embedding").collect()
    }
    assert(ex.getMessage.contains("pre-round-19"),
      s"legacy refusal must say why: ${ex.getMessage}")
    val exI = intercept[IllegalArgumentException] {
      java.nio.file.Files.writeString(java.nio.file.Paths.get(
        s"$base/legacy/_graft_ivfadcstore_committed"), "v1")
      Pq.searchIvfAdcStore(spark, s"$base/legacy", probes, "probe",
        "embedding").collect()
    }
    assert(exI.getMessage.contains("pre-round-19"))
  }

  test("empty-probed-dirs serve (r18 verdict #8): when every probed " +
      "list is empty the serve returns zero rows from the committed " +
      "schema — never a full-index listing") {
    import spark.implicits._
    // all 40 corpus vectors land in coarse cell 0; cell 1 stays empty
    val oneSided = (0 until 40).map { i =>
      (i.toLong, Array.tabulate(4)(j =>
        (0.5 + 0.02 * math.sin(i * 11 + j * 3)).toFloat))
    }.toDF("cand", "embedding")
    val coarse = Seq(
      (0, Seq(500L, 500L, 500L, 500L)),
      (1, Seq(-500L, -500L, -500L, -500L))).toDF("cid", "c")
    val path = java.nio.file.Files
      .createTempDirectory("graft_ivfadc_empty").toString + "/store"
    Pq.saveIvfAdcStore(oneSided, "cand", "embedding", coarse, path,
      m = 2, dsub = 2, k = 2)
    // the probe's nearest (and only probed) list is the EMPTY cell 1
    val probes = Seq(
      (100L, Array(-0.5f, -0.5f, -0.5f, -0.5f))).toDF("probe", "embedding")
    val served = Pq.searchIvfAdcStore(spark, path, probes, "probe",
      "embedding", nprobe = 1)
    assert(served.collect().isEmpty,
      "an empty probed list must serve zero rows, not throw")
    assert(served.inputFiles.isEmpty,
      "the empty-probed branch must never build a file index")
  }
}
