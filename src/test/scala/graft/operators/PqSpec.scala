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
      Pq.searchStore(spark, path, probes, "probe", "embedding",
        m = 2, dsub = 2).collect()
    }
    Pq.saveStore(corpus.toDF("cand", "embedding"), "cand", "embedding",
      path, m = 2, dsub = 2, k = 2)
    val cb = Pq.trainCodebooks(corpus, "vec_id", "embedding",
      m = 2, dsub = 2, k = 2)
    val inline = Pq.search(corpus.toDF("cand", "embedding"), "cand",
        probes, "probe", "embedding", cb, m = 2, dsub = 2)
      .collect().map(_.toSeq).toSet
    val served = Pq.searchStore(spark, path, probes, "probe",
        "embedding", m = 2, dsub = 2)
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
      "embedding", m = 2, dsub = 2, nprobe = 1)
    assert(served.collect().map(_.toSeq).toSet ==
      rows.map(_.toSeq).toSet, "store-served IVF-ADC must equal inline")
    // the codes scan must carry the probed-list PARTITION filter —
    // serve-time IO is the probed directories only
    val plan = served.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("cid"),
      s"probed lists must push down as partition filters:\n$plan")
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
}
