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
}
