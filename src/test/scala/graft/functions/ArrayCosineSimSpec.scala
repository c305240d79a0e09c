package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Differential check: the fused one-pass cosine must be bit-identical
  * to the composed dot/(norm*norm) form (each accumulator performs the
  * same left-to-right additions), plus SQL registration and a relative
  * throughput check. */
class ArrayCosineSimSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private lazy val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    .select(col("vec_id"), Vectors.asDouble(col("embedding")).as("v"))

  test("fused and composed cosine are bit-identical on all pairs") {
    val pairs = emb.toDF("a", "va").crossJoin(emb.toDF("b", "vb")).limit(5000)
      .select(
        Vectors.cosine(col("va"), col("vb")).as("fused"),
        Vectors.cosineComposed(col("va"), col("vb")).as("composed"))
    assert(pairs.filter(col("fused") =!= col("composed")).count() == 0)
  }

  test("array_cosine is callable from SQL after registration") {
    graft.plans.GraftExtensions.install(spark)
    emb.limit(5).createOrReplaceTempView("__cos_v")
    val d = spark.sql(
      "SELECT array_cosine(v, v) AS c FROM __cos_v")
      .collect().map(_.getDouble(0))
    spark.catalog.dropTempView("__cos_v")
    assert(d.forall(c => math.abs(c - 1.0) < 1e-12),
      "self-cosine must be exactly ~1")
  }

  test("null array yields null") {
    val df = emb.limit(3).select(
      Vectors.cosine(lit(null).cast("array<double>"), col("v")).as("c"))
    assert(df.collect().forall(_.isNullAt(0)))
  }

  test("fused single pass is not slower than the composed three-pass form") {
    val big = emb.toDF("a", "va").crossJoin(emb.toDF("b", "vb")) // 250k pairs
    def time(c: org.apache.spark.sql.Column): Double = {
      val t0 = System.nanoTime()
      big.select(sum(c)).collect()
      (System.nanoTime() - t0) / 1e9
    }
    time(Vectors.cosine(col("va"), col("vb")))  // warm both paths
    time(Vectors.cosineComposed(col("va"), col("vb")))
    val fused = time(Vectors.cosine(col("va"), col("vb")))
    val composed = time(Vectors.cosineComposed(col("va"), col("vb")))
    info(f"fused=$fused%.2fs composed=$composed%.2fs speedup=${composed / fused}%.1fx")
    assert(fused <= composed * 1.5)
  }
}
