package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Differential check: the codegen'd ArrayDotProduct must be bit-identical
  * to the higher-order-function fold (same summation order), plus a
  * relative throughput sanity check. */
class ArrayDotProductSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private lazy val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    .select(col("vec_id"), Vectors.asDouble(col("embedding")).as("v"))

  test("expression and HOF fold are bit-identical on all pair dot products") {
    val pairs = emb.toDF("a", "va").crossJoin(emb.toDF("b", "vb")).limit(5000)
      .select(
        Vectors.dot(col("va"), col("vb")).as("native"),
        Vectors.dotHof(col("va"), col("vb")).as("hof"))
    val diff = pairs.filter(col("native") =!= col("hof")).count()
    assert(diff == 0)
  }

  test("expression survives interpreted (non-codegen) eval too") {
    val withFallback = emb.limit(10)
      .select(Vectors.dot(col("v"), col("v")).as("d"))
      .collect().map(_.getDouble(0))
    // embeddings are unit-normalized → self-dot ≈ 1
    assert(withFallback.forall(d => math.abs(d - 1.0) < 1e-5))
  }

  test("null array yields null, not a crash") {
    val df = emb.limit(3).select(
      Vectors.dot(lit(null).cast("array<double>"), col("v")).as("d"))
    assert(df.collect().forall(_.isNullAt(0)))
  }

  test("codegen'd expression is not slower than the HOF form") {
    val big = emb.toDF("a", "va").crossJoin(emb.toDF("b", "vb")) // 250k pairs
    def time(c: org.apache.spark.sql.Column): Double = {
      val t0 = System.nanoTime()
      big.select(sum(c)).collect()
      (System.nanoTime() - t0) / 1e9
    }
    time(Vectors.dot(col("va"), col("vb")))    // warm both paths
    time(Vectors.dotHof(col("va"), col("vb")))
    val native = time(Vectors.dot(col("va"), col("vb")))
    val hof = time(Vectors.dotHof(col("va"), col("vb")))
    info(f"native=$native%.2fs hof=$hof%.2fs speedup=${hof / native}%.1fx")
    assert(native <= hof * 1.5, f"native $native%.2fs vs hof $hof%.2fs")
  }
}
