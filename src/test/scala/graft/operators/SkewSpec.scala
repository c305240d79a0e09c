package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Salted two-phase aggregation and salted join must match their
  * unsalted equivalents exactly on a deliberately skewed dataset. */
class SkewSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private lazy val skewed = {
    import spark.implicits._
    // key "hot" holds 90% of rows
    val hot = (1 to 9000).map(i => ("hot", i.toDouble))
    val cold = (1 to 1000).map(i => (s"k${i % 50}", i.toDouble))
    (hot ++ cold).toDF("k", "v").repartition(8)
  }

  test("salted count/sum equals plain groupBy") {
    val plain = skewed.groupBy("k")
      .agg(count(lit(1)).as("n"), sum("v").as("sum_v"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    val salted = Skew.saltedCountSum(skewed, col("k"), col("v"), 16)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(salted == plain)
  }

  test("salted equi-join equals plain join") {
    import spark.implicits._
    val dim = (Seq("hot") ++ (0 until 50).map(i => s"k$i"))
      .zipWithIndex.toDF("k", "dim_val")
    val plain = skewed.join(dim, "k").agg(
      count(lit(1)), sum("dim_val"), sum("v")).first()
    val salted = Skew.saltedEquiJoin(skewed, dim, "k", 8).agg(
      count(lit(1)), sum("dim_val"), sum("v")).first()
    assert(plain == salted)
  }
}
