package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** approxNtile = the distributed scale path for q29's exact global
  * ntile: cross-checked against the exact window on sf0.001. */
class RankingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("approxNtile matches exact ntile on sf0.001 (high accuracy)") {
    val cust = graft.Tables.customer(spark, "/root/testdata/sf0.001")
      .select("c_custkey", "c_acctbal")
    val exact = cust.withColumn("q_exact",
      ntile(4).over(Window.orderBy(col("c_acctbal").asc, col("c_custkey").asc))
        .cast("long"))
    val both = Ranking.approxNtile(exact, "c_acctbal", 4, tileCol = "q_approx",
      accuracy = 1000000)
    val n = both.count()
    val mismatched = both.filter(col("q_exact") =!= col("q_approx")).count()
    // value-based split vs row-count split can only disagree on rows tied
    // with a boundary value; at full sketch accuracy that is ~0 here
    assert(mismatched <= n / 100,
      s"approx tiles must track exact ntile: $mismatched/$n mismatched")
    // tiles must stay balanced (each within 2% of n/4)
    val sizes = both.groupBy("q_approx").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sizes.keySet == Set(1L, 2L, 3L, 4L))
    sizes.values.foreach(c =>
      assert(math.abs(c - n / 4.0) <= n * 0.02, s"unbalanced tiles: $sizes"))
  }

  test("approxNtile stays in [1, n] and is monotone in the order column") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), col("n_chars").cast("double").as("len"))
    val tiled = Ranking.approxNtile(docs, "len", 10)
    val bad = tiled.filter(col("tile") < 1 || col("tile") > 10).count()
    assert(bad == 0)
    // monotonicity: a doc with a larger value never gets a smaller tile
    val viol = tiled.toDF().as("x").join(tiled.toDF().as("y"),
        col("x.len") > col("y.len") && col("x.tile") < col("y.tile"))
      .count()
    assert(viol == 0, "tile assignment must be monotone in the value")
  }
}
