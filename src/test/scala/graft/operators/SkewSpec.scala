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

  test("AQE splits the skewed join partition at runtime (no manual salt)") {
    import spark.implicits._
    // fact: one key owns ~90% of rows; rows padded so the hot partition
    // crosses the (deliberately tiny) skew thresholds
    val fact = ((1 to 20000).map(i => ("hot", i)) ++
      (1 to 2000).map(i => (s"k${i % 50}", i)))
      .toDF("k", "i")
      .withColumn("pad", expr("repeat('x', 100)"))
      .repartition(8)
    val dim = (Seq("hot") ++ (0 until 50).map(i => s"k$i"))
      .zipWithIndex.toDF("k", "dim_val")
    val prev = Seq(
      "spark.sql.adaptive.enabled",
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.enabled",
      "spark.sql.autoBroadcastJoinThreshold")
      .map(k => k -> spark.conf.getOption(k)).toMap
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64KB")
      spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      // force a sort-merge join (broadcast would hide the skew path)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = fact.join(dim, "k")
      // execute THIS plan (count() would plan its own aggregate), then
      // read the finalized adaptive plan
      val n = joined.collect().length
      assert(n == 22000, "AQE split must not change the result")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"adaptive plan must mark the skewed join split:\n${plan.take(1500)}")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
