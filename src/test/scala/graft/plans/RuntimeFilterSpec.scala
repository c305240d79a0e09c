package graft.plans

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Runtime bloom-filter join pruning (Spark's runtime row-level filter
  * injection): when a shuffle join's build side is selective, Catalyst
  * plants a bloom filter built from the dim keys onto the fact scan, so
  * fact rows that cannot join are dropped BEFORE the exchange — at
  * 100 TB this is the difference between shuffling the whole fact table
  * and shuffling the matching fraction. The thresholds that gate
  * injection (creation-side size, application-side scan size) default to
  * production values; the test scopes them down so the optimization is
  * observable at test scale.
  */
class RuntimeFilterSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("selective dim filter injects a bloom filter on the fact side") {
    val confs = Map(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "10GB",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      // force a shuffle join: broadcast would bypass runtime filters
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1")
    val prev = confs.keys.map(k => k -> spark.conf.getOption(k)).toMap
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val d = "/root/testdata/sf0.001"
      val fact = graft.Tables.orders(spark, d)
      val dim = graft.Tables.customer(spark, d)
        .filter(col("c_mktsegment") === "BUILDING") // selective build side
      val joined = fact.join(dim, col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n"))
      val plan = joined.queryExecution.optimizedPlan.toString
      assert(plan.contains("might_contain") || plan.contains("BloomFilter"),
        s"runtime bloom filter must be injected on the fact side:\n$plan")
      // and the result is unaffected by the injected filter
      val n = joined.collect().map(r => r.getLong(1)).sum
      val expected = fact.join(dim.hint("broadcast"),
        col("o_custkey") === col("c_custkey")).count()
      assert(n == expected)
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }
}
