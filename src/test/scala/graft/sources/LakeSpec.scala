package graft.sources

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Lake round-trips (parquet/csv/json) and the partition-pruning
  * contract: a date filter over a partitioned layout must show up as
  * PartitionFilters, not data filters. */
class LakeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private def tmp(p: String) =
    java.nio.file.Files.createTempDirectory(p).toString

  private lazy val events =
    graft.Tables.events(spark, "/root/testdata/sf0.001")

  test("json and csv round-trip with explicit schemas") {
    val src = events.select("event_id", "user_id", "event_type", "value")
    val j = tmp("lake_json")
    Lake.writeJson(src, j)
    val back = Lake.readJson(spark, j, src.schema)
    assert(back.count() == src.count())
    assert(back.schema == src.schema)
    val c = tmp("lake_csv")
    Lake.writeCsv(src, c)
    val backCsv = Lake.readCsv(spark, c, src.schema)
    assert(backCsv.agg(sum("event_id")).first().getLong(0)
      == src.agg(sum("event_id")).first().getLong(0))
  }

  test("date-partitioned write prunes partitions on read") {
    val path = tmp("lake_part")
    Lake.writeDatePartitioned(events, "ts", path)
    val lake = Lake.readDatePartitioned(spark, path)
    val days = lake.select("p_date").distinct().count()
    assert(days > 1, "fixture must span multiple days")
    val q = lake.filter(col("p_date") === "2024-01-01")
    val scan = q.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters") &&
      scan.contains("isnotnull(p_date"),
      s"partition filter missing from scan:\n$scan")
    // pruned read touches only the one day's rows
    val expected = events
      .filter(date_format(col("ts"), "yyyy-MM-dd") === "2024-01-01").count()
    assert(q.count() == expected)
  }

  test("bucketed tables join without any shuffle (co-located join)") {
    val orders = graft.Tables.orders(spark, "/root/testdata/sf0.001")
    val customer = graft.Tables.customer(spark, "/root/testdata/sf0.001")
    Lake.writeBucketed(orders.select("o_orderkey", "o_custkey", "o_totalprice"),
      "bkt_orders", "o_custkey", 8)
    Lake.writeBucketed(customer.select("c_custkey", "c_name"),
      "bkt_customer", "c_custkey", 8)
    // disable broadcast so the join strategy must rely on bucketing
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = Lake.readTable(spark, "bkt_orders")
        .join(Lake.readTable(spark, "bkt_customer"),
          col("o_custkey") === col("c_custkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join must be shuffle-free:\n$plan")
      // and it still returns the right answer
      val n = joined.count()
      val expected = orders.join(customer,
        col("o_custkey") === col("c_custkey")).count()
      assert(n == expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql("DROP TABLE IF EXISTS bkt_orders")
      spark.sql("DROP TABLE IF EXISTS bkt_customer")
    }
  }
}
