package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.GroupStateTimeout
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** flatMapGroupsWithState custom state: running per-user totals across
  * micro-batches, plus state-timeout reclamation. */
class StatefulOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private def t(m: String) = Timestamp.valueOf(s"2024-01-01 $m:00")

  test("per-user running totals accumulate across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev2]
    val withWm = mem.toDF()
      .withWatermark("ts", "10 minutes").as[Ev2]
    val q = StatefulOps.userActivity(withWm)
      .writeStream.format("memory").queryName("state_out")
      .outputMode("append").start()
    mem.addData(
      Ev2(1, t("10:00"), 1, "view", 1.0),
      Ev2(2, t("10:05"), 1, "view", 2.0),
      Ev2(3, t("10:06"), 2, "view", 5.0))
    q.processAllAvailable()
    mem.addData(Ev2(4, t("10:10"), 1, "click", 4.0))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("state_out")
      .groupBy("user_id").agg(max("n").as("n"), max("sum_value").as("s"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    // user 1: batch 1 -> (2, 3.0); batch 2 -> (3, 7.0) running ACROSS batches
    assert(rows(1L) == (3L, 7.0))
    assert(rows(2L) == (1L, 5.0))
  }

  test("event-time timeout emits a final summary and releases state") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev2]
    val withWm = mem.toDF()
      .withWatermark("ts", "10 minutes").as[Ev2]
    val q = StatefulOps.userActivity(withWm, GroupStateTimeout.EventTimeTimeout())
      .writeStream.format("memory").queryName("state_timeout_out")
      .outputMode("append").start()
    mem.addData(Ev2(1, t("10:00"), 1, "view", 1.0))
    q.processAllAvailable()
    // push the watermark far past user 1's timeout (10:00 + 1h)
    mem.addData(Ev2(2, t("13:00"), 2, "view", 2.0))
    q.processAllAvailable()
    mem.addData(Ev2(3, t("14:00"), 2, "view", 3.0))
    q.processAllAvailable()
    q.stop()
    val user1Rows = spark.table("state_timeout_out")
      .filter("user_id = 1").count()
    // initial emission + timeout emission
    assert(user1Rows == 2, s"expected update+timeout emissions, got $user1Rows")
  }

  test("transformWithState (v2) running totals match the v1 semantics") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // v2 requires the RocksDB provider; scope the conf to this query
    val confKey = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(confKey)
    spark.conf.set(confKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val mem = MemoryStream[Ev2]
      val q = StatefulOps.userActivityV2(mem.toDS())
        .writeStream.format("memory").queryName("state_v2_out")
        .outputMode("update").start()
      mem.addData(
        Ev2(1, t("10:00"), 1, "view", 1.0),
        Ev2(2, t("10:05"), 1, "view", 2.0),
        Ev2(3, t("10:06"), 2, "view", 5.0))
      q.processAllAvailable()
      mem.addData(Ev2(4, t("10:10"), 1, "click", 4.0))
      q.processAllAvailable()
      q.stop()
      val rows = spark.table("state_v2_out")
        .groupBy("user_id").agg(max("n").as("n"), max("sum_value").as("s"))
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
      // same cross-batch accumulation contract as the v1 test above
      assert(rows(1L) == (3L, 7.0))
      assert(rows(2L) == (1L, 5.0))
    } finally {
      prev match {
        case Some(v) => spark.conf.set(confKey, v)
        case None    => spark.conf.unset(confKey)
      }
    }
  }
}
