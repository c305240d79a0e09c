package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Metrics.shuffleOf must see exchanges that happen and not invent ones
  * that don't. */
class MetricsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("a groupBy action records shuffle writes; a narrow map records none") {
    val li = Tables.lineitem(spark, "/root/testdata/sf0.001")
    val agg = Metrics.shuffleOf(spark) {
      li.groupBy("l_returnflag").count()
        .write.format("noop").mode("overwrite").save()
    }
    assert(agg.recordsWritten > 0, "partial->final agg must shuffle")
    assert(agg.recordsWritten <= 200,
      s"partial agg shuffles |groups|x|partitions|, got ${agg.recordsWritten}")
    val narrow = Metrics.shuffleOf(spark) {
      li.select(col("l_orderkey") + 1)
        .write.format("noop").mode("overwrite").save()
    }
    assert(narrow.recordsWritten == 0, "a narrow map must not shuffle")
  }
}
