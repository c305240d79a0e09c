package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.{Metrics, TestSpark}

/** Plan contracts: the shuffle-volume properties PLANS.md claims,
  * pinned as tests so a future edit can't silently reintroduce a fat
  * exchange. Bounds are generous (×4 headroom over measured values at
  * sf0.001) — they catch shape regressions (partial agg lost, pushdown
  * broken, WindowGroupLimit defeated), not noise. */
class PlanContractSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def shuffled(name: String): Long =
    Metrics.shuffleOf(spark) {
      graft.SparkEntry.queries(name)(spark, sf)
        .write.format("noop").mode("overwrite").save()
    }.recordsWritten

  test("q20 aggregation exchange carries |groups|, not |rows|") {
    // 6 groups x 4 partitions partials + final sort rows
    assert(shuffled("q20_agg_group") <= 100,
      "partial aggregation must shrink the exchange to group cardinality")
  }

  test("q44 multi-join exchange stays group-sized (broadcast dims hold)") {
    assert(shuffled("q44_multi_join_agg") <= 100,
      "dimension joins must broadcast; only the aggregate may shuffle")
  }

  test("q39 top-k per group prunes the window exchange map-side") {
    // WindowGroupLimit: rank<=3 filters before the shuffle
    assert(shuffled("q39_topk_group") <= 200,
      "rank filter must push below the exchange (WindowGroupLimit)")
  }

  test("q04 global top-k never shuffles (TakeOrderedAndProject)") {
    assert(shuffled("q04_topk") == 0,
      "orderBy+limit must plan per-partition heaps, not a sort exchange")
  }
}
