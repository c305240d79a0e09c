package graft.operators

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Temporal operators on planted fixtures: asof picks the latest
  * at-or-before row per key, pairsWithin finds exactly the bounded
  * pairs (including across bin boundaries), sessionize cuts islands at
  * the gap. */
class TemporalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(m: String) = Timestamp.valueOf(s"2024-01-01 $m:00")

  test("asofJoin: latest at-or-before right row, inner semantics, same-ts matches") {
    val clicks = Seq(
      (1L, ts("10:30"), 100L),  // between views -> 10:00 view
      (1L, ts("11:00"), 101L),  // exactly at a view ts -> that view
      (2L, ts("09:00"), 102L),  // before any view -> dropped (inner)
      (2L, ts("23:00"), 103L))  // long after -> latest view
      .toDF("user_id", "ts", "click_id")
    val views = Seq(
      (1L, ts("10:00"), 10L), (1L, ts("11:00"), 11L),
      (2L, ts("12:00"), 20L), (2L, ts("13:00"), 21L))
      .toDF("user_id", "ts", "view_id")
    val out = Temporal.asofJoin(clicks, views, "user_id", "ts")
      .select("click_id", "r_view_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(100L -> 10L, 101L -> 11L, 103L -> 21L))
  }

  test("pairsWithin finds cross-bin pairs and respects the bound exactly") {
    val ev = Seq(
      (1L, 1L, ts("10:00")),
      (1L, 2L, ts("10:59")),  // 59 min from #1 -> pair (bin-adjacent)
      (1L, 3L, ts("12:30")),  // 91 min from #2 -> no pair with 1h horizon
      (1L, 5L, ts("09:10")),  // EARLIER than #1 but larger id -> pair (1,5)
      (2L, 4L, ts("10:30")))  // other key
      .toDF("user_id", "event_id", "ts")
    val pairs = Temporal.pairsWithin(ev, "user_id", "event_id", "ts", 3600L)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L), (1L, 5L)),
      "pairs must be found in either time direction, exactly once")
    // exactly-at-the-bound pair is included (<=)
    val edge = Seq((1L, 1L, ts("10:00")), (1L, 2L, ts("11:00")))
      .toDF("user_id", "event_id", "ts")
    assert(Temporal.pairsWithin(edge, "user_id", "event_id", "ts", 3600L)
      .count() == 1)
  }

  test("sessionize cuts islands at the gap and counts members") {
    val ev = Seq(
      (1L, ts("10:00")), (1L, ts("10:20")), (1L, ts("10:50")),  // session 1
      (1L, ts("12:30")),                                        // session 2
      (2L, ts("10:00")))
      .toDF("user_id", "ts")
    val out = Temporal.sessionize(ev, "user_id", "ts", gapSec = 1800L)
      .orderBy("user_id", "session_start").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).toString,
        r.getTimestamp(2).toString, r.getLong(3)))
    assert(out.toSeq == Seq(
      (1L, "2024-01-01 10:00:00.0", "2024-01-01 10:50:00.0", 3L),
      (1L, "2024-01-01 12:30:00.0", "2024-01-01 12:30:00.0", 1L),
      (2L, "2024-01-01 10:00:00.0", "2024-01-01 10:00:00.0", 1L)))
  }
}
