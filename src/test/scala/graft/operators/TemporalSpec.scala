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

  test("asofJoin forward: earliest at-or-after right row, same-ts matches") {
    val clicks = Seq(
      (1L, ts("10:30"), 100L),  // between views -> 11:00 view
      (1L, ts("11:00"), 101L),  // exactly at a view ts -> that view
      (2L, ts("09:00"), 102L),  // before all views -> earliest (12:00)
      (2L, ts("23:00"), 103L))  // after every view -> dropped (inner)
      .toDF("user_id", "ts", "click_id")
    val views = Seq(
      (1L, ts("10:00"), 10L), (1L, ts("11:00"), 11L),
      (2L, ts("12:00"), 20L), (2L, ts("13:00"), 21L))
      .toDF("user_id", "ts", "view_id")
    val out = Temporal.asofJoin(clicks, views, "user_id", "ts",
        direction = "forward")
      .select("click_id", "r_view_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(100L -> 11L, 101L -> 11L, 102L -> 20L))
  }

  test("asofJoin keepUnmatched: LEFT semantics — unmatched and " +
      "null-key left rows survive with null right columns") {
    val clicks = Seq(
      (java.lang.Long.valueOf(1L), ts("10:30"), 100L), // matched -> 10:00
      (java.lang.Long.valueOf(2L), ts("09:00"), 102L), // before any view -> kept, nulls
      (null.asInstanceOf[java.lang.Long], ts("12:00"), 104L)) // null key -> kept, nulls
      .toDF("user_id", "ts", "click_id")
    val views = Seq(
      (1L, ts("10:00"), 10L), (2L, ts("12:00"), 20L))
      .toDF("user_id", "ts", "view_id")
    val out = Temporal.asofJoin(clicks, views, "user_id", "ts",
        keepUnmatched = true)
      .select("click_id", "r_view_id").collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(out == Map(100L -> Some(10L), 102L -> None, 104L -> None),
      s"left form keeps every click: $out")
    // inner form drops exactly the unmatched two
    val inner = Temporal.asofJoin(clicks, views, "user_id", "ts")
      .select("click_id").collect().map(_.getLong(0)).toSet
    assert(inner == Set(100L))
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

  test("pairsWithin is floor-bucketed: pre-1970 epochs pair correctly") {
    // negative epoch micros: double-div + cast truncates toward zero,
    // floor division keeps every bucket exactly horizon-wide. Pairs
    // within the horizon must be found on both sides of 1970-01-01.
    def t(s: String) = Timestamp.valueOf(s)
    val ev = Seq(
      (1L, 1L, t("1969-12-31 23:10:00")),
      (1L, 2L, t("1969-12-31 23:50:00")),  // 40 min from #1 -> pair
      (1L, 3L, t("1970-01-01 00:15:00")),  // 25 min from #2 (crosses epoch) -> pair
      (1L, 4L, t("1969-12-31 21:00:00")))  // >1h from all -> alone
      .toDF("user_id", "event_id", "ts")
    val pairs = Temporal.pairsWithin(ev, "user_id", "event_id", "ts", 3600L)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L), (2L, 3L)),
      "floor bucketing must find pre-1970 and epoch-crossing pairs")
  }

  test("batch sessionize == streaming session_window on the same events") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    // real slice: sf0.001 events for a handful of users
    val batch = graft.Tables.events(spark, "/root/testdata/sf0.001")
      .filter(col("user_id") < 5)
      .select(col("event_id"), col("ts").cast("timestamp").as("ts"),
        col("user_id"), col("event_type"), col("value"))
    val expected = Temporal.sessionize(
        batch.select("user_id", "ts"), "user_id", "ts", gapSec = 1800L)
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2),
        r.getLong(3))).toSet

    val mem = MemoryStream[graft.streaming.Ev]
    val q = graft.streaming.StreamingOps
      .sessionCounts(mem.toDF(), gap = "30 minutes", lateness = "0 seconds")
      .writeStream.format("memory").queryName("sess_parity")
      .outputMode("append").start()
    val rows = batch.collect().map(r => graft.streaming.Ev(
      r.getLong(0), r.getTimestamp(1), r.getLong(2), r.getString(3),
      r.getDouble(4)))
    mem.addData(rows.toIndexedSeq: _*)
    q.processAllAvailable()
    // close all sessions: advance the watermark far past the data
    mem.addData(graft.streaming.Ev(999999L,
      java.sql.Timestamp.valueOf("2030-01-01 00:00:00"), 99999L, "x", 0.0))
    q.processAllAvailable()
    val got = spark.table("sess_parity")
      .filter(col("user_id") < 5)
      .select("user_id", "ss", "se", "n").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2),
        r.getLong(3))).toSet
    q.stop()
    // streaming session_window's end = last_ts + gap; align to batch's
    // end = last event ts by subtracting the (whole-second) gap —
    // preserving nanos, which Timestamp.getTime arithmetic would drop
    val gotAligned = got.map { case (u, ss, se, n) =>
      val end = new java.sql.Timestamp(se.getTime - 1800 * 1000L)
      end.setNanos(se.getNanos)
      (u, ss, end, n) }
    assert(gotAligned == expected,
      s"batch and streaming sessionization must agree\nbatch: $expected\nstream: $gotAligned")
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
