package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Custom keyed state via `flatMapGroupsWithState` (SURVEY.md §2.4 /
  * builder mandate: "KeyValueGroupedDataset …flatMapGroupsWithState for
  * custom state") — the escape hatch for stateful logic the built-in
  * window/dedup operators can't express.
  *
  * Implemented op: per-user running activity tracker that emits an
  * updated summary (event count, value sum, last event time) on every
  * micro-batch touching that user, with event-time timeout reclaiming
  * state for idle users — the bounded-state discipline that keeps a
  * 100 TB/day keyed stream from accumulating unbounded state.
  */
object StatefulOps {

  case class UserActivity(user_id: Long, n: Long, sum_value: Double,
                          last_ts: java.sql.Timestamp)

  case class ActivityState(n: Long, sum_value: Double, lastMillis: Long)

  /** Per-user running totals with state timeout. Input must carry a
    * watermark on `ts` when used with EventTimeTimeout. */
  def userActivity(events: Dataset[Ev2],
                   timeout: GroupStateTimeout = GroupStateTimeout.EventTimeTimeout())
      : Dataset[UserActivity] = {
    implicit val outEnc = Encoders.product[UserActivity]
    implicit val stEnc = Encoders.product[ActivityState]
    implicit val keyEnc = Encoders.scalaLong
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[ActivityState, UserActivity](
        OutputMode.Append(), timeout) {
        (userId: Long, rows: Iterator[Ev2], state: GroupState[ActivityState]) =>
          if (state.hasTimedOut) {
            // idle user: emit final summary, release the state
            val s = state.get
            state.remove()
            Iterator(UserActivity(userId, s.n, s.sum_value,
              new java.sql.Timestamp(s.lastMillis)))
          } else {
            val prev = state.getOption.getOrElse(ActivityState(0L, 0.0, 0L))
            var n = prev.n
            var sum = prev.sum_value
            var last = prev.lastMillis
            rows.foreach { e =>
              n += 1; sum += e.value
              last = math.max(last, e.ts.getTime)
            }
            state.update(ActivityState(n, sum, last))
            if (timeout == GroupStateTimeout.EventTimeTimeout()) {
              // reclaim state once the watermark passes 1h beyond the
              // user's last activity
              state.setTimeoutTimestamp(last + 3600 * 1000L)
            }
            Iterator(UserActivity(userId, n, sum, new java.sql.Timestamp(last)))
          }
      }
  }

  /** The arbitrary-state-v2 (`transformWithState`) twin of
    * [[userActivity]]: the same per-user running totals held in a named
    * `ValueState`. The v2 API is the forward path for custom streaming
    * state — typed state variables (value/list/map) with per-state TTL
    * instead of one opaque blob, and timers decoupled from state.
    *
    * Requires the RocksDB state store provider
    * (`spark.sql.streaming.stateStore.providerClass` =
    * `...state.RocksDBStateStoreProvider`) — at scale that is the
    * provider a keyed 100-TB/day stream runs anyway (changelog
    * checkpointing, out-of-heap state). */
  class ActivityProcessor extends StatefulProcessor[Long, Ev2, UserActivity] {
    @transient private var state: ValueState[ActivityState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[ActivityState]("activity",
        Encoders.product[ActivityState], TTLConfig.NONE)

    override def handleInputRows(userId: Long, rows: Iterator[Ev2],
                                 timerValues: TimerValues): Iterator[UserActivity] = {
      val prev = if (state.exists()) state.get() else ActivityState(0L, 0.0, 0L)
      var n = prev.n
      var sum = prev.sum_value
      var last = prev.lastMillis
      rows.foreach { e =>
        n += 1; sum += e.value
        last = math.max(last, e.ts.getTime)
      }
      state.update(ActivityState(n, sum, last))
      Iterator.single(UserActivity(userId, n, sum, new java.sql.Timestamp(last)))
    }
  }

  /** [[userActivity]] via `transformWithState` (see [[ActivityProcessor]]). */
  def userActivityV2(events: Dataset[Ev2]): Dataset[UserActivity] = {
    implicit val outEnc = Encoders.product[UserActivity]
    implicit val keyEnc = Encoders.scalaLong
    events.groupByKey(_.user_id)
      .transformWithState(new ActivityProcessor,
        TimeMode.None(), OutputMode.Update())
  }
}

/** Events row for typed streaming ops (mirrors the events table schema). */
case class Ev2(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
               event_type: String, value: Double)
