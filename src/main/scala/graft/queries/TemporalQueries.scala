package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._
import graft.operators.Temporal

/** Event-time analytics queries (round 2): the as-of/range/session
  * family a warehouse tier runs over the events stream, each the query
  * face of a [[graft.operators.Temporal]] operator, plus the exact
  * quantile battery. All timestamps stay TIMESTAMP_NTZ (UTC session) and
  * all interval math is integer microseconds (`unix_micros`), so results
  * hash-match the DuckDB oracle exactly — no float epoch arithmetic. */
object TemporalQueries {

  /** q61 as-of join: each click correlated to the user's most recent
    * view at-or-before it (the attribution primitive). Views pre-
    * aggregated to one per (user, ts) so the match is deterministic.
    * Plan: ONE shuffle on user_id + a sorted window pass — never a
    * per-row theta join. */
  def q61(s: SparkSession, d: String): DataFrame = {
    val e = events(s, d)
    val views = e.filter(col("event_type") === "view")
      .groupBy(col("user_id"), col("ts"))
      .agg(max(col("event_id")).as("view_id"))
    val clicks = e.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("event_id").as("click_id"))
    Temporal.asofJoin(clicks, views, "user_id", "ts")
      .select(col("click_id"), col("user_id"),
        col("ts").as("click_ts"), col("r_ts").as("view_ts"),
        col("r_view_id").as("view_id"))
      .orderBy("click_id")
  }

  /** q62 bounded-interval pairing: per user, how many ordered event
    * pairs fall within 6 hours of each other. The operator bins to
    * 6-hour buckets so candidates meet through (user, bucket) equi-joins
    * — the scale path for range self-joins. */
  def q62(s: SparkSession, d: String): DataFrame =
    Temporal.pairsWithin(events(s, d), "user_id", "event_id", "ts",
        horizonSec = 21600L)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_pairs"))
      .orderBy("user_id")

  /** q63 batch sessionization (gaps-and-islands, 6-hour gap): the batch
    * twin of the streaming session window — same islands, one exchange. */
  def q63(s: SparkSession, d: String): DataFrame =
    Temporal.sessionize(events(s, d).select("user_id", "ts"), "user_id",
        "ts", gapSec = 21600L)
      .select(col("user_id"),
        col("session_start").cast("timestamp_ntz").as("session_start"),
        col("session_end").cast("timestamp_ntz").as("session_end"),
        col("n_events"))
      .orderBy("user_id", "session_start")

  /** q64 exact quantiles per group (linear interpolation — the same
    * definition as DuckDB's quantile_cont, so results match to the bit).
    * The body is the DISTRIBUTED exact form,
    * [[graft.operators.Ranking.exactQuantilesByGroupScan]] (histogram-
    * refinement selection: a few narrow scans, zero shuffle) — Spark's
    * `percentile` aggregate pins the same contract but its buffer holds
    * a value→count map growing O(distinct values) PER GROUP (an
    * executor OOM on near-all-distinct columns like l_extendedprice at
    * 100×), so the single-buffer form was retired to RankingSpec's
    * cross-check ("matches the percentile aggregate exactly") and this
    * face shares q97's scale-safe body; the oracle hash gate proved the
    * forms bit-identical before the swap. Approximate alternatives:
    * [[graft.operators.Sketches.quantileSketch]] (mergeable, ~KB
    * buffers, rank error ≤ ε·n) or `approx_percentile`. */
  def q64(s: SparkSession, d: String): DataFrame =
    ExtendedQueries.q97(s, d)
}
