package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
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

  /** q121 time-weighted average (TWAP): per user, each event's value
    * weighted by how long it HELD — the integer-microsecond gap to the
    * user's next event (lead; the final open-ended observation carries
    * no weight). The metric that makes irregularly-sampled streams
    * comparable: an arithmetic mean over-counts bursts. The query face
    * of [[graft.operators.Temporal.twap]]: one exchange on the user
    * key; weights are integer micros so only the final ratio is float.
    * Users whose events all share one timestamp have zero total weight
    * and drop (no defined holding period). */
  def q121(s: SparkSession, d: String): DataFrame =
    Temporal.twap(
        events(s, d).select(col("user_id"), col("event_id"), col("value"),
          unix_micros(col("ts").cast("timestamp")).as("us")),
        "user_id", "us", "value", "event_id")
      .select(col("user_id"), col("n_intervals"),
        round(col("twap"), 4).as("twap"))
      .orderBy("user_id")

  /** q124 event-transition matrix: P(next event_type | current) over
    * each user's time-ordered stream — the first-order Markov read
    * behind session modeling and anomaly baselines. The query face of
    * [[graft.operators.Temporal.transitionMatrix]]: one user_id
    * exchange feeds the lead() window; the (src, dst) count and the
    * per-src normalizing window both run over the 25-row transition
    * matrix, i.e. metadata. */
  def q124(s: SparkSession, d: String): DataFrame =
    Temporal.transitionMatrix(
        events(s, d).select(col("user_id"), col("event_id"),
          col("event_type"),
          unix_micros(col("ts").cast("timestamp")).as("us")),
        "user_id", "event_type", "us", "event_id")
      .select(col("src"), col("dst"), col("n"),
        round(col("p"), 4).as("p"))
      .orderBy("src", "dst")

  /** q126 time-decayed aggregate: each user's activity score as of
    * their LAST event, every prior event's value discounted by a
    * one-day half-life (weight 2^(-Δ/1d), Δ in integer micros). The
    * recency-weighted statistic a freshness-aware ranking pipeline
    * keeps per entity ([[graft.operators.Temporal.decayedSum]]) — and
    * unlike a recursive EWMA it is a plain one-pass aggregate: the
    * max(us) window and the groupBy ride the SAME user_id exchange,
    * zero joins. */
  def q126(s: SparkSession, d: String): DataFrame =
    Temporal.decayedSum(
        events(s, d).select(col("user_id"), col("value"),
          unix_micros(col("ts").cast("timestamp")).as("us")),
        "user_id", "us", "value", halfLifeUs = 86400000000L)
      .select(col("user_id"), col("n_events"),
        round(col("decayed"), 4).as("decayed"))
      .orderBy("user_id")

  /** q122 funnel conversion: per signup-cohort day, how many users
    * reached a purchase within 7 days of their FIRST signup. The
    * sequence-detection read (strictly ordered steps with a horizon)
    * that q80's presence-based retention cannot express.
    *
    * Shape: ONE signup aggregate (not a reused frame, which Spark would
    * scan+aggregate twice), a single user-key equi-join to purchases
    * with the horizon folded into a per-user `max(when(...))` — the
    * user-level aggregate reuses the join's user_id partitioning, so
    * the per-user conv flag costs no new exchange — then a group-sized
    * cohort rollup. The conversion window is integer microseconds. */
  def q122(s: SparkSession, d: String): DataFrame = {
    val e = events(s, d)
      .select(col("user_id"), col("event_type"),
        unix_micros(col("ts").cast("timestamp")).as("us"))
    val signups = e.filter(col("event_type") === "signup")
      .groupBy(col("user_id")).agg(min(col("us")).as("s_us"))
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("us").as("p_us"))
    val horizon = 7L * 24 * 3600 * 1000000L
    signups.join(purchases, Seq("user_id"), "left")
      .groupBy(col("user_id"), col("s_us"))
      .agg(max(when(col("p_us") >= col("s_us") &&
        col("p_us") <= col("s_us") + horizon, 1L).otherwise(0L))
        .as("conv"))
      .select(
        to_date(timestamp_micros(col("s_us"))).cast("timestamp")
          .as("cohort_day"),
        col("conv"))
      .groupBy(col("cohort_day"))
      .agg(count(lit(1)).as("n_signups"), sum(col("conv")).as("n_converted"))
      .withColumn("rate",
        round(col("n_converted").cast("double") / col("n_signups"), 4))
      .orderBy("cohort_day")
  }

  /** q147 LEFT as-of join (round 9): q61's attribution primitive with
    * KEEP-unmatched semantics — clicks with no view at-or-before them
    * survive with null view columns (the unattributed-traffic read an
    * attribution report needs alongside the matched rows; inner as-of
    * silently drops exactly the cohort being measured). Same union+
    * window plan, same single user_id exchange — the left form only
    * skips the final null filter; vs DuckDB's native ASOF LEFT JOIN. */
  def q147(s: SparkSession, d: String): DataFrame = {
    val e = events(s, d)
    val views = e.filter(col("event_type") === "view")
      .groupBy(col("user_id"), col("ts"))
      .agg(max(col("event_id")).as("view_id"))
    val clicks = e.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("event_id").as("click_id"))
    Temporal.asofJoin(clicks, views, "user_id", "ts",
        keepUnmatched = true)
      .select(col("click_id"), col("user_id"),
        col("ts").as("click_ts"), col("r_ts").as("view_ts"),
        col("r_view_id").as("view_id"))
      .orderBy("click_id")
  }

  /** q148 per-key daily gap-fill with last-observation-carried-forward:
    * each user's day range becomes a continuous spine (q87's sequence
    * explode, but PER KEY), missing days surface as explicit rows
    * carrying the last observed daily total — the feature-store
    * "as-of-day snapshot" primitive (q87 fills a global spine with
    * zeros; LOCF fill is state propagation, not absence marking).
    *
    * Value math is integer micros (q121's rule): per-event
    * floor(value·1e6) summed as BIGINT, so the carried totals are
    * engine-exact. Plan: ONE user_id exchange serves the daily
    * pre-aggregate, the per-user min/max bounds, AND the LOCF window
    * (all partition by user); the spine explode is narrow. Spine rows ∝
    * users×days — the join back to daily totals is group-sized, and no
    * global-order operator appears anywhere.
    *
    * The LOCF itself is `last(ignoreNulls)` over rows unbounded
    * preceding — never a self-join; the oracle expresses the identical
    * semantics via the portable count-partition trick (count(v) OVER
    * names the carry group, max(v) OVER the group extracts the one
    * non-null), because `IGNORE NULLS` has no dialect-shared spelling. */
  def q148(s: SparkSession, d: String): DataFrame = {
    val e = events(s, d).select(col("user_id"),
      to_date(col("ts")).as("day"),
      floor(col("value") * 1000000).cast("long").as("vm"))
    val daily = e.groupBy(col("user_id"), col("day"))
      .agg(sum(col("vm")).as("v"))
    val spine = e.groupBy(col("user_id"))
      .agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
      .select(col("user_id"),
        explode(expr("sequence(d0, d1, interval 1 day)")).as("day"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spine.join(daily, Seq("user_id", "day"), "left")
      .select(col("user_id"), col("day").cast("timestamp").as("day"),
        last(col("v"), ignoreNulls = true).over(w).as("v_filled"),
        when(col("v").isNull, 1L).otherwise(0L).as("is_gap"))
      .orderBy("user_id", "day")
  }

  /** q156 population-stability-index drift audit (round 11): per
    * event_type, the PSI between the first and second half of the
    * stream (split at the event_id midpoint — deterministic and
    * engine-portable, and event ids are assigned in arrival order)
    * over 10 equal-width value bins spanning the GLOBAL value range.
    * PSI = Σ_bins (p_a − p_b)·ln(p_a/p_b) — the standard
    * train-vs-serve / snapshot-vs-snapshot distribution-shift gate a
    * feature pipeline runs before shipping (rule of thumb: <0.1 calm,
    * >0.25 drifted). Bin shares are add-half smoothed
    * ((c+0.5)/(n+5)) so an empty bin on one side stays finite.
    *
    * Scale shape: ONE pass builds (type, bin) half-counts — the split
    * flag and the bin index are narrow expressions against two
    * broadcast 1-row frames (global max id, global value range), the
    * count aggregate partial-aggregates to ≤ types×bins×partitions
    * rows, and everything after operates on ≤ types×10 rows. Nothing
    * doc-sized ever shuffles; no window anywhere. */
  def q156(s: SparkSession, d: String): DataFrame = {
    val ev = events(s, d).select(col("event_id"), col("event_type"),
      col("value"))
    val st = ev.agg(max(col("event_id")).as("mx"),
      min(col("value")).as("lo"), max(col("value")).as("hi"))
    val binned = ev.crossJoin(broadcast(st))
      .select(col("event_type"),
        when(col("event_id") < (col("mx") + 1) / lit(2.0), lit(0))
          .otherwise(lit(1)).as("h"),
        least(floor((col("value") - col("lo")) /
            ((col("hi") - col("lo")) / lit(10.0))), lit(9L))
          .cast("long").as("bin"))
    val c = binned.groupBy(col("event_type"), col("bin"))
      .agg(sum(when(col("h") === 0, 1L).otherwise(0L)).as("c0"),
        sum(when(col("h") === 1, 1L).otherwise(0L)).as("c1"))
    val n = c.groupBy(col("event_type"))
      .agg(sum(col("c0")).as("n0"), sum(col("c1")).as("n1"))
    val pa = (col("c0") + lit(0.5)) / (col("n0") + lit(5.0))
    val pb = (col("c1") + lit(0.5)) / (col("n1") + lit(5.0))
    c.join(broadcast(n), "event_type")
      .select(col("event_type"), ((pa - pb) * log(pa / pb)).as("term"))
      .groupBy(col("event_type"))
      .agg(round(sum(col("term")), 4).as("psi"))
      .orderBy("event_type")
  }

  /** q163 purged temporal split audit (round 11): the time-series CV
    * layout — train on the first 60% of the stream, EMBARGO the next
    * 10% (the "purge gap" that keeps look-ahead features from leaking
    * across the boundary), test on the last 30% — split at fractions
    * of the max event_id (arrival order; scale-invariant, portable).
    * Per event_type it reports the three segment sizes plus
    * `n_leaked_users`: users active in BOTH train and test — the
    * entity-level leakage a purely temporal split cannot remove (the
    * signal that a user-grouped split, q150's discipline, is needed
    * on top).
    *
    * One pass tags each row's segment against a broadcast 1-row max;
    * segment counts partial-aggregate; the leak census is a
    * (type, user)-DISTINCT aggregate joined to itself on the type+user
    * key — user-cardinality-bounded, never row×row. */
  def q163(s: SparkSession, d: String): DataFrame = {
    val ev = events(s, d).select(col("event_id"), col("event_type"),
      col("user_id"))
    val mx = ev.agg(max(col("event_id")).as("mx"))
    val seg = ev.crossJoin(broadcast(mx))
      .select(col("event_type"), col("user_id"),
        when(col("event_id") < (col("mx") + 1) * lit(0.6), lit("train"))
          .when(col("event_id") < (col("mx") + 1) * lit(0.7), lit("gap"))
          .otherwise(lit("test")).as("seg"))
    val counts = seg.groupBy(col("event_type"))
      .agg(sum(when(col("seg") === "train", 1L).otherwise(0L)).as("n_train"),
        sum(when(col("seg") === "gap", 1L).otherwise(0L)).as("n_gap"),
        sum(when(col("seg") === "test", 1L).otherwise(0L)).as("n_test"))
    val users = seg.filter(col("seg") =!= "gap")
      .select(col("event_type"), col("user_id"), col("seg")).distinct()
    val leaked = users.filter(col("seg") === "train")
      .select(col("event_type"), col("user_id"))
      .join(users.filter(col("seg") === "test")
        .select(col("event_type"), col("user_id")),
        Seq("event_type", "user_id"), "left_semi")
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_leaked_users"))
    counts.join(leaked, Seq("event_type"), "left")
      .select(col("event_type"), col("n_train"), col("n_gap"),
        col("n_test"),
        coalesce(col("n_leaked_users"), lit(0L)).as("n_leaked_users"))
      .orderBy("event_type")
  }

  /** q166 quantile normalization (round 11): map each event_type's
    * value distribution onto the GLOBAL distribution — every row's
    * normalized value is the global quantile at that row's within-type
    * percent rank (quantile_cont interpolation between the two
    * bracketing positions of the sorted global multiset). The
    * distribution-alignment primitive (genomics' quantile
    * normalization, feature preprocessing's rank-gauss cousin): after
    * it, every type's marginal distribution IS the global one, so
    * per-type scale/shape artifacts can't leak into downstream
    * thresholds.
    *
    * Scale shape: the global sorted positions come from
    * [[graft.operators.Ranking.exactRowNumber]] (range partition +
    * metadata rebase — never a SinglePartition window; ties on value
    * are positionally interchangeable, equal values interpolate to
    * themselves); the two bracket lookups are position-keyed
    * equi-joins (data-proportional shuffles, no broadcast of the
    * row-scale frame); the within-type percent_rank is
    * [[graft.operators.Ranking.exactPercentRankByGroup]] (round 12 —
    * the r11 verdict's one weak mark: a per-event_type window over the
    * row-scale table sorted ~1/|types| of ALL events in one task; the
    * grouped operator collapses to tie classes, running-counts them
    * with a range partition + metadata rebase, and joins back — every
    * stage parallel, bit-identical rank arithmetic).
    * Interpolation is q64's: pos = r·(N−1), v = g_lo + (pos−lo)·
    * (g_hi−g_lo), identical IEEE ops both engines; output rounds at 4
    * and orders by event_id. */
  def q166(s: SparkSession, d: String): DataFrame = {
    val ev = events(s, d).select(col("event_id"), col("event_type"),
      col("value"))
    // ONE range pass yields the global sorted positions AND the exact
    // within-type percent_rank (fused operator — two separate calls
    // would checkpoint and range-exchange the same frame twice)
    val (ranked, n) = graft.operators.Ranking
      .exactGlobalRowAndGroupPercentRank(ev, "value", "event_type",
        rnCol = "rk", prCol = "pr")
    val g = ranked
      .select((col("rk") - 1).cast("long").as("i"),
        col("value").as("gv"))
    val pos = ranked
      .withColumn("pos", col("pr") * lit(n - 1L))
      .withColumn("lo", floor(col("pos")).cast("long"))
      .withColumn("hi", ceil(col("pos")).cast("long"))
    pos
      .join(g.select(col("i").as("lo"), col("gv").as("glo")), "lo")
      .join(g.select(col("i").as("hi"), col("gv").as("ghi")), "hi")
      // FLOOR-truncated, not round(): interpolants between few-decimal
      // inputs land on exact .xxxx5 boundaries, where Spark's decimal
      // HALF_UP and the oracle's float round disagree (q136's rule)
      .select(col("event_id"), col("event_type"), col("value"),
        (floor((col("glo") + (col("pos") - col("lo")) *
          (col("ghi") - col("glo"))) * 10000) / 10000).as("value_norm"))
      .orderBy("event_id")
  }

  /** q174 per-type activity-concentration Gini: within each event
    * type, the Gini coefficient of events-per-user — 0 means uniform
    * engagement, →1 means a few power users generate everything; the
    * concentration audit behind user-level dedup and leakage budgets
    * (a skewed type means user-disjoint splits move large event mass).
    *
    * Gini over sorted per-user counts x₁≤…≤xₙ is (2·Σi·xᵢ −
    * (n+1)·Σxᵢ) / (n·Σxᵢ) — non-negative by the sort, exact integer
    * arithmetic until one scaled floor division (q136's rule).
    *
    * Plan: per-(type, user) counts partial-aggregate the event stream
    * (the only row-scale exchange); the ranking window partitions by
    * type over the USER-cardinality-bounded frame (q163's accepted
    * census shape — |users| rows per type, not |events|); the rollup
    * is |types| rows. */
  def q174(s: SparkSession, d: String): DataFrame = {
    val ua = events(s, d).groupBy(col("event_type"), col("user_id"))
      .agg(count(lit(1)).as("x"))
    val wS = Window.partitionBy(col("event_type"))
      .orderBy(col("x").asc, col("user_id").asc)
    ua.withColumn("i", row_number().over(wS))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_users"), sum(col("x")).as("n_events"),
        sum(col("x") * col("i")).as("sxi"))
      .select(col("event_type"), col("n_users"), col("n_events"),
        (floor((lit(2) * col("sxi") - (col("n_users") + 1) *
          col("n_events")) * 10000.0 /
          (col("n_users") * col("n_events"))) / 10000.0).as("gini"))
      .orderBy("event_type")
  }

  /** q176 hour-of-day activity profile: events per (type, UTC hour)
    * with each cell's share of its type — the diurnal-shape audit
    * behind ingestion scheduling and drift baselines (a type whose
    * hourly profile shifts is q156's PSI alarm waiting to fire).
    * Plan: ONE |types×24|-bounded count aggregate; shares divide by a
    * |types|-row re-aggregate (AQE-sized join). Integer ratio →
    * scaled floor division (q136's rule). */
  def q176(s: SparkSession, d: String): DataFrame = {
    val hc = events(s, d)
      .select(col("event_type"), hour(col("ts")).cast("long").as("hh"))
      .groupBy(col("event_type"), col("hh")).agg(count(lit(1)).as("n"))
    val tot = hc.groupBy(col("event_type")).agg(sum(col("n")).as("tot"))
    hc.join(tot, "event_type")
      .select(col("event_type"), col("hh"), col("n"),
        (floor(col("n") * 10000.0 / col("tot")) / 10000.0).as("share"))
      .orderBy("event_type", "hh")
  }

  /** q177 Markov entropy rate of the event-transition process: per
    * source type the transition entropy H(src) = −Σ p·ln p over
    * next-event types (within each user's time-ordered stream), plus
    * the pooled rate Σ (n_src/N)·H(src) — how predictable the NEXT
    * action is; the sequence-compressibility audit complementing
    * q124's raw matrix and q158's character-level entropy rate.
    * Plan: q124's one user-key window + a 25-cell transition count;
    * every aggregate after that is |types|- or 1-row. round(4) on the
    * irrational entropy sums (q126's rule). */
  def q177(s: SparkSession, d: String): DataFrame = {
    val e = events(s, d).select(col("user_id"), col("event_id"),
      col("event_type").as("src"),
      unix_micros(col("ts").cast("timestamp")).as("us"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("us").asc, col("event_id").asc)
    val c = e.withColumn("dst", lead(col("src"), 1).over(w))
      .filter(col("dst").isNotNull)
      .groupBy(col("src"), col("dst")).agg(count(lit(1)).as("n"))
    // p per cell first (a window over the 25-cell matrix — metadata),
    // THEN the entropy aggregate: a window inside an aggregate is
    // illegal SQL in both engines
    val cp = c
      .withColumn("tot", sum(col("n")).over(
        Window.partitionBy(col("src"))))
      .withColumn("p", col("n") / col("tot"))
    val bySrc = cp.groupBy(col("src"))
      .agg(max(col("tot")).as("n_out"),
        (-sum(col("p") * log(col("p")))).as("h"))
    // The pooled rate rides whole-frame windows over the |types|-row
    // bySrc frame (metadata-sized — a SinglePartition window here is
    // five rows, not row-scale) so bySrc has ONE lineage reference:
    // the crossJoin(agg(bySrc)) form referenced bySrc twice, and when
    // the optimizer does not plant a ReusedExchange the row-scale
    // user-key window underneath runs twice for a 25-cell output.
    val wAll = Window.partitionBy()
    bySrc
      .withColumn("nn", sum(col("n_out")).over(wAll))
      .withColumn("rate",
        sum(col("h") * col("n_out") / col("nn")).over(wAll))
      .select(col("src"), col("n_out"), round(col("h"), 4).as("entropy"),
        round(col("rate"), 4).as("entropy_rate"))
      .orderBy("src")
  }

  /** q179 within-user lag-1 value autocorrelation, pooled per type of
    * the CURRENT event: Pearson r between each event's value and the
    * same user's immediately previous value — the temporal-dependence
    * audit behind i.i.d.-sampling assumptions (a high r means
    * event-level shuffling is NOT equivalent to user-level sampling).
    * Plan: one user-key window (lag), then a |types|-row moment
    * aggregate (n, Σx, Σy, Σxy, Σx², Σy²) — the closed-form Pearson
    * assembled from partial-aggregable sums; round(4) absorbs the
    * partial-sum reassociation (q126's rule). */
  def q179(s: SparkSession, d: String): DataFrame = {
    val e = events(s, d).select(col("user_id"), col("event_id"),
      col("event_type"), col("value"),
      unix_micros(col("ts").cast("timestamp")).as("us"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("us").asc, col("event_id").asc)
    e.withColumn("prev", lag(col("value"), 1).over(w))
      .filter(col("prev").isNotNull)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_pairs"), sum(col("value")).as("sx"),
        sum(col("prev")).as("sy"), sum(col("value") * col("prev")).as("sxy"),
        sum(col("value") * col("value")).as("sxx"),
        sum(col("prev") * col("prev")).as("syy"))
      .select(col("event_type"), col("n_pairs"),
        (round((col("n_pairs") * col("sxy") - col("sx") * col("sy")) /
          sqrt((col("n_pairs") * col("sxx") - col("sx") * col("sx")) *
            (col("n_pairs") * col("syy") - col("sy") * col("sy"))), 4)
          + lit(0.0)).as("lag1_corr"))
      .orderBy("event_type")
  }

  /** q180 exact two-sample Kolmogorov–Smirnov statistic between the
    * click and view value distributions: D = max |F₁(v) − F₂(v)| —
    * THE nonparametric distribution-shift test (q156's PSI needs a
    * binning choice; KS does not). Engine-portable and overflow-free:
    * per DISTINCT value the two group counts, cumulated in value
    * order (exact longs), then the sup over |cum₁/n₁ − cum₂/n₂| —
    * each division ONE correctly-rounded IEEE op on exact longs,
    * identical across engines at any scale (the exact-long cross
    * product cum₁·n₂ would wrap 2^63 past ~3.0e9 rows per group).
    *
    * Plan: the only row-scale exchange is the per-value conditional
    * count (partial-aggregated); the cumulative sums ride
    * [[graft.operators.Ranking.runningAgg]] over the DISTINCT-value
    * frame (range partition + metadata rebase — never a
    * SinglePartition window, and the distinct frame grows with data);
    * the sup is a 1-row aggregate. */
  def q180(s: SparkSession, d: String): DataFrame = {
    val cnt = events(s, d)
      .filter(col("event_type").isin("click", "view"))
      .groupBy(col("value"))
      .agg(sum(when(col("event_type") === "click", 1L).otherwise(0L))
          .as("c1"),
        sum(when(col("event_type") === "view", 1L).otherwise(0L))
          .as("c2"))
    val r = graft.operators.Ranking.runningAggMulti(cnt, Seq("value"),
      Seq(("c1", "sum", "cum1"), ("c2", "sum", "cum2")))
    val tot = cnt.agg(sum(col("c1")).as("n1"), sum(col("c2")).as("n2"))
    // Per-value |F1 - F2| in DOUBLE: cum/n is ONE correctly-rounded
    // IEEE op on exact longs — identical in both engines — and carries
    // no overflow (the previous exact-long cross products cum1·n2
    // wrapped 2^63 once each group passed ~3.0e9 rows: Spark wraps
    // silently, DuckDB errors, so the engines diverged exactly at the
    // scales this engine targets). Beyond 2^53 rows the long→double
    // conversion rounds, but IEEE-identically on both faces — accuracy
    // degrades in the last ulp, portability does not.
    r.crossJoin(broadcast(tot))
      .select(col("n1"), col("n2"),
        abs(col("cum1") / col("n1") - col("cum2") / col("n2")).as("dv"))
      .groupBy(col("n1"), col("n2"))
      .agg(max(col("dv")).as("dmax"))
      .select(col("n1"), col("n2"),
        (floor(col("dmax") * 10000.0) / 10000.0).as("ks_d"))
  }

  /** q188 exact Mann-Whitney AUC between the click and view value
    * distributions (round 14; Mann & Whitney 1947, and Hanley &
    * McNeil 1982's AUC equivalence: AUC = P(X₁ > X₂) + ½P(X₁ = X₂) —
    * the stochastic-dominance companion to q180's KS distance: KS says
    * WHETHER the distributions differ, AUC says which one sits
    * higher).
    *
    * Same scale-safe frame as q180: per distinct VALUE conditional
    * counts (value-domain-bounded — proven FLAT at ×30 data by the KS
    * probe), one cumulative range pass
    * ([[graft.operators.Ranking.runningAggMulti]]), then
    * AUC = Σ_v (c₁(v)/n₁) · ((cum₂(v)−c₂(v))/n₂ + c₂(v)/(2·n₂)) —
    * the pair count ⟨click at v, view below v⟩ plus half the ties,
    * divided per SIDE as in q180's overflow-free rewrite: every
    * numerator stays an exact long, each division is one
    * correctly-rounded IEEE op, and no n₁·n₂ or rank-sum product is
    * ever materialized (the classical U = R₁ − n₁(n₁+1)/2 form loses
    * to catastrophic cancellation past ~2⁵³ pair counts and overflows
    * 2⁶³ at ~3e9 rows/group — exactly the scales this engine
    * targets). Sum of products of rationals → §2.9 round-4; AUC is
    * non-negative but rides `+ 0.0` uniformly with the rest of the
    * statistical family. */
  def q188(s: SparkSession, d: String): DataFrame = {
    val cnt = events(s, d)
      .filter(col("event_type").isin("click", "view"))
      .groupBy(col("value"))
      .agg(sum(when(col("event_type") === "click", 1L).otherwise(0L))
          .as("c1"),
        sum(when(col("event_type") === "view", 1L).otherwise(0L))
          .as("c2"))
    val r = graft.operators.Ranking.runningAggMulti(cnt, Seq("value"),
      Seq(("c1", "sum", "cum1"), ("c2", "sum", "cum2")))
    val tot = cnt.agg(sum(col("c1")).as("n1"), sum(col("c2")).as("n2"))
    r.crossJoin(broadcast(tot))
      .select(col("n1"), col("n2"),
        ((col("c1") / col("n1")) *
          ((col("cum2") - col("c2")) / col("n2") +
            col("c2") / (lit(2.0) * col("n2")))).as("term"))
      .groupBy(col("n1"), col("n2"))
      .agg(sum(col("term")).as("s"))
      .select(col("n1"), col("n2"),
        (round(col("s"), 4) + 0.0).as("auc"))
  }

  /** q192 exact tie-corrected Spearman rank correlation per event type
    * (round 14; Spearman 1904 with the standard ties treatment:
    * average ranks, then Pearson over the ranks): value vs hour-of-day
    * — the nonparametric "does intensity follow the clock" monotone-
    * association audit that q179's Pearson autocorrelation can't give
    * (it sees only linear association on raw values; Spearman is
    * invariant to any monotone transform and robust to the heavy
    * value-distribution tails).
    *
    * With massive ties (24 hour values!) the naive 1−6Σd²/(n(n²−1))
    * textbook form is simply WRONG — average ranks + Pearson is the
    * exact estimator. Average rank within type for a value v is
    * `cum(v) − c(v) + (c(v)+1)/2` over the per-type cumulative counts.
    *
    * Scale shape: value ranks ride q180's distinct-value discipline —
    * per-(type, value) counts, ONE global [[graft.operators.Ranking
    * .runningAggMulti]] pass ordered (type, value), rebased per type by
    * a |types|-row triangular offset join (never a per-enum window over
    * an unbounded value domain); hour ranks ride a |types|×24 metadata
    * window (q177's precedent). Rank tables join back to the row
    * stream unhinted (value-domain-bounded → AQE broadcasts), and the
    * finale is ONE group aggregate of six sums. Every rank is a half-
    * integer and every sum stays an exact quarter-integer below 2⁵³,
    * so the closed form is one deterministic IEEE evaluation per side
    * (q180's discipline); round-4 `+ 0.0` on the cancellable ratio. */
  def q192(s: SparkSession, d: String): DataFrame = {
    val ev = events(s, d).select(col("event_type"), col("value"),
      hour(col("ts")).cast("long").as("hh"))
    val cv = ev.groupBy(col("event_type"), col("value"))
      .agg(count(lit(1)).as("cv"))
    val cumv = graft.operators.Ranking.runningAggMulti(cv,
      Seq("event_type", "value"), Seq(("cv", "sum", "cumv")))
    val nt = cv.groupBy(col("event_type")).agg(sum(col("cv")).as("n"))
    val off = nt
      .join(nt.select(col("event_type").as("et_b"), col("n").as("n_b")),
        col("et_b") < col("event_type"), "left_outer")
      .groupBy(col("event_type"))
      .agg(coalesce(sum(col("n_b")), lit(0L)).as("off"))
    val rankV = cumv.join(broadcast(off), "event_type")
      .select(col("event_type"), col("value"),
        (col("cumv") - col("off") - col("cv") +
          (col("cv") + lit(1L)) / lit(2.0)).as("rx"))
    val ch = ev.groupBy(col("event_type"), col("hh"))
      .agg(count(lit(1)).as("ch"))
    val wh = Window.partitionBy("event_type").orderBy("hh")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val rankH = ch
      .select(col("event_type"), col("hh"), col("ch"),
        sum(col("ch")).over(wh).as("cumh"))
      .select(col("event_type"), col("hh"),
        (col("cumh") - col("ch") +
          (col("ch") + lit(1L)) / lit(2.0)).as("ry"))
    ev.join(rankV, Seq("event_type", "value"))
      .join(rankH, Seq("event_type", "hh"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("rx")).as("sx"), sum(col("ry")).as("sy"),
        sum(col("rx") * col("rx")).as("sxx"),
        sum(col("ry") * col("ry")).as("syy"),
        sum(col("rx") * col("ry")).as("sxy"))
      .select(col("event_type"), col("n_events"),
        (round(
          (col("n_events") * col("sxy") - col("sx") * col("sy")) /
            sqrt((col("n_events") * col("sxx") - col("sx") * col("sx")) *
              (col("n_events") * col("syy") - col("sy") * col("sy")))
          , 4) + 0.0).as("rho"))
      .orderBy("event_type")
  }

  /** q195 exact Kendall τ-b, value vs hour-of-day (round 14; Kendall
    * 1938 with the τ-b ties normalization) — q192's Spearman ranks
    * whole distributions; τ-b counts concordant-vs-discordant PAIRS,
    * the other canonical nonparametric association. The textbook
    * algorithm is an O(n log n) merge-count over n events — a
    * SINGLE-NODE shape. Here the n² pair space collapses onto the
    * bounded (value, hour) CELL GRID: for every cell, the count of
    * events strictly below-left (concordant side) and below-right
    * (discordant side) comes from 24 exclusive column prefixes in ONE
    * [[graft.operators.Ranking.runningAggMulti]] pass over the
    * |values|-row wide frame (hour has 24 values, so "wide" is 24 LONG
    * columns — no per-enum window, no pair join, no LOCF as-of).
    *
    * Overflow-free (q180/q188's discipline): the classical
    * C, D, n₀ = n(n−1)/2 counts wrap 2⁶³ past ~4e9 events, so nothing
    * here materializes a pair COUNT — every per-cell term is
    * (n_vh/n)·((LT−GT)/(n−1)), one correctly-rounded division per
    * side, and the ties corrections enter as the ratios
    * n₁/n₀ = Σ (n_v/n)·((n_v−1)/(n−1)) per side:
    * τ-b = 2·Σ_cells (n_vh/n)·((LT−GT)/(n−1)) /
    *       √((1 − n₁/n₀)(1 − n₂/n₀)).
    * LT/GT themselves are event counts ≤ n — exact longs at any scale.
    * Sum of rounded rationals → round-4 `+ 0.0` (cancellable). */
  def q195(s: SparkSession, d: String): DataFrame = {
    val ev = events(s, d).select(col("value"),
      hour(col("ts")).cast("int").as("hh"))
    // cell frame checkpoint-pinned (q187's lesson): it feeds the wide
    // prefix frame AND the per-cell join AND both ties/total scalars —
    // without the pin each consumer re-aggregates the event scan
    val cells = ev.groupBy(col("value"), col("hh"))
      .agg(count(lit(1)).as("n"))
      .localCheckpoint(false) // lazy pin (r19): all 5 consumers full-scan
    // wide |values|-row frame: one LONG column of per-value counts per
    // hour (absent cells are 0 so the prefix sums see the full grid)
    val hourCounts = (0 until 24).map(h =>
      sum(when(col("hh") === h, col("n")).otherwise(0L)).as(s"c$h"))
    val wide = cells.groupBy(col("value"))
      .agg(hourCounts.head, hourCounts.tail: _*)
    // 24 EXCLUSIVE running sums in one range pass: r$h(v) = events with
    // value' < v in hour column h
    val pref = graft.operators.Ranking.runningAggMulti(wide, Seq("value"),
      (0 until 24).map(h => (s"c$h", "sum", s"r$h")), inclusive = false)
    // per cell: LT = events below-left, GT = events below-right
    // the exclusive frame of the first value row is SQL-NULL → 0 here
    val lt = (0 until 24).map(h =>
      when(col("hh") > h, coalesce(col(s"r$h"), lit(0L)))
        .otherwise(0L)).reduce(_ + _)
    val gt = (0 until 24).map(h =>
      when(col("hh") < h, coalesce(col(s"r$h"), lit(0L)))
        .otherwise(0L)).reduce(_ + _)
    // totals and ties all fold from the pinned cell frame — the event
    // table is scanned exactly once
    val tot = cells.agg(sum(col("n")).as("ntot"))
    val num = cells.join(pref, "value").crossJoin(broadcast(tot))
      .select(((col("n") / col("ntot")) *
        ((lt - gt) / (col("ntot") - lit(1L)))).as("term"))
      .agg(sum(col("term")).as("num"))
    // ties ratios, one division per factor (never n_v(n_v-1)/2 longs)
    def tieRatio(key: Column, out: String) =
      cells.groupBy(key.as("k")).agg(sum(col("n")).as("nk"))
        .crossJoin(broadcast(tot))
        .agg(sum((col("nk") / col("ntot")) *
          ((col("nk") - lit(1L)) / (col("ntot") - lit(1L)))).as(out))
    val t1 = tieRatio(col("value"), "n1r")
    val t2 = tieRatio(col("hh"), "n2r")
    tot.crossJoin(broadcast(num))
      .crossJoin(broadcast(t1)).crossJoin(broadcast(t2))
      .select(col("ntot").as("n_events"),
        (round(lit(2.0) * col("num") /
          sqrt((lit(1.0) - col("n1r")) * (lit(1.0) - col("n2r"))), 4)
          + 0.0).as("tau_b"))
  }

  /** q196 one-way ANOVA across event types (round 14; Fisher 1925):
    * does mean `value` differ by type? — the PARAMETRIC mean-shift
    * companion to the nonparametric family (KS q180 = whole
    * distribution, AUC q188 = stochastic dominance, Spearman q192 /
    * τ-b q195 = monotone association, MI q181 / χ² q132 = categorical
    * dependence). Reports F, both degrees of freedom, and η² (the
    * between-groups variance share — the effect size reviewers ask for
    * next to any significant F).
    *
    * Scale shape: ONE partial-aggregable pass — per-type (n, Σv, Σv²)
    * — then |types|-row closed forms: SSB = Σ nᵢ(x̄ᵢ − x̄)² folds from
    * the moments as Σ (Sᵢ²/nᵢ) − S²/n, SSW = Σvᵢ² − Σ Sᵢ²/nᵢ. Double
    * moment sums follow q77/q130's round-4 tolerance. */
  def q196(s: SparkSession, d: String): DataFrame = {
    val m = events(s, d).groupBy(col("event_type"))
      .agg(count(lit(1)).as("nk"), sum(col("value")).as("sk"),
        sum(col("value") * col("value")).as("qk"))
    val g = m.agg(sum(col("nk")).as("n"), sum(col("sk")).as("s"),
      sum(col("qk")).as("q"), count(lit(1)).as("k"),
      sum(col("sk") * col("sk") / col("nk")).as("a"))
    g.select(col("n").as("n_events"), col("k").as("n_groups"),
        (col("a") - col("s") * col("s") / col("n")).as("ssb"),
        (col("q") - col("a")).as("ssw"),
        (col("q") - col("s") * col("s") / col("n")).as("sst"),
        (col("k") - lit(1L)).as("df1"), (col("n") - col("k")).as("df2"))
      .select(col("n_events"), col("df1"), col("df2"),
        (round((col("ssb") / col("df1")) / (col("ssw") / col("df2")), 4)
          + 0.0).as("f_stat"),
        (round(col("ssb") / col("sst"), 4) + 0.0).as("eta_sq"))
  }

  /** q206 exact higher distribution moments per event type (round 15):
    * population skewness g₁ = m₃/m₂^1.5 and excess kurtosis
    * g₂ = m₄/m₂² − 3 from ONE partial-aggregable raw-power-sum pass
    * (Σv..Σv⁴), central moments by the standard closed forms — the
    * tail-shape audit that completes the moment family (q77/q130 stop
    * at variance; the nonparametric battery q180–q196 never looks at
    * moments above 2). The value census a mixture designer reads to
    * know whether a source's value distribution is heavy-tailed before
    * trusting z-scores on it. |types|-row frame; identical double-op
    * parenthesization on both faces (§2.9), round-4 `+ 0.0` on every
    * cancellable output. */
  def q206(s: SparkSession, d: String): DataFrame = {
    val v = col("value")
    val m = events(s, d).groupBy(col("event_type"))
      .agg(count(lit(1)).as("nk"), sum(v).as("s1"),
        sum(v * v).as("s2"), sum(v * v * v).as("s3"),
        sum(v * v * v * v).as("s4"))
    m.select(col("event_type"), col("nk"),
        (col("s1") / col("nk")).as("mu"),
        col("s2"), col("s3"), col("s4"))
      .select(col("event_type"), col("nk"), col("mu"),
        (col("s2") / col("nk") - col("mu") * col("mu")).as("m2"),
        (col("s3") / col("nk") - lit(3) * col("mu") * (col("s2") / col("nk"))
          + lit(2) * col("mu") * col("mu") * col("mu")).as("m3"),
        (col("s4") / col("nk") - lit(4) * col("mu") * (col("s3") / col("nk"))
          + lit(6) * col("mu") * col("mu") * (col("s2") / col("nk"))
          - lit(3) * col("mu") * col("mu") * col("mu") * col("mu")).as("m4"))
      .select(col("event_type"), col("nk").as("n_events"),
        (round(col("mu"), 4) + 0.0).as("mean"),
        (round(sqrt(col("m2")), 4) + 0.0).as("sd"),
        (round(col("m3") / pow(col("m2"), 1.5), 4) + 0.0).as("skew"),
        (round(col("m4") / (col("m2") * col("m2")) - lit(3), 4) + 0.0)
          .as("kurt_excess"))
      .orderBy("event_type")
  }
}
