package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal join/grouping operators — the event-time analytics family
  * (as-of correlation, bounded-interval pairing, sessionization) that
  * the reference delegates to its warehouse tier (ad-hoc SQL over
  * Athena/Redshift, reference `README.md:21`; the `created_utc` event
  * time it lands is the join key here, `etls/reddit_etl.py:74`). A
  * warehouse resolves these with ASOF/range joins and gaps-and-islands
  * SQL. Each is built to the shape that survives scale:
  *
  *  - **asofJoin**: the naive form is a per-left-row aggregating theta
  *    join (O(n·m) and a planner NLJ trap). This one is the union-scan
  *    form: tag both inputs, union, ONE shuffle on the key, and a
  *    running `last(_, ignoreNulls)` window carries the most recent
  *    right row forward to each left row. Cost: one exchange + one
  *    sorted pass, independent of time-range density.
  *  - **pairsWithin**: a bounded-interval self-join binned to
  *    `horizon`-sized buckets — candidates meet only inside (key,
  *    bucket) and (key, bucket+1), an equi-join; the exact |Δt| filter
  *    prunes the rest. Never a full theta join.
  *  - **sessionize**: gaps-and-islands with two windows over the SAME
  *    (key, ts) partitioning — Catalyst plans one exchange; session ids
  *    never cross keys, so the 100-TB failure mode (a global session
  *    sequence) can't occur.
  */
object Temporal {

  /** As-of join: for each `left` row, the single nearest `right` row on
    * the same `keyCol` — the most recent with `right.ts <= left.ts` when
    * `direction = "backward"` (default), or the earliest with
    * `right.ts >= left.ts` when `direction = "forward"`. Inner by
    * default (left rows with no matching right row drop — DuckDB ASOF
    * JOIN's default); `keepUnmatched = true` gives LEFT semantics:
    * unmatched left rows — including null-key/null-ts rows, which match
    * nothing — keep with null `r_*` columns, matching DuckDB's
    * `ASOF LEFT JOIN` row for row (q147's oracle). `right` must be
    * unique per (key, ts) — pre-aggregate if it isn't; ties between a
    * left and right row at the SAME ts match (right sorts first).
    *
    * Columns: left's columns plus `right`'s non-key/ts columns prefixed
    * `r_`, and `r_ts`. Both directions are the same union-scan shape —
    * forward only flips the window's time ordering, so the cost model
    * (one exchange + one sorted pass) is identical; the left form only
    * drops the final null filter and unions the (typically tiny)
    * null-key/ts residue back, so it prices the same. */
  def asofJoin(left: DataFrame, right: DataFrame,
               keyCol: String, tsCol: String,
               direction: String = "backward",
               keepUnmatched: Boolean = false): DataFrame = {
    require(direction == "backward" || direction == "forward",
      s"direction must be backward|forward, got $direction")
    val reserved = Seq("__side", "__r", "__last")
    require(!(left.columns ++ right.columns).exists(reserved.contains),
      s"asofJoin reserves column names ${reserved.mkString("/")}")
    require(!right.columns.filter(_ != tsCol).contains("ts") || tsCol == "ts",
      "right must not carry a column named 'ts' alongside a different " +
        s"tsCol ($tsCol): the payload struct would hold two 'ts' fields " +
        "and the field reference becomes ambiguous")
    val rCols = right.columns.filter(c => c != keyCol && c != tsCol)
    val lCols = left.columns
    // SQL equi-join semantics: NULL keys match nothing (the window
    // would otherwise group all null-key rows into one partition and
    // "match" them — rows DuckDB's ASOF JOIN never emits), and a null
    // timestamp compares unknown on both sides — inner-join drops them
    val left0 = left.filter(col(keyCol).isNotNull && col(tsCol).isNotNull)
    val right0 = right.filter(col(keyCol).isNotNull && col(tsCol).isNotNull)
    // tag & align schemas: right rows carry the payload struct, left null
    val payload = struct((col(tsCol).as("ts") +: rCols.map(col)): _*)
    val r = right0.select(
      (Seq(col(keyCol), col(tsCol), lit(0).as("__side"),
        payload.as("__r")) ++ lCols.filter(c => c != keyCol && c != tsCol)
          .map(c => lit(null).cast(left.schema(c).dataType).as(c))): _*)
    val l = left0.select(
      (Seq(col(keyCol), col(tsCol), lit(1).as("__side"),
        lit(null).cast(r.schema("__r").dataType).as("__r")) ++
        lCols.filter(c => c != keyCol && c != tsCol).map(col)): _*)
    // one shuffle on the key; __side=0 sorts first so same-ts rights
    // match in either direction (scanning backward = ts asc, forward =
    // ts desc; the running `last` then carries the nearest right row)
    val tsOrd = if (direction == "backward") col(tsCol).asc else col(tsCol).desc
    val w = Window.partitionBy(col(keyCol))
      .orderBy(tsOrd, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matchFilter =
      if (keepUnmatched) lit(true) else col("__last").isNotNull
    val joined = r.unionByName(l)
      .withColumn("__last", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1 && matchFilter)
      .select(
        (lCols.map(col) :+ col("__last.ts").as(s"r_$tsCol")) ++
          rCols.map(c => col(s"__last.$c").as(s"r_$c")): _*)
    if (!keepUnmatched) joined
    else {
      // null-key/null-ts left rows match nothing but survive the LEFT
      // form — they were pre-filtered from the window input (they would
      // otherwise pool into one null partition), so union them back
      // with a null payload
      val residue = left
        .filter(col(keyCol).isNull || col(tsCol).isNull)
        .select(
          (lCols.map(col) :+
            lit(null).cast(right.schema(tsCol).dataType)
              .as(s"r_$tsCol")) ++
            rCols.map(c => lit(null).cast(right.schema(c).dataType)
              .as(s"r_$c")): _*)
      joined.unionByName(residue)
    }
  }

  /** Ordered pairs of rows on the same key whose timestamps differ by at
    * most `horizonSec` (a < b on `idCol`, in EITHER time direction).
    * Binned: |Δt| ≤ horizon forces the two `horizonSec`-wide time
    * buckets to differ by at most 1, so the probe side registers under
    * its bucket ± 1 (a 3× narrow expansion) and candidates meet through
    * ONE equi-join on (key, bucket) — never an unbounded theta join.
    * Each qualifying pair meets exactly once (at the build row's unique
    * bucket). Output: key, a, b, both ts. */
  def pairsWithin(events: DataFrame, keyCol: String, idCol: String,
                  tsCol: String, horizonSec: Long): DataFrame = {
    require(horizonSec > 0, "horizonSec must be positive (pmod-by-zero " +
      "errors under ANSI; a zero horizon should filter exact-ts equality)")
    val hUs = horizonSec * 1000000L
    // integer microseconds: deterministic bucket + delta math (float
    // epoch arithmetic would disagree with the oracle at boundaries).
    // Bucketing must be FLOOR division — double-divide + cast("long")
    // truncates toward zero, so pre-1970 (negative-epoch) timestamps
    // would land adjacent events in non-adjacent buckets and silently
    // miss pairs. (x - pmod(x, h)) div h is exact integer floor division
    // for every epoch sign — and `div` (long math) stays exact where
    // the `/` operator's double cast would round above 2^53 (hostile/
    // corrupt far-future timestamps).
    val e = events.select(col(keyCol).as("k"), col(idCol).as("id"),
        col(tsCol).as("t"),
        unix_micros(col(tsCol).cast("timestamp")).as("__us"))
      .withColumn("b", expr(s"(__us - pmod(__us, ${hUs}L)) div ${hUs}L"))
      .drop("__us")
    val probe = e.select(col("k"), col("id").as("a"), col("t").as("ta"),
        explode(array(col("b") - 1, col("b"), col("b") + 1)).as("bp"))
    val build = e.toDF("k2", "b", "tb", "bb")
    val cand = probe.join(build,
      col("k") === col("k2") && col("bp") === col("bb") &&
        col("a") < col("b"))
    cand.filter(abs(unix_micros(col("tb").cast("timestamp")) -
        unix_micros(col("ta").cast("timestamp"))) <= hUs)
      .select(col("k").as(keyCol), col("a"), col("b"),
        col("ta").as(s"${tsCol}_a"), col("tb").as(s"${tsCol}_b"))
  }

  /** Batch sessionization (gaps-and-islands): consecutive events on a key
    * belong to one session while the gap stays ≤ `gapSec`; a larger gap
    * opens a new session. Output: key, session_start, session_end,
    * n_events. The batch twin of the streaming `session_window`. */
  def sessionize(events: DataFrame, keyCol: String, tsCol: String,
                 gapSec: Long): DataFrame = {
    val byKey = Window.partitionBy(col(keyCol)).orderBy(col(tsCol).asc)
    events
      .withColumn("__gap",
        unix_micros(col(tsCol).cast("timestamp")) -
          unix_micros(lag(col(tsCol), 1).over(byKey).cast("timestamp")))
      .withColumn("__new", when(col("__gap").isNull ||
        col("__gap") > gapSec * 1000000L, 1).otherwise(0))
      .withColumn("__sid", sum(col("__new")).over(
        byKey.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col(keyCol), col("__sid"))
      .agg(min(col(tsCol)).as("session_start"),
        max(col(tsCol)).as("session_end"),
        count(lit(1)).as("n_events"))
      .drop("__sid")
  }

  /** Time-weighted average per key over an irregularly-sampled stream:
    * each value weighted by its holding period — the integer-microsecond
    * gap to the key's NEXT observation (`tieCol` breaks equal-timestamp
    * ordering; the final open-ended observation carries no weight). Keys
    * whose observations all share one timestamp have zero total weight
    * and drop. One exchange: the lead() window and the aggregate share
    * the key partitioning. Output: key, n_intervals, tw (total weight,
    * micros), vw (value·weight sum), twap — unrounded. */
  def twap(events: DataFrame, keyCol: String, tsUsCol: String,
           valueCol: String, tieCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsUsCol).asc, col(tieCol).asc)
    events
      .withColumn("__w", lead(col(tsUsCol), 1).over(w) - col(tsUsCol))
      .filter(col("__w").isNotNull)
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_intervals"), sum(col("__w")).as("tw"),
        sum(col(valueCol) * col("__w")).as("vw"))
      .filter(col("tw") > 0)
      .withColumn("twap", col("vw") / col("tw"))
  }

  /** First-order Markov transition matrix: P(next `typeCol` | current)
    * over each key's time-ordered stream. The lead() window rides one
    * key exchange; the (src, dst) counts and the per-src normalizing
    * window are |types|²-sized — metadata for any sane type domain.
    * Output: src, dst, n, p — unrounded. */
  def transitionMatrix(events: DataFrame, keyCol: String,
                       typeCol: String, tsUsCol: String,
                       tieCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsUsCol).asc, col(tieCol).asc)
    events
      .select(col(keyCol), col(tsUsCol), col(tieCol),
        col(typeCol).as("src"))
      .withColumn("dst", lead(col("src"), 1).over(w))
      .filter(col("dst").isNotNull)
      .groupBy(col("src"), col("dst"))
      .agg(count(lit(1)).as("n"))
      .withColumn("p", col("n").cast("double") /
        sum(col("n")).over(Window.partitionBy(col("src"))))
  }

  /** Exponentially time-decayed sum per key, evaluated at the key's
    * LAST observation: Σ value·2^(−Δ/halfLifeUs) with Δ the integer-
    * microsecond distance to the key's max timestamp. The recency
    * weighting a freshness-aware ranking keeps per entity — and unlike
    * a recursive EWMA it is a plain one-pass aggregate: the max()
    * window and the groupBy share ONE key exchange, zero joins.
    * Output: key, n_events, decayed — unrounded. */
  def decayedSum(events: DataFrame, keyCol: String, tsUsCol: String,
                 valueCol: String, halfLifeUs: Long): DataFrame = {
    require(halfLifeUs > 0, "halfLifeUs must be positive (zero yields " +
      "silent NaN for every key; negative flips decay to amplification)")
    val wk = Window.partitionBy(col(keyCol))
    events
      .withColumn("__last", max(col(tsUsCol)).over(wk))
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_events"),
        sum(col(valueCol) * pow(lit(0.5),
          (col("__last") - col(tsUsCol)) / lit(halfLifeUs.toDouble)))
          .as("decayed"))
  }
}
