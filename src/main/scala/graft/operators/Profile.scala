package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Data-quality profiling operators — the pre-training corpus audit
  * surface (null rates, cardinalities, value ranges, completeness of
  * key sequences). Each is a handful of ordinary aggregates shaped so
  * the exchange carries per-column metric tuples or gap boundaries,
  * never rows.
  */
object Profile {

  /** Per-column profile in long format: (col_name, n, n_nonnull,
    * n_distinct, min_v, max_v, avg_v) — ONE scan computes every metric
    * for every column (a single multi-aggregate pass; the distinct
    * counts expand internally but nothing rescans), then a tiny
    * reshape unions one row per column. Numeric columns only (min/max/
    * avg cast to double, rounded to `scale`). */
  def describe(df: DataFrame, cols: Seq[String], scale: Int = 4): DataFrame = {
    require(cols.nonEmpty, "describe needs at least one column")
    val aggs = cols.flatMap(c => Seq(
      count(lit(1)).as(s"${c}__n"),
      count(col(c)).as(s"${c}__nn"),
      countDistinct(col(c)).as(s"${c}__nd"),
      round(min(col(c)).cast("double"), scale).as(s"${c}__min"),
      round(max(col(c)).cast("double"), scale).as(s"${c}__max"),
      round(avg(col(c)), scale).as(s"${c}__avg")))
    val row = df.agg(aggs.head, aggs.drop(1): _*)
    cols.map(c => row.select(
        lit(c).as("col_name"),
        col(s"${c}__n").as("n"),
        col(s"${c}__nn").as("n_nonnull"),
        col(s"${c}__nd").as("n_distinct"),
        col(s"${c}__min").as("min_v"),
        col(s"${c}__max").as("max_v"),
        col(s"${c}__avg").as("avg_v")))
      .reduce(_.unionByName(_))
  }

  /** Missing ranges in an integer key sequence: every maximal run of
    * absent values strictly inside [min(key), max(key)], as
    * (gap_start, gap_end, gap_len).
    *
    * Scale shape: the naive form is `lead` over a GLOBAL order — a
    * single-task window over all rows (the q29 failure mode). This one
    * finds gap STARTS (k+1 absent) and gap ENDS (k-1 absent) with two
    * distributed anti-joins over the keys, then pairs them positionally
    * — sorted disjoint intervals pair 1:1 — with a window over only the
    * gap-boundary set, which is |gaps|-sized (data-quality metadata),
    * not |rows|-sized. Keys must be unique. */
  def sequenceGaps(df: DataFrame, keyCol: String): DataFrame = {
    val keys = df.select(col(keyCol).cast("long").as("k"))
    val bounds = keys.agg(min(col("k")).as("lo"), max(col("k")).as("hi"))
    val starts = keys.select((col("k") + 1).as("gap_start"))
      .join(keys.withColumnRenamed("k", "p"),
        col("gap_start") === col("p"), "left_anti")
      .crossJoin(broadcast(bounds))
      .filter(col("gap_start") <= col("hi"))
      .select("gap_start")
    val ends = keys.select((col("k") - 1).as("gap_end"))
      .join(keys.withColumnRenamed("k", "p"),
        col("gap_end") === col("p"), "left_anti")
      .crossJoin(broadcast(bounds))
      .filter(col("gap_end") >= col("lo"))
      .select("gap_end")
    // boundary sets are |gaps|-sized: the global-order windows here sort
    // gap metadata, not data
    val ws = Window.orderBy(col("gap_start"))
    val we = Window.orderBy(col("gap_end"))
    starts.withColumn("__i", row_number().over(ws))
      .join(ends.withColumn("__i", row_number().over(we)), "__i")
      .select(col("gap_start"), col("gap_end"),
        (col("gap_end") - col("gap_start") + 1).as("gap_len"))
  }

  /** The Gopher quality-rule battery (Rae et al. 2021 Table A1, the
    * constants verbatim) — per doc, the exact-integer counters and the
    * per-rule verdicts a curation pipeline gates on:
    *  - r_words:  50 ≤ word count ≤ 100,000
    *  - r_mwl:    3 ≤ mean word length ≤ 10 (exact cross-multiply)
    *  - r_sym:    hash ratio ≤ 0.1 AND ellipsis ratio ≤ 0.1 — the
    *    paper applies the 0.1 threshold to EACH symbol separately
    *    ("either the hash symbol or the ellipsis"), so the counters
    *    are reported separately (`n_hash`, `n_ellipsis`) and the rule
    *    is the conjunction of two cross-multiplies
    *  - r_alpha:  ≥ 80% of words carry an alphabetic character
    *  - r_stop:   ≥ 2 distinct words from the paper's stop set
    * plus `gopher_pass` = AND of all five. The paper's line-shape
    * rules (bullet/ellipsis line fractions) are q202's span machinery
    * and are vacuous on a single-line corpus — deliberately out of
    * this battery's scope.
    *
    * Fully narrow: every counter is a per-row HOF fold over the token
    * array (one tokenize, one regexp class per word for the alpha
    * test, exact integer arithmetic; the only float is the reported
    * mean word length, floor-idiom'd). Nothing exchanges until the
    * caller's own sort/aggregate — at 100 TB this is embarrassingly
    * parallel scan work, the cheapest possible gate shape. */
  def gopherRules(docs: DataFrame, idCol: String,
                  textCol: String): DataFrame = {
    val stops = Seq("the", "be", "to", "of", "and", "that", "have", "with")
    val stopArr = stops.map(s => s"'$s'").mkString("array(", ", ", ")")
    docs
      .select(col(idCol),
        expr(TextHashes.toks(textCol)).as("toks"), col(textCol).as("__t"))
      .select(col(idCol),
        size(col("toks")).cast("long").as("n_words"),
        expr("aggregate(toks, 0L, (acc, x) -> acc + length(x))")
          .as("sum_len"),
        expr("cast(size(filter(toks, x -> " +
          "length(regexp_replace(x, '[A-Za-z]', '')) < length(x))) as bigint)")
          .as("n_alpha"),
        // plain replace (not regexp): replaces ALL occurrences on both
        // engines, and the ellipsis length-delta is always a multiple
        // of 3 so the division is exact
        expr("length(__t) - length(replace(__t, '#', ''))")
          .cast("long").as("n_hash"),
        expr("(length(__t) - length(replace(__t, '...', ''))) / 3")
          .cast("long").as("n_ellipsis"),
        expr(s"cast(size(array_intersect(array_distinct(toks), $stopArr)) as bigint)")
          .as("n_stop"))
      .select(col(idCol), col("n_words"),
        (floor(col("sum_len") * lit(10000.0) /
          when(col("n_words") === 0, lit(null)).otherwise(col("n_words")))
          / 10000.0).as("mwl"),
        col("n_alpha"), col("n_hash"), col("n_ellipsis"), col("n_stop"),
        (col("n_words") >= 50 && col("n_words") <= 100000L).as("r_words"),
        (col("sum_len") >= col("n_words") * 3 &&
          col("sum_len") <= col("n_words") * 10).as("r_mwl"),
        (col("n_hash") * 10 <= col("n_words") &&
          col("n_ellipsis") * 10 <= col("n_words")).as("r_sym"),
        (col("n_alpha") * 10 >= col("n_words") * 8).as("r_alpha"),
        (col("n_stop") >= 2).as("r_stop"))
      .withColumn("gopher_pass",
        col("r_words") && col("r_mwl") && col("r_sym") &&
          col("r_alpha") && col("r_stop"))
  }
}
