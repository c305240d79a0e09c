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
}
