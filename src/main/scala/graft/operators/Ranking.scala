package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed ranking operators — the scale paths for global-window
  * queries (q29's exact ntile funnels every row through one task, which
  * is correct but single-threaded by construction).
  *
  * `approxNtile` is the standard two-phase shape: one pass computes the
  * (n-1) approximate tile boundaries with `approx_percentile` (a
  * partial-aggregable sketch — merged on the driver in O(sketch), never
  * O(rows)), then a codegen'd range lookup assigns each row its tile in
  * a narrow map. No global sort, no single-task window: the only
  * exchange is the sketch aggregation's partial→final step.
  */
object Ranking {

  /** Approximate n-tile assignment over `orderCol`: returns `df` plus
    * `tileCol` ∈ [1, n]. Rows equal to a boundary land in the lower tile
    * (matching SQL ntile's "earlier rows fill earlier tiles" bias as
    * closely as a value-based split can).
    *
    * `accuracy` is `approx_percentile`'s inverse-epsilon knob: boundary
    * rank error ≤ rows/accuracy. At accuracy 10⁴ a 10⁹-row corpus
    * misplaces at most 10⁻⁴ of rows per boundary — and the sketch stays
    * a few KB per partition regardless of scale. */
  def approxNtile(df: DataFrame, orderCol: String, n: Int,
                  tileCol: String = "tile",
                  accuracy: Int = 10000): DataFrame = {
    require(n >= 1, "ntile needs n >= 1")
    if (n == 1) return df.withColumn(tileCol, lit(1L))
    val pcts = (1 until n).map(_.toDouble / n)
    val bounds = df.agg(
      percentile_approx(col(orderCol),
        array(pcts.map(lit): _*), lit(accuracy)).as("bs"))
    // boundaries are a tiny (n-1)-element array: broadcast-joined in,
    // tile = 1 + #boundaries strictly below the row's value
    val tile = lit(1) + aggregate(col("bs"),
      lit(0), (acc, b) => acc + when(col(orderCol) > b, 1).otherwise(0))
    df.crossJoin(broadcast(bounds))
      .withColumn(tileCol, tile.cast("long"))
      .drop("bs")
  }

  private val MidBits = 33 // monotonically_increasing_id: pid<<33 | row

  /** EXACT distributed global ranking — the scale-safe twin of an
    * un-partitioned `row_number()` window (q29's single-task funnel).
    *
    * Phase 1 range-partitions on `orderCols` and sorts within partitions
    * — ONE exchange, every partition sorts in parallel;
    * `monotonically_increasing_id` then pins each row's local position
    * (partition id in the upper 31 bits, in-partition counter in the
    * lower 33; nondeterministic expressions fence optimizer reordering,
    * so the id is evaluated above the sort). Phase 2 collects per-
    * partition COUNTS to the driver (one long per partition — metadata,
    * not data), prefix-sums them, and rebases each local row number by
    * its partition's global offset via a literal-map lookup — a narrow
    * codegen projection, no second shuffle, no single-task stage.
    *
    * `orderCols` must be a total order (include a unique tiebreaker) for
    * per-row determinism. The ranked input is `localCheckpoint`-ed so the
    * counts job and downstream jobs see the SAME sampled range boundaries
    * and ids. Returns (ranked df incl. `rankCol` = 1..N, N). */
  private def globalRank(df: DataFrame, orderCols: Seq[String],
                         rankCol: String, partitions: Int): (DataFrame, Long) = {
    require(orderCols.nonEmpty, "global ranking needs at least one order column")
    val nPart = if (partitions > 0) partitions
      else df.sparkSession.sessionState.conf.numShufflePartitions
    val ord = orderCols.map(c => col(c).asc)
    val parted = df.repartitionByRange(nPart, ord: _*)
      .sortWithinPartitions(ord: _*)
      .withColumn("__mid", monotonically_increasing_id())
      .localCheckpoint(true)
    val pid = shiftrightunsigned(col("__mid"), MidBits)
    val lrn = col("__mid").bitwiseAND(lit((1L << MidBits) - 1)) + 1
    val counts = parted.groupBy(pid.as("__pid")).agg(count(lit(1)).as("c"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val total = counts.values.sum
    var acc = 0L
    val offsets = counts.keys.toSeq.sorted.map { p =>
      val o = acc; acc += counts(p); p -> o
    }
    val offMap = map(offsets.flatMap { case (p, o) => Seq(lit(p), lit(o)) }: _*)
    (parted.withColumn(rankCol, (element_at(offMap, pid) + lrn).cast("long"))
      .drop("__mid"), total)
  }

  /** Exact global `row_number` over `orderCols`, distributed (see
    * [[globalRank]] for the two-phase shape). */
  def exactRowNumber(df: DataFrame, orderCols: Seq[String],
                     rankCol: String = "rn",
                     partitions: Int = 0): DataFrame =
    globalRank(df, orderCols, rankCol, partitions)._1

  /** Exact global `ntile(n)` over `orderCols`, distributed and
    * bit-identical to the single-task window form: the first N mod n
    * tiles take ceil(N/n) rows, the rest floor(N/n) — SQL ntile's exact
    * row-count split, computed from the global rank. */
  def exactNtile(df: DataFrame, orderCols: Seq[String], n: Int,
                 tileCol: String = "tile",
                 partitions: Int = 0): DataFrame = {
    require(n >= 1, "ntile needs n >= 1")
    val (ranked, total) = globalRank(df, orderCols, "__grank", partitions)
    val q = total / n
    val r = total % n
    val big = q + 1
    val rank = col("__grank")
    // ranks 1..r*big fill the r bigger tiles; guard q=0 (N < n: every
    // row is in a big tile, the otherwise-branch is unreachable but must
    // not divide by zero under ANSI)
    val tile = when(rank <= r * big, ceil(rank / lit(big.toDouble)))
      .otherwise(lit(r) + ceil((rank - r * big) / lit(math.max(q, 1L).toDouble)))
    ranked.withColumn(tileCol, tile.cast("long")).drop("__grank")
  }

  /** Exact global `ntile(n)` AND `percent_rank` from ONE ranking pass —
    * [[exactNtile]] and [[exactPercentRank]] each pay their own range
    * exchange + sort; a consumer wanting both (the common distribution-
    * summary shape, q78) should pay once. */
  def exactNtilePercentRank(df: DataFrame, orderCols: Seq[String], n: Int,
                            tileCol: String = "tile",
                            prCol: String = "pr",
                            partitions: Int = 0): DataFrame = {
    require(n >= 1, "ntile needs n >= 1")
    val (ranked, total) = globalRank(df, orderCols, "__grank", partitions)
    val q = total / n
    val r = total % n
    val big = q + 1
    val rank = col("__grank")
    val tile = when(rank <= r * big, ceil(rank / lit(big.toDouble)))
      .otherwise(lit(r) + ceil((rank - r * big) / lit(math.max(q, 1L).toDouble)))
    val denom = math.max(total - 1L, 1L).toDouble
    ranked.withColumn(tileCol, tile.cast("long"))
      .withColumn(prCol, (rank - 1) / lit(denom))
      .drop("__grank")
  }

  /** Exact global `percent_rank` over `orderCols` (= (rank-1)/(N-1)),
    * distributed. With a total order every rank is unique, so row_number
    * equals SQL rank and the window definition is matched exactly. */
  def exactPercentRank(df: DataFrame, orderCols: Seq[String],
                       prCol: String = "pr",
                       partitions: Int = 0): DataFrame = {
    val (ranked, total) = globalRank(df, orderCols, "__grank", partitions)
    val denom = math.max(total - 1L, 1L).toDouble
    ranked.withColumn(prCol, (col("__grank") - 1) / lit(denom))
      .drop("__grank")
  }

  /** EXACT per-group continuous quantiles (SQL `percentile` /
    * `quantile_cont` semantics: linear interpolation at rank (N−1)·p),
    * distributed — the scale-safe twin of Spark's exact `percentile`
    * aggregate, whose buffer holds a value→count map that grows
    * O(distinct values) PER GROUP (an executor OOM when a huge table
    * has few groups — q64's declared weakness).
    *
    * Shape: range-partition on (group, value) and sort within
    * partitions — values of one group span consecutive partitions,
    * every partition sorts in parallel, and sorts SPILL (no unbounded
    * in-memory buffer anywhere). Per-(partition, group) row counts and
    * first-local-positions are collected — ≤ partitions × |groups|
    * longs of METADATA — and prefix-summed per group on the driver, so
    * each row's within-group rank is a narrow literal-map projection.
    * The quantile boundary ranks (⌊t⌋+1, ⌈t⌉+1 for t = (N−1)·p) are
    * computed on the driver from the same metadata, the ≤ 2·|ps|
    * boundary ROWS per group are filtered out via a broadcast join, and
    * one tiny aggregation interpolates. No stage sees more than its
    * partition; no buffer exceeds the sort's spill threshold.
    *
    * Output: one row per group — `groupCol`, then `q_<i>` (i = index
    * into `ps`) in the given order. */
  def exactQuantilesByGroup(df: DataFrame, groupCol: String,
                            valueCol: String, ps: Seq[Double],
                            partitions: Int = 0): DataFrame = {
    require(ps.nonEmpty && ps.forall(p => p >= 0 && p <= 1),
      "quantile fractions must be in [0, 1]")
    val spark = df.sparkSession
    val nPart = if (partitions > 0) partitions
      else spark.sessionState.conf.numShufflePartitions
    val parted = df
      .select(col(groupCol).as("__g"), col(valueCol).cast("double").as("__v"))
      .filter(col("__v").isNotNull)
      .repartitionByRange(nPart, col("__g").asc, col("__v").asc)
      .sortWithinPartitions(col("__g").asc, col("__v").asc)
      .withColumn("__mid", monotonically_increasing_id())
      .localCheckpoint(true)
    val pid = shiftrightunsigned(col("__mid"), MidBits)
    val local = col("__mid").bitwiseAND(lit((1L << MidBits) - 1))
    // metadata: per (partition, group) row count + first local position
    val meta = parted.groupBy(pid.as("__pid"), col("__g"))
      .agg(count(lit(1)).as("c"), min(local).as("first"))
      .collect().map(r => (r.getLong(0), r.get(1), r.getLong(2), r.getLong(3)))
    // per group: prefix-sum counts in partition order -> rank offsets
    val byGroup = meta.groupBy(_._2).toSeq
    val offsets: Seq[((Long, Any), (Long, Long))] =
      byGroup.flatMap { case (_, rows) =>
        var acc = 0L
        rows.sortBy(_._1).toSeq.map { case (p, g, c, first) =>
          val o = acc; acc += c; ((p, g), (o, first))
        }
      }
    val groupTotals = byGroup.map { case (g, rows) => g -> rows.map(_._3).sum }
    // boundary ranks per (group, p): lo/hi/frac of t = (N-1)*p
    case class Bound(g: Any, pi: Int, lo: Long, hi: Long, frac: Double)
    val bounds = groupTotals.flatMap { case (g, n) =>
      ps.zipWithIndex.map { case (p, i) =>
        val t = (n - 1) * p
        val lo = math.floor(t).toLong
        Bound(g, i, lo + 1, math.ceil(t).toLong + 1, t - lo)
      }
    }.toSeq
    // within-group rank via literal maps keyed "pid:group" (groups are
    // grouping keys — bounded cardinality, driver-side by definition)
    // group keys must be non-null (they are grouping keys; null groups
    // would fall out of the string-keyed maps silently)
    def key(p: Long, g: Any) = s"$p:${String.valueOf(g)}"
    val offMap = map(offsets.toSeq.flatMap { case ((p, g), (o, _)) =>
      Seq(lit(key(p, g)), lit(o)) }: _*)
    val firstMap = map(offsets.toSeq.flatMap { case ((p, g), (_, f)) =>
      Seq(lit(key(p, g)), lit(f)) }: _*)
    val k = concat(pid.cast("string"), lit(":"), col("__g").cast("string"))
    val ranked = parted.withColumn("__r",
      element_at(offMap, k) + (local - element_at(firstMap, k)) + 1)
    import spark.implicits._
    val boundDf = broadcast(bounds.map(b =>
        (String.valueOf(b.g), b.pi, b.lo, b.hi, b.frac))
      .toDF("__bg", "__pi", "__lo", "__hi", "__frac"))
    // ≤ 2 boundary rows per (group, p) survive this join
    val picked = ranked.join(boundDf,
      col("__g").cast("string") === col("__bg") &&
        (col("__r") === col("__lo") || col("__r") === col("__hi")))
    val interp = picked.groupBy(col("__g"), col("__pi"))
      .agg(min(col("__frac")).as("__f"),
        min(when(col("__r") === col("__lo"), col("__v"))).as("__vlo"),
        min(when(col("__r") === col("__hi"), col("__v"))).as("__vhi"))
      .select(col("__g"), col("__pi"),
        (col("__vlo") + col("__f") * (col("__vhi") - col("__vlo"))).as("__q"))
    interp.groupBy(col("__g").as(groupCol))
      .pivot("__pi", ps.indices.map(_.toString))
      .agg(first(col("__q")))
      .select(col(groupCol) +:
        ps.indices.map(i => col(i.toString).as(s"q_$i")): _*)
  }
}
