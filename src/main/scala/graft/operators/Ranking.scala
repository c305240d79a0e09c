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

  /** Driver-computed rank metadata above this many entries ships as a
    * broadcast-joined DataFrame instead of a `map(lit...)` literal map —
    * a literal map sized partitions × groups blows up plan size and
    * codegen at high cardinalities (10⁴ × 10⁴ = 10⁸ literals), while a
    * broadcast hash join of the same entries is a few MB of table. Below
    * the threshold the literal map wins: it is a pure codegen projection
    * with no join operator at all. */
  private val MaxLiteralEntries = 10000

  /** First-pass coarse-bin width for [[exactQuantilesByGroupScan]]: top
    * bits of the sortable double image. 13 (sign + exponent + 1
    * mantissa bit) is the MINIMUM that isolates -Inf / finite / +Inf /
    * NaN into distinct bins; 16 adds three more mantissa bits — 16
    * bins per octave, so even a narrow-range column (small-integer
    * quantities spanning two octaves) spreads over dozens of bins and
    * each bin's row count lands under the collect cap in ONE pass.
    * Occupied bins stay bounded by the data's exponent spread × 16
    * (hundreds at most in practice). */
  private val FirstPassBinBits = 16

  /** Attach driver-computed per-key metadata columns (`outCols`) to
    * `df`, keyed by the string expression `keyExpr`: literal-map lookup
    * below `maxLiteral` entries, broadcast equi-join above (see
    * [[MaxLiteralEntries]]). `entries` = (key, values aligned with
    * `outCols`). Both paths leave row count and partitioning untouched —
    * every key produced by `keyExpr` must be present in `entries`. */
  private def attachMeta(df: DataFrame, keyExpr: Column,
                         entries: Seq[(String, Seq[Long])],
                         outCols: Seq[String],
                         maxLiteral: Int): DataFrame = {
    if (entries.size.toLong * outCols.size <= maxLiteral) {
      val maps = outCols.indices.map { i =>
        map(entries.flatMap { case (k, vs) => Seq(lit(k), lit(vs(i))) }: _*)
      }
      df.select(col("*") +: outCols.zipWithIndex.map { case (c, i) =>
        element_at(maps(i), keyExpr).as(c) }: _*)
    } else {
      val spark = df.sparkSession
      import spark.implicits._
      val meta = broadcast(
        entries.map { case (k, vs) => (k, vs) }
          .toDF("__mk", "__mv")
          .select(col("__mk") +: outCols.zipWithIndex.map { case (c, i) =>
            element_at(col("__mv"), i + 1).as(c) }: _*))
      df.withColumn("__mk0", keyExpr).join(meta, col("__mk0") === col("__mk"))
        .drop("__mk0", "__mk")
    }
  }

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
    // LAZY pin (round 19): the counts collect below computes every
    // partition (a global groupBy), so the first job materializes the
    // checkpoint — same same-boundaries/same-ids guarantee as the
    // eager pin, one fewer job per ranking call
    val parted = df.repartitionByRange(nPart, ord: _*)
      .sortWithinPartitions(ord: _*)
      .withColumn("__mid", monotonically_increasing_id())
      .localCheckpoint(false)
    val pid = shiftrightunsigned(col("__mid"), MidBits)
    val lrn = col("__mid").bitwiseAND(lit((1L << MidBits) - 1)) + 1
    val counts = parted.groupBy(pid.as("__pid")).agg(count(lit(1)).as("c"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val total = counts.values.sum
    var acc = 0L
    val offsets = counts.keys.toSeq.sorted.map { p =>
      val o = acc; acc += counts(p); p -> o
    }
    val withOff = attachMeta(parted, pid.cast("string"),
      offsets.map { case (p, o) => p.toString -> Seq(o) },
      Seq("__off"), MaxLiteralEntries)
    (withOff.withColumn(rankCol, (col("__off") + lrn).cast("long"))
      .drop("__mid", "__off"), total)
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

  /** EXACT per-group `percent_rank` over `orderCol`, distributed — the
    * scale-safe twin of `percent_rank() OVER (PARTITION BY group ORDER
    * BY value)` when the GROUP is a bounded enum over a row-scale table
    * (q166's event_type: a handful of values means each window
    * partition is a constant fraction of ALL rows sorted in ONE task —
    * the exact failure mode [[globalRank]] exists for, per stratum).
    *
    * SQL semantics reproduced exactly: pr = (rank − 1) / (N_g − 1)
    * where rank is the MINIMUM row position among ties (SQL `rank`,
    * which `percent_rank` is defined over — NOT row_number) and N_g is
    * the group's row count; a single-row group yields 0.0. The
    * arithmetic is the window's own (long subtraction, one double
    * division) so results are bit-identical.
    *
    * Shape — never a per-stratum sort of the full table, and never a
    * join back:
    *  1. range-partition on (group, value) — RangePartitioner assigns a
    *     partition from the KEY alone, so a (group, value) tie class
    *     can never straddle a boundary, while a single group's rows
    *     spread over as many partitions as its row share demands. The
    *     partition id is pinned as a column INSIDE the exchange stage
    *     (`spark_partition_id` before a localCheckpoint, so the sampled
    *     range boundaries are frozen and every later job sees the SAME
    *     assignment);
    *  2. one metadata aggregate — per-(partition, group) row counts,
    *     ≤ partitions × |groups| longs collected — prefix-summed per
    *     group on the driver into each partition's within-group offset
    *     plus the group total, re-attached as a literal map below
    *     [[MaxLiteralEntries]] entries, broadcast-joined above;
    *  3. `rank()` over a window partitioned by (partition id, group):
    *     window partitions are ~rows/partitions sized slices (the id is
    *     in the key), every one parallel; within a slice `rank()` gives
    *     the tie-min local rank, and because ties never straddle
    *     partitions, offset + local rank IS the group-global rank.
    *
    * Degenerate skew: a SINGLE (group, value) class holding a huge row
    * share lands in one partition — an irreducible tie class (all its
    * rows share one rank); collapse such data upstream if it appears.
    * NULL `orderCol` values rank first (Spark's ASC window default;
    * note DuckDB defaults to NULLS LAST — align explicitly when an
    * oracle compares a null-bearing column); a NULL group key is its
    * own window partition, keyed internally by a sentinel string. */
  def exactPercentRankByGroup(df: DataFrame, groupCol: String,
                              orderCol: String, prCol: String = "pr",
                              partitions: Int = 0): DataFrame = {
    val nPart = if (partitions > 0) partitions
      else df.sparkSession.sessionState.conf.numShufflePartitions
    val parted = df
      .repartitionByRange(nPart, col(groupCol).asc, col(orderCol).asc)
      .withColumn("__pid", spark_partition_id().cast("long"))
      // LAZY pin (round 19): the metadata collect below computes every
      // partition, materializing the checkpoint in its own job
      .localCheckpoint(false)
    // one metadata job: per-(partition, group) counts; the string form
    // of the group key comes from Spark's own cast (q97's rule), with a
    // sentinel for a NULL group so it survives the string-keyed lookup
    val sentinel = "\u0000null"
    val gs = coalesce(col(groupCol).cast("string"), lit(sentinel))
    val meta = parted.groupBy(col("__pid"), gs.as("__gsv"))
      .agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val offsets = meta.groupBy(_._2).toSeq.flatMap { case (g, rows) =>
      val tot = rows.map(_._3).sum
      var acc = 0L
      rows.sortBy(_._1).toSeq.map { case (p, _, c) =>
        val o = acc; acc += c; s"$p:$g" -> Seq(o, tot)
      }
    }
    val keyed = attachMeta(parted,
      concat(col("__pid").cast("string"), lit(":"), gs),
      offsets, Seq("__off", "__tot"), MaxLiteralEntries)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__pid"), col(groupCol)).orderBy(col(orderCol).asc)
    keyed
      .withColumn(prCol,
        (col("__off") + rank().over(w) - 1).cast("double") /
          greatest(col("__tot") - 1, lit(1L)).cast("double"))
      .drop("__pid", "__off", "__tot")
  }

  /** Fused global row position + per-group percent_rank from ONE range
    * pass (q166's shape: quantile normalization needs BOTH the global
    * sorted position of every value AND each row's within-stratum
    * percent_rank — paying [[exactRowNumber]] and
    * [[exactPercentRankByGroup]] separately costs two full range
    * exchanges and two checkpoints of the same frame).
    *
    * One `repartitionByRange(orderCol)` serves both: equal `orderCol`
    * values can never straddle a range boundary, so every (group,
    * value) tie class is intact in ONE partition and the per-(pid,
    * group) `rank()` window rebases exactly ([[exactPercentRankByGroup]]'s
    * argument), while the in-partition sort + `monotonically_increasing
    * _id` pins the global position ([[globalRank]]'s argument). A single
    * metadata collect — per-(partition, group) counts — yields global
    * partition offsets (sum over groups), per-group partition offsets
    * (prefix per group), group totals, and the global N.
    *
    * `rnCol` is the 1-based global row number over `orderCol` ASC (ties
    * ordered arbitrarily but deterministically within the checkpoint —
    * callers interpolating between sorted values are tie-insensitive);
    * `prCol` is the exact SQL `percent_rank() OVER (PARTITION BY group
    * ORDER BY orderCol)`. Returns (frame, total row count). */
  def exactGlobalRowAndGroupPercentRank(df: DataFrame, orderCol: String,
                                        groupCol: String,
                                        rnCol: String = "rn",
                                        prCol: String = "pr",
                                        partitions: Int = 0): (DataFrame, Long) = {
    val nPart = if (partitions > 0) partitions
      else df.sparkSession.sessionState.conf.numShufflePartitions
    val parted = df
      .repartitionByRange(nPart, col(orderCol).asc)
      .sortWithinPartitions(col(orderCol).asc)
      .withColumn("__mid", monotonically_increasing_id())
      // LAZY pin (round 19): the metadata collect below computes every
      // partition, materializing the checkpoint in its own job
      .localCheckpoint(false)
    val pid = shiftrightunsigned(col("__mid"), MidBits)
    val local = col("__mid").bitwiseAND(lit((1L << MidBits) - 1))
    val sentinel = "\u0000null"
    val gs = coalesce(col(groupCol).cast("string"), lit(sentinel))
    val meta = parted.groupBy(pid.as("__pid"), gs.as("__gsv"))
      .agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val total = meta.map(_._3).sum
    // global offsets: per-pid totals, prefix-summed in pid order
    var gAcc = 0L
    val gOff = meta.groupBy(_._1).view.mapValues(_.map(_._3).sum).toSeq
      .sortBy(_._1).map { case (p, c) => val o = gAcc; gAcc += c; p -> o }
      .toMap
    // per-(pid, group) within-group offsets + group totals
    val entries = meta.groupBy(_._2).toSeq.flatMap { case (g, rows) =>
      val tot = rows.map(_._3).sum
      var acc = 0L
      rows.sortBy(_._1).toSeq.map { case (p, _, c) =>
        val o = acc; acc += c; s"$p:$g" -> Seq(o, tot, gOff(p))
      }
    }
    val keyed = attachMeta(parted,
      concat(pid.cast("string"), lit(":"), gs),
      entries, Seq("__off", "__tot", "__goff"), MaxLiteralEntries)
    val w = Window.partitionBy(pid, col(groupCol)).orderBy(col(orderCol).asc)
    (keyed
      .withColumn(rnCol, (col("__goff") + local + 1).cast("long"))
      .withColumn(prCol,
        (col("__off") + rank().over(w) - 1).cast("double") /
          greatest(col("__tot") - 1, lit(1L)).cast("double"))
      .drop("__mid", "__off", "__tot", "__goff"), total)
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
                            partitions: Int = 0,
                            maxLiteralEntries: Int = MaxLiteralEntries): DataFrame =
    exactQuantilesByGroupMulti(df, groupCol, Seq(valueCol -> ps),
        partitions, maxLiteralEntries)
      .select(col(groupCol) +:
        ps.indices.map(i => col(s"q_0_$i").as(s"q_$i")): _*)

  /** [[exactQuantilesByGroup]] for SEVERAL value columns in ONE
    * partitioned pass — per-column calls each pay a full range exchange +
    * sort + checkpoint of the input (q97 paid two); this form stacks the
    * requested columns into (columnIndex, value) rows FIRST, so a single
    * range partitioning on (column, group, value) sorts every column's
    * values in parallel and one metadata collect serves all of them. The
    * stacked frame is |rows| × |specs| — each value still crosses the
    * exchange exactly once, same total bytes as the per-column calls,
    * but one job instead of |specs|.
    *
    * `specs` = (valueCol, fractions) per requested column. Output: one
    * row per group — `groupCol`, then `q_<ci>_<pi>` for spec `ci`,
    * fraction index `pi` (the given order).
    *
    * `maxLiteralEntries` caps the driver metadata shipped as literal
    * maps; larger rank-offset sets broadcast-join instead (see
    * [[MaxLiteralEntries]]). */
  def exactQuantilesByGroupMulti(df: DataFrame, groupCol: String,
                                 specs: Seq[(String, Seq[Double])],
                                 partitions: Int = 0,
                                 maxLiteralEntries: Int = MaxLiteralEntries): DataFrame = {
    require(specs.nonEmpty, "need at least one (valueCol, fractions) spec")
    specs.foreach { case (c, ps) =>
      require(ps.nonEmpty && ps.forall(p => p >= 0 && p <= 1),
        s"quantile fractions for $c must be in [0, 1]") }
    val spark = df.sparkSession
    val nPart = if (partitions > 0) partitions
      else spark.sessionState.conf.numShufflePartitions
    // stack: one (columnIndex, value) row per requested column — narrow
    val stacked = df.select(col(groupCol).as("__g"),
        explode(array(specs.zipWithIndex.map { case ((c, _), ci) =>
          struct(lit(ci).as("ci"), col(c).cast("double").as("v"))
        }: _*)).as("__e"))
      .select(col("__g"), col("__e.ci").as("__ci"), col("__e.v").as("__v"))
      .filter(col("__v").isNotNull)
    val parted = stacked
      .repartitionByRange(nPart, col("__ci").asc, col("__g").asc, col("__v").asc)
      .sortWithinPartitions(col("__ci").asc, col("__g").asc, col("__v").asc)
      .withColumn("__mid", monotonically_increasing_id())
      // LAZY pin (round 19): the metadata collect below computes every
      // partition, materializing the checkpoint in its own job
      .localCheckpoint(false)
    val pid = shiftrightunsigned(col("__mid"), MidBits)
    val local = col("__mid").bitwiseAND(lit((1L << MidBits) - 1))
    // metadata: per (partition, column, group) row count + first local
    // position — ≤ partitions × |specs| × |groups| longs. The group
    // key's string form comes back as SPARK's cast (driver-side
    // String.valueOf disagrees with cast() for timestamps — trailing
    // ".0" — which would silently empty the keyed lookups below)
    val meta = parted.groupBy(pid.as("__pid"), col("__ci"), col("__g"),
        col("__g").cast("string").as("__gsv"))
      .agg(count(lit(1)).as("c"), min(local).as("first"))
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(3),
        r.getLong(4), r.getLong(5)))
    // per (column, group): prefix-sum counts in partition order -> offsets
    val byCg = meta.groupBy(m => (m._2, m._3)).toSeq
    val offsets: Seq[((Long, Int, String), (Long, Long))] =
      byCg.flatMap { case (_, rows) =>
        var acc = 0L
        rows.sortBy(_._1).toSeq.map { case (p, ci, gs, c, first) =>
          val o = acc; acc += c; ((p, ci, gs), (o, first))
        }
      }
    val cgTotals = byCg.map { case (cg, rows) => cg -> rows.map(_._4).sum }
    // boundary ranks per (column, group, p): lo/hi/frac of t = (N-1)*p
    val bounds = cgTotals.flatMap { case ((ci, gs), n) =>
      specs(ci)._2.zipWithIndex.map { case (p, pi) =>
        val t = (n - 1) * p
        val lo = math.floor(t).toLong
        (ci, gs, pi, lo + 1, math.ceil(t).toLong + 1, t - lo)
      }
    }.toSeq
    // within-group rank: offset/first metadata keyed "pid:ci:group"
    // (group keys must be non-null — they are grouping keys; null
    // groups would fall out of the string-keyed lookup silently)
    def key(p: Long, ci: Int, gs: String) = s"$p:$ci:$gs"
    val k = concat(pid.cast("string"), lit(":"), col("__ci").cast("string"),
      lit(":"), col("__g").cast("string"))
    val ranked = attachMeta(parted, k,
        offsets.map { case ((p, ci, gs), (o, f)) => key(p, ci, gs) -> Seq(o, f) },
        Seq("__off", "__first"), maxLiteralEntries)
      .withColumn("__r", col("__off") + (local - col("__first")) + 1)
    import spark.implicits._
    val boundDf = broadcast(bounds
      .toDF("__bci", "__bg", "__pi", "__lo", "__hi", "__frac"))
    // ≤ 2 boundary rows per (column, group, p) survive this join
    val picked = ranked.join(boundDf,
      col("__ci") === col("__bci") &&
        col("__g").cast("string") === col("__bg") &&
        (col("__r") === col("__lo") || col("__r") === col("__hi")))
    val interp = picked.groupBy(col("__g"), col("__ci"), col("__pi"))
      .agg(min(col("__frac")).as("__f"),
        min(when(col("__r") === col("__lo"), col("__v"))).as("__vlo"),
        min(when(col("__r") === col("__hi"), col("__v"))).as("__vhi"))
      .select(col("__g"), concat(col("__ci"), lit("_"), col("__pi")).as("__cp"),
        // two-sided weighted interpolation with exact-rank short-circuit
        // — bit-matches Spark's percentile and DuckDB's quantile_cont
        // (the one-sided lo + f*(hi-lo) drifts an ulp on some operands)
        when(col("__vlo") === col("__vhi") || col("__f") === 0, col("__vlo"))
          .otherwise((lit(1) - col("__f")) * col("__vlo") +
            col("__f") * col("__vhi")).as("__q"))
    val outKeys = specs.zipWithIndex.flatMap { case ((_, ps), ci) =>
      ps.indices.map(pi => s"${ci}_$pi") }
    interp.groupBy(col("__g").as(groupCol))
      .pivot("__cp", outKeys)
      .agg(first(col("__q")))
      .select(col(groupCol) +: outKeys.map(k0 => col(k0).as(s"q_$k0")): _*)
  }

  /** EXACT per-group quantiles by iterative histogram refinement —
    * the zero-shuffle twin of [[exactQuantilesByGroupMulti]] (same
    * contract, same output schema), and the preferred shape when only
    * the quantile VALUES are needed (the range-sort form additionally
    * yields per-row ranks, which this one never materializes).
    *
    * Classic distributed selection: a quantile is the value at one or
    * two specific ranks per group, so instead of sorting anything the
    * operator brackets each target rank inside a shrinking value
    * interval —
    *
    *  1. one aggregation computes per-group count/min/max (narrow scan,
    *     |groups| rows out);
    *  2. each refinement round histograms the rows inside every active
    *     target's interval into `buckets` equal-width bins (broadcast
    *     target table → narrow scan → `targets × buckets` counts back);
    *     the bin containing the target rank becomes the next interval;
    *  3. once an interval holds ≤ `collectCap` rows (or is too narrow
    *     to subdivide), its DISTINCT values + counts come back (bounded
    *     by the cap / by how many doubles fit in the interval) and the
    *     rank is answered exactly on the driver.
    *
    * Every pass is a full scan with column pruning and a partial-agg
    * exchange of metadata size — NO shuffle of data rows, NO sort, NO
    * materialization, bounded driver state (`targets × buckets` longs).
    * At 100 TB that is 3–4 cheap scans against the range-sort form's
    * full-data exchange; rounds converge geometrically (each divides
    * the interval by `buckets`; doubles bottom out at ulp width, where
    * the distinct-value collect is a handful of rows no matter the
    * row count).
    *
    * Refined intervals are DATA-defined, not arithmetic-defined: the
    * bin index (floor((v−lo)/width), one-step-corrected against the
    * exact edge comparisons) is a MONOTONE function of v, so each bin's
    * rows form a contiguous value range — the next interval is
    * `[min(bin), nextUp(max(bin)))` over the bin's actual values, which
    * the next round's plain comparisons reproduce exactly. Arithmetic
    * edges (`lo + b·width`) can collapse once width shrinks under an
    * ulp and would strand counted rows outside their own half-open
    * interval; data edges cannot. A bin holding one distinct value
    * resolves on the spot (duplicate-heavy groups converge in O(1)
    * rounds); a bin the bucketing can no longer split is only possible
    * when its whole span is a few ulps, where the distinct-value
    * collect is a handful of rows. */
  def exactQuantilesByGroupScan(df: DataFrame, groupCol: String,
                                specs: Seq[(String, Seq[Double])],
                                buckets: Int = 1024,
                                collectCap: Int = 32768,
                                maxRounds: Int = 64,
                                materialize: Boolean = false): DataFrame = {
    require(specs.nonEmpty, "need at least one (valueCol, fractions) spec")
    specs.foreach { case (c, ps) =>
      require(ps.nonEmpty && ps.forall(p => p >= 0 && p <= 1),
        s"quantile fractions for $c must be in [0, 1]") }
    require(buckets >= 2 && collectCap >= 1, "need buckets >= 2, cap >= 1")
    val spark = df.sparkSession
    import spark.implicits._
    // the stacked row stream: (group, columnIndex, value) — by default
    // re-derived per pass (narrow, column-pruned: the right default when
    // the input is a stored column and the scan is parquet-cheap). With
    // `materialize`, the stream is localCheckpoint-ed ONCE and every
    // refinement pass reads the blocks instead of re-running the
    // derivation — opt in when the value column is an EXPENSIVE derived
    // expression (q112's tokenize projection). Cost: O(|rows|·|specs|)
    // executor storage for the duration of the call (released before
    // returning); the scan family's time-for-memory dial, now explicit.
    val stream = df.select(col(groupCol).as("__g"),
        explode(array(specs.zipWithIndex.map { case ((c, _), ci) =>
          struct(lit(ci).as("ci"), col(c).cast("double").as("v"))
        }: _*)).as("__e"))
      .select(col("__g"), col("__e.ci").as("__ci"), col("__e.v").as("__v"))
      .filter(col("__v").isNotNull)
    val matRows =
      if (materialize) Some(stream.localCheckpoint(true)) else None
    def rows = matRows.getOrElse(stream)
    try {
    // pass 1 (FUSED stats + coarse bracketing, round 8): per (column,
    // group, coarse-bin) count/min/max, where the bin is the top
    // FirstPassBinBits bits of the order-preserving IEEE-754 bit image
    // of the value ([[graft.functions.DoubleSortableBits]]). The
    // binning is MONOTONE and data-independent — no prior min/max
    // needed — so this one scan yields (a) exact per-group counts, with
    // ±Inf and NaN isolated in their own bins (13 top bits are exactly
    // enough to separate -Inf / finite / +Inf / NaN, reproducing the
    // sort order's regions without special-case arithmetic), and
    // (b) for every target rank, the ≤ half-exponent-wide bin holding
    // it: offset/rowsIn/interval come straight from the bin prefix
    // sums. Typical value distributions therefore SKIP the dedicated
    // refinement round and resolve on the next (distinct-value) pass —
    // two scans total instead of three-plus — while pathological spans
    // fall through to the same refinement loop as before. Driver
    // state: occupied bins × groups; occupancy is bounded by the
    // data's exponent spread (≤ 2^13, tens in practice) — the same
    // metadata class as the per-group stats row this pass replaces.
    // The group key also comes back as SPARK's string cast (`__gsv`) —
    // driver-side String.valueOf disagrees with cast() for timestamps
    // (trailing ".0") and nulls, which would silently empty the joins.
    val binCol = shiftrightunsigned(
      org.apache.spark.sql.graftbridge.toColumn(
        graft.functions.DoubleSortableBits(
          org.apache.spark.sql.graftbridge.toExpression(col("__v")))),
      64 - FirstPassBinBits)
    val binned = rows
      .groupBy(col("__ci"), col("__g"), col("__g").cast("string").as("__gsv"),
        binCol.as("__b"))
      .agg(count(lit(1)).as("n"), min(col("__v")).as("mn"),
        max(col("__v")).as("mx"))
      .collect()
      .map(r => (r.getInt(0), r.get(1), r.getString(2), r.getLong(3),
        r.getLong(4), r.getDouble(5), r.getDouble(6)))
    val perCg = binned.groupBy(t => (t._1, t._2))
    val cgN: Map[(Int, Any), Long] =
      perCg.map { case (k, bins) => k -> bins.map(_._5).sum }
    // one target per distinct needed rank: quantile p needs the values
    // at ranks floor(t)+1 and ceil(t)+1, t = (n-1)p — dedup'd per group
    case class Target(tid: Int, ci: Int, g: Any, gs: String, rank: Long,
                      var lo: Double, var hi: Double, // half-open [lo, hi)
                      var offset: Long, // values < lo
                      var rowsIn: Long,
                      var stuck: Boolean, // bucketing can't split further
                      var value: Option[Double])
    var nextTid = 0
    val targets = perCg.toSeq.flatMap { case ((ci, g), binRows) =>
      val gs = binRows.head._3
      // bin ids ascend with value (top bits of a monotone image)
      val sorted = binRows.sortBy(_._4)
      val n = cgN((ci, g))
      val ranks = specs(ci)._2.flatMap { p =>
        val t = (n - 1) * p
        Seq(math.floor(t).toLong + 1, math.ceil(t).toLong + 1)
      }.distinct
      ranks.map { r =>
        // prefix-walk to the bin holding rank r (r <= n by construction)
        var acc = 0L
        var k = 0
        while (acc + sorted(k)._5 < r) { acc += sorted(k)._5; k += 1 }
        val (_, _, _, _, nb, mnb, mxb) = sorted(k)
        val t = Target(nextTid, ci, g, gs, r, mnb, Math.nextUp(mxb),
          acc, nb, stuck = false, None)
        nextTid += 1
        if (mnb.isNaN) t.value = Some(Double.NaN)  // the all-NaN bin
        else if (mnb == mxb) t.value = Some(mnb)   // one distinct (incl ±Inf)
        t
      }
    }
    val gType = df.schema(groupCol).dataType
    def active = targets.filter(t => t.value.isEmpty && t.rowsIn > collectCap)
    var round = 0
    while (active.exists(!_.stuck) && round < maxRounds) {
      val refinable = active.filter(!_.stuck)
      val tDf = broadcast(refinable.map(t =>
          (t.tid, t.ci, t.gs, t.lo, t.hi,
            math.max((t.hi - t.lo) / buckets, java.lang.Double.MIN_VALUE)))
        .toDF("tid", "tci", "tg", "lo", "hi", "w"))
      val raw = floor((col("__v") - col("lo")) / col("w")).cast("long")
      // one-step-corrected floor: keeps the index aligned with the
      // exact edge comparisons where edges are representable, and —
      // the property refinement actually relies on — MONOTONE in v
      val idx = raw -
        when(col("__v") < col("lo") + raw * col("w"), 1L).otherwise(0L) +
        when(col("__v") >= col("lo") + (raw + 1L) * col("w"), 1L).otherwise(0L)
      val counts = rows.join(tDf,
          col("__ci") === col("tci") &&
            (col("__g").cast("string") <=> col("tg")) && // null-safe: null groups rank too
            col("__v") >= col("lo") && col("__v") < col("hi"))
        .select(col("tid"),
          least(greatest(idx, lit(0L)), lit(buckets - 1L)).as("b"),
          col("__v"))
        .groupBy(col("tid"), col("b"))
        .agg(count(lit(1)).as("c"), min(col("__v")).as("mn"),
          max(col("__v")).as("mx"))
        .collect()
        .map(r => (r.getInt(0), r.getLong(1)) ->
          (r.getLong(2), r.getDouble(3), r.getDouble(4)))
        .toMap
      refinable.foreach { t =>
        var acc = 0L
        var b = 0
        var done = false
        while (!done && b < buckets) {
          counts.get((t.tid, b.toLong)) match {
            case Some((c, mn, mx)) if t.offset + acc + c >= t.rank =>
              t.offset += acc
              t.rowsIn = c
              if (mn == mx) t.value = Some(mn) // one distinct value left
              else {
                // data-defined edges (see scaladoc): the bin's rows are
                // a contiguous value range, so [mn, nextUp(mx)) holds
                // exactly them; no-shrink means the span is a few ulps
                // — hand it to the distinct-value resolution
                if (mn == t.lo && Math.nextUp(mx) == t.hi) t.stuck = true
                t.lo = mn
                t.hi = Math.nextUp(mx)
              }
              done = true
            case maybe =>
              acc += maybe.map(_._1).getOrElse(0L)
              b += 1
          }
        }
        assert(done, s"rank ${t.rank} not found — bucket accounting broke")
      }
      round += 1
    }
    // resolution: distinct values + counts inside each remaining
    // interval (≤ collectCap rows, or ulp-narrow => few distincts)
    val pending = targets.filter(_.value.isEmpty)
    if (pending.nonEmpty) {
      val tDf = broadcast(pending.map(t =>
          (t.tid, t.ci, t.gs, t.lo, t.hi))
        .toDF("tid", "tci", "tg", "lo", "hi"))
      val vals = rows.join(tDf,
          col("__ci") === col("tci") &&
            (col("__g").cast("string") <=> col("tg")) &&
            col("__v") >= col("lo") && col("__v") < col("hi"))
        .groupBy(col("tid"), col("__v")).agg(count(lit(1)).as("c"))
        .collect()
        .groupBy(_.getInt(0))
      pending.foreach { t =>
        val cand = vals.getOrElse(t.tid, Array.empty)
          .map(r => r.getDouble(1) -> r.getLong(2)).sortBy(_._1)
        var acc = t.offset
        t.value = cand.collectFirst {
          case (v, c) if { acc += c; acc >= t.rank } => v
        }
        assert(t.value.isDefined,
          s"rank ${t.rank} unresolved — interval accounting broke")
      }
    }
    // assemble: q = vlo + frac * (vhi - vlo), one output row per group
    val byKey = targets.map(t => (t.ci, t.g, t.rank) -> t.value.get).toMap
    val groups = cgN.keySet.map(_._2)
    val outRows = groups.toSeq.map { g =>
      val qs = specs.zipWithIndex.flatMap { case ((_, ps), ci) =>
        ps.map { p =>
          cgN.get((ci, g)) match {
            case Some(n) =>
              val t = (n - 1) * p
              val lo = byKey((ci, g, math.floor(t).toLong + 1))
              val hi = byKey((ci, g, math.ceil(t).toLong + 1))
              val f = t - math.floor(t)
              // two-sided weighted form, exact-rank short-circuit: the
              // interpolation both Spark's percentile and DuckDB's
              // quantile_cont compute — the one-sided lo + f*(hi-lo)
              // drifts an ulp on some operands and would break
              // bit-parity with the oracle pre-rounding
              java.lang.Double.valueOf(
                if (lo == hi || f == 0) lo else (1 - f) * lo + f * hi)
            case None => null // group absent for this column (all-null)
          }
        }
      }
      org.apache.spark.sql.Row.fromSeq(g +: qs)
    }
    val outKeys = specs.zipWithIndex.flatMap { case ((_, ps), ci) =>
      ps.indices.map(pi => s"q_${ci}_$pi") }
    val schema = org.apache.spark.sql.types.StructType(
      org.apache.spark.sql.types.StructField(groupCol, gType) +:
        outKeys.map(k0 => org.apache.spark.sql.types.StructField(
          k0, org.apache.spark.sql.types.DoubleType)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(outRows, 1), schema)
    // the result is driver-assembled metadata — the checkpointed stream
    // has served its last pass, so the blocks release on EVERY exit
    // path (a failed refinement pass must not pin O(rows·specs) storage
    // in the shared session). NOT Dataset.unpersist: that only clears
    // CacheManager entries, and a local checkpoint's blocks live in the
    // block manager directly (the r6 RankingSpec leak gate caught it).
    } finally matRows.foreach(
      org.apache.spark.sql.graftbridge.releaseCheckpoint(_))
  }

  /** EXACT distributed global-order running aggregate over an integral
    * value column — the scale-safe twin of
    * `fn(v) OVER (ORDER BY ... ROWS BETWEEN UNBOUNDED PRECEDING AND
    * {CURRENT ROW | 1 PRECEDING})`, which Spark plans as a
    * SinglePartition window (every row through one task).
    *
    * Same two-phase discipline as [[globalRank]]: range-partition on
    * `orderCols` + parallel in-partition sort pins each row's partition;
    * ONE aggregate per partition is collected (a long per partition —
    * metadata, not data), exclusive-prefix-combined on the driver, and
    * attached back per row (literal map below [[MaxLiteralEntries]],
    * broadcast join above). The in-partition running value is a window
    * PARTITIONED BY the range-partition id — a hash exchange that keeps
    * every partition parallel, never a global sort — and each row's
    * result is `offset ⊕ local`.
    *
    * `fn` ∈ sum|max|min over values cast to LONG: integral math is
    * associative, so the distributed result is bit-identical to the
    * single-task window under ANY partitioning (a double running sum
    * would re-associate; overflow is the caller's contract, as in SQL).
    * `orderCols` must be a total order (include a unique tiebreaker).
    * NULL semantics match SQL's window exactly: NULL values are ignored
    * by the aggregate, and a row whose frame holds NO non-null value
    * (all-null prefix, or the empty frame of the first row under
    * `inclusive = false` — UNBOUNDED PRECEDING..1 PRECEDING) yields
    * NULL, not the fn identity. The per-partition offset tracks a
    * non-null COUNT alongside the value so the mask is exact across
    * partition boundaries. */
  def runningAgg(df: DataFrame, orderCols: Seq[String], valueCol: String,
                 fn: String, outCol: String, inclusive: Boolean = true,
                 partitions: Int = 0): DataFrame =
    runningAggMulti(df, orderCols, Seq((valueCol, fn, outCol)),
      inclusive, partitions)

  /** [[runningAgg]] for SEVERAL (valueCol, fn, outCol) specs in ONE
    * partitioned pass — per-column calls each pay a full range
    * exchange, an eager checkpoint, a metadata collect, and a
    * pid-keyed window (q180's two cumulative counts paid all of it
    * twice); this form ranges once and computes every requested
    * running column over the same window. Semantics per column are
    * exactly [[runningAgg]]'s (fn ∈ sum|max|min over longs, SQL NULL
    * frame mask, bit-identical to the single-task window). */
  def runningAggMulti(df: DataFrame, orderCols: Seq[String],
                      specs: Seq[(String, String, String)],
                      inclusive: Boolean = true,
                      partitions: Int = 0): DataFrame = {
    require(orderCols.nonEmpty, "running aggregate needs an order")
    require(specs.nonEmpty, "need at least one (valueCol, fn, outCol)")
    def fnOf(fn: String): (Column => Column, Long,
        (Column, Column) => Column, (Long, Long) => Long) = fn match {
      case "sum" => (sum, 0L, (a, b) => a + b, _ + _)
      case "max" => (max, Long.MinValue,
        (a, b) => greatest(a, b), math.max)
      case "min" => (min, Long.MaxValue,
        (a, b) => least(a, b), math.min)
      case other => throw new IllegalArgumentException(
        s"fn must be sum|max|min, got $other")
    }
    val fs = specs.map { case (_, fn, _) => fnOf(fn) }
    val nPart = if (partitions > 0) partitions
      else df.sparkSession.sessionState.conf.numShufflePartitions
    val ord = orderCols.map(c => col(c).asc)
    val parted = specs.zipWithIndex
      .foldLeft(df) { case (acc, ((vc, _, _), i)) =>
        acc.withColumn(s"__v$i", col(vc).cast("long")) }
      .repartitionByRange(nPart, ord: _*)
      .sortWithinPartitions(ord: _*)
      .withColumn("__mid", monotonically_increasing_id())
      // LAZY pin (round 19): the perPart collect computes every
      // partition, materializing the checkpoint in its own job — same
      // boundaries/ids guarantee, one fewer job per call
      .localCheckpoint(false)
    val pid = shiftrightunsigned(col("__mid"), MidBits)
    // coalesce to the identity: an all-null partition aggregates to NULL
    // and would NPE getLong; its identity value is neutral under the
    // combiner and its count of 0 keeps the NULL mask exact.
    val aggExprs = specs.indices.flatMap { i =>
      Seq(coalesce(fs(i)._1(col(s"__v$i")), lit(fs(i)._2)).as(s"a$i"),
        count(col(s"__v$i")).as(s"c$i"))
    }
    val perPart = parted.groupBy(pid.as("__pid"))
      .agg(aggExprs.head, aggExprs.tail: _*)
      .collect().map(r => r.getLong(0) ->
        specs.indices.map(i => (r.getLong(1 + 2 * i), r.getLong(2 + 2 * i))))
      .toMap
    // exclusive prefix-combine per column, in partition order
    val accs = fs.map(_._2).toArray
    val cnts = Array.fill(specs.size)(0L)
    val offsets = perPart.keys.toSeq.sorted.map { p =>
      val entry = specs.indices.flatMap { i =>
        val (o, c) = (accs(i), cnts(i))
        accs(i) = fs(i)._4(accs(i), perPart(p)(i)._1)
        cnts(i) += perPart(p)(i)._2
        Seq(o, c)
      }
      p.toString -> entry
    }
    val withOff = attachMeta(parted, pid.cast("string"), offsets,
      specs.indices.flatMap(i => Seq(s"__off$i", s"__offc$i")),
      MaxLiteralEntries)
    val w0 = Window.partitionBy(pid).orderBy(ord: _*)
    val w = if (inclusive)
      w0.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    else w0.rowsBetween(Window.unboundedPreceding, -1)
    // SQL null-frame mask: the window's value is NULL iff the frame holds
    // zero non-null values — cross-partition prefix count + local frame
    // count detects that exactly (including the empty exclusive frame of
    // the first global row).
    // ONE select for all output columns — a per-spec withColumn fold
    // re-analyzes a growing plan per column and goes quadratic in
    // |specs| (24-spec caller q195 measured 17.4 s vs 1.2 s for one
    // spec on the same 18k-row frame; the single-select pass costs one
    // analysis regardless of spec count)
    val internal = ("__mid" +: specs.indices.flatMap(i =>
      Seq(s"__off$i", s"__offc$i", s"__v$i"))).toSet
    val outNames = specs.map(_._3).toSet
    val keep = withOff.columns
      .filterNot(c => internal(c) || outNames(c)).map(col(_))
    val outs = specs.zipWithIndex.map { case ((_, _, outCol), i) =>
      when(col(s"__offc$i") + count(col(s"__v$i")).over(w) === 0,
        lit(null).cast("long"))
        .otherwise(fs(i)._3(col(s"__off$i"),
          coalesce(fs(i)._1(col(s"__v$i")).over(w), lit(fs(i)._2))))
        .as(outCol)
    }
    withOff.select(keep ++ outs: _*)
  }
}
