package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-batch assembly operators (builder mandate: the step between
  * curation and the trainer — turning a cleaned corpus into the exact
  * sequences/splits a training job consumes). Like [[Sampling]], every
  * decision is keyed on a portable salted md5 of the row id — never
  * `rand()` — so a re-run, an incremental slice, or the DuckDB oracle
  * reproduces the identical assignment.
  *
  * Reference scope: the reference pipeline stops at loading curated rows
  * into a warehouse (reference `README.md:13`); these are the operators
  * its output feeds at 100 TB, kept in the same engine so the lineage
  * from raw crawl to training batch is one plan.
  */
object Batching {

  /** Portable hash-order key: lowercase-hex md5 of `salt:id`. Sorting by
    * (hkey, id) is a deterministic engine-independent shuffle of the
    * corpus — the "document order" every operator below packs or splits
    * against. */
  private def hkey(idCol: String, salt: String): Column =
    md5(concat(lit(s"$salt:"), col(idCol).cast("string")))

  /** Uniform 16-bit integer from the first four md5 nibbles (same
    * `instr` arithmetic as [[Sampling]]'s rate gate — DuckDB-replicable
    * verbatim, granularity 65536). Salt/column land inside an expr()
    * SQL string, so both are shape-restricted (no quote breakage, no
    * expression smuggling). */
  private def hash16(idCol: String, salt: String): Column = {
    require(salt.matches("[A-Za-z0-9_.:-]*"),
      s"salt must be [A-Za-z0-9_.:-]*, got '$salt'")
    require(idCol.matches("[A-Za-z0-9_]+"),
      s"idCol must be a plain identifier, got '$idCol'")
    def nib(i: Int) =
      s"(instr('0123456789abcdef', substr(md5(concat('$salt:', cast($idCol as string))),$i,1)) - 1)"
    expr(s"${nib(1)}*4096 + ${nib(2)}*256 + ${nib(3)}*16 + ${nib(4)}")
  }

  /** Concat-and-chunk sequence packing: deterministically shuffle each
    * stratum's docs (hash order), lay them end to end, and cut the tape
    * every `budget` tokens — a doc is assigned to the chunk its FIRST
    * token lands in (`chunk = floor(exclusive-cumsum / budget)`), the
    * layout GPT-style pretraining uses when documents are concatenated
    * with EOD separators and split into fixed-length sequences.
    *
    * Adds `chunk` to the input (plus nothing else); group on
    * (stratum, chunk) downstream for per-sequence manifests.
    *
    * Scale shape: ONE exchange on the stratum key and a per-stratum
    * running sum — no global-order window ever (packing across strata
    * has no training meaning; a single giant stratum should be
    * pre-split by a second hash-derived column folded into `strataCol`).
    * The assignment is stable under re-runs but NOT under corpus growth
    * (an inserted doc shifts every later chunk boundary in its stratum
    * — inherent to contiguous packing; re-pack per frozen snapshot). */
  def packChunks(df: DataFrame, strataCol: String, idCol: String,
                 tokenCol: String, budget: Long): DataFrame = {
    require(budget > 0, "budget must be positive")
    val w = Window.partitionBy(col(strataCol))
      .orderBy(hkey(idCol, "pack").asc, col(idCol).asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    df.withColumn("chunk",
      floor(coalesce(sum(col(tokenCol)).over(w), lit(0L)) / budget))
  }

  /** Deterministic k-fold assignment: `fold = hash16(id) % k`. Fully
    * NARROW (a codegen'd projection — zero shuffle, zero window) and
    * membership-stable: a row's fold never changes as the corpus grows,
    * so folds built incrementally stay consistent. `salt` decorrelates
    * the fold from other hash-keyed gates on the same ids. */
  def kFold(df: DataFrame, idCol: String, k: Int,
            salt: String = "fold"): DataFrame = {
    require(k > 0, "k must be positive")
    df.withColumn("fold", (hash16(idCol, salt) % k).cast("long"))
  }

  /** Per-stratum token-budget cap: keep each stratum's docs in hash
    * order while the RUNNING (inclusive) token total stays within
    * `budget` — "at most N tokens of each source", the knob that
    * down-weights an over-represented crawl without dropping it.
    * Membership is deterministic but (unlike [[Sampling.stratifiedRate]])
    * not stable under growth — a new low-hash doc displaces the tail.
    *
    * Same one-exchange-per-stratum shape as [[packChunks]]. The running
    * sum cannot be pruned below the exchange (every row's keep decision
    * needs its prefix), so the stratum's rows all shuffle once; when
    * only the CUTOFF is needed at extreme scale, derive the hash
    * threshold from a quantile scan over (hkey, tokens) instead and
    * apply it as a narrow filter. */
  def capTokens(df: DataFrame, strataCol: String, idCol: String,
                tokenCol: String, budget: Long): DataFrame = {
    require(budget > 0, "budget must be positive")
    val w = Window.partitionBy(col(strataCol))
      .orderBy(hkey(idCol, "cap").asc, col(idCol).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("__cum", sum(col(tokenCol)).over(w))
      .filter(col("__cum") <= budget)
      .drop("__cum")
  }

  /** Temperature-scaled dataset mixing at α = 0.5: stratum s keeps
    * `floor(totalKeep · √n_s / Σ√n_s)` rows — the multilingual-pretraining
    * rebalance that up-weights small sources relative to proportional
    * sampling without flattening to uniform (p_s ∝ n_s^α; α=1 is
    * proportional, α=0 uniform). Members are the stratum's smallest
    * salted-md5 ids, so the selection is deterministic, engine-portable,
    * and decorrelated from every other hash gate.
    *
    * α is FIXED at 0.5 on purpose: `sqrt` is IEEE-correctly-rounded on
    * every platform, so both engines compute bit-identical shares,
    * whereas a general `pow(n, α)` is not correctly rounded and a
    * last-ulp disagreement could flip a floor() at a target boundary.
    * The share arithmetic stays in EXACT integer space (fixed-point
    * √n·10⁶ longs; one double division per stratum) — no float
    * accumulation whose order could differ across engines.
    *
    * Scale shape: target derivation is a |strata|-sized aggregate +
    * 1-row total; membership is one row_number window per stratum (one
    * exchange). For strata too large to shuffle, derive the per-stratum
    * hash CUTOFF from the target instead (the capTokens note applies). */
  def temperatureMix(df: DataFrame, strataCol: String, idCol: String,
                     totalKeep: Long): DataFrame = {
    require(totalKeep > 0, "totalKeep must be positive")
    // a NULL stratum can never be selected (the membership equi-join
    // below skips null keys), so letting it into the counts would
    // silently shrink every real stratum's target by the null share —
    // null rows are excluded from BOTH the budget and the output
    val rows = df.filter(col(strataCol).isNotNull)
    val cnts = rows.groupBy(col(strataCol)).agg(count(lit(1)).as("__n"))
      .withColumn("__sq", floor(sqrt(col("__n")) * 1000000.0).cast("long"))
    // exact integer sum — order-free, no float accumulation
    val tot = cnts.agg(sum(col("__sq")).as("__sqt"))
    // share = floor(double(sq) · K / sqt): explicit double FIRST — a
    // long·long product can overflow at corpus scale, and the two
    // engines disagree on overflow (Spark wraps, DuckDB errors); the
    // double path is the same two IEEE ops in the same order on both
    val targets = cnts.crossJoin(broadcast(tot))
      .select(col(strataCol),
        floor(col("__sq").cast("double") * totalKeep / col("__sqt"))
          .cast("long").as("__target"))
    val w = Window.partitionBy(col(strataCol))
      .orderBy(hkey(idCol, "mix").asc, col(idCol).asc)
    rows.withColumn("__rn", row_number().over(w))
      .join(broadcast(targets), strataCol)
      .filter(col("__rn") <= col("__target"))
      .drop("__rn", "__target")
  }

  /** WATER-FILLING budget allocation (round 11): given per-stratum
    * weights (token counts) and a total `budget`, find the unique
    * integer LEVEL L such that Σᵢ min(nᵢ, L) fills the budget as far
    * as a uniform cap can — small strata keep everything, strata above
    * L are capped AT L. This is the fair-allocation rule behind "cap
    * the giant crawl dumps, keep the curated sources whole": unlike
    * proportional sampling it never starves a small source, unlike a
    * fixed per-source cap it spends the whole budget.
    *
    * Closed form over strata sorted by n asc (i = strata fully below
    * the level, P_i their weight prefix-sum, S strata total):
    * L_i = floor((budget − P_i) / (S − i)) is VALID iff n_i ≤ L_i
    * (the i taken strata really fit under it) and L_i < n_{i+1} (the
    * rest really cap); exactly one cut is valid unless the budget
    * covers everything (then every stratum keeps its full weight).
    * Integer arithmetic end-to-end — engine-exact.
    *
    * Returns one row per stratum: `(strataCol, n, alloc, capped)`.
    * The plan is one group-sized count aggregate + windows over the
    * |strata|-row frame — nothing data-sized past the first partial
    * aggregation. Σ alloc ≤ budget and budget − Σ alloc < S whenever
    * capping occurs (the integer floor's remainder). */
  def waterFillAllocation(df: DataFrame, strataCol: String,
                          weightCol: Column, budget: Long): DataFrame = {
    require(budget >= 0, "budget must be non-negative")
    waterFillCore(df, strataCol, weightCol, _ => lit(budget))
  }

  /** [[waterFillAllocation]] with the budget as a FRACTION of the total
    * weight — the scale-invariant face (the q164 contract query uses
    * it so the same allocation rule replays at every sf). */
  def waterFillAllocationFraction(df: DataFrame, strataCol: String,
                                  weightCol: Column,
                                  fraction: Double): DataFrame = {
    require(fraction >= 0, "fraction must be non-negative")
    waterFillCore(df, strataCol, weightCol,
      tot => floor(tot.cast("double") * fraction).cast("long"))
  }

  /** Shared body: `budgetOf` maps the total-weight column to the
    * budget column (evaluated on the 1-row stats frame). */
  private def waterFillCore(df: DataFrame, strataCol: String,
                            weightCol: Column,
                            budgetOf: Column => Column): DataFrame = {
    // the |strata|-row weight aggregate feeds FOUR downstream subtrees
    // (ranking, stats, candidate levels, final allocation) — lazily
    // localCheckpoint-ed so the weight scan (data-sized: it tokenizes
    // the corpus in q164) runs ONCE per action instead of once per
    // reference (r11 bench: 1.08 s → one-scan cost). Blocks are
    // |strata| rows; callers release post-action per the
    // caller-releases-the-RESULT contract (Bench/Verify do).
    val n = df.filter(col(strataCol).isNotNull)
      .groupBy(col(strataCol))
      .agg(sum(weightCol).cast("long").as("n"))
      .localCheckpoint(false)
    val wAsc = Window.orderBy(col("n").asc, col(strataCol).asc)
    // |strata| rows: the single-partition window is group-sized by
    // contract (strata are sources/langs — bounded), never data-sized
    val ranked = n
      .withColumn("__i", row_number().over(wAsc).cast("long"))
      .withColumn("__p", sum(col("n")).over(
        wAsc.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("__next", lead(col("n"), 1).over(wAsc))
    val st = ranked.agg(count(lit(1)).as("__s"),
        sum(col("n")).as("__tot"))
      .withColumn("__b", budgetOf(col("__tot")))
    val cand = ranked.crossJoin(broadcast(st))
      // cut AFTER row __i: rows 1..__i fully taken (prefix __p), the
      // remaining __s − __i rows cap at the level
      .withColumn("__lvl",
        floor((col("__b") - col("__p")) / (col("__s") - col("__i")))
          .cast("long"))
      .withColumn("__valid",
        col("__i") < col("__s") && col("n") <= col("__lvl") &&
          col("__lvl") < col("__next"))
    // the zero-cut case (every stratum caps: level < smallest n) has no
    // ranked row; its candidate level is floor(budget / S)
    val anyValid = cand.filter(col("__valid"))
      .agg(count(lit(1)).as("__any"))
    val lvl0 = st.crossJoin(broadcast(anyValid))
      .filter(col("__b") < col("__tot") && col("__any") === 0)
      .select(floor(col("__b") / col("__s")).cast("long").as("__lvl"))
    val level = cand.filter(col("__valid")).select(col("__lvl"))
      .unionByName(lvl0)
    n.crossJoin(broadcast(st))
      .join(broadcast(level), lit(true), "left")
      .select(col(strataCol), col("n"),
        when(col("__b") >= col("__tot"), col("n"))
          .otherwise(least(col("n"), coalesce(col("__lvl"), lit(0L))))
          .as("alloc"))
      .withColumn("capped", (col("alloc") < col("n")).cast("boolean"))
  }
}
