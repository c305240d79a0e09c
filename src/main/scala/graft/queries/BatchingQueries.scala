package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables._
import graft.operators.Batching

/** Round-5 batch-assembly + statistical-audit faces — the step between a
  * curated corpus and the trainer, plus the distribution checks a data
  * curator runs before shipping a snapshot:
  *
  *  - q127: concat-and-chunk sequence packing per language
  *    ([[Batching.packChunks]] — the GPT-style fixed-length-sequence
  *    layout, hash-order deterministic so the oracle replays it)
  *  - q128: deterministic k-fold split audit ([[Batching.kFold]])
  *  - q129: per-source token-budget cap ([[Batching.capTokens]])
  *  - q130: per-group z-score outlier audit (2σ rule on lineitem prices)
  *  - q131: per-event-type linear trend (regr_slope/intercept of value
  *    on fractional days — both engines' regr_* built-ins)
  *  - q132: lang × source chi-square independence statistic (is the
  *    language mix uniform across sources, or does a source skew?)
  *  - q133: per-user rolling 3-day time-RANGE features on the event
  *    stream (q81's value-range frame discipline applied to epoch time)
  *
  * Same design rules as the rest of the inventory: codegen'd built-ins
  * only, one exchange per keyed window, group-sized aggregates, every
  * query hash-checked against DuckDB.
  */
object BatchingQueries {

  /** Non-empty whitespace token count (shared contract expression —
    * identical to the q52/q107 tokenizer). */
  private val nToks = "size(filter(split(trim(text), ' '), x -> x != ''))"

  /** q127 sequence packing: pack each language's docs into 2048-token
    * chunks in deterministic hash order and emit the per-chunk manifest.
    * The pack window is per-LANGUAGE (one exchange, no global order);
    * the manifest aggregate is chunk-sized. */
  def q127(s: SparkSession, d: String): DataFrame =
    Batching.packChunks(
        documents(s, d).select(col("doc_id"), col("lang"),
          expr(nToks).cast("long").as("nt")),
        "lang", "doc_id", "nt", 2048L)
      .groupBy(col("lang"), col("chunk"))
      .agg(count(lit(1)).as("n_docs"), sum(col("nt")).as("tokens"))
      .orderBy("lang", "chunk")

  /** q128 k-fold audit: 5-fold deterministic assignment, then the
    * per-(fold, lang) census that checks the folds are balanced. The
    * fold gate is a NARROW projection — the only exchange is the
    * group-sized census aggregate. */
  def q128(s: SparkSession, d: String): DataFrame =
    Batching.kFold(documents(s, d), "doc_id", 5)
      .groupBy(col("fold"), col("lang"))
      .agg(count(lit(1)).as("n"), sum(col("n_chars")).as("__sc"))
      // TRUNCATED mean from exact integer sums: round(avg, 2) is an
      // engine-portability trap — a census mean is often an exact
      // decimal half (sum/n with small n), and Spark rounds the
      // shortest decimal repr (282.775 → 282.78) while DuckDB rounds
      // the binary value (282.774999… → 282.77). floor on the exact
      // rational sum*100/n is identical IEEE math in both engines.
      .select(col("fold"), col("lang"), col("n"),
        (floor(col("__sc") * 100 / col("n")) / 100.0).as("avg_chars"))
      .orderBy("fold", "lang")

  /** q129 token-budget cap: at most 800 tokens of each source (hash
    * order), then the per-source kept-vs-total census. One exchange on
    * the source for the cap window; the cap filter cannot prune below
    * it (every keep decision needs its running prefix) — the operator
    * doc records the quantile-scan cutoff alternative for strata too
    * large to shuffle. */
  def q129(s: SparkSession, d: String): DataFrame = {
    val toks = documents(s, d).select(col("doc_id"), col("source"),
      expr(nToks).cast("long").as("nt"))
    val kept = Batching.capTokens(toks, "source", "doc_id", "nt", 800L)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_kept"), sum(col("nt")).as("tokens_kept"))
    val total = toks.groupBy(col("source"))
      .agg(count(lit(1)).as("n_total"))
    // every source keeps >= 1 doc (budget >= max single-doc size here),
    // so the inner join is total on the source dimension
    kept.join(total, "source")
      .select(col("source"), col("n_kept"), col("tokens_kept"),
        col("n_total"))
      .orderBy("source")
  }

  /** q130 z-score outlier audit: lineitem prices more than 1.5 sample
    * standard deviations from their return-flag group mean (a uniform
    * distribution tops out at |z| = √3, so 1.5σ flags its tails; real
    * long-tailed data would use 2–3σ). Group stats
    * are a 3-row aggregate joined back (AQE broadcasts); the outlier
    * scan is a narrow codegen'd filter — the audit never shuffles data
    * rows, only the group-sized stat and result tables. */
  def q130(s: SparkSession, d: String): DataFrame = {
    val li = lineitem(s, d)
    val stats = li.groupBy(col("l_returnflag"))
      .agg(avg(col("l_extendedprice")).as("__mu"),
        stddev_samp(col("l_extendedprice")).as("__sd"))
    li.join(stats, "l_returnflag")
      .filter(abs(col("l_extendedprice") - col("__mu")) > lit(1.5) * col("__sd"))
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n_out"),
        round(min(col("l_extendedprice")), 2).as("lo"),
        round(max(col("l_extendedprice")), 2).as("hi"))
      .orderBy("l_returnflag")
  }

  /** q131 per-type linear trend: slope/intercept of event value over
    * fractional days (epoch micros / 86.4e9) via the regr_* aggregate
    * family — one partial+final pass, exchange = |event types|. */
  def q131(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .select(col("event_type"), col("value"),
        (unix_micros(col("ts").cast("timestamp")) / lit(8.64e10)).as("x"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        (round(expr("regr_slope(value, x)"), 5) + lit(0.0)).as("slope"),
        (round(expr("regr_intercept(value, x)"), 2) + lit(0.0)).as("icept"))
      .orderBy("event_type")

  /** q132 chi-square independence of lang × source: the contingency
    * CELLS are the only aggregate that touches rows (exchange =
    * |langs × sources|); marginals and the total re-aggregate the cell
    * table (metadata-sized), and the statistic folds in one final
    * 1-row pass. dof = (|lang|-1) × (|source|-1). */
  def q132(s: SparkSession, d: String): DataFrame = {
    val cells = documents(s, d)
      .groupBy(col("lang"), col("source"))
      .agg(count(lit(1)).cast("double").as("o"))
    val rl = cells.groupBy(col("lang")).agg(sum(col("o")).as("rl"))
    val cs = cells.groupBy(col("source")).agg(sum(col("o")).as("cs"))
    val tot = cells.agg(sum(col("o")).as("t"),
      countDistinct(col("lang")).as("nl"),
      countDistinct(col("source")).as("ns"))
    cells.join(rl, "lang").join(cs, "source").crossJoin(tot)
      .select((pow(col("o") - col("rl") * col("cs") / col("t"), 2) /
          (col("rl") * col("cs") / col("t"))).as("term"),
        col("t"), col("nl"), col("ns"))
      .groupBy(col("t"), col("nl"), col("ns"))
      .agg(round(sum(col("term")), 2).as("chi2"))
      .select(col("chi2"),
        ((col("nl") - 1) * (col("ns") - 1)).cast("long").as("dof"),
        col("t").cast("long").as("n"))
  }

  /** q133 rolling 3-day time-range features: per-user event count and
    * mean value over the trailing 72 h, computed as a value-RANGE frame
    * over integer epoch MICROS (q81's discipline on the time axis —
    * deterministic, peer-inclusive, engine-portable). One exchange on
    * user_id; the user_id < 40 bound keeps the contract output finite
    * while the frame semantics stay per-key and scale-free. */
  def q133(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(unix_micros(col("ts").cast("timestamp")))
      .rangeBetween(-259200000000L, Window.currentRow)
    events(s, d).filter(col("user_id") < 40)
      .select(col("user_id"), col("event_id"),
        count(lit(1)).over(w).as("n_3d"),
        // truncation, not round(): same portability trap as q128 —
        // short frames make exact decimal halves common
        (floor(sum(col("value")).over(w) / count(lit(1)).over(w)
          * 10000) / 10000.0).as("avg_3d"))
      .orderBy("user_id", "event_id")
  }

  /** q134 GLOBAL running total — the exact distributed twin of
    * `sum(v) OVER (ORDER BY ..., ROWS UNBOUNDED PRECEDING)` with NO
    * partition key, which Spark otherwise plans as a SinglePartition
    * window (the whole table through one task — q27's per-key window
    * can't express this and q29's funnel is the anti-pattern).
    * [[graft.operators.Ranking.runningAgg]] range-partitions on the
    * order, combines ONE aggregate per partition driver-side (metadata),
    * and rebases per-partition windows — every partition stays parallel.
    * This is the primitive a batch-assembly tape uses to cut a GLOBAL
    * token stream (packChunks's single-giant-stratum escape hatch).
    * floor() before the long cast: double→bigint casts truncate in
    * Spark but round in DuckDB; floor is identical IEEE on both. */
  def q134(s: SparkSession, d: String): DataFrame =
    graft.operators.Ranking.runningAgg(
        orders(s, d).select(col("o_orderkey"), col("o_orderdate"),
          floor(col("o_totalprice")).as("v")),
        orderCols = Seq("o_orderdate", "o_orderkey"), valueCol = "v",
        fn = "sum", outCol = "run_total")
      .select(col("o_orderkey"), col("run_total"))
      .orderBy("o_orderkey")

  /** q135 packing-efficiency audit: q127's layout graded — per language,
    * how full the 2048-token sequences actually are (`fill_rate` =
    * tokens / (chunks·2048)). The number a batch-assembly pipeline
    * watches: a low fill rate means wasted accelerator steps, a rate
    * near 1 means the packing is tight. Same per-stratum window as
    * q127; the audit itself is a group-sized rollup. Ratio emitted as a
    * floor-truncated exact rational (q128's portability rule). */
  def q135(s: SparkSession, d: String): DataFrame =
    Batching.packChunks(
        documents(s, d).select(col("doc_id"), col("lang"),
          expr(nToks).cast("long").as("nt")),
        "lang", "doc_id", "nt", 2048L)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("chunk")).as("n_chunks"),
        sum(col("nt")).as("tokens"))
      .select(col("lang"), col("n_docs"), col("n_chunks"), col("tokens"),
        (floor(col("tokens") * 10000.0 / (col("n_chunks") * 2048)) /
          10000.0).as("fill_rate"))
      .orderBy("lang")

  /** q137 cross-split leakage audit: near-duplicate documents (equal
    * bag-of-words fingerprint — md5 of the SORTED DISTINCT token set,
    * which catches token-shuffled copies exact dedup misses) landing in
    * DIFFERENT q128 folds. Split leakage is the eval-contamination
    * failure a k-fold protocol must audit before trusting held-out
    * metrics: a near-dup pair straddling train and eval folds leaks
    * training signal. Fingerprint and fold are both NARROW projections;
    * the only exchange is the fingerprint group. */
  def q137(s: SparkSession, d: String): DataFrame = {
    val fp = md5(concat_ws(" ",
      array_sort(array_distinct(expr(
        graft.operators.TextHashes.toks("text"))))))
    Batching.kFold(documents(s, d).select(col("doc_id"), col("text")),
        "doc_id", 5)
      .select(col("doc_id"), col("fold"), fp.as("fp"))
      .groupBy(col("fp"))
      .agg(min(col("doc_id")).as("rep"), count(lit(1)).as("n_docs"),
        countDistinct(col("fold")).as("n_folds"))
      .filter(col("n_docs") > 1 && col("n_folds") > 1)
      .select(col("rep"), col("n_docs"), col("n_folds"))
      .orderBy("rep")
  }

  /** q138 temperature-scaled mixing audit
    * ([[Batching.temperatureMix]], α=0.5, 200 docs total): per source,
    * corpus size vs rows actually kept. The α<1 rebalance up-weights
    * small sources relative to proportional sampling — the standard
    * multilingual-pretraining mix knob — and every kept/dropped decision
    * replays identically on the oracle (portable hash order + exact
    * fixed-point share arithmetic; see the operator doc for why α is
    * pinned to the one IEEE-exact exponent). */
  def q138(s: SparkSession, d: String): DataFrame = {
    val docs = documents(s, d).select(col("doc_id"), col("source"))
    val kept = Batching.temperatureMix(docs, "source", "doc_id", 200L)
      .groupBy(col("source")).agg(count(lit(1)).as("n_kept"))
    docs.groupBy(col("source")).agg(count(lit(1)).as("n_total"))
      .join(kept, Seq("source"), "left")
      .select(col("source"), col("n_total"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"))
      .orderBy("source")
  }

  /** q154 token-budget curriculum phases (round 11): rank the corpus
    * easiest-first by type-token ratio (high TTR = lexically diverse
    * prose, low = repetitive boilerplate), then cut the GLOBAL ordered
    * stream into consecutive 5000-token phases — the curriculum /
    * staged-training layout (phase 0 trains first), reported as a
    * per-phase manifest. TTR rounds at 4 BEFORE ordering so both
    * engines rank identical keys; ties break on doc_id.
    *
    * The global running token total comes from [[graft.operators
    * .Ranking.runningAgg]] (range partition + metadata offset rebase —
    * never a SinglePartition window; q134's operator), ordered by
    * (−ttr, doc_id): negating an IEEE double is exact, so ascending
    * −ttr IS descending ttr. `inclusive=false` yields the tokens
    * BEFORE each doc — a doc belongs to the phase it STARTS in. */
  def q154(s: SparkSession, d: String): DataFrame = {
    val t = documents(s, d)
      .select(col("doc_id"), expr(
        graft.operators.TextHashes.toks("text")).as("toks"))
      .filter(size(col("toks")) > 0)
      .select(col("doc_id"), size(col("toks")).cast("long").as("n_toks"),
        round(size(array_distinct(col("toks"))).cast("double") /
          size(col("toks")), 4).as("ttr"))
      .withColumn("neg_ttr", -col("ttr"))
    graft.operators.Ranking.runningAgg(t,
        orderCols = Seq("neg_ttr", "doc_id"), valueCol = "n_toks",
        fn = "sum", outCol = "cum_before", inclusive = false)
      // the global first row has NOTHING before it — runningAgg's
      // exclusive frame yields null there, the oracle's COALESCE 0
      .select(floor(coalesce(col("cum_before"), lit(0L)) / 5000)
          .cast("long").as("phase"),
        col("n_toks"), col("ttr"))
      .groupBy(col("phase"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_toks")).as("n_tokens"),
        min(col("ttr")).as("min_ttr"), max(col("ttr")).as("max_ttr"))
      .orderBy("phase")
  }

  /** q155 deterministic weighted sampling without replacement (round
    * 11): per source, the 3 documents drawn by the Efraimidis–Spirakis
    * A-ES scheme — key = −ln(u)/w with weight w = n_chars and u a
    * (0,1) uniform derived from the doc's salted md5 (first 8 nibbles
    * + 0.5, over 2³²) — smallest keys win. This is THE distributed
    * weighted-sample primitive (rank by key, no sequential pass), and
    * the hash-derived u makes the draw REPLAYABLE: both engines, and
    * any rerun, select the same docs — q128's portable-nibble
    * discipline applied to weighted sampling. Per-source window = the
    * accepted per-stratum shape (q39/q127); output orders by the
    * ROUNDED key so cross-engine ordering compares equal values. */
  /** q164 water-filling mixture allocation (round 11,
    * [[Batching.waterFillAllocationFraction]]): per-source token
    * budgets under a total budget of 60% of the corpus, allocated by
    * the unique uniform LEVEL L with Σ min(nᵢ, L) ≤ budget — small
    * sources keep every token, the giant dumps cap AT the level. The
    * fair-mixing rule between proportional sampling (starves small
    * sources) and fixed caps (wastes budget); fraction form so the
    * contract replays at every sf. Integer arithmetic end-to-end;
    * plan: one token-count partial aggregate, then windows over the
    * |sources|-row frame. */
  def q164(s: SparkSession, d: String): DataFrame =
    graft.operators.Batching.waterFillAllocationFraction(
        documents(s, d), "source", expr(nToks), 0.6)
      .orderBy("source")

  def q155(s: SparkSession, d: String): DataFrame = {
    def nib(i: Int) =
      s"(instr('0123456789abcdef', substr(md5(concat('ws:', cast(doc_id as string))),$i,1)) - 1)"
    val v32 = (1 to 8).map(i => s"${nib(i)} * ${1L << (4 * (8 - i))}L")
      .mkString(" + ")
    val key = expr(s"-ln((($v32) + 0.5D) / 4294967296.0D) / n_chars")
    val w = Window.partitionBy(col("source"))
      .orderBy(col("key").asc, col("doc_id").asc)
    documents(s, d).select(col("source"), col("doc_id"), col("n_chars"))
      .withColumn("key", key)
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
      .select(col("source"), col("doc_id"),
        round(col("key") * 1000000, 4).as("key_ppm"))
      .orderBy(col("source"), col("key_ppm"), col("doc_id"))
  }

  /** q169 class-weight table for imbalanced strata — the two standard
    * loss-reweighting schemes a trainer consumes verbatim: inverse
    * frequency w = N/(k·n_c), and the class-balanced effective-number
    * weight w = (1−β)/(1−β^{n_c}) at β = 0.999 (Cui et al.'s "
    * effective number of samples": repeated samples saturate, so huge
    * classes stop earning proportionally smaller weights).
    *
    * Plan: one |types|-row count aggregate + a 1-row broadcast of
    * (N, k) — group-sized everything. w_inv is a ratio of exact
    * integers → scaled integer floor division (q136's rule); the
    * class-balanced weight is irrational (exp/ln on both faces —
    * identical expression shape) → round(4) (q126's rule). */
  def q169(s: SparkSession, d: String): DataFrame = {
    val byType = events(s, d).groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_c"))
    val tot = byType.agg(sum(col("n_c")).as("n"), count(lit(1)).as("k"))
    byType.crossJoin(broadcast(tot))
      .select(col("event_type"), col("n_c"),
        (floor(col("n") * 10000.0 / (col("k") * col("n_c"))) / 10000.0)
          .as("w_inv"),
        round(lit(0.001) /
          (lit(1.0) - exp(col("n_c") * log(lit(0.999)))), 4).as("w_cb"))
      .orderBy("event_type")
  }

  /** q170 exact stratified sample allocation by largest remainder
    * (Hamilton's method): a global budget of 1000 rows split across
    * event-type strata proportionally — floor share first, then the
    * strata with the largest fractional remainders (ties by type name)
    * absorb the leftover, so Σ quota = budget EXACTLY; the allocation
    * every stratified sampler needs before it draws a single row.
    *
    * Plan: one |types|-row count aggregate, a 1-row broadcast total,
    * and windows over the |types|-row frame (q164's accepted shape —
    * the data-scale table is touched once, for counts). All integer
    * arithmetic: base = ⌊S·n_c/N⌋ and remainder r_c = S·n_c − base·N
    * are exact on both engines. */
  def q170(s: SparkSession, d: String): DataFrame = {
    val budget = 1000L
    val byType = events(s, d).groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_c"))
    val tot = byType.agg(sum(col("n_c")).as("n"))
    val based = byType.crossJoin(broadcast(tot))
      .withColumn("base",
        floor(lit(budget) * col("n_c") * lit(1.0) / col("n")).cast("long"))
      .withColumn("rem", lit(budget) * col("n_c") - col("base") * col("n"))
    val wR = Window.orderBy(col("rem").desc, col("event_type").asc)
    val wAll = Window.rowsBetween(Window.unboundedPreceding,
      Window.unboundedFollowing)
    based
      .withColumn("pos", row_number().over(wR))
      .withColumn("leftover", lit(budget) - sum(col("base")).over(wAll))
      .select(col("event_type"), col("n_c"),
        (col("base") +
          when(col("pos") <= col("leftover"), 1L).otherwise(0L))
          .as("quota"))
      .orderBy("event_type")
  }

  /** q181 mutual information of the lang × source contingency — the
    * information-theoretic twin of q132's chi-square: MI =
    * Σ p_ij·ln(p_ij·N / (r_i·c_j)) in nats, with the marginal
    * entropies for context (MI ≤ min(H_lang, H_source); MI ≈ 0 means
    * a source tells you nothing about language — the independence a
    * balanced corpus wants). Plan: the |langs × sources| cell count is
    * the only aggregate touching rows; marginals re-aggregate the cell
    * table (metadata-sized) and each statistic folds in a 1-row pass.
    * round(4) on the irrational log sums (q126's rule). */
  def q181(s: SparkSession, d: String): DataFrame = {
    val cells = documents(s, d)
      .groupBy(col("lang"), col("source"))
      .agg(count(lit(1)).cast("double").as("o"))
    val rl = cells.groupBy(col("lang")).agg(sum(col("o")).as("rl"))
    val cs = cells.groupBy(col("source")).agg(sum(col("o")).as("cs"))
    val tot = cells.agg(sum(col("o")).as("t"))
    val mi = cells.join(rl, "lang").join(cs, "source")
      .crossJoin(broadcast(tot))
      .agg((round(sum((col("o") / col("t")) *
        log(col("o") * col("t") / (col("rl") * col("cs")))), 4)
        + lit(0.0)).as("mi"))
    val hl = rl.crossJoin(broadcast(tot))
      .agg((round(-sum((col("rl") / col("t")) *
        log(col("rl") / col("t"))), 4) + lit(0.0)).as("h_lang"))
    val hs = cs.crossJoin(broadcast(tot))
      .agg((round(-sum((col("cs") / col("t")) *
        log(col("cs") / col("t"))), 4) + lit(0.0)).as("h_source"))
    tot.select(col("t").cast("long").as("n_docs"))
      .crossJoin(broadcast(mi))
      .crossJoin(broadcast(hl))
      .crossJoin(broadcast(hs))
  }

  /** q194 exact TOKEN-weighted document-length quantiles per language
    * (round 14): the length L such that 25/50/75% of the language's
    * TOKEN MASS lives in documents of ≤ L tokens — the number sequence-
    * length planning actually needs (q112's doc-weighted quantiles
    * answer "how long is a typical document"; packing and truncation
    * budgets care how long the typical TOKEN's document is, and the two
    * diverge hard on heavy-tailed corpora where a few long docs carry
    * most of the mass).
    *
    * Lower weighted quantile (min L with W(≤L) ≥ α·W) — so selection is
    * PURE INTEGER: the α comparisons are cross-multiplied
    * (4·cum ≥ W, 2·cum ≥ W, 4·cum ≥ 3·W), no double ever enters the
    * contract. Scale shape: one (lang, n_tok) aggregate (length-domain-
    * bounded), ONE global [[graft.operators.Ranking.runningAggMulti]]
    * pass ordered (lang, n_tok) with q192's |langs|-row triangular
    * offset rebase — never a per-enum window — then a |cells|-bounded
    * conditional-min fold. */
  def q194(s: SparkSession, d: String): DataFrame = {
    val f = documents(s, d)
      .select(col("lang"), expr(nToks).cast("long").as("n_tok"))
      .filter(col("n_tok") > 0)
    val cnt = f.groupBy(col("lang"), col("n_tok"))
      .agg(sum(col("n_tok")).as("w"))
    val cum = graft.operators.Ranking.runningAggMulti(cnt,
      Seq("lang", "n_tok"), Seq(("w", "sum", "cumw")))
    val wt = cnt.groupBy(col("lang")).agg(sum(col("w")).as("wtot"))
    val off = wt
      .join(wt.select(col("lang").as("lg_b"), col("wtot").as("w_b")),
        col("lg_b") < col("lang"), "left_outer")
      .groupBy(col("lang"))
      .agg(coalesce(sum(col("w_b")), lit(0L)).as("off"))
    cum.join(broadcast(off), "lang").join(broadcast(wt), "lang")
      .select(col("lang"), col("n_tok"), col("wtot"),
        (col("cumw") - col("off")).as("cw"))
      .groupBy(col("lang"))
      .agg(max(col("wtot")).as("token_mass"),
        min(when(col("cw") * 4 >= col("wtot"), col("n_tok"))).as("p25_len"),
        min(when(col("cw") * 2 >= col("wtot"), col("n_tok"))).as("p50_len"),
        min(when(col("cw") * 4 >= col("wtot") * 3, col("n_tok")))
          .as("p75_len"))
      .orderBy("lang")
  }
}
