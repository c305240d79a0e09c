package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.{Metrics, TestSpark}

/** Plan contracts: the shuffle-volume properties PLANS.md claims,
  * pinned as tests so a future edit can't silently reintroduce a fat
  * exchange. Bounds are generous (×4 headroom over measured values at
  * sf0.001) — they catch shape regressions (partial agg lost, pushdown
  * broken, WindowGroupLimit defeated), not noise. */
class PlanContractSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def shuffled(name: String): Long =
    Metrics.shuffleOf(spark) {
      graft.SparkEntry.queries(name)(spark, sf)
        .write.format("noop").mode("overwrite").save()
    }.recordsWritten

  test("q20 aggregation exchange carries |groups|, not |rows|") {
    // 6 groups x 4 partitions partials + final sort rows
    assert(shuffled("q20_agg_group") <= 100,
      "partial aggregation must shrink the exchange to group cardinality")
  }

  test("q44 multi-join exchange stays group-sized (broadcast dims hold)") {
    assert(shuffled("q44_multi_join_agg") <= 100,
      "dimension joins must broadcast; only the aggregate may shuffle")
  }

  test("q39 top-k per group prunes the window exchange map-side") {
    // WindowGroupLimit: rank<=3 filters before the shuffle
    assert(shuffled("q39_topk_group") <= 200,
      "rank filter must push below the exchange (WindowGroupLimit)")
  }

  test("q04 global top-k plans per-partition heaps (TakeOrderedAndProject)") {
    // the plan-node assertion is the contract; the record bound is
    // relaxed from == 0 because TakeOrderedAndProject legitimately
    // shuffles the per-partition top-k whenever the scan has >1 input
    // partition (a file split or parallelism change would flip an
    // exact-zero assertion without any plan regression)
    val plan = graft.SparkEntry.queries("q04_topk")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"orderBy+limit must plan per-partition heaps, not a sort exchange:\n$plan")
    val limit = 10
    assert(shuffled("q04_topk") <= limit * 32L,
      "only per-partition top-k rows may cross the exchange")
  }

  // ---- temporal family: the shapes PLANS.md claims, measured ----------

  private def executedPlan(name: String): String = {
    val df = graft.SparkEntry.queries(name)(spark, sf)
    // collect() executes THIS Dataset's QueryExecution, so the adaptive
    // plan below is the FINAL one (a noop .write would spawn a separate
    // QueryExecution and leave this plan un-executed, isFinalPlan=false
    // — asserting on the pre-AQE plan misses runtime rewrites)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("isFinalPlan=false"),
      s"plan must be post-AQE final for the contract to mean anything:\n$plan")
    // the adaptive toString prints Final AND Initial sections — counting
    // nodes across both would double every Exchange/Join
    plan.split("== Initial Plan ==")(0)
  }

  test("q61 as-of join is the union+window form: zero join operators") {
    val plan = executedPlan("q61_asof_join")
    assert(!plan.contains("Join"),
      s"asofJoin must be union+window, never a per-row theta join:\n$plan")
  }

  test("q62 range pairing resolves through exactly one equi-join") {
    val plan = executedPlan("q62_pairs_range")
    val joins = "(?i)(SortMergeJoin|BroadcastHashJoin|ShuffledHashJoin)".r
      .findAllIn(plan).length
    assert(joins == 1,
      s"bucket-binned range join must be ONE equi-join, found $joins:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"),
      s"range pairing must never degrade to a theta/cross join:\n$plan")
  }

  test("q63 sessionize stays within two exchanges") {
    val plan = executedPlan("q63_sessionize")
    val exchanges = "Exchange".r.findAllIn(plan).length
    assert(exchanges <= 2,
      s"gaps-and-islands must reuse ONE user_id exchange + final agg, " +
        s"found $exchanges:\n$plan")
  }

  // ---- round-3 extension family ---------------------------------------

  test("q90 forward as-of keeps the zero-join union+window shape") {
    val plan = executedPlan("q90_asof_forward")
    assert(!plan.contains("Join"),
      s"forward asofJoin must stay union+window, never a theta join:\n$plan")
  }

  test("q147 LEFT as-of prices like the inner form: union+window, " +
      "zero joins (r9)") {
    val plan = executedPlan("q147_asof_left")
    assert(!plan.contains("Join"),
      s"keepUnmatched must not reintroduce a join (the left form only " +
        s"drops the null filter + unions the null-key residue):\n$plan")
  }

  test("q79 IVF search never plans a cartesian product against the corpus") {
    // centroids and probe lists broadcast; the corpus side may only meet
    // them through BroadcastNestedLoopJoin-free broadcast hash joins or
    // the tiny crossJoin against the broadcast K-row centroid set
    val plan = executedPlan("q79_ivf_ann")
    assert(!plan.contains("CartesianProduct"),
      s"IVF must broadcast centroids/probes, not cross-shuffle the corpus:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"IVF candidate scoring must be broadcast-joined, not shuffled:\n$plan")
  }

  test("q81 value-RANGE frame runs over one partition exchange") {
    val plan = executedPlan("q81_range_frame")
    val exchanges = "Exchange".r.findAllIn(plan).length
    // one o_custkey exchange + the contract sort
    assert(exchanges <= 2,
      s"RANGE frame must evaluate in one sorted pass per key, " +
        s"found $exchanges exchanges:\n$plan")
  }

  // ---- round-4 swaps: the contract faces now carry distributed bodies

  test("q29 ranks without a single-task window funnel") {
    // the old body's Window.orderBy planned Exchange SinglePartition +
    // a Window node; the Ranking form has neither (the pre-checkpoint
    // range sort runs as its own parallel job)
    val plan = executedPlan("q29_window_ntile")
    assert(!plan.contains("Window"),
      s"q29 must use the distributed ranking form, not a global window:\n$plan")
    assert(!plan.contains("SinglePartition"),
      s"q29 must never funnel rows through one partition:\n$plan")
  }

  test("q64 quantile scan never shuffles data rows (sf0.1 measured)") {
    // the returned frame is driver-assembled, so a plan-string assert
    // would be vacuous — the contract lives in the EAGER jobs the scan
    // runs while constructing it, and those are captured by job-group-
    // scoped shuffle metrics. At sf0.1 the stacked input is 1.2M rows:
    // the retired percentile form shuffled O(distinct)-sized buffers,
    // the range-sort form all 1.2M rows; the histogram scan's partial
    // aggregations must stay metadata-sized (partitions × targets ×
    // bins after map-side combine — measured ~10k; bound has headroom).
    // Only discriminating at this sf: below ~100k rows the bin partials
    // aren't yet map-side-combined under the data row count.
    val shuffledRecs = Metrics.shuffleOf(spark) {
      graft.SparkEntry.queries("q64_percentiles")(spark, "/root/testdata/sf0.1")
        .write.format("noop").mode("overwrite").save()
    }.recordsWritten
    assert(shuffledRecs <= 100000L,
      s"quantile scan must shuffle bin metadata, not the 1.2M stacked " +
        s"data rows: $shuffledRecs records crossed an exchange")
  }

  test("q96 encode ranks its vocabulary without a global-order window") {
    // rankVocab uses Ranking.exactRowNumber: no Window node, no
    // single-partition funnel anywhere in the encode plan
    val plan = executedPlan("q96_encode")
    assert(!plan.contains("Window"),
      s"vocab ranking must be the distributed exactRowNumber form:\n$plan")
    assert(!plan.contains("SinglePartition"),
      s"encode must never funnel the vocabulary through one partition:\n$plan")
  }

  test("q89 salted join spreads the key: no single-key exchange partner") {
    // the contract is structural: join key must be (custkey, __salt) —
    // visible as a hash partitioning over TWO expressions on both sides
    val plan = executedPlan("q89_salted_join")
    assert(plan.contains("custkey") && plan.contains("__salt"),
      s"salted join must shuffle on (key, salt), not the bare key:\n$plan")
  }

  test("q120 prefix join never plans a cartesian product") {
    // candidates must come from the prefix inverted-index EQUI-join;
    // a cartesian/NLJ pairing would mean the pruning silently died
    val plan = executedPlan("q120_prefix_join")
    assert(!plan.contains("CartesianProduct"),
      s"prefix join must pair through the inverted index:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      s"prefix join must never fall back to NLJ pairing:\n$plan")
  }

  test("q121 TWAP reuses the window's user_id exchange for the aggregate") {
    // lead() partitions by user_id; the per-user aggregate must ride the
    // same exchange — one data exchange + the contract sort, zero joins
    val plan = executedPlan("q121_twap")
    val exchanges = "Exchange".r.findAllIn(plan).length
    assert(exchanges <= 2,
      s"TWAP must be window exchange + final sort only, found $exchanges:\n$plan")
    assert(!plan.contains("Join"),
      s"TWAP is a single-table read — no join may appear:\n$plan")
  }

  test("q122 funnel aggregates signups once and joins once") {
    // the naive form references the signup aggregate twice and Spark
    // scans+aggregates it twice; the contract pins the single-pass shape
    val plan = executedPlan("q122_funnel")
    val scans = "FileScan".r.findAllIn(plan).length
    assert(scans == 2,
      s"funnel must scan events twice (signup + purchase pushdowns), " +
        s"not re-aggregate the signup side, found $scans scans:\n$plan")
    val joins = "(?i)(SortMergeJoin|BroadcastHashJoin|ShuffledHashJoin)".r
      .findAllIn(plan).length
    assert(joins == 1,
      s"funnel must pair signups to purchases through ONE equi-join:\n$plan")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"horizon predicate must ride the equi-join, never a theta join:\n$plan")
  }

  test("q123 correlation matrix is one aggregate pass over one scan") {
    // all six Pearson pairs are co-moment aggregates on the same scan;
    // the only exchange carries one partial-aggregate row per partition
    // and the 6-row reshape happens after it — a per-pair self-join
    // would show extra scans/joins here
    val plan = executedPlan("q123_corr_matrix")
    assert("FileScan".r.findAllIn(plan).length == 1,
      s"corr matrix must compute all pairs on ONE scan:\n$plan")
    val exchanges = "Exchange".r.findAllIn(plan).length
    assert(exchanges <= 1,
      s"corr matrix may only shuffle partial-agg rows, found $exchanges:\n$plan")
    assert(!plan.contains("Join"),
      s"corr matrix must never self-join per pair:\n$plan")
  }

  test("q124/q125/q126 sequence/entropy/decay plans stay join-free") {
    // transition matrix: user window + matrix-sized aggs; entropy:
    // (lang,tok) counts + lang rollup; decay: window + agg on the SAME
    // user_id exchange — none of them may introduce a join
    for ((q, maxEx) <- Seq("q124_transitions" -> 4, "q125_entropy" -> 3,
        "q126_decay" -> 2)) {
      val plan = executedPlan(q)
      assert(!plan.contains("Join"), s"$q must be join-free:\n$plan")
      val exchanges = "Exchange".r.findAllIn(plan).length
      assert(exchanges <= maxEx,
        s"$q exceeded its exchange budget ($exchanges > $maxEx):\n$plan")
    }
  }

  test("q106 bucketed join plans zero join exchanges (layout paid at ingest)") {
    // both sides land bucketed by custkey, so the sort-merge join reads
    // co-located buckets directly: the ONLY exchanges in the final plan
    // are the group-sized aggregate and the contract sort — a plain
    // (unbucketed) join would add two row-sized exchanges before the join
    val plan = executedPlan("q106_bucket_join")
    assert(plan.contains("SortMergeJoin"),
      s"merge hint must pin the sort-merge path over the bucketed scans:\n$plan")
    val exchanges = "Exchange".r.findAllIn(plan).length
    assert(exchanges <= 2,
      s"expected only the aggregate + sort exchanges, found $exchanges:\n$plan")
    assert(shuffled("q106_bucket_join") <= 400,
      "join must move zero data rows; only group-sized agg/sort partials")
  }

  test("q134 global running total never plans a SinglePartition window") {
    // the naive form funnels the whole table through one task; the
    // runningAgg body must show range partitioning + pid-keyed windows
    val plan = executedPlan("q134_running_total")
    assert(!plan.contains("SinglePartition"),
      s"global running agg must not serialize into one task:\n$plan")
    assert(plan.contains("rangepartitioning"),
      s"order must pin partitions via a range exchange:\n$plan")
  }

  test("q138 temperature mix broadcasts its targets and windows per stratum") {
    val plan = executedPlan("q138_temp_mix")
    assert(plan.contains("BroadcastExchange"),
      s"|strata|-sized target table must broadcast, never shuffle the corpus side:\n$plan")
    assert(plan.contains("hashpartitioning(source"),
      s"membership window must key its one exchange on the stratum:\n$plan")
  }

  test("q136 novelty never windows the shingle key (r6 hot-key fix)") {
    // min(doc_id) OVER (PARTITION BY s) put every row of a hot shingle
    // into one task; the aggregate+join-back body has no Window at all
    // and its only join is doc_id-keyed between doc-sized aggregates
    val plan = executedPlan("q136_novelty")
    assert(!plan.contains("Window"),
      s"novelty must aggregate+join-back, never window the shingle key:\n$plan")
  }

  test("q110 containment df-cap keeps the candidate exchange bounded") {
    // the r5-flagged uncapped self-join exploded on hot shingles; with
    // the df<=20 gate the shuffle stays proportional to informative
    // shingle volume (measured ~17k records at sf0.001; x4 headroom)
    assert(shuffled("q110_containment") <= 70000,
      "df cap must bound the inverted-index join's shuffle volume")
  }

  test("q142 embedding-dim audit exchanges 64 groups, not 64x rows") {
    // posexplode fans 100 vectors to 6400 rows, but partial aggregation
    // must shrink the exchange to |dims| x partitions partials plus the
    // 64 sort rows — never the exploded stream
    assert(shuffled("q142_embed_dims") <= 64 * 40L,
      "per-dim stats must partial-aggregate below the exchange")
  }

  test("q144 novelty curve: fingerprint exchange + 10-row decile agg") {
    // fingerprint groupBy + join-back (both on fp — one partitioning,
    // reused) + max-id scalar + 10-group aggregate; the bound is
    // ~2x docs + partials, far under any per-token/shingle explosion
    assert(shuffled("q144_novelty_curve") <= 4000,
      "novelty curve must shuffle doc-level fingerprints only")
  }

  // ---- round-11 additions: measured at sf0.001, bounds ×4 ----------

  test("q153 BM25: term filter lands before the tf aggregate — " +
      "exchanges are doc/term-bounded, never token-stream-sized") {
    // measured 3657 (dl rollup ∝ docs + 4-term tf/df partials); the
    // token stream at sf0.001 is ~4k tokens ALL of which would cross
    // un-aggregated if the filter slipped above the explode
    assert(shuffled("q153_bm25") <= 15000,
      "BM25 exchanges must stay bounded by docs + query-term hits")
  }

  test("q157 banded edit-distance join: candidates ∝ band population, " +
      "no cartesian") {
    val plan = executedPlan("q157_edit_distance")
    assert(!plan.contains("CartesianProduct"),
      s"length-band join must plan an equi-join:\n$plan")
    assert(shuffled("q157_edit_distance") <= 100,
      "only banded candidates and results may shuffle") // measured 14
  }

  test("q158 entropy rate: ONE vocabulary²-bounded count feeds " +
      "context/total folds — token volume never crosses the wire") {
    // measured 9132 = |distinct (lang,bigram)| partials + folds; the
    // exploded bigram stream is ~8x larger and must partial-aggregate
    assert(shuffled("q158_entropy_rate") <= 36000,
      "bigram counts must partial-aggregate below the exchange")
  }

  test("q162 b-bit audit and q159 LSH audit: inverted-index pair " +
      "generation, never all-pairs") {
    assert(shuffled("q162_bbit_minhash") <= 15000, // measured 3530
      "pair feed must be shared-shingle-bounded")
    assert(shuffled("q159_lsh_audit") <= 28000, // measured 6926
      "candidates must come from band keys, truth from the inverted index")
    // the 1-row metric cross-joins carry broadcast hints and plan as
    // BroadcastNestedLoopJoin, so ANY CartesianProduct occurrence is a
    // data-sized join regression. (The round-11 guard `!contains(A) ||
    // !contains("CartesianProduct, inner")` was vacuous — plan strings
    // never contain the literal right operand, driver ADVICE r11.)
    val plan = executedPlan("q159_lsh_audit")
    assert(!plan.contains("CartesianProduct"),
      s"no cartesian allowed (metric cross-joins must broadcast):\n$plan")
  }

  test("q164 water-fill: everything past the weight aggregate is " +
      "|strata|-row work") {
    assert(shuffled("q164_water_fill") <= 250, // measured 62
      "only strata-row frames may shuffle after the count partial-agg")
  }

  test("q156/q163 event audits: one tagged counting pass each, " +
      "group-sized exchanges") {
    assert(shuffled("q156_psi_drift") <= 250, // measured 56
      "PSI cells must partial-aggregate to types×bins")
    assert(shuffled("q163_purged_split") <= 700, // measured 166
      "segment counts + user-distinct leak census only")
  }

  // ---- round-12 additions: measured at sf0.001, bounds ×4 ----------

  test("q167/q168 corpus-statistics: ONE vocabulary-bounded exchange " +
      "each — the token stream never crosses the wire") {
    assert(shuffled("q167_js_divergence") <= 1000, // measured 33
      "JS divergence must partial-aggregate to per-token half counts")
    assert(shuffled("q168_good_turing") <= 1000, // measured 58
      "freq-of-freqs must collapse below the exchange")
  }

  test("q169/q170/q174 event audits: |types|- or |users|-bounded " +
      "exchanges, never event rows") {
    assert(shuffled("q169_class_weights") <= 100, // measured 11
      "class weights shuffle the 5-row type census only")
    assert(shuffled("q170_stratified_quota") <= 100, // measured 11
      "quota allocation shuffles the 5-row type census only")
    assert(shuffled("q174_activity_gini") <= 700, // measured 155
      "gini must rank the user-bounded census, not events")
  }

  test("q171/q172 lexical audits: per-doc-vocabulary exchanges " +
      "(doc×token partials), never raw token occurrences") {
    assert(shuffled("q171_burstiness") <= 50000, // measured 11774
      "burstiness must partial-aggregate (doc, token) counts")
    assert(shuffled("q172_hapax_ratio") <= 50000, // measured 12274
      "hapax scoring must ride the (doc, token) count frame")
  }

  test("q173 MATTR is narrow: sliding windows stay inside codegen, " +
      "only the doc-level rollup shuffles") {
    assert(shuffled("q173_mattr") <= 2000, // measured 420
      "window distinct-counts must be per-row HOFs, not exploded rows")
  }

  test("q175/q178 corpus profiles: scan-family quantiles and " +
      "vocabulary-bounded coverage — no data-row exchanges") {
    // q175's quartiles ride the histogram-refinement scan (zero data
    // shuffle); only metadata/target counts cross (measured 1505)
    assert(shuffled("q175_embed_norms") <= 6000,
      "norm quartiles must use the scan family, not a sort exchange")
    assert(shuffled("q178_coverage_curve") <= 1000, // measured 32
      "coverage must ride the vocabulary count + a 50-row window")
  }

  test("q176/q177/q179 event profiles: one user- or cell-bounded " +
      "exchange each, never a per-type full sort") {
    assert(shuffled("q176_hour_profile") <= 1000, // measured 245
      "hour profile shuffles types×24 cells only")
    assert(shuffled("q177_markov_entropy") <= 4500, // measured 1057
      "entropy rate rides q124's user window + the 25-cell matrix")
    // round 13 (r12 verdict #3): the pooled rate now rides whole-frame
    // windows over the |types|-row bySrc frame, so the row-scale
    // user-key window has exactly ONE lineage reference — the prior
    // crossJoin(agg(bySrc)) form ran it twice when no ReusedExchange
    // was planted under the duplicated subplan. Count Window EXEC NODES
    // partitioned by user_id, not raw windowspecdefinition substrings
    // (r13 ADVICE: one node prints the spec once per window EXPRESSION,
    // so a benign second aggregate over the same window would trip a
    // substring count without any duplicated execution): one node line
    // per WindowExec, user_id in its partition spec.
    val p177 = executedPlan("q177_markov_entropy")
    val userWindowNodes = p177.linesIterator.count(l =>
      l.contains("Window [") && l.contains("windowspecdefinition(user_id#"))
    assert(userWindowNodes == 1,
      s"the row-scale user window must execute exactly once " +
        s"(found $userWindowNodes Window nodes over user_id):\n$p177")
    assert(shuffled("q179_lag_corr") <= 4500, // measured 1010
      "lag correlation rides the user window + |types| moments")
  }

  test("q180/q181/q182 distribution audits: distinct-value, cell-, " +
      "and per-vector-bounded exchanges") {
    // KS cumulates the DISTINCT-value frame through runningAgg (range
    // partition + metadata rebase; its localCheckpoint splits those
    // jobs out of this plan). The main plan's only SinglePartition
    // exchanges may be 1-ROW scalar aggregates (the n1/n2 totals) —
    // never a window: a partitionless cumulative window would funnel
    // the whole distinct-value frame through one task.
    val plan = executedPlan("q180_ks_test")
    assert(plan.split("SinglePartition").length - 1 <= 2,
      s"only scalar-aggregate exchanges may be SinglePartition:\n$plan")
    // runningAgg's window IS here (partitioned by the materialized pid
    // column: `windowspecdefinition(_w0#…, value ASC, …)`); what must
    // NOT appear is a PARTITIONLESS spec, which prints with the order
    // column first — that would be a global cumulative window.
    assert(("windowspecdefinition\\(value#\\d+ ASC").r
        .findFirstIn(plan).isEmpty,
      s"cumulative sums must ride a pid-partitioned window:\n$plan")
    assert(shuffled("q180_ks_test") <= 10000, // measured 2344
      "KS shuffles per-value counts + the running-sum frame only")
    assert(shuffled("q181_mutual_info") <= 2000, // measured 450
      "MI shuffles langs×sources cells + marginals only")
    assert(shuffled("q182_label_cohesion") <= 5000, // measured 1160
      "cohesion shuffles labels×dims cells + per-vector partials")
  }

  test("q166 quantile normalization: no per-type window sort over the " +
      "row-scale events table (r12 — the r11 verdict's weak mark)") {
    val plan = executedPlan("q166_quantile_norm")
    // the within-type rank must come from exactPercentRankByGroup
    // (tie-class collapse + runningAgg rebase); a Window partitioned by
    // the bounded event_type enum would sort ~1/|types| of ALL events
    // in ONE task at 100×. runningAgg's own window partitions by the
    // range-partition id, never by event_type.
    assert(!plan.contains("windowspecdefinition(event_type"),
      s"within-type rank must not be a per-enum-value window:\n$plan")
    // exchanges: global-rank range partition + tie-class partials +
    // the class join-back — all data- or class-bounded (measured 4987)
    assert(shuffled("q166_quantile_norm") <= 20000,
      "q166 must shuffle ranks and tie classes only")
  }

  test("q103 serving plan never re-shuffles the signature store (r9)") {
    // the bucketed index table is the 100-TB contract: the store scan
    // must carry its bucket layout, the touched-key prune must stream
    // the store through a broadcast semi join, and NO exchange may key
    // on the store's own bkey attribute — the representative-cap window
    // and candidate join both reuse the scan's partitioning. The
    // increment side may exchange freely (it is batch-sized).
    //
    // Since r10 the shipped q103 PINS the dominated set, so its final
    // plan shows only checkpoint scans; the contract lives on the
    // pipeline the pin executes — the SAME call with materialize=false,
    // whose single plan exposes the store scan end-to-end.
    // the SHIPPED pipeline, lazy twin — store build, increment, and
    // serve all come from q103Pipeline itself (round 11), so this
    // contract pins exactly what q103 runs and cannot drift from it
    val df = graft.queries.ExtendedQueries
      .q103Pipeline(spark, sf, materialize = false)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("isFinalPlan=false"),
      s"plan must be post-AQE final for the contract to mean anything:\n$plan")
    val scanRe =
      ("FileScan parquet spark_catalog\\.default\\.graft_sig_idx" +
        "[^\\[]*\\[bkey#(\\d+)").r
    val scan = scanRe.findFirstMatchIn(plan)
    assert(scan.isDefined,
      s"q103 must serve from the bucketed graft_sig_idx table:\n$plan")
    assert(plan.contains("Bucketed: true"),
      s"the signature-index scan must use its bucket layout:\n$plan")
    val storeBkey = s"bkey#${scan.get.group(1)}"
    assert(!plan.contains(s"Exchange hashpartitioning($storeBkey") &&
      !plan.contains(s"Exchange rangepartitioning($storeBkey"),
      s"the store side must never re-shuffle on $storeBkey:\n$plan")
    assert(("BroadcastHashJoin \\[" + storeBkey + "\\][^\\n]*LeftSemi").r
        .findFirstIn(plan).isDefined,
      s"the touched-key prune must stream the store (broadcast semi):\n$plan")
  }

  test("q183/q184/q185 round-14 additions: corpus-linear semantic " +
      "dedup, zero-exchange span scrub, vocabulary-bounded BPE rounds") {
    // q183: assignment is the NARROW per-row fold (Ann.assignNarrow —
    // no argmax exchange, no SortAggregate); the only data-sized
    // exchange left is the contract sort, plus |clusters| min-id
    // partials (measured 509 at sf0.001 = 500 vectors + 9 partials)
    assert(shuffled("q183_semantic_dedup") <= 2500,
      "semantic dedup must shuffle one row per vector, never pairs")
    val p183 = executedPlan("q183_semantic_dedup")
    assert(!p183.contains("CartesianProduct") &&
      !p183.contains("SortMergeJoin"),
      s"rep joins must broadcast (|clusters| rows), pivots too:\n$p183")
    // q184: pure per-row HOF chain — nothing but the final sort moves
    // (measured 500 = one row per doc)
    assert(shuffled("q184_span_scrub") <= 2000,
      "span scrub is narrow; only the contract sort may exchange")
    // q185: corpus is aggregated once into |vocab| word counts; all 8
    // merge rounds exchange pair-partials bounded by |vocab| x word_len
    // (measured 695 at sf0.001 — and FLAT in corpus size by design)
    assert(shuffled("q185_bpe_train") <= 3000,
      "BPE rounds must stay vocabulary-bounded, never corpus-sized")
  }

  test("q186/q187/q188 round-14 additions: vocabulary-bounded encode, " +
      "doc×bucket-capped DSIR, distinct-value-bounded AUC") {
    // q186: the merge table is K=8 rows of driver metadata; the only
    // exchanges are q185's vocab-bounded training rounds + the distinct
    // -token frame and its contract sort (measured 757 at sf0.001)
    assert(shuffled("q186_bpe_encode") <= 3000,
      "BPE encode exchanges stay vocabulary-bounded, never corpus-sized")
    // q187: the ONE data-sized exchange is the (doc, bucket) partial
    // -agg frame — hard-capped at 256 rows per document REGARDLESS of
    // document length (the 256-row marginals/log-ratio stages are flat),
    // so the bound is semantic: 256×docs + flat-stage slack
    // (measured 79,607 at sf0.001 = 500 docs)
    val docs = graft.Tables.documents(spark, sf).count()
    assert(shuffled("q187_dsir_weights") <= 256L * docs + 8192L,
      "DSIR must exchange at most 256 rows per doc + flat marginals")
    // q188: q180's distinct-value frame — per-value conditional counts
    // + the running-sum rebase + 1-row totals (measured 1590; the KS
    // probe proved this frame FLAT at ×30 data)
    assert(shuffled("q188_auc_mw") <= 8000,
      "AUC shuffles per-value counts + the running-sum frame only")
    val p188 = executedPlan("q188_auc_mw")
    assert(("windowspecdefinition\\(value#\\d+ ASC").r
        .findFirstIn(p188).isEmpty,
      s"cumulative sums must ride a pid-partitioned window:\n$p188")
  }

  test("q189–q193 round-14 additions: cluster-, vocab-, and " +
      "distinct-value-bounded exchanges; q191 narrow") {
    // q189: q113's band/verify/CC shapes + two cluster-keyed hash
    // aggregates (measured 992 at sf0.001 — docs + cluster partials)
    assert(shuffled("q189_keep_best") <= 4000,
      "keep-best argmax must stay cluster-bounded, never pair-sized")
    // q190: ONE (source, token) distinct aggregate + |sources|² cells
    // (measured 1207 — vocab-bounded; token volume never crosses)
    assert(shuffled("q190_vocab_overlap") <= 5000,
      "vocab overlap exchanges stay vocabulary-bounded")
    // q191: pure codegen'd map — only the contract sort moves
    // (measured 500 = one row per doc)
    assert(shuffled("q191_luhn_card") <= 2000,
      "Luhn detection is narrow; only the output sort may exchange")
    // q192: distinct-value count frames + ONE runningAggMulti range
    // pass + rank join-backs (measured 4256); like q180, the cumulative
    // must never ride a partitionless (global) window
    assert(shuffled("q192_spearman") <= 17000,
      "Spearman shuffles distinct-value frames + the running pass only")
    val p192 = executedPlan("q192_spearman")
    assert(("windowspecdefinition\\(value#\\d+ ASC").r
        .findFirstIn(p192).isEmpty,
      s"value-rank cumulation must ride the pid-partitioned window:\n$p192")
    // q193: q185's vocab-bounded rounds + the (lang, token) count join
    // (measured 891)
    assert(shuffled("q193_bpe_fertility") <= 3600,
      "fertility exchanges stay vocabulary-bounded, never corpus-sized")
  }

  test("q194/q195 round-14 additions: length-domain and cell-grid " +
      "bounded exchanges") {
    // q194: one (lang, n_tok) mass aggregate + the runningAggMulti
    // range pass — length-domain-bounded (measured 1200 at sf0.001)
    assert(shuffled("q194_wlen_quantiles") <= 5000,
      "weighted quantiles shuffle the (lang, length) frame only")
    // q195: every exchange is bounded by the (value, hour) CELL frame
    // (values × 24 — value-domain-bounded, proven FLAT at ×30 by the
    // KS probe): cells, the wide-frame partials, the range pass, the
    // rank join-backs (measured 27,762 at sf0.001 = 1000 events).
    // What must never appear: a pair join or a partitionless window.
    assert(shuffled("q195_kendall") <= 120000,
      "Kendall must shuffle cell-frame rows only, never pairs")
    val p195 = executedPlan("q195_kendall")
    assert(!p195.contains("CartesianProduct"),
      s"tau-b must never materialize the pair space:\n$p195")
    assert(("windowspecdefinition\\(value#\\d+ ASC").r
        .findFirstIn(p195).isEmpty,
      s"column prefixes must ride the pid-partitioned window:\n$p195")
    // q196: ONE per-type moment pass — |types| partials only
    // (measured 6 at sf0.001)
    assert(shuffled("q196_anova") <= 100,
      "ANOVA shuffles per-type moment partials only")
    // q197: q113's family machinery + one cluster-keyed count
    // (measured 895)
    assert(shuffled("q197_soft_dedup") <= 3600,
      "soft-dedup weights stay cluster-bounded, never pair-sized")
  }

  test("q198–q200 round-15 additions: store-backed encode stays " +
      "vocab-bounded; trainer ids corpus-linear once; selection rides " +
      "the doc×bucket cap + one range pass") {
    // q198: q186's exchange family — the merge-table TRAIN+WRITE is
    // paid once per JVM (ensureTable memo); steady-state serving is a
    // K-row store read + the vocab-bounded segmentation (measured 765
    // at sf0.001 INCLUDING the first-call train+write)
    assert(shuffled("q198_bpe_store") <= 3000,
      "store-backed encode stays vocabulary-bounded, never corpus-sized")
    // q199: segmentation + the symbol→id join live on the |vocab| and
    // alphabet frames; the corpus-sized work is ONE posexplode + ONE
    // per-doc reassembly aggregate (measured 930 at sf0.001)
    assert(shuffled("q199_bpe_ids") <= 4000,
      "trainer-id emission shuffles vocab frames + one per-doc pass")
    // q200: q187's doc×bucket≤256 hard cap + the Gumbel ranking's
    // single range-partitioned pass over |docs| rows (measured 35,299
    // at sf0.001 = 500 docs — DSIR frame dominated)
    val docs = graft.Tables.documents(spark, sf).count()
    assert(shuffled("q200_dsir_select") <= 256L * docs + 16384L,
      "selection must exchange ≤256 rows/doc + the docs-row rank pass")
    // the ranking must never ride a partitionless (global) window or a
    // driver-side top-k — q188/q192's runningAgg discipline
    val p200 = executedPlan("q200_dsir_select")
    assert(("windowspecdefinition\\(neg_key#\\d+ ASC").r
        .findFirstIn(p200).isEmpty,
      s"selection rank must ride the pid-partitioned window:\n$p200")
  }

  test("q201 dedup-agreement audit: bounded-universe pair frames, one " +
      "aggregate, no corpus-sized exchange") {
    // the 300-row probe universe's band buckets + candidate pairs +
    // semantic assignment partials + the tagged full-outer meet
    // (measured 1,676 at sf0.001); the truth self-join is a broadcast
    // NLJ and must stay out of the exchanges entirely
    assert(shuffled("q201_dedup_agreement") <= 7000,
      "agreement audit must shuffle probe-universe frames only")
    val p201 = executedPlan("q201_dedup_agreement")
    assert(!p201.contains("CartesianProduct"),
      s"truth pairs must ride a broadcast NLJ, never a cartesian:\n$p201")
  }

  test("q202–q205 round-15 batch: span-df-, HOF-, probe-, and " +
      "pair-frame-bounded exchanges") {
    // q202: span frames ∝ corpus tokens/4 + the |distinct spans| df
    // aggregate + the tiny boilerplate join-back (measured 14,883)
    assert(shuffled("q202_boilerplate") <= 60000,
      "boilerplate removal shuffles span frames, never pair products")
    // q203: pure narrow per-row HOF chain — the 500 records ARE the
    // contract sort (measured 500)
    assert(shuffled("q203_winnowing") <= 2000,
      "winnowing must select fingerprints without any data exchange")
    // q204: only the band-filtered survivors reach the per-probe top-3
    // window (measured 120); candidates never exchange (probe side
    // broadcasts) and rank<=3 must prune map-side
    assert(shuffled("q204_hard_negatives") <= 500,
      "hard-negative mining shuffles banded survivors only")
    val p204 = executedPlan("q204_hard_negatives")
    assert(p204.contains("WindowGroupLimit"),
      s"rank<=3 must prune below the window exchange:\n$p204")
    // q205: q151's rarest-shingle index frames + the two column-pruned
    // source attributions (measured 17,057)
    assert(shuffled("q205_source_syndication") <= 70000,
      "syndication matrix rides the q151 index, never all-pairs")
    // q206/q207: one partial-aggregable pass each onto |types|- /
    // |sources|-row frames (q196's shape)
    val m67 = Seq("q206_moments", "q207_charclass")
      .map(n => n -> shuffled(n)).toMap
    assert(m67.values.forall(_ <= 800), s"measured $m67")
  }

  test("q208–q211 round-16 batch: store-served ids stay vocab-bounded; " +
      "winnow pairs ride the fingerprint index; the DSIR audit adds " +
      "one doc-keyed pass; gate-served cleaning drops the df aggregate") {
    val m = Seq("q208_bpe_ids_store", "q209_winnow_pairs",
      "q210_dsir_audit", "q211_boilerplate_store")
      .map(n => n -> shuffled(n)).toMap
    info(s"measured $m")
    // q208: q199's exchange family with the (merges+vocab) TRAIN+WRITE
    // paid once per JVM (ensureTable memo); steady-state serving reads
    // the K+|alphabet|-row store and pays only the vocab-frame joins +
    // one per-doc reassembly (measured 3,480 at sf0.001 INCLUDING the
    // first-call train+write)
    assert(m("q208_bpe_ids_store") <= 12000,
      "store-served ids stay vocabulary-bounded, never corpus-sized")
    // q209: index entries ∝ selected fingerprints (~2/(w+1) of the
    // k-grams), candidates ∝ shared-fingerprint mass (measured 11,331
    // at sf0.001 — the 3.5k-pair frame + per-pair distinct-fp partials
    // dominate); never doc × doc (125k pairs would)
    assert(m("q209_winnow_pairs") <= 50000,
      "winnow pairs must ride the fingerprint index, never all-pairs")
    // q210: q200's probed chain (doc×bucket≤256 cap + one range pass)
    // + ONE doc-keyed attribution join + the |sources×langs| cells
    // (measured 34,993 at sf0.001 = 500 docs)
    val docs = graft.Tables.documents(spark, sf).count()
    assert(m("q210_dsir_audit") <= 256L * docs + 32768L,
      "the audit adds one docs-row join to q200's capped chain")
    // q211: the committed gate replaces q202's per-run df aggregate —
    // steady-state serving shuffles the span fold partials only
    // (measured 14,883 at sf0.001 INCLUDING the first-call gate build;
    // the serve-only path re-measured below)
    assert(m("q211_boilerplate_store") <= 60000,
      "gate-served cleaning must not re-aggregate the corpus")
    // serve-only (store already committed by the call above): the
    // cleaning pass must cost LESS than inline q202 — the whole point
    // of landing the gate
    val serveOnly = shuffled("q211_boilerplate_store")
    val inline = shuffled("q202_boilerplate")
    assert(serveOnly < inline,
      s"serve-only ($serveOnly) must undercut inline q202 ($inline)")
  }

  test("q212/q213 round-16 serve faces: index-served matching and " +
      "store-served scoring stay bounded; steady-state serves never " +
      "exceed their inline twins") {
    val m = Seq("q212_winnow_store", "q213_dsir_store")
      .map(n => n -> shuffled(n)).toMap
    info(s"measured $m")
    // q212: first call pays the index land (q209's entries frame — a
    // narrow parquet write, no exchange; measured 11,331 at sf0.001
    // = exactly q209's join/aggregate records); the serve join keys
    // on (fp, gram) against the committed index
    assert(m("q212_winnow_store") <= 50000,
      "index-served matching must ride the fingerprint index")
    // q213: first call pays the store build (one reference dsirPerDoc
    // pass) + the serve pass (measured 67,084 at sf0.001 combined;
    // steady-state 33,794 — the estimate stage gone); each pass keeps
    // the ≤256/doc cap
    val docs = graft.Tables.documents(spark, sf).count()
    assert(m("q213_dsir_store") <= 256L * docs + 16384L,
      "store-served scoring must keep the doc×bucket cap")
    // steady-state (stores committed above): what the stores delete is
    // the corpus-side COMPUTE (q212: one side's md5-per-k-gram
    // fingerprint pass; q213: the marginal/log-ratio estimate stage) —
    // the EXCHANGE is the join/aggregate semantics and stays, so the
    // contract is serve ≤ inline on records (measured EQUAL for q212:
    // both sides of the fp-gram join still shuffle) with the compute
    // dividend showing up as wall in the bench map (q208's ×3.4
    // serve-vs-retrain precedent)
    val s212 = shuffled("q212_winnow_store")
    val i209 = shuffled("q209_winnow_pairs")
    assert(s212 <= i209,
      s"serve-only q212 ($s212) must not exceed inline q209 ($i209)")
    val s213 = shuffled("q213_dsir_store")
    val i187 = shuffled("q187_dsir_weights")
    assert(s213 <= i187,
      s"serve-only q213 ($s213) must not exceed inline q187 ($i187)")
    info(s"steady-state: q212 $s212 vs q209 $i209; q213 $s213 vs q187 $i187")
  }

  test("q214–q218 round-16 sketch/graph/fusion batch: CMS counters are " +
      "cell-bounded, bloom screens are word+doc-bounded, textrank " +
      "iterations carry the rank vector, fusion rides the bounded " +
      "probe key, the bloom store serve matches inline") {
    val m = Seq("q214_cms_heavy", "q215_bloom_screen", "q216_textrank",
      "q217_rrf_fusion", "q218_bloom_store")
      .map(n => n -> shuffled(n)).toMap
    info(s"measured $m")
    // q214: the counter matrix exchange is ≤ 4·16 cells × partitions
    // (map-side partials collapse each partition to the cell space);
    // the audit adds the |vocab|-keyed exact count + the est rollup.
    // The round-19 scan-parallelism floor spreads the tokenize map
    // across defaultParallelism partitions, so BOTH partial-aggregate
    // terms scale with the partition count while staying bounded per
    // partition — counter cells at ≤ 64/partition, the audit's exact
    // count at ≤ |vocab(sf0.001)|/partition — and the bound is
    // partition-aware (measured 151 single-task; 1,011 at 4
    // partitions)
    val par = spark.sparkContext.defaultParallelism
    assert(m("q214_cms_heavy") <= 300L * par + 700,
      "CMS build must collapse to the fixed cell space map-side")
    // q215: the distinct (doc, shingle) exchange is the dominant term
    // (the inverted-index land — ~|shingle rows|, the deliberate trade
    // that killed the 10 s InferFiltersFromGenerate interpreted chain);
    // the filter agg is ≤ 64 words × partitions and the audit rollup
    // is doc-keyed (measured 28,785 at sf0.001)
    assert(m("q215_bloom_screen") <= 120000,
      "bloom screen = one distinct shingle exchange + word/doc-bounded aggs")
    // q216: edges agg ≤ |E| (distinct ordered bigrams) × partials +
    // 5 iterations × (|V| rank vector broadcast-joined against the
    // pinned edge frame + |V|-keyed contribution rollup) — the rank
    // vector is the only per-iteration exchange
    // (measured 1,987 at sf0.001)
    assert(m("q216_textrank") <= 8000,
      "each textrank iteration may exchange the rank vector, never the corpus")
    // q217: BM25 side = |cand|-keyed tf/dl rollups + probe-bounded
    // score frames; cosine side broadcasts the probe batch (q204's
    // rule); the fusion join is |probes|·20 rows
    // (measured 10,539 at sf0.001)
    assert(m("q217_rrf_fusion") <= 40000,
      "fusion must ride the bounded probe key")
    // q218 (store already committed by the call above): serve-only
    // bloom screening must not exceed the inline build+screen — the
    // filter build (eval tokenize + word agg) is what the store
    // deletes
    val serveOnly = shuffled("q218_bloom_store")
    val inline = shuffled("q215_bloom_screen")
    assert(serveOnly <= inline,
      s"serve-only q218 ($serveOnly) must not exceed inline q215 ($inline)")
    info(s"steady-state: q218 $serveOnly vs q215 $inline")
    // q219: the register aggregate's key space is |sources|·16 —
    // map-side partials collapse to it regardless of token volume;
    // the audit adds the |source×vocab|-keyed exact distinct
    val s219 = shuffled("q219_hll_audit")
    info(s"q219 measured $s219")
    assert(s219 <= 4000,
      "HLL registers must collapse to the |sources|·16 cell space map-side")
    // q220: one corpus pass — the dedup-survivor join is the
    // |distinct hashes| frame, the quota window is source-partitioned
    // over gate survivors, the card is a 1-row aggregate exploded
    val s220 = shuffled("q220_funnel")
    info(s"q220 measured $s220")
    val docs = graft.Tables.documents(spark, sf).count()
    assert(s220 <= 8 * docs + 4000,
      "the funnel must flag in one pass — per-doc-frame exchanges only, never a per-stage re-scan blowup")
    // q221/q222 (stores committed by the calls above): what the
    // stores delete is the corpus-side COUNT/SKETCH pass — the
    // serve-only exchange must not exceed the inline twin's
    val s221 = shuffled("q221_cms_store")
    val i214 = shuffled("q214_cms_heavy")
    assert(s221 <= i214,
      s"serve-only q221 ($s221) must not exceed inline q214 ($i214)")
    // q222's dividend is NOT a smaller exchange (inline q219's
    // exchanges are already metadata-sized) but never re-scanning
    // rows: merge-on-read re-aggregates the committed per-slice
    // register tables, a strictly register-bounded exchange — measured
    // 1,337 at sf0.001 (2 slices × |sources|·16 spined registers + the
    // same exact-distinct audit q219 carries); the bound is absolute
    // in the register space, independent of corpus rows
    val s222 = shuffled("q222_hll_store")
    assert(s222 <= 6000,
      s"merge-on-read q222 ($s222) must stay register-bounded")
    info(s"steady-state: q221 $s221 vs q214 $i214; q222 $s222 (register-bounded)")
    // q223: the Gram self-join exchanges 2·n·d narrow rows; the (j,k)
    // aggregate collapses map-side to the fixed d² = 4,096 cells; the
    // six iterations run on d-/d²-row frames from the pinned matrix
    val s223 = shuffled("q223_pca_power")
    info(s"q223 measured $s223")
    val vecs = graft.Tables.embeddings(spark, sf).count()
    assert(s223 <= 4 * vecs * 64 + 64 * 1024,
      "the Gram pass must exchange n·d rows + d²-cell partials, never n·d²")
    // q224: per round, the argmin partial is n-keyed and the update
    // aggregate collapses to the K·d cell space; the centroid frame
    // broadcasts — nothing n·K-sized ever crosses an exchange
    val s224 = shuffled("q224_kmeans")
    info(s"q224 measured $s224")
    assert(s224 <= 8 * vecs + 64 * 1024,
      "k-means rounds must exchange n-keyed argmin partials + K·d cells only")
    // q225: fully narrow rule battery — the only exchange is the
    // contract sort (∝ docs; q203's class)
    val s225 = shuffled("q225_gopher_rules")
    info(s"q225 measured $s225")
    assert(s225 <= 4 * docs,
      "the Gopher battery must stay narrow — contract sort only")
    // q226/q228: count tables are vocabulary-bounded; the stream-side
    // exchange is the per-doc rollup. The store face (already
    // committed by the earlier call) deletes the TRAINING pass — its
    // serve-only exchange must not exceed the inline twin's
    val i226 = shuffled("q226_lm_backoff")
    val s228 = shuffled("q228_lm_store")
    info(s"q226 inline $i226; q228 serve-only $s228")
    // the store deletes the TRAINING scan; the committed tables read
    // back unpartitioned, so the vocabulary-bounded count tables may
    // re-shuffle (measured +31 records at sf0.001 — the uni table) —
    // the allowance is strictly table-sized, never stream-sized
    assert(s228 <= i226 + 4096,
      s"serve-only q228 ($s228) must stay within a vocabulary-bounded " +
        s"allowance of inline q226 ($i226)")
  }

  test("q230 substring removal: exchanges are gram-table- and " +
      "cover-mass-bounded — no pair join exists to blow up") {
    val s230 = shuffled("q230_substr_removal")
    info(s"q230 measured $s230")
    // the df/keeper aggregate ships |distinct 5-grams| (≈ token volume
    // at this corpus size, count_distinct two-phase), the cover join
    // re-keys gram occurrences once, the covered-position collect is
    // duplicated-gram mass × 5, and the final marry is doc-keyed; every
    // term is linear in token volume with NO doc×doc term anywhere
    // (measured 51,062 at sf0.001 ≈ 1.9× token volume)
    val docs = graft.Tables.documents(spark, sf).count()
    val toks = 55L * docs // corpus mean ≈ 54.3 tokens/doc
    assert(s230 <= 6 * toks,
      "substring removal must stay within a small multiple of token volume")
  }

  test("q231–q235 product quantization: training partials are " +
      "(vector, sub)-keyed, update cells are fixed-space, the ADC " +
      "rollup is probe-bounded, and the store serve matches inline") {
    val m = Seq("q231_pq_train", "q232_pq_encode", "q233_pq_search",
      "q234_pq_recall", "q235_pq_store")
      .map(n => n -> shuffled(n)).toMap
    info(s"measured $m")
    val vecs = graft.Tables.embeddings(spark, sf).count()
    // q231: 2 Lloyd rounds × (n·m argmin partials + ≤1,024 update
    // cells × partitions) + the m·k codebook frame
    assert(m("q231_pq_train") <= 2 * 8 * vecs + 64 * 1024,
      "codebook training must exchange argmin partials + fixed cells only")
    // q232: one more assignment pass over the trained books (n·m codes)
    assert(m("q232_pq_encode") <= 3 * 8 * vecs + 64 * 1024,
      "encoding is one assignment pass over the committed books")
    // q233/q235: + the (probe, cand) ADC rollup (≤ |probes|·n partials)
    // — probe-bounded by the audit contract; the LUT broadcasts
    assert(m("q233_pq_search") <= 10 * 8 * vecs + 64 * 1024,
      "ADC search adds only the probe-bounded rollup")
    // the store face deletes the train+encode passes at serve time;
    // within one JVM the build already ran, so its measured shuffle
    // must stay at-or-below the inline twin's
    assert(m("q235_pq_store") <= m("q233_pq_search"),
      s"serve-only q235 (${m("q235_pq_store")}) must not exceed " +
        s"inline q233 (${m("q233_pq_search")})")
    // q234 adds the brute-force truth: probes×corpus ranked per probe
    // (WindowGroupLimit prunes map-side) — audit-only cost
    assert(m("q234_pq_recall") <= 20 * 8 * vecs + 64 * 1024,
      "the recall audit stays probe-bounded")
  }

  test("q236 sign-LSH banding audit: exchanges are bucket- and " +
      "candidate-mass-bounded on the audit universe") {
    val s236 = shuffled("q236_signlsh_audit")
    info(s"q236 measured $s236")
    // 44 band rows per vector (Σ bands over the 8 configs) on the
    // ≤300-vector universe + the distinct candidate set (≤ all-pairs
    // on the universe by construction) + config-sized rollups; the
    // truth side is a broadcast NLJ over the bounded universe and
    // never shuffles data rows (measured 64,912 at sf0.001)
    assert(s236 <= 600000,
      "the banding audit must stay inside audit-universe mass")
  }

  test("q237–q239 subword trainer: everything after the one token " +
      "count is word-vocabulary-bounded") {
    val m = Seq("q237_subword_train", "q238_subword_encode",
      "q239_subword_fert").map(n => n -> shuffled(n)).toMap
    info(s"measured $m")
    // the corpus-proportional exchange is the single (word) count
    // behind the word frame (+ q239's (lang, token) count); step
    // tables are ≤ 12·|words| rows per pass, usage aggregates
    // |pieces|-bounded, the walk narrow
    // (measured q237 595, q238 774, q239 908 at sf0.001 — the token
    // count collapses map-side to the word vocabulary)
    val docs = graft.Tables.documents(spark, sf).count()
    val toks = 55L * docs
    assert(m("q237_subword_train") <= 6 * toks,
      "training must stay within a small multiple of the word universe")
    assert(m("q238_subword_encode") <= 10 * toks,
      "encode adds one more segmentation pass")
    assert(m("q239_subword_fert") <= 12 * toks,
      "fertility adds one (lang, token) count + a vocab-sized join")
  }

  test("q240/q241 IVF-ADC: residual training + probed-list ADC stay " +
      "inside the q231-class bounds; the store serve never exceeds " +
      "inline") {
    // q241's FIRST call in a JVM pays the ensure-build; warm it so the
    // measured row is the steady-state serve (the q212 discipline)
    shuffled("q241_ivfadc_store")
    val m = Seq("q240_ivfadc", "q241_ivfadc_store")
      .map(n => n -> shuffled(n)).toMap
    info(s"measured $m")
    val vecs = graft.Tables.embeddings(spark, sf).count()
    // coarse assignment is a broadcast 8-row cross join (argmin
    // partials n-keyed), residual training = q231's shape, the ADC
    // is a narrow packed-codes fold bounded by the PROBED lists'
    // share (measured: inline 15,710; steady-state store serve 78 —
    // the r17 row-form rollup's 797 cut 10× again by the round-18
    // packed layout: serve-side exchange is just the map-side-pruned
    // rank, a 200× dividend vs inline at sf0.001)
    assert(m("q240_ivfadc") <= 12 * 8 * vecs + 64 * 1024,
      "IVF-ADC must stay within assignment + training + probed-ADC mass")
    assert(m("q241_ivfadc_store") <= m("q240_ivfadc"),
      s"store-served IVF-ADC (${m("q241_ivfadc_store")}) must not " +
        s"exceed inline (${m("q240_ivfadc")})")
  }

  test("q242–q244 round-18 batch: the nprobe sweep rides ONE index " +
      "build, and the subword/substring store serves never exceed " +
      "their inline twins") {
    // first calls pay the ensure-builds; warm so the measured rows are
    // steady-state serves (the q212 discipline)
    shuffled("q243_subword_store"); shuffled("q244_substr_store")
    val m = Seq("q242_ivfadc_sweep", "q243_subword_store",
      "q244_substr_store", "q245_ivfadc_rerank")
      .map(n => n -> shuffled(n)).toMap
    info(s"measured $m")
    val vecs = graft.Tables.embeddings(spark, sf).count()
    // q242: coarse k-means (n-keyed argmin partials, fixed-cell
    // updates) + one residual train/encode (q240's mass) + the ONE
    // maxNprobe=8 candidate frame (≤ |probes|·n ADC partials — nprobe
    // = nlist IS the full-ADC ceiling by design) + the bounded exact-
    // truth audit (6×n window). What must NOT appear: 4× re-search
    // mass — the sweep is a filter over one frame. (Measured at
    // sf0.001: 19,887 — ~1.3× the single q240 search, against ~63k
    // for four re-searches; q243 serve 62 vs inline 774; q244 serve
    // 1,030 vs inline 51,062 — the committed gate deletes the gram-df
    // aggregate, a ~50× serve dividend.)
    assert(m("q242_ivfadc_sweep") <= 40 * 8 * vecs + 128 * 1024,
      "the nprobe sweep must ride one index build + one candidate frame")
    // q243/q244: what the stores delete is the TRAIN side (subword:
    // the seed/segment/prune loop; substring: the gram df/keeper
    // aggregate) — serve-only exchange must not exceed the inline twin
    val i238 = shuffled("q238_subword_encode")
    assert(m("q243_subword_store") <= i238,
      s"serve-only q243 (${m("q243_subword_store")}) must not exceed " +
        s"inline q238 ($i238)")
    val i230 = shuffled("q230_substr_removal")
    assert(m("q244_substr_store") <= i230,
      s"serve-only q244 (${m("q244_substr_store")}) must not exceed " +
        s"inline q230 ($i230)")
    info(s"steady-state: q243 ${m("q243_subword_store")} vs q238 $i238; " +
      s"q244 ${m("q244_substr_store")} vs q230 $i230")
    // q245 = q240's build mass + the refine, whose join BROADCASTS the
    // |probes|·R shortlist (the corpus side never exchanges) and whose
    // rank is a 60-row window — the re-rank must cost ~nothing beyond
    // the shortlist search it refines
    val i240 = shuffled("q240_ivfadc")
    assert(m("q245_ivfadc_rerank") <= i240 + 4096,
      s"the refine stage must add only shortlist-bounded exchange: " +
        s"q245 ${m("q245_ivfadc_rerank")} vs q240 $i240")
  }

  test("q246–q248 round-19 batch: the rerank store serve never exceeds " +
      "its inline twin, and the R sweep rides ONE refine frame") {
    // first calls pay the ensure-builds; warm so the measured rows are
    // steady-state serves (the q212 discipline)
    shuffled("q246_ivfadcr_store"); shuffled("q248_substr_bucketed")
    val m = Seq("q246_ivfadcr_store", "q247_rerank_sweep",
      "q248_substr_bucketed")
      .map(n => n -> shuffled(n)).toMap
    info(s"measured $m")
    // q246: serve-only — shortlist from the committed partition-pruned
    // codes + a broadcast-shortlist refine against committed vectors;
    // the build (train + encode + pack + vector write) is NOT in the
    // measured row, so serve exchange must not exceed the inline q245
    // (which pays train + encode + search every call)
    val i245 = shuffled("q245_ivfadc_rerank")
    assert(m("q246_ivfadcr_store") <= i245,
      s"serve-only q246 (${m("q246_ivfadcr_store")}) must not exceed " +
        s"inline q245 ($i245)")
    // q247: ONE index build + ONE refine at maxShortlist — the sweep is
    // a filter, so its mass stays within ~q245's build+refine plus the
    // 4-way windowed sweep rows; what must NOT appear is 4x re-search
    // or 4x re-refine mass
    assert(m("q247_rerank_sweep") <= 4 * i245,
      s"the R sweep must ride one refine frame, not |sweep| re-searches: " +
        s"q247 ${m("q247_rerank_sweep")} vs inline q245 $i245")
    // q248: the bucketed-gate serve must stay within the PATH-store
    // serve's mass (same batch side; the gate side reads bucketed and
    // never exchanges — the ZERO-gate-side pin below is the layout-
    // discriminating version with broadcast disabled)
    val i244 = shuffled("q244_substr_store")
    assert(m("q248_substr_bucketed") <= i244,
      s"bucketed-gate serve (${m("q248_substr_bucketed")}) must not " +
        s"exceed the path-store serve ($i244)")
  }

  test("q248 gram-bucketed gate: ZERO gate-side exchange records on a " +
      "serve batch — the gate join reuses the scan's bucket " +
      "partitioning even when the gate is past broadcast range") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // a gate MUCH larger than the batch: 120 doc pairs each sharing a
    // distinct 8-token run -> 4 duplicated 5-grams per pair, 480 gate
    // rows; the serve batch is 2 tiny docs (~22 gram occurrences)
    val docs = (0 until 120).flatMap { p =>
      val run = (0 until 8).map(t => s"p${p}r$t").mkString(" ")
      Seq((2L * p, s"a$p $run"), (2L * p + 1, s"b$p $run z$p"))
    }.toDF("doc_id", "text")
    val table = "graft_test_substr_gate_zerox"
    graft.operators.Dedup.saveSubstrGateBucketed(
      docs, "doc_id", "text", table)
    val gateRows = spark.table(table).count()
    assert(gateRows >= 400, s"planted gate must be corpus-scale: $gateRows")
    val batch = Seq((9001L, "q1 p3r0 p3r1 p3r2 p3r3 p3r4 q2"),
      (9002L, "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11 w12 w13")
    ).toDF("doc_id", "text")
    // disable broadcast entirely: an unbucketed gate would now shuffle
    // ALL its rows every serve (the exact failure mode the layout
    // deletes); the bucketed gate side must contribute ZERO exchange
    // records, leaving only the batch's own gram/cover/marry exchanges
    val bc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try {
      val recs = Metrics.shuffleOf(spark) {
        graft.operators.Dedup.substrServeBucketed(spark, table, batch,
            "doc_id", "text")
          .write.format("noop").mode("overwrite").save()
      }.recordsWritten
      info(s"forced-SMJ bucketed serve shuffled $recs records " +
        s"(gate $gateRows rows)")
      assert(recs < gateRows / 2,
        s"gate rows must NOT cross an exchange: $recs shuffled vs " +
          s"$gateRows gate rows")
      assert(recs <= 120,
        s"serve exchange must be batch-bounded (~22 grams + cover + " +
          s"marry), got $recs")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", bc)
      spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
    }
  }
}
