package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._
import graft.functions.Vectors
import graft.operators.TextHashes

/** Round-5 coverage extensions — the curation faces a 100-TB training-data
  * pipeline runs between ingest and tokenization:
  *
  *  - q106: co-located bucketed fact⋈dim join (the layout that deletes the
  *    per-query shuffle at 100 TB; the oracle is the PLAIN join, so the
  *    hash gate proves the layout rewrite is semantics-free — q89's
  *    discipline applied to storage layout instead of salting)
  *  - q107: bigram language-model counts (n-gram statistics)
  *  - q108: benchmark decontamination (train/eval n-gram overlap)
  *  - q109: repetition quality metrics (Gopher-style dup-ngram ratios)
  *  - q110: asymmetric containment near-dup (sub-document duplication
  *    that symmetric Jaccard under-scores)
  *  - q111: int8 embedding quantization + quantized-vs-exact cosine error
  *  - q112: exact per-group quantiles over a DERIVED column (the
  *    scan-selection operator consuming a computed input, not a stored one)
  *
  * Same design rules as the rest of the inventory: codegen'd built-ins (no
  * UDFs), shuffle-minimal shapes, every query hash-checked against DuckDB.
  */
object CurationQueries {

  /** Non-empty whitespace tokens (shared contract expression). */
  private def toks = TextHashes.toks("text")

  /** Bigram array over a token-array reference: element i (0-based lambda
    * index over the first n-1 tokens) pairs with its successor. Slice
    * keeps the build narrow (no sequence(), whose descending-range edge
    * at size<2 is a trap; callers filter size>=2). */
  private def bigrams(toksRef: String): String =
    s"transform(slice($toksRef, 1, size($toksRef)-1), (x, i) -> concat(x, ' ', element_at($toksRef, i + 2)))"

  /** Distinct (doc_id, shingle) pairs of word 3-grams — the inverted-index
    * feed. Per-doc dedup happens NARROWLY (`array_distinct` before the
    * explode): a document's shingles all live in its one input row, so
    * the row-level `distinct()` the r8 shape paid — a full
    * (doc_id, s)-keyed exchange of every pair — bought nothing the
    * array form doesn't. ZERO exchanges here; consumers' own keyed
    * aggregates (all partial-agged) are the only shuffles, which is
    * what took the novelty_hot probe's shuffle ratio from ×12 at ×10
    * data down to tracking the data (round 9). The explode stays a
    * direct generator expression (never a pre-built array column — the
    * q47 InferFiltersFromGenerate regression). */
  private def shingleRows(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), expr(toks).as("toks"))
      .filter(size(col("toks")) >= 3)
      .select(col("doc_id"),
        explode(expr(TextHashes.shingleSet("toks"))).as("s"))

  /** q106 co-located bucketed join: orders and customer land bucketed by
    * custkey ([[graft.sources.Lake.writeBucketed]], 8 buckets, catalog
    * tables), so the fact⋈dim join needs ZERO exchange — bucketing pays
    * the shuffle once at ingest and every subsequent join on the key is
    * local (the merge hint pins sort-merge so the plan-contract face
    * shows the bucketed path even where AQE would broadcast). The oracle
    * is the PLAIN join on the raw parquet: the hash gate proves the
    * layout is invisible to semantics. */
  def q106(s: SparkSession, d: String): DataFrame = {
    val suffix = d.replaceAll("[^A-Za-z0-9]", "_")
    val factT = s"graft_orders_bkt$suffix"
    val dimT = s"graft_customer_bkt$suffix"
    // ensureBucketed (memoized), not writeBucketed: the layout is
    // pay-once-at-ingest, and the table name encodes the source dir so
    // one JVM never aliases two datasets onto one memo entry.
    graft.sources.Lake.ensureBucketed(
      orders(s, d).select(col("o_custkey").as("custkey"),
        col("o_totalprice")), factT, "custkey", 8)
    graft.sources.Lake.ensureBucketed(
      customer(s, d).select(col("c_custkey").as("custkey"),
        col("c_nationkey")), dimT, "custkey", 8)
    graft.sources.Lake.readTable(s, factT).hint("merge")
      .join(graft.sources.Lake.readTable(s, dimT), "custkey")
      .groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("o_totalprice")), 2).as("revenue"))
      .select(col("c_nationkey").cast("long").as("c_nationkey"),
        col("n"), col("revenue"))
      .orderBy("c_nationkey")
  }

  /** q107 bigram language-model counts: top-30 corpus bigrams. The bigram
    * build is NARROW (per-row array transform — no positional self-join);
    * the only exchange is the partial+final count aggregate, which
    * carries |distinct bigrams| not |tokens|, then TakeOrdered for the
    * top-k. Deterministic tie-break on the bigram itself. */
  def q107(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .select(expr(toks).as("toks"))
      .filter(size(col("toks")) >= 2)
      .select(explode(expr(bigrams("toks"))).as("bigram"))
      .groupBy(col("bigram"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("bigram").asc)
      .limit(30)

  /** q108 benchmark decontamination: which held-out/eval documents
    * (doc_id 300–349) share word 3-grams with the training corpus
    * (doc_id < 200), and how much. The train side collapses to DISTINCT
    * shingles; the overlap is one inverted-index equi-join on the
    * shingle — never doc×doc. Every eval doc reports (zero hits
    * included): the output IS the contamination audit a release gate
    * reads. */
  def q108(s: SparkSession, d: String): DataFrame = {
    val docs = documents(s, d).select(col("doc_id"), col("text"))
    val train = shingleRows(docs.filter(col("doc_id") < 200))
      .select(col("s")).distinct()
    val eval_ = shingleRows(docs.filter(col("doc_id").between(300, 349)))
    val nsh = eval_.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shingles"))
    val hits = eval_.join(train, "s")
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_hit"))
    nsh.join(hits, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_shingles"),
        coalesce(col("n_hit"), lit(0L)).as("n_overlap"),
        round(coalesce(col("n_hit"), lit(0L)).cast("double") /
          col("n_shingles"), 4).as("contamination"))
      .orderBy("doc_id")
  }

  /** q109 repetition quality metrics (the Gopher-rule family): per
    * document, the type-token ratio and the fraction of bigram mass held
    * by the single most-repeated bigram — the signals that condemn
    * boilerplate/template text. Two group-sized exchanges (per-doc bigram
    * counts, per-doc rollup) joined to the narrow per-row stats. */
  def q109(s: SparkSession, d: String): DataFrame = {
    val t = documents(s, d).filter(col("doc_id") < 200)
      .select(col("doc_id"), expr(toks).as("toks"))
      .filter(size(col("toks")) >= 2)
    val base = t.select(col("doc_id"),
      size(col("toks")).cast("long").as("n_tok"),
      size(array_distinct(col("toks"))).cast("long").as("n_distinct"))
    val top = t.select(col("doc_id"), explode(expr(bigrams("toks"))).as("bg"))
      .groupBy(col("doc_id"), col("bg"))
      .agg(count(lit(1)).as("n"))
      .groupBy(col("doc_id"))
      .agg(max(col("n")).as("top_bg"), sum(col("n")).as("n_bg"))
    base.join(top, "doc_id")
      .select(col("doc_id"), col("n_tok"),
        round(col("n_distinct").cast("double") / col("n_tok"), 4).as("ttr"),
        round(col("top_bg").cast("double") / col("n_bg"), 4).as("top_bg_frac"))
      .orderBy("doc_id")
  }

  /** Asymmetric containment over a DF-CAPPED inverted index: shingles
    * appearing in more than `dfCap` documents are dropped BEFORE the
    * index self-joins — the r5-flagged scale fix. A stop-shingle in d
    * docs would otherwise emit d² join rows while carrying zero
    * containment signal (ubiquity is the opposite of evidence that one
    * SPECIFIC document contains another); capping bounds every bucket's
    * contribution at dfCap² and the denominators |A|,|B| count only the
    * informative shingles, so both sides of the ratio live in the same
    * capped universe. Returns one row per candidate pair:
    * (a, b, cont_a=|A∩B|/|A|, cont_b=|A∩B|/|B|), rounded to 4dp. */
  private[graft] def containmentPairs(docs: DataFrame,
                                      dfCap: Int): DataFrame = {
    val shAll = shingleRows(docs)
    val keep = shAll.groupBy(col("s")).agg(count(lit(1)).as("df"))
      .filter(col("df") <= dfCap).select(col("s"))
    val sh = shAll.join(keep, "s")
    val cnt = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val inter = sh.select(col("doc_id").as("a"), col("s"))
      .join(sh.select(col("doc_id").as("b"), col("s").as("s2")),
        col("s") === col("s2") && col("a") < col("b"))
      .groupBy(col("a"), col("b"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(cnt.toDF("a", "na"), "a")
      .join(cnt.toDF("b", "nb"), "b")
      .select(col("a"), col("b"),
        round(col("inter").cast("double") / col("na"), 4).as("cont_a"),
        round(col("inter").cast("double") / col("nb"), 4).as("cont_b"))
  }

  /** q110 asymmetric containment near-dup: pairs where one document's
    * shingle set is largely CONTAINED in the other's —
    * |A∩B|/|A| and |A∩B|/|B| — the sub-document-duplication signal that
    * symmetric Jaccard (q47) under-scores when sizes differ. Candidates
    * come from the df-capped inverted index ([[containmentPairs]], cap
    * 20 here ≈ 20% of the 100-doc contract corpus — never all-pairs,
    * never an uncapped hot-shingle bucket); ranking is on the ROUNDED
    * max containment so float order can't drift the top-20 cut. The
    * oracle applies the identical HAVING count(*) <= 20 gate, so the
    * hash proves the capped semantics, not just the plan. */
  def q110(s: SparkSession, d: String): DataFrame =
    containmentPairs(
        documents(s, d).select(col("doc_id"), col("text"))
          .filter(col("doc_id") < 100), dfCap = 20)
      .withColumn("cont_max", greatest(col("cont_a"), col("cont_b")))
      .orderBy(col("cont_max").desc, col("a").asc, col("b").asc)
      .limit(20)

  /** q136 first-occurrence n-gram novelty: for every document, the
    * fraction of its distinct 3-gram shingles whose FIRST appearance in
    * doc_id order is this document — the "how much new content does
    * this doc add" signal an incremental crawl ranks refresh candidates
    * by (a boilerplate mirror scores ~0, fresh prose ~1). Both sides
    * aggregate BEFORE they meet: n_shingles is a per-doc count of the
    * shingle feed, n_first counts the winners of a combiner-safe
    * groupBy(s).agg(min(doc_id)) — a ubiquitous boilerplate shingle
    * collapses map-side to one row per partition, so no shingle key
    * ever owns a corpus-sized window partition or join bucket (the
    * min-over-shingle WINDOW form has exactly that ceiling; the
    * adversarial gate lives in RoundSevenProperties). The only join is
    * doc_id-keyed between two doc-sized aggregates. Ratio emitted as a
    * floor-truncated exact rational (q128's portability rule). */
  def q136(s: SparkSession, d: String): DataFrame =
    noveltyByDoc(documents(s, d).select(col("doc_id"), col("text")))

  /** q136 body over an arbitrary (doc_id, text) frame — factored so the
    * adversarial hot-shingle gate (RoundSevenProperties) can drive it
    * with a planted 1000-doc boilerplate shingle.
    *
    * Round 10: SINGLE-scan, JOIN-free, via a sentinel shingle. The r9
    * shape deleted the pairs-sized exchange but paid a second full
    * tokenize+shingle scan for the per-doc denominator, plus a
    * doc-keyed join of the two branches. Here each doc prepends one
    * SENTINEL entry `'#' || doc_id || '#' || n_shingles` to its
    * distinct-shingle array before the explode. A sentinel can never
    * equal a real shingle (word 3-grams always contain two
    * token-separator spaces; the sentinel has none) and is unique per
    * doc, so after `groupBy(s).agg(min(doc_id))` every doc wins
    * exactly its own sentinel plus its genuinely-novel shingles —
    * one more doc-keyed partial agg yields `n_first = count-1`, the
    * sentinel string hands back the `n_shingles` denominator, and the
    * r9 left join (two doc-keyed exchanges + SMJ) disappears with the
    * second scan. The hot-key cap is unchanged: a ubiquitous
    * boilerplate shingle still collapses map-side in the min-combiner,
    * and sentinels add exactly one row per doc. The generator
    * expression stays inline over the `toks` projection (never a
    * pre-built array column) per the InferFiltersFromGenerate trap
    * documented at [[PipelineQueries.q47]].
    *
    * Two load-bearing encoding details. (1) The denominator rides
    * INSIDE the sentinel string, not in a struct beside the doc_id:
    * `min(struct(doc_id, n_shingles))` has a non-mutable aggregation
    * buffer, which demotes the shingle agg to SortAggregate and
    * full-sorts the exploded pair-volume feed by shingle string
    * (measured 8.9 s at sf0.1 vs sub-second for this form) — the
    * aggregate must stay `min(doc_id)` over a long buffer so
    * HashAggregate + map-side combine apply. (2) A winner row is the
    * group's sentinel iff it contains NO space, so the doc-level agg
    * recovers `n_shingles` with one `instr`+`substring_index` over
    * winner rows only. */
  private[graft] def noveltyByDoc(docs: DataFrame): DataFrame = {
    val sh = TextHashes.shingleSet("toks")
    docs.select(col("doc_id"), expr(toks).as("toks"))
      .filter(size(col("toks")) >= 3)
      .select(col("doc_id"),
        explode(expr(
          s"""concat(
             |  array(concat('#', cast(doc_id as string), '#',
             |               cast(size($sh) as string))),
             |  $sh)""".stripMargin)).as("s"))
      .groupBy(col("s")).agg(min(col("doc_id")).as("doc_id"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("cnt"),
        max(when(expr("instr(s, ' ')") === 0,
          expr("cast(substring_index(s, '#', -1) as bigint)")))
          .as("n_shingles"))
      .select(col("doc_id"), col("n_shingles"),
        (col("cnt") - 1).as("n_first"),
        (floor((col("cnt") - 1) * 10000.0 / col("n_shingles")) / 10000.0)
          .as("novelty"))
      .orderBy("doc_id")
  }

  /** q111 int8 embedding quantization: per-vector symmetric scale
    * (amax/127), elements quantized by the engine-portable
    * floor(x·127/amax + 0.5) — identical IEEE double math on both
    * engines, so the quantized INTEGER vectors are bit-identical and the
    * only float work is the final cosine. Reports quantized-vs-exact
    * cosine for consecutive vector pairs plus the error — the memory/
    * recall tradeoff audit run before shipping a compressed ANN index
    * (4× smaller vectors; the error column is the evidence). */
  def q111(s: SparkSession, d: String): DataFrame = {
    val e = embeddings(s, d).filter(col("vec_id") < 100)
      .select(col("vec_id"), Vectors.asDouble(col("embedding")).as("v"))
      .withColumn("amax",
        expr("aggregate(v, 0D, (acc, x) -> greatest(acc, abs(x)))"))
      .withColumn("qv",
        expr("transform(v, x -> cast(floor(x * 127.0D / nullif(amax, 0D) + 0.5D) as double))"))
      .select(col("vec_id"), col("v"), col("qv"))
    val j = e.toDF("vec_id", "va", "qa")
      .join(e.toDF("b", "vb", "qb"), col("b") === col("vec_id") + 1)
    j.select(col("vec_id"),
        round(Vectors.cosine(col("va"), col("vb")), 4).as("exact_cos"),
        round(Vectors.cosine(col("qa"), col("qb")), 4).as("quant_cos"))
      .withColumn("cos_err",
        round(abs(col("exact_cos") - col("quant_cos")), 4))
      .orderBy("vec_id")
  }

  /** q113 dedup cluster audit: every document labeled with its near-dup
    * CLUSTER (connected component of the verified MinHash edge graph,
    * label = component minimum; singletons label themselves). The edges
    * are [[graft.operators.Dedup.minhashEdges]] — the exact pair set
    * dedup acts on — and the labels come from the delta-iteration
    * [[graft.operators.Dedup.connectedComponents]]; the oracle recomputes
    * the same edges in SQL and closes them with a recursive CTE, so the
    * hash gate proves the ITERATIVE distributed clustering equals the
    * declarative transitive closure.
    *
    * CAP-FREE BY CONTRACT, AUDIT-ONLY SCOPE: `maxBucketSize =
    * Int.MaxValue` is required because the oracle's recursive CTE closes
    * the COMPLETE band-collision edge set — a star-linked subset has the
    * same connected components only when the components themselves are
    * intact, which capping guarantees for CLUSTER MEMBERSHIP but not for
    * the per-edge set the CTE hashes. This is the one uncapped LSH path
    * in the inventory and it is scoped to the <100-doc audit contract;
    * production clustering takes [[graft.operators.Dedup
    * .minhashLshClusters]] with the default cap, which DedupSpec proves
    * yields the SAME clusters on this corpus. (Star links keep a hot
    * bucket CONNECTED when its members are mutually similar — the
    * boilerplate-cluster case hot buckets actually are; the recall
    * tradeoff for mixed buckets is documented at `candidatePairs`.) */
  def q113(s: SparkSession, d: String): DataFrame = {
    val docs = documents(s, d).filter(col("doc_id") < 100)
      .select(col("doc_id"), col("text"))
    val edges = graft.operators.Dedup.minhashEdges(docs, "doc_id", "text",
      threshold = 0.8, maxBucketSize = Int.MaxValue) // cap-free: see above
    val labels = graft.operators.Dedup.connectedComponents(edges)
      .toDF("doc_id", "cluster")
    docs.select(col("doc_id"))
      .join(labels, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("cluster"), col("doc_id")).cast("long").as("cluster"))
      .orderBy("doc_id")
  }

  /** q114 bigram PMI (pointwise mutual information): association strength
    * of adjacent token pairs — ln(p(xy) / (p(x)·p(y))) with joint mass
    * over bigram positions and marginals over token positions. The
    * collocation-mining read over a corpus. Marginal/total aggregates
    * are group-sized; the 1-row totals broadcast as scalar cross joins;
    * the unigram-marginal joins carry NO broadcast hint — a natural-
    * language vocabulary is usually broadcastable and AQE will choose
    * that, but a forced hint would OOM the driver on an unbounded token
    * domain (ids, hashes), so the plan must be allowed to degrade to a
    * shuffle join. Ranking is on the ROUNDED pmi with the bigram as
    * tiebreak, support ≥ 5 so the top-30 cut sits on real mass. */
  def q114(s: SparkSession, d: String): DataFrame = {
    val t = documents(s, d).select(expr(toks).as("toks"))
      .filter(size(col("toks")) >= 2)
    val uni = t.select(explode(col("toks")).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("c1"))
    val bg = t.select(explode(expr(bigrams("toks"))).as("bigram"))
      .groupBy("bigram").agg(count(lit(1)).as("c2"))
      .filter(col("c2") >= 5)
    val nTok = uni.agg(sum(col("c1")).as("n_tok"))
    val nBg = t.select((size(col("toks")) - 1).cast("long").as("nb"))
      .agg(sum(col("nb")).as("n_bg"))
    bg.crossJoin(broadcast(nTok)).crossJoin(broadcast(nBg))
      .withColumn("x", expr("split_part(bigram, ' ', 1)"))
      .withColumn("y", expr("split_part(bigram, ' ', 2)"))
      .join(uni.toDF("x", "cx"), "x")
      .join(uni.toDF("y", "cy"), "y")
      .select(col("bigram"), col("c2").as("n"),
        round(log((col("c2").cast("double") / col("n_bg")) /
          ((col("cx").cast("double") / col("n_tok")) *
            (col("cy").cast("double") / col("n_tok")))), 4).as("pmi"))
      .orderBy(col("pmi").desc, col("bigram").asc)
      .limit(30)
  }

  /** q115 ANN recall audit: q79's IVF search graded against the
    * brute-force exact top-3 for the same probes — per-probe hit count
    * and recall@3. The quality gate an ANN deployment publishes next to
    * its latency; the brute-force side is bounded by the PROBE batch
    * (6 probes × corpus — an audit cost, not a serving cost). Both
    * rankings order by ROUNDED similarity with the candidate id as
    * tiebreak, so the comparison is deterministic cross-engine. */
  def q115(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val e = embeddings(s, d)
    val cents = e.filter(col("vec_id") < 4)
      .select(col("vec_id").as("cid"), col("embedding"))
    val probes = e.filter(col("vec_id").between(4, 9))
      .select(col("vec_id").as("probe"), col("embedding"))
    val cands = e.filter(col("vec_id") >= 10)
      .select(col("vec_id").as("cand"), col("embedding"))
    val ivf = graft.operators.Ann.ivfSearch(cands, "cand", probes, "probe",
        cents, "cid", "embedding", nprobe = 2, k = 3)
      .select(col("probe"), col("cand"))
    val pv = probes.select(col("probe"), Vectors.asDouble(col("embedding")).as("vp"))
    val cv = cands.select(col("cand"), Vectors.asDouble(col("embedding")).as("vc"))
    val wB = Window.partitionBy(col("probe"))
      .orderBy(col("sim").desc, col("cand").asc)
    val brute = pv.crossJoin(cv)
      .select(col("probe"), col("cand"),
        round(Vectors.cosine(col("vp"), col("vc")), 4).as("sim"))
      .withColumn("rk", row_number().over(wB))
      .filter(col("rk") <= 3)
      .select(col("probe"), col("cand"))
    val hits = ivf.join(brute, Seq("probe", "cand"))
      .groupBy(col("probe")).agg(count(lit(1)).as("n_hit"))
    probes.select(col("probe"))
      .join(hits, Seq("probe"), "left")
      .select(col("probe"),
        coalesce(col("n_hit"), lit(0L)).as("n_hit"),
        round(coalesce(col("n_hit"), lit(0L)).cast("double") / 3.0, 4)
          .as("recall"))
      .orderBy("probe")
  }

  /** q139 quantized-index recall audit: brute-force top-3 neighbors by
    * INT8-QUANTIZED cosine (q111's portable quantizer — the 4×-smaller
    * vectors a memory-bound serving index stores) vs top-3 by exact
    * float cosine, recall@3 per probe. Closes the compression loop the
    * other two audits leave open: q111 prices the per-PAIR cosine error,
    * q115 the IVF pruning loss — this one answers whether the quantized
    * RANKING still finds the true neighbors, the number that justifies
    * shipping int8. Probe set bounded (<6 probes) by the q115 audit
    * contract; both rankings tie-break on rounded sim + id so the
    * comparison is deterministic cross-engine. */
  def q139(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val e = embeddings(s, d)
      .select(col("vec_id"), Vectors.asDouble(col("embedding")).as("v"))
      .withColumn("amax",
        expr("aggregate(v, 0D, (acc, x) -> greatest(acc, abs(x)))"))
      .withColumn("qv",
        expr("transform(v, x -> cast(floor(x * 127.0D / nullif(amax, 0D) + 0.5D) as double))"))
    val probes = e.filter(col("vec_id").between(4, 9))
      .select(col("vec_id").as("probe"), col("v").as("vp"), col("qv").as("qp"))
    val cands = e.filter(col("vec_id") >= 10)
      .select(col("vec_id").as("cand"), col("v").as("vc"), col("qv").as("qc"))
    def top3(sim: org.apache.spark.sql.Column) = {
      val w = Window.partitionBy(col("probe"))
        .orderBy(col("sim").desc, col("cand").asc)
      probes.crossJoin(cands)
        .select(col("probe"), col("cand"), round(sim, 4).as("sim"))
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 3)
        .select(col("probe"), col("cand"))
    }
    val exact = top3(Vectors.cosine(col("vp"), col("vc")))
    val quant = top3(Vectors.cosine(col("qp"), col("qc")))
    val hits = quant.join(exact, Seq("probe", "cand"))
      .groupBy(col("probe")).agg(count(lit(1)).as("n_hit"))
    probes.select(col("probe"))
      .join(hits, Seq("probe"), "left")
      .select(col("probe"),
        coalesce(col("n_hit"), lit(0L)).as("n_hit"),
        round(coalesce(col("n_hit"), lit(0L)).cast("double") / 3.0, 4)
          .as("recall"))
      .orderBy("probe")
  }

  /** q116 salted aggregation equivalence: [[graft.operators.Skew
    * .saltedCountSum]] (two-phase count/sum through 8 salt buckets — a
    * hot key spreads across 8 reducers before the group-sized
    * re-aggregate) must be result-identical to the plain GROUP BY. The
    * oracle IS the plain aggregate — q89's hash-gate discipline applied
    * to the aggregation rewrite. */
  def q116(s: SparkSession, d: String): DataFrame =
    graft.operators.Skew.saltedCountSum(lineitem(s, d),
        col("l_returnflag"), col("l_extendedprice"), saltBuckets = 8)
      .select(col("k").as("l_returnflag"), col("n"),
        round(col("sum_v"), 2).as("sum_price"))
      .orderBy("l_returnflag")

  /** q117 winsorized mean: per-group p05/p95 from the zero-shuffle
    * quantile scan ([[graft.operators.Ranking.exactQuantilesByGroupScan]])
    * broadcast back onto the rows, values clipped into [p05, p95], then
    * one aggregate — the outlier-robust statistic composed FROM the
    * quantile operator (selection feeding computation, not just a
    * report). */
  def q117(s: SparkSession, d: String): DataFrame = {
    val li = lineitem(s, d)
    val q = graft.operators.Ranking.exactQuantilesByGroupScan(
        li, "l_returnflag", Seq("l_extendedprice" -> Seq(0.05, 0.95)))
      .select(col("l_returnflag"), col("q_0_0").as("lo"),
        col("q_0_1").as("hi"))
    li.join(broadcast(q), "l_returnflag")
      .groupBy(col("l_returnflag"))
      .agg(
        round(avg(greatest(col("lo"), least(col("hi"),
          col("l_extendedprice")))), 2).as("wmean"),
        count(lit(1)).as("n"))
      .orderBy("l_returnflag")
  }

  /** q118 MinHash estimator calibration: for every LSH candidate pair
    * (band-key collision over docs <100), the SIGNATURE-estimated
    * Jaccard (fraction of agreeing min-hashes — what incremental dedup
    * thresholds on, q103) against the TRUE shingle Jaccard, with the
    * error. Top-20 by true similarity. The audit that justifies the
    * 8-hash estimate before trusting it at corpus scale. Candidates come
    * from [[graft.operators.Dedup.lshCandidates]] — the shared
    * hot-capped banding, NOT an inline bucket self-join (the r5-flagged
    * uncapped path): below the cap the pair set is identical to the
    * plain band collision the oracle computes, above it a boilerplate
    * band key star-links instead of exploding m². */
  def q118(s: SparkSession, d: String): DataFrame = {
    val docs = documents(s, d).filter(col("doc_id") < 100)
      .select(col("doc_id"), col("text"))
    val sigs = graft.operators.Dedup.minhashSignatures(docs, "doc_id", "text")
    val pairs = graft.operators.Dedup.lshCandidates(sigs, "doc_id")
    val sh = docs
      .select(col("doc_id"), expr(toks).as("toks"))
      .filter(size(col("toks")) >= 3)
      .select(col("doc_id"), expr(TextHashes.shingleSet("toks")).as("sh"))
    val agree = size(filter(zip_with(col("mha"), col("mhb"),
      (x, y) => x === y), m => m))
    pairs
      .join(sigs.toDF("a", "mha"), "a")
      .join(sigs.toDF("b", "mhb"), "b")
      .join(sh.toDF("a", "sha"), "a")
      .join(sh.toDF("b", "shb"), "b")
      .withColumn("inter", size(array_intersect(col("sha"), col("shb"))))
      .select(col("a"), col("b"),
        round(agree / lit(8.0), 4).as("est_j"),
        round(col("inter").cast("double") /
          (size(col("sha")) + size(col("shb")) - col("inter")), 4).as("true_j"))
      .withColumn("err", round(abs(col("est_j") - col("true_j")), 4))
      .orderBy(col("true_j").desc, col("a").asc, col("b").asc)
      .limit(20)
  }

  /** q119 composed quality gate (the C4/Gopher-style filter): every
    * document graded against four rules — minimum length, type-token
    * diversity, top-bigram repetition, stopword density — into a
    * fail BITMASK (1=short, 2=low-diversity, 4=repetitive,
    * 8=low-stopword) plus the keep verdict. The auditable form: a
    * release gate keeps `fail_mask = 0` and the mask says WHY everything
    * else dropped. All signals are exact integer ratios compared with
    * identical IEEE doubles on both engines; thresholds sit at corpus
    * split points (30 tokens / 0.4 ttr / 0.08 top-bigram / 0.03
    * stopword) so the gate actually partitions the data. */
  def q119(s: SparkSession, d: String): DataFrame = {
    // scan-parallelism floor (round 19, guide §2.5): the tokenize +
    // bigram chain ran as ONE ~0.46 s task at sf0.1; self-disabling at
    // real volumes
    val t = graft.Tables.withParallelismFloor(documents(s, d), "doc_id")
      .select(col("doc_id"), expr(toks).as("toks"))
    val base = t.filter(size(col("toks")) >= 1)
      .select(col("doc_id"),
        size(col("toks")).cast("long").as("n_tok"),
        size(array_distinct(col("toks"))).cast("long").as("nd"),
        expr("size(filter(toks, x -> array_contains(array('the','a','of','to','and','in','is'), x)))")
          .cast("long").as("n_stop"))
    val top = t.filter(size(col("toks")) >= 2)
      .select(col("doc_id"), explode(expr(bigrams("toks"))).as("bg"))
      .groupBy(col("doc_id"), col("bg"))
      .agg(count(lit(1)).as("n"))
      .groupBy(col("doc_id"))
      .agg((max(col("n")).cast("double") / sum(col("n"))).as("topf"))
    base.join(top, Seq("doc_id"), "left")
      .withColumn("topf", coalesce(col("topf"), lit(0.0)))
      .withColumn("fail_mask",
        (when(col("n_tok") < 30, 1).otherwise(0) +
          when(col("nd").cast("double") / col("n_tok") < 0.4, 2).otherwise(0) +
          when(col("topf") > 0.08, 4).otherwise(0) +
          when(col("n_stop").cast("double") / col("n_tok") < 0.03, 8)
            .otherwise(0)).cast("long"))
      .select(col("doc_id"), col("n_tok"), col("fail_mask"),
        (col("fail_mask") === 0).as("keep"))
      .orderBy("doc_id")
  }

  /** q120 EXACT similarity join by prefix filtering
    * ([[graft.operators.Dedup.prefixSimilarityJoin]]): every pair with
    * token-set Jaccard ≥ 0.8 over docs <80. The oracle is the BRUTE
    * FORCE ground truth (all shared-token pairs, no pruning) — so the
    * hash gate proves the prefix-filter optimization is LOSSLESS, the
    * property LSH queries (q46–q60) can only approximate. */
  def q120(s: SparkSession, d: String): DataFrame =
    graft.operators.Dedup.prefixSimilarityJoin(
        documents(s, d).filter(col("doc_id") < 80)
          .select(col("doc_id"), col("text")),
        "doc_id", "text", threshold = 0.8)
      .select(col("a"), col("b"), round(col("j"), 4).as("j"))
      .orderBy("a", "b")

  /** q112 exact per-group quantiles over a DERIVED measure: token counts
    * per language through [[graft.operators.Ranking
    * .exactQuantilesByGroupScan]] — the histogram-refinement selection
    * reads its input from a computed projection (tokenize → count), so
    * each refinement pass re-derives the narrow column instead of
    * materializing it; still zero data-row shuffles. The corpus-curation
    * read: "how long are my documents, per language, exactly". */
  def q112(s: SparkSession, d: String): DataFrame = {
    val dtl = documents(s, d)
      .select(col("lang"), size(expr(toks)).cast("double").as("n_tok"))
    // NOT materialized (round 8): the fused first-pass bracketing cut
    // the scan to TWO passes, and checkpointing the stacked stream
    // (write + read-back) now costs more than one extra narrow
    // tokenize — the r5 materialize advice was right at 4+ passes,
    // wrong at 2 (measured both ways at sf0.1)
    graft.operators.Ranking.exactQuantilesByGroupScan(
        dtl, "lang", Seq("n_tok" -> Seq(0.25, 0.5, 0.75)))
      .select(col("lang"),
        round(col("q_0_0"), 4).as("p25_tok"),
        round(col("q_0_1"), 4).as("p50_tok"),
        round(col("q_0_2"), 4).as("p75_tok"))
      .orderBy("lang")
  }

  /** Bag-of-words content fingerprint — q137's exact construction
    * (md5 of the space-joined sorted distinct token set), shared so the
    * leakage, label-consistency, and novelty audits can never drift
    * onto different notions of "same content". */
  private def bagFingerprint =
    md5(concat_ws(" ", array_sort(array_distinct(expr(toks)))))

  /** q142 embedding-dimension health audit: per-dimension mean / spread
    * / range over the whole corpus — the collapse/anisotropy check every
    * embedding pipeline runs before trusting cosine distances (a
    * dimension with ~zero variance carries no signal; one with a huge
    * |mean| relative to its spread makes cosine similarity saturate).
    * Unit-norm embeddings make whole-VECTOR norms a vacuous audit, so
    * the per-dimension marginal is the informative read. Shape:
    * posexplode (narrow, 64× rows) into a 64-GROUP hash aggregate —
    * partial aggregation reduces map-side, the exchange carries 64 rows
    * per partition regardless of corpus size. */
  def q142(s: SparkSession, d: String): DataFrame =
    embeddings(s, d)
      .select(posexplode(Vectors.asDouble(col("embedding")))
        .as(Seq("pos", "x")))
      .select((col("pos") + 1).cast("long").as("dim"), col("x"))
      .groupBy(col("dim"))
      .agg(count(lit(1)).as("n"),
        round(avg(col("x")), 4).as("mean_x"),
        round(stddev_samp(col("x")), 4).as("sd_x"),
        round(min(col("x")), 4).as("min_x"),
        round(max(col("x")), 4).as("max_x"))
      .orderBy("dim")

  /** q143 duplicate-family label-consistency audit: exact-content
    * families (same bag-of-words fingerprint) whose members disagree on
    * the `lang` label — the standard mislabel/contamination signal a
    * language-filtered corpus build checks before per-language mixing
    * (a duplicated doc carrying two langs means at least one label is
    * wrong, and language-stratified dedup would silently keep both).
    * One fingerprint exchange; the family aggregate emits min/max lang
    * as the witness pair. Families of 1 are noise and drop. */
  def q143(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .select(col("doc_id"), col("lang"), bagFingerprint.as("fp"))
      .groupBy(col("fp"))
      .agg(min(col("doc_id")).as("rep"),
        count(lit(1)).as("n_docs"),
        countDistinct(col("lang")).as("n_langs"),
        min(col("lang")).as("lang_a"),
        max(col("lang")).as("lang_b"))
      .filter(col("n_docs") > 1)
      .select(col("rep"), col("n_docs"), col("n_langs"),
        col("lang_a"), col("lang_b"),
        (col("n_langs") > 1).as("mislabel_risk"))
      .orderBy("rep")

  /** q144 corpus novelty curve: fraction of FIRST-OCCURRENCE content per
    * doc_id decile — the marginal-value-of-more-data read (a crawl whose
    * late deciles are mostly re-observed fingerprints has stopped adding
    * information; the curve's tail is the stop signal for collection).
    * First occurrence = min(doc_id) per fingerprint (q136's novelty
    * discipline at document granularity); deciles are arithmetic on the
    * max id (one scalar broadcast), so the whole query is the
    * fingerprint exchange + a 10-row aggregate. Rate is
    * floor-truncated (engine-portable exact rational). */
  def q144(s: SparkSession, d: String): DataFrame = {
    val docs = documents(s, d)
      .select(col("doc_id"), bagFingerprint.as("fp"))
    val firsts = docs.groupBy(col("fp"))
      .agg(min(col("doc_id")).as("first_id"))
    docs.join(firsts, "fp")
      .withColumn("novel",
        (col("doc_id") === col("first_id")).cast("int"))
      .crossJoin(broadcast(
        documents(s, d).agg(max(col("doc_id")).as("max_id"))))
      .select(floor(lit(10.0) * col("doc_id") / (col("max_id") + 1))
        .cast("long").as("decile"), col("novel"))
      .groupBy(col("decile"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("novel")).cast("long").as("n_novel"),
        (floor(sum(col("novel")) * 10000.0 / count(lit(1))) / 10000.0)
          .as("novelty_rate"))
      .orderBy("decile")
  }

  /** q150 leakage-free fold assignment: q128's k-fold split is
    * hash-random per DOCUMENT, so near-duplicate pairs straddle folds
    * (q137 audits exactly that leak); here the split key is the
    * near-dup CLUSTER — q113's connected components over verified LSH
    * edges — hashed with q128's portable salted-md5, so every member
    * of a cluster lands in the same fold by construction. This is the
    * split a dedup-aware training pipeline actually ships: eval folds
    * stay clean without dropping the duplicates.
    *
    * Plan: q113's shapes end-to-end (band-key candidate join, exact
    * verification, frontier-only delta iteration) + a NARROW fold
    * projection — the fold adds zero exchanges. The oracle re-derives
    * the clusters with the same recursive CTE q113 pins and the same
    * md5 nibble arithmetic, so fold membership is engine-exact. */
  def q150(s: SparkSession, d: String): DataFrame = {
    val docs = documents(s, d).filter(col("doc_id") < 100)
      .select(col("doc_id"), col("text"))
    val edges = graft.operators.Dedup.minhashEdges(docs, "doc_id", "text",
      threshold = 0.8, maxBucketSize = Int.MaxValue) // q113's cap-free gate
    val labels = graft.operators.Dedup.connectedComponents(edges)
      .toDF("doc_id", "cluster")
    def nib(i: Int) =
      s"(instr('0123456789abcdef', substr(md5(concat('fold:', cast(cluster as string))),$i,1)) - 1)"
    docs.select(col("doc_id"))
      .join(labels, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("cluster"), col("doc_id")).cast("long").as("cluster"))
      .withColumn("fold",
        expr(s"cast((${nib(1)} * 16 + ${nib(2)}) % 3 as bigint)"))
      .orderBy("doc_id")
  }

  /** q151 exact sub-document duplication: pairs where one document's
    * whole TOKEN STREAM appears contiguously inside another's — the
    * quote/mirror/boilerplate-page case that shingle-set containment
    * (q110) only scores approximately. Semantics are token-boundary
    * substring on the normalized (single-space-joined) token text;
    * matching is space-padded so `"b c" ⊂ "a b c d"` matches while
    * `"at scan" ⊄ "cat scans"` cannot.
    *
    * LOSSLESS at scale (q120's discipline, not LSH): a contained doc's
    * shingles are ALL shingles of its container, so joining each
    * containee's single RAREST shingle against the corpus inverted
    * index yields a candidate superset — candidates ∝ the rarest
    * shingle's df, never all-pairs — and exact padded-`instr`
    * verification filters it. The oracle IS the all-pairs brute force,
    * so the driver hash gate proves the pruning lossless, the property
    * a hard dedup contract needs. Containees need ≥ 3 tokens (a shingle
    * must exist — stated in both faces); containers then have ≥ 3 by
    * implication.
    *
    * The rarest pick rides a single LONG (round 11): `min(struct(df,
    * s))` has a non-mutable buffer, which demotes BOTH aggregate
    * phases to SortAggregate and full-sorts the (doc, shingle)
    * pair-volume feed within partitions — q136's measured 8.9 s-vs-
    * 0.9 s demotion, and r10's slowest query (1.56 s). Instead each
    * row encodes `code = min(df, 2³¹−1)·2³¹ + h` (h = the 31-bit
    * token-triple xxhash64 — round 12: hashed straight from the three
    * tokens, no concat string ever materializes)
    * and the pick is `min(code)` — a long buffer, so HashAggregate +
    * map-side combine apply and nothing sorts. The low bits identify
    * the picked shingle by HASH, not by value, and the candidate join
    * keys on that same 31-bit hash: a's winning shingle is a real
    * shingle of a, every container carries the identical shingle and
    * therefore the identical hash, so the join still finds every true
    * pair — hash collisions and the df clamp only ADD candidates,
    * which exact verification removes. Losslessness is untouched; the
    * pick is deterministic (min over a fixed encoding); the clamp
    * keeps the encoding overflow-free for any df up to 2³¹−1 and
    * merely widens the candidate set beyond it. */
  def q151(s: SparkSession, d: String): DataFrame =
    substringDupPairs(documents(s, d)).orderBy("contained", "container")

  /** q151's body over ANY (doc_id, text) frame — extracted round 14 so
    * the scale probe can drive the rarest-shingle index over a salted
    * full corpus (constant dup density) without duplicating the shape. */
  private[graft] def substringDupPairs(docsIn: DataFrame): DataFrame = {
    val norm = docsIn
      .select(col("doc_id"), expr(toks).as("toks"))
      .filter(size(col("toks")) >= 3)
      .select(col("doc_id"),
        array_join(col("toks"), " ").as("norm"),
        size(col("toks")).cast("long").as("n_toks"))
    val mask = (1L << 31) - 1
    // shingle HASHES built directly from the token triple (round 12):
    // the index only ever consumes h, so the per-shingle concat string
    // + string-space array_distinct the shingleRows form pays (twice —
    // this index derives once per join side) is pure waste here.
    // xxhash64 over the three tokens replaces it; dedup happens in
    // 31-bit hash space, which can only MERGE colliding shingles — the
    // pick is still a real shingle hash of the doc and every container
    // carries the identical shingle, so losslessness is untouched
    // (same argument as the df clamp below). A/B at sf0.1: 1.43 →
    // 1.17 s warm.
    val index = docsIn
      .select(col("doc_id"), expr(toks).as("toks"))
      .filter(size(col("toks")) >= 3)
      .select(col("doc_id"), explode(expr(
        s"""array_distinct(transform(sequence(1, size(toks) - 2),
           |  i -> xxhash64(element_at(toks, i), element_at(toks, i + 1),
           |    element_at(toks, i + 2)) & ${mask}L))""".stripMargin))
        .as("h"))
    val df = index.groupBy(col("h")).agg(count(lit(1)).as("df"))
    val rarest = index.join(df, "h")
      .groupBy(col("doc_id"))
      .agg(min(least(col("df"), lit(mask)) * lit(mask + 1) + col("h"))
        .as("code"))
      .select(col("doc_id").as("a_id"),
        col("code").bitwiseAND(lit(mask)).as("h"))
    // distinct: two DISTINCT container shingles colliding on h would
    // emit the same (a, b) twice (the s-keyed join couldn't — shingles
    // are per-doc distinct). Candidate-sized exchange, exactness cannot
    // hinge on hash luck.
    val cand = rarest
      .join(index.select(col("doc_id").as("b_id"), col("h")), "h")
      .filter(col("a_id") =!= col("b_id"))
      .select(col("a_id"), col("b_id"))
      .distinct()
    cand
      .join(norm.select(col("doc_id").as("a_id"), col("norm").as("a_norm"),
        col("n_toks").as("n_toks_contained")), "a_id")
      .join(norm.select(col("doc_id").as("b_id"), col("norm").as("b_norm"),
        col("n_toks").as("n_toks_container")), "b_id")
      // free length prune (r12): a longer text cannot be contained in a
      // shorter one, so the integer comparison discards roughly half of
      // a symmetric candidate set BEFORE the O(|b_norm|) instr scan
      .filter(col("n_toks_contained") <= col("n_toks_container"))
      .filter(instr(concat(lit(" "), col("b_norm"), lit(" ")),
        concat(lit(" "), col("a_norm"), lit(" "))) > 0)
      .select(col("a_id").as("contained"), col("b_id").as("container"),
        col("n_toks_contained"), col("n_toks_container"))
  }

  /** q152 bigram-LM document scoring (the CCNet/Gopher quality-filter
    * primitive): train an add-one-smoothed bigram language model on the
    * corpus itself, then score every document by its mean log-likelihood
    * ln((C(w1w2)+1)/(C(w1·)+V)) — documents far below the corpus norm
    * are boilerplate/garble candidates, far above are near-duplicates
    * of high-mass content; both tails feed the quality gate (q119 scores
    * FORM — length/punct ratios; this scores CONTENT against the corpus
    * distribution).
    *
    * Plan: bigram and context counts are partial-aggregated (exchanges
    * = |distinct bigrams| and |vocab| — saturating, per the q107 probe),
    * the vocab size is a 1-row broadcast, and the per-occurrence score
    * join keys on the bigram with NO broadcast hint (q114's rule: AQE
    * broadcasts a sane vocabulary, an unbounded token domain degrades
    * to a shuffle join instead of a driver OOM). The per-doc rollup is
    * doc-sized. round(4) on the mean: an irrational sum, q126's rule. */
  def q152(s: SparkSession, d: String): DataFrame = {
    // scan-parallelism floor (round 19, guide §2.5): the tokenize +
    // bigram maps ran as single ~0.3 s tasks at sf0.1; self-disabling
    // at real volumes
    val bg = graft.Tables.withParallelismFloor(documents(s, d), "doc_id")
      .select(col("doc_id"), expr(toks).as("toks"))
      .filter(size(col("toks")) >= 2)
      .select(col("doc_id"), explode(expr(bigrams("toks"))).as("bg"))
      .select(col("doc_id"), col("bg"),
        substring_index(col("bg"), " ", 1).as("w1"))
    val c2 = bg.groupBy(col("bg")).agg(count(lit(1)).as("c2"))
    val c1 = bg.groupBy(col("w1")).agg(count(lit(1)).as("c1"))
    val v = documents(s, d)
      .select(explode(expr(toks)).as("w")).agg(count_distinct(col("w")).as("v"))
    bg.join(c2, "bg").join(c1, "w1").crossJoin(broadcast(v))
      .select(col("doc_id"),
        log((col("c2") + lit(1.0)) / (col("c1") + col("v"))).as("ll"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        round(sum(col("ll")) / count(lit(1)), 4).as("avg_ll"))
      .orderBy("doc_id")
  }

  /** q157 edit-distance near-duplicate verification (round 11): all
    * doc pairs (a < b, doc_id < 200 — the declared probe corpus) whose
    * character-level Levenshtein distance is ≤ 45 — the EXACT
    * small-edit near-dup relation (minhash/simhash score SET overlap;
    * edit distance catches in-place token substitutions they
    * under-weight). The planted near-dup families here straddle
    * language labels, so no lang equality narrows the pair space — the
    * pruning must come from geometry.
    *
    * Scale shape — a BANDED length join, never doc×doc: lev(a,b) ≥
    * |len(a)−len(b)|, so qualifying pairs differ by ≤ 20 chars
    * (declared alongside the threshold, both faces) and each left doc
    * need only meet the three adjacent floor(n_chars/20) bands
    * (explode of a 3-element array). Candidates ∝ per-band population
    * — the classic interval-band equi-join — and each candidate pays
    * one codegen'd `levenshtein`. The oracle is the brute-force
    * inequality join, so the hash gate proves the banding lossless
    * (a |Δlen| ≤ 20 pair always lands in an adjacent band: bands are
    * 20 wide). */
  def q157(s: SparkSession, d: String): DataFrame =
    editDistancePairs(documents(s, d).filter(col("doc_id") < 200))
      .orderBy("a", "b")

  /** q157's body over ANY (doc_id, text, n_chars) frame — extracted
    * round 14 for the scale probe (length-band population growth). */
  private[graft] def editDistancePairs(docsIn: DataFrame): DataFrame = {
    val docs = docsIn
      .select(col("doc_id"), col("text"), col("n_chars"),
        floor(col("n_chars") / 20).as("band"))
    val left = docs.select(col("doc_id").as("a"), col("text").as("ta"),
        col("n_chars").as("ca"),
        explode(array(col("band") - 1, col("band"),
          col("band") + 1)).as("band"))
    val right = docs.select(col("doc_id").as("b"), col("text").as("tb"),
      col("n_chars").as("cb"), col("band"))
    // the THRESHOLD form: Spark's bounded levenshtein walks only the
    // 2·45+1 diagonal band of the DP matrix and exits early, returning
    // -1 past the bound — ~6x cheaper per pair than the full matrix at
    // these lengths (r11 bench: 2.91 s -> 0.46 s). The oracle's
    // unbounded levenshtein + `<= 45` filter selects identical rows:
    // within the bound the banded DP IS the classic distance.
    left.join(right, "band")
      .filter(col("a") < col("b") &&
        abs(col("ca") - col("cb")) <= 20)
      .select(col("a"), col("b"),
        levenshtein(col("ta"), col("tb"), 45).cast("long").as("lev"))
      .filter(col("lev") >= 0)
  }

  /** q158 conditional bigram entropy rate per language (round 11):
    * H(W₂|W₁) = −Σ p(w₁,w₂)·ln(c(w₁,w₂)/c(w₁·)) over each language's
    * bigram distribution — the sequence-predictability complement to
    * q125's unigram entropy and q152's per-doc LM score: natural text
    * sits in a characteristic band, machine-generated loops score low,
    * shuffled/garbled text high, and a language whose rate drifts
    * between snapshots signals contamination or a scraper change.
    *
    * Scale shape: everything flows from ONE (lang, w₁, w₂) count
    * aggregate — vocabulary²-bounded and partial-aggregated below the
    * exchange; context counts c(w₁·) and the per-lang total fold from
    * it (never a second pass over tokens), and the final rollup is
    * |langs| rows. Token volume appears only in the narrow explode. */
  def q158(s: SparkSession, d: String): DataFrame = {
    val c2 = documents(s, d)
      .select(col("lang"), expr(toks).as("toks"))
      .filter(size(col("toks")) >= 2)
      .select(col("lang"), explode(expr(bigrams("toks"))).as("bg"))
      .groupBy(col("lang"), col("bg")).agg(count(lit(1)).as("c2"))
      .select(col("lang"), col("c2"),
        substring_index(col("bg"), " ", 1).as("w1"))
    val c1 = c2.groupBy(col("lang"), col("w1")).agg(sum(col("c2")).as("c1"))
    val t = c2.groupBy(col("lang")).agg(sum(col("c2")).as("n"))
    c2.join(c1, Seq("lang", "w1")).join(broadcast(t), "lang")
      .select(col("lang"), col("n"),
        (col("c2") / col("n") * log(col("c2") / col("c1"))).as("term"))
      .groupBy(col("lang"), col("n"))
      .agg(round(-sum(col("term")), 4).as("h_rate"))
      .select(col("lang"), col("n").as("n_bigrams"), col("h_rate"))
      .orderBy("lang")
  }

  /** q189 quality-canonical dedup survivors (round 14): q113's near-dup
    * families re-labeled with the representative REAL pipelines keep —
    * the highest-quality member (longest text, `n_chars`; ties to the
    * smallest doc_id), not the arbitrary min-id. Dropping the shorter
    * members of a dup family keeps the fullest copy of the content
    * (truncated scrapes, elided quotes), which min-id selection gets
    * wrong whenever the truncated copy happens to carry the smaller id.
    *
    * Scale shape: q113's machinery end-to-end (band-key candidates,
    * exact verify, delta-CC), then TWO cluster-keyed hash aggregates —
    * max quality per cluster, then min doc_id among the maxima — both
    * partial-aggregated and cluster-bounded. The argmax is deliberately
    * two-pass instead of a `max_by(id, struct(quality, -id))`: a struct
    * ordering key demotes the aggregate to its sort-based fallback,
    * while paired LONG aggregates stay in HashAggregate (the q151
    * encode rule). */
  def q189(s: SparkSession, d: String): DataFrame = {
    val docs = documents(s, d).filter(col("doc_id") < 100)
      .select(col("doc_id"), col("n_chars"))
    val edges = graft.operators.Dedup.minhashEdges(
      documents(s, d).filter(col("doc_id") < 100)
        .select(col("doc_id"), col("text")),
      "doc_id", "text", threshold = 0.8,
      maxBucketSize = Int.MaxValue) // q113's cap-free gate
    val labeled = docs
      .join(graft.operators.Dedup.connectedComponents(edges)
        .toDF("doc_id", "cluster"), Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_chars"),
        coalesce(col("cluster"), col("doc_id")).cast("long").as("cluster"))
    val best = labeled.groupBy(col("cluster"))
      .agg(max(col("n_chars")).as("best_chars"))
    val rep = labeled.join(best, "cluster")
      .filter(col("n_chars") === col("best_chars"))
      .groupBy(col("cluster")).agg(min(col("doc_id")).as("rep_id"))
    labeled.join(rep, "cluster")
      .select(col("doc_id"), col("cluster"), col("rep_id"),
        (col("doc_id") === col("rep_id")).as("keep"))
      .orderBy("doc_id")
  }

  /** q197 soft-dedup sampling weights (round 14; the SoftDeDup
    * alternative to hard removal): every member of a near-dup family
    * of size m gets sampling weight 1/m, so the family contributes ONE
    * document's worth of probability mass while keeping all its
    * variants available — the middle ground between q41/q189 (drop)
    * and no dedup (over-train on duplicated content). Also reports the
    * family size, so Σ weight = the corpus's EFFECTIVE size (the
    * number the dataset card q160 wants next to raw doc count).
    *
    * Scale shape: q113's family machinery + ONE cluster-keyed count
    * aggregate joined back (cluster-bounded). The weight is a ratio of
    * exact integers → the floor idiom, identical double ops both
    * faces. */
  def q197(s: SparkSession, d: String): DataFrame = {
    val docs = documents(s, d).filter(col("doc_id") < 100)
      .select(col("doc_id"), col("text"))
    val edges = graft.operators.Dedup.minhashEdges(docs, "doc_id", "text",
      threshold = 0.8, maxBucketSize = Int.MaxValue) // q113's cap-free gate
    val labeled = docs.select(col("doc_id"))
      .join(graft.operators.Dedup.connectedComponents(edges)
        .toDF("doc_id", "cluster"), Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("cluster"), col("doc_id")).cast("long").as("cluster"))
    val fam = labeled.groupBy(col("cluster"))
      .agg(count(lit(1)).as("fam_size"))
    labeled.join(fam, "cluster")
      .select(col("doc_id"), col("cluster"), col("fam_size"),
        (floor(lit(10000.0) / col("fam_size")) / 10000.0).as("weight"))
      .orderBy("doc_id")
  }

  /** q205 cross-source syndication matrix (round 15) — q190's
    * vocabulary-Jaccard mirror detector says two sources USE the same
    * words; this one says they CARRY the same passages: q151's lossless
    * sub-document duplication pairs ([[substringDupPairs]], the
    * rarest-shingle inverted index) rolled up to the (source, source)
    * grid — per unordered source pair, the number of containment pairs
    * and the duplicated token mass (Σ tokens of the contained side).
    * The diagonal (src, src) is intra-source re-posting; off-diagonal
    * cells are the syndication/mirror signal a curation pipeline uses
    * to pick ONE canonical source before dedup even runs.
    *
    * Scale shape: the pair frame is the q151 index's output (bounded
    * by shared-rare-shingle volume — probed sublinear at ×30); the two
    * doc→source attributions join that tiny frame against column-pruned
    * (doc_id, source) scans (AQE broadcasts the pair side); the final
    * aggregate is |sources|²-bounded. */
  def q205(s: SparkSession, d: String): DataFrame = {
    val pairs = substringDupPairs(documents(s, d))
    val src = documents(s, d).select(col("doc_id"), col("source"))
    pairs
      .join(src.toDF("contained", "src_ca"), Seq("contained"))
      .join(src.toDF("container", "src_cb"), Seq("container"))
      .select(least(col("src_ca"), col("src_cb")).as("src_a"),
        greatest(col("src_ca"), col("src_cb")).as("src_b"),
        col("n_toks_contained"))
      .groupBy(col("src_a"), col("src_b"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(col("n_toks_contained")).as("dup_tokens"))
      .orderBy("src_a", "src_b")
  }
}
