package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables._
import graft.functions.Vectors

/** Large-scale training-data pipeline operators (SURVEY.md §2.5 Tier C +
  * builder mandate): dedup (exact in q41; MinHash-LSH, n-gram Jaccard,
  * SimHash, embedding near-dup here), similarity search (brute-force in
  * q43; LSH-bucketed ANN here), and text analysis (language-ID heuristic,
  * quality scoring, token counting, fingerprinting).
  *
  * Every hash used is portable SQL (`md5` hex, salted per hash function;
  * nibble values recovered with `instr` against a hex alphabet), so each
  * operator is verifiable against the DuckDB oracle — no engine-private
  * hash functions in the contract surface.
  *
  * Scale design: all operators are shuffle-minimal —
  *  - shingling/token explode is a narrow map; the only exchange is the
  *    per-doc aggregation (partial agg shrinks it);
  *  - LSH banding turns the O(n²) all-pairs dedup into an equi-join on
  *    band keys — at 100 TB the candidate-pair join shuffles only on
  *    bucket keys, never materializing the full cross product;
  *  - pairwise queries (q47/q49) are bounded probe sets by contract
  *    (absolute doc_id/vec_id bounds), so their cost is constant in sf;
  *  - ANN (q54) broadcasts the probe set and partitions candidates by
  *    bucket — a map-side join at any scale.
  */
object PipelineQueries {

  /** Per-document distinct word 3-gram shingle SET as an array column —
    * a narrow map (split → transform → array_distinct), no explode, no
    * distinct exchange. Every shingle consumer derives from this one
    * computation: signatures via `array_min` over transformed arrays,
    * set sizes via `size`, intersections via `array_intersect` — the
    * whole shingle pipeline stays inside whole-stage codegen and the
    * only shuffles left are the ones the operator semantics require.
    * Docs with <3 tokens have no shingles and are filtered out. */
  private def shingleSets(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
        expr(graft.operators.TextHashes.toks("text")).as("toks"))
      .filter(size(col("toks")) >= 3)
      .select(col("doc_id"),
        expr(graft.operators.TextHashes.shingleSet("toks")).as("sh"))

  /** The EXPLODED distinct (doc_id, shingle) frame — the inverted-
    * index shape (q47's idiom: single-level generator over the
    * transform + row-level distinct; exploding [[shingleSets]]'
    * pre-built array instead trips InferFiltersFromGenerate into an
    * interpreted per-scan-row shingle chain). Downstream doc_id
    * filters push through the distinct on the grouping key into the
    * scan. */
  private def shingleRows(docs: DataFrame): DataFrame =
    // scan-parallelism floor (round 19, guide §2.5): the tokenize +
    // shingle chain ran as ONE ~0.5 s task at sf0.1 (q215/q218
    // profiles); self-disabling at real volumes
    graft.Tables.withParallelismFloor(docs, "doc_id")
      .select(col("doc_id"),
        expr(graft.operators.TextHashes.toks("text")).as("toks"))
      .filter(size(col("toks")) >= 3)
      .select(col("doc_id"),
        explode(expr(graft.operators.TextHashes.shingleTransform("toks")))
          .as("s"))
      .distinct()

  /** q46 MinHash signatures + LSH band keys (8 salted md5 min-hashes,
    * 4 bands × 2 rows). Documents sharing any band key are near-dup
    * candidates; at scale dedup is a self-join on the band columns.
    * Signatures are array_min over the per-doc shingle array — a narrow
    * map; the old explode + groupBy exchange is gone. */
  def q46(s: SparkSession, d: String): DataFrame = {
    val mj = (j: Int) => array_min(expr(s"transform(sh, x -> md5(concat('$j:', x)))"))
    shingleSets(documents(s, d).filter(col("doc_id") < 100))
      .select(col("doc_id") +: (0 until 8).map(j => mj(j).as(s"m$j")): _*)
      .select(col("doc_id"),
        concat(col("m0"), col("m1")).as("band0"),
        concat(col("m2"), col("m3")).as("band1"),
        concat(col("m4"), col("m5")).as("band2"),
        concat(col("m6"), col("m7")).as("band3"))
      .orderBy("doc_id")
  }

  /** q47 n-gram Jaccard near-dup: top-20 most-similar document pairs by
    * 3-gram shingle Jaccard. Pair generation is an equi-join on the
    * shingle (inverted-index join), not a cross join; set sizes come
    * from the array form (narrow), so only the inverted index pays an
    * exchange — the old shape built the distinct-shingle index three
    * times.
    *
    * The explode is deliberately single-level (generator expression
    * directly over the `toks` projection, shingle-dedup via a
    * row-level `distinct()`): exploding a pre-built array column makes
    * `InferFiltersFromGenerate` synthesize `size(arr) > 0` filters
    * whose pushdown re-inlines the whole shingle chain into a per-scan-
    * row interpreted filter — a 10× regression measured at sf0.1. */
  def q47(s: SparkSession, d: String): DataFrame = {
    val base = documents(s, d).filter(col("doc_id") < 60)
      .select(col("doc_id"),
        expr(graft.operators.TextHashes.toks("text")).as("toks"))
      .filter(size(col("toks")) >= 3)
    val cnt = base.select(col("doc_id"),
      expr(s"size(${graft.operators.TextHashes.shingleSet("toks")})").as("n"))
    val inv = base.select(col("doc_id"),
        explode(expr(graft.operators.TextHashes.shingleTransform("toks"))).as("s"))
      .distinct()
    val inter = inv.toDF("a", "s")
      .join(inv.toDF("b", "s2"), col("s") === col("s2") && col("a") < col("b"))
      .groupBy(col("a"), col("b")).agg(count(lit(1)).as("inter"))
    inter
      .join(broadcast(cnt.toDF("a", "na")), "a")
      .join(broadcast(cnt.toDF("b", "nb")), "b")
      .select(col("a"), col("b"),
        round(col("inter") / (col("na") + col("nb") - col("inter")), 4)
          .as("jaccard"))
      .orderBy(col("jaccard").desc, col("a").asc, col("b").asc)
      .limit(20)
  }

  /** q48 SimHash document fingerprint: 16-bit signature over distinct
    * tokens, hash = first 4 nibbles of md5 (portable across engines).
    * Near-dup = small Hamming distance between signatures. Fully narrow:
    * distinct tokens via array_distinct, per-bit ±1 vote sums via
    * `aggregate` over the token-hash array — zero exchanges before the
    * 100-row contract sort (the old form exploded + grouped). */
  def q48(s: SparkSession, d: String): DataFrame = {
    val sig = graft.operators.TextHashes.simhashSig("hvs")
    documents(s, d).filter(col("doc_id") < 100)
      .select(col("doc_id"),
        expr(graft.operators.TextHashes.hvArray("text")).as("hvs"))
      // token-less docs have no signature (the explode-based oracle
      // drops them; without this filter they'd surface as simhash=0)
      .filter(size(col("hvs")) > 0)
      .select(col("doc_id"), expr(s"cast($sig as bigint)").as("simhash"))
      .orderBy("doc_id")
  }

  /** q49 embedding near-dup: top-20 cosine-closest vector pairs. Bounded
    * probe set by contract; the scale path for all-pairs is q54's LSH
    * bucketing. */
  def q49(s: SparkSession, d: String): DataFrame = {
    val e = embeddings(s, d).filter(col("vec_id") < 100)
      .select(col("vec_id"), Vectors.asDouble(col("embedding")).as("v"))
    e.toDF("a", "va").join(e.toDF("b", "vb"), col("a") < col("b"))
      .select(col("a"), col("b"),
        round(Vectors.cosine(col("va"), col("vb")), 4).as("sim"))
      .orderBy(col("sim").desc, col("a").asc, col("b").asc)
      .limit(20)
  }

  /** q50 language-ID heuristic: stopword-ratio classifier (n-gram/stopword
    * profile approach). On synthetic data the signal is flat — the operator
    * contract is the deterministic ratio + argmax machinery. */
  def q50(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .select(col("doc_id"), col("lang"),
        expr("filter(split(trim(text), ' '), x -> x != '')").as("toks"))
      .select(col("doc_id"), col("lang"),
        size(col("toks")).cast("long").as("n_tok"),
        expr("size(filter(toks, x -> array_contains(array('the','a','of','to','and','in','is'), x)))")
          .as("n_stop"))
      .select(col("doc_id"), col("n_tok"),
        round(col("n_stop") / col("n_tok"), 4).as("stop_ratio"),
        col("lang"))
      .withColumn("pred_lang",
        when(col("stop_ratio") >= 0.08, lit("en")).otherwise(lit("unk")))
      .orderBy("doc_id")

  /** q51 text quality scoring: type-token ratio + word-length features
    * composed into a bounded score (length/stopword-style heuristics). */
  def q51(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .select(col("doc_id"),
        expr("filter(split(trim(text), ' '), x -> x != '')").as("toks"),
        length(regexp_replace(trim(col("text")), " ", "")).cast("long").as("n_char"))
      .select(col("doc_id"),
        size(col("toks")).cast("long").as("n_tok"),
        size(array_distinct(col("toks"))).cast("long").as("n_distinct"),
        col("n_char"))
      .withColumn("ttr", round(col("n_distinct") / col("n_tok"), 4))
      .withColumn("avg_wlen", round(col("n_char") / col("n_tok"), 4))
      .withColumn("quality",
        round(lit(0.5) * col("ttr")
          + lit(0.5) * least(col("avg_wlen") / 10.0, lit(1.0)), 6))
      .orderBy("doc_id")

  /** q52 token counting: whitespace tokens, regex word tokens, and a
    * BPE-style chars/4 estimate (the standard token-budget heuristic). */
  def q52(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .select(col("doc_id"),
        expr("size(filter(split(trim(text), ' '), x -> x != ''))").cast("long")
          .as("ws_tokens"),
        regexp_count(col("text"), lit("[a-z0-9]+")).cast("long").as("re_tokens"),
        length(regexp_replace(trim(col("text")), " ", "")).cast("long").as("n_char"))
      .withColumn("bpe_est", ceil(col("n_char") / 4.0).cast("long"))
      .orderBy("doc_id")
      .limit(200)

  /** q53 document fingerprinting: mod-16 sampled shingle hashes (hash
    * breaking / winnowing-style selection) — a compact content signature
    * whose overlap estimates containment. */
  def q53(s: SparkSession, d: String): DataFrame =
    // narrow form: the winnowing selection + counts are array ops over the
    // per-doc shingle set — no explode, no aggregation exchange
    shingleSets(documents(s, d).filter(col("doc_id") < 100))
      .select(col("doc_id"),
        size(col("sh")).cast("long").as("n_shingles"),
        expr("size(filter(sh, x -> substr(md5(x), 32, 1) = '0'))").cast("long")
          .as("n_sel"),
        expr("array_min(transform(filter(sh, x -> substr(md5(x), 32, 1) = '0'), x -> md5(x)))")
          .as("fp_min"))
      .orderBy("doc_id")

  /** q125 token-distribution entropy per language: Shannon entropy of
    * the unigram distribution, the corpus-diversity statistic a
    * curation pipeline tracks per slice (a collapsing H flags template
    * spam / dedup failures). Computed as ln(T) − Σ n·ln(n) / T so the
    * whole thing is ONE aggregation over (lang, token) counts followed
    * by a group-sized rollup — never a per-token p=n/T join back. */
  def q125(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .select(col("lang"),
        explode(expr("filter(split(trim(text), ' '), x -> x != '')"))
          .as("tok"))
      .groupBy(col("lang"), col("tok"))
      .agg(count(lit(1)).as("n"))
      .groupBy(col("lang"))
      .agg(sum(col("n")).as("n_tokens"),
        count(lit(1)).as("n_types"),
        sum(col("n") * log(col("n"))).as("nlogn"))
      .select(col("lang"), col("n_tokens"), col("n_types"),
        round(log(col("n_tokens")) - col("nlogn") / col("n_tokens"), 4)
          .as("entropy"))
      .orderBy("lang")

  /** q55 JSON→map functions (§2.3 map/JSON family: `from_json`,
    * `map_keys`, map element access): parse `events.props` into a typed
    * map, list its keys, extract the value — all codegen'd expressions,
    * no UDF JSON parsing. */
  def q55(s: SparkSession, d: String): DataFrame = {
    val mapType = org.apache.spark.sql.types.DataType.fromDDL("map<string,bigint>")
    events(s, d).select(
        col("event_id"),
        array_join(map_keys(
          from_json(col("props"), mapType)), ",").as("keys"),
        element_at(from_json(col("props"), mapType), "k").as("k_val"))
      .orderBy("event_id")
      .limit(200)
  }

  /** q58 corpus-level near-dedup, end-to-end: the two-stage
    * [[graft.operators.Dedup.minhashLsh]] operator (LSH candidates →
    * Jaccard verification ≥0.8 → smallest-id survivor) over doc_id<100 —
    * returns the surviving doc ids. The synthetic corpus contains
    * generator-planted near-dups, so this exercises real removals. */
  def q58(s: SparkSession, d: String): DataFrame =
    // cap-free: the contract oracle enumerates the full pair set, so the
    // contract query must too (the capped default is the LIBRARY's
    // scale posture, not the oracle semantics)
    graft.operators.Dedup.minhashLsh(
        documents(s, d).filter(col("doc_id") < 100).select("doc_id", "text"),
        "doc_id", "text", threshold = 0.8, maxBucketSize = Int.MaxValue)
      .select("doc_id")
      .orderBy("doc_id")

  /** q59 SimHash Hamming≤k corpus dedup, end-to-end:
    * [[graft.operators.Dedup.simhashNear]] over doc_id<200 — 4×4-bit
    * band buckets generate candidates (pigeonhole: Hamming≤2 ⇒ some
    * band matches exactly), exact `bit_count(xor)` verifies, smallest
    * id survives. The shared synthetic vocab clusters signatures, so
    * this exercises heavy removal. */
  def q59(s: SparkSession, d: String): DataFrame =
    graft.operators.Dedup.simhashNear(
        documents(s, d).filter(col("doc_id") < 200).select("doc_id", "text"),
        "doc_id", "text", k = 2, maxBucketSize = Int.MaxValue) // cap-free: see q58
      .select("doc_id")
      .orderBy("doc_id")

  /** q60 embedding corpus dedup, end-to-end:
    * [[graft.operators.Dedup.embeddingCosine]] over the full embeddings
    * table — multi-band sign-LSH (2 bands × 8 dims) generates
    * candidates, exact cosine verifies. The synthetic corpus has no
    * true near-dups, so the threshold sits at the observed similarity
    * tail (0.4) to exercise real removals through the full path.
    *
    * Banding derivation (round 17, cited to q236's measured curve):
    * the 2×8 choice is the NEAR-DUP-regime config — θ→1 pairs agree on
    * every sign and collide in every band, and 256-bucket bands keep
    * pruning at corpus scale. At this face's θ=0.4 tail the curve
    * shows NO banding prunes and recalls (0.95 recall needs 16×4 at
    * 65% of all-pairs), so gray-zone recall is delegated to q183's
    * SemDeDup by design — the banding here is for the dup regime a
    * production corpus actually has. */
  def q60(s: SparkSession, d: String): DataFrame =
    graft.operators.Dedup.embeddingCosine(
        embeddings(s, d).select("vec_id", "embedding"),
        "vec_id", "embedding", threshold = 0.4,
        maxBucketSize = Int.MaxValue) // cap-free: see q58
      .select("vec_id")
      .orderBy("vec_id")

  /** q71 document chunking: 20-token windows with 5-token overlap
    * (stride 15) — the context-window preparation step, one row per
    * chunk ([[graft.operators.TextPipeline.chunk]]). */
  def q71(s: SparkSession, d: String): DataFrame =
    graft.operators.TextPipeline.chunk(
        documents(s, d).filter(col("doc_id") < 100), "doc_id", "text",
        size = 20, overlap = 5)
      .orderBy("doc_id", "chunk_idx")

  /** q72 text normalization: lowercase, strip non-alphanumerics,
    * collapse whitespace — canonical pre-tokenization cleanup as a pure
    * codegen'd expression chain. */
  def q72(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .select(col("doc_id"),
        graft.operators.TextPipeline.normalize(col("text")).as("norm_text"))
      .orderBy("doc_id")
      .limit(300)

  /** q73 stopword removal preserving token order (the q50 stopword
    * profile, applied as a transform). */
  def q73(s: SparkSession, d: String): DataFrame =
    graft.operators.TextPipeline.removeStopwords(
        documents(s, d).filter(col("doc_id") < 300), "doc_id", "text",
        Seq("the", "a", "of", "to", "and", "in", "is"))
      .orderBy("doc_id")

  /** q74 corpus vocabulary by document frequency: the aggregation whose
    * exchange carries |vocab| partial counts (per-doc distinct happens
    * before the explode), not |token occurrences|. */
  def q74(s: SparkSession, d: String): DataFrame =
    graft.operators.TextPipeline.vocabulary(documents(s, d), "doc_id", "text")
      .orderBy(col("df").desc, col("token").asc)
      .limit(30)

  /** q75 deterministic corpus split: content-free md5-nibble hash of the
    * id → train/val/test ≈ 81/12.5/6%; reproducible across engines. */
  def q75(s: SparkSession, d: String): DataFrame =
    graft.operators.TextPipeline.hashSplit(documents(s, d), "doc_id")
      .groupBy(col("split"))
      .agg(count(lit(1)).as("n"),
        min(col("doc_id")).as("min_id"), max(col("doc_id")).as("max_id"))
      .orderBy("split")

  /** q145 Zipf rank-frequency fit: log-log regression of term frequency
    * against frequency rank over the top-200 vocabulary — the classic
    * corpus-health diagnostic (natural language sits near slope −1; a
    * much flatter slope flags templated/machine text, a much steeper
    * one a degenerate vocabulary). Occurrence counts aggregate to
    * |vocab|; ranking is [[graft.operators.Ranking.exactRowNumber]]
    * (range-partitioned — no single-task global window even at web-
    * scale vocabularies); the regression runs over 200 rows of
    * metadata. */
  def q145(s: SparkSession, d: String): DataFrame = {
    val occ = documents(s, d)
      .select(explode(expr(
        graft.operators.TextHashes.toks("text"))).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("c"))
    val ranked = graft.operators.Ranking.exactRowNumber(
      occ.withColumn("__negc", -col("c")), Seq("__negc", "token"),
      rankCol = "rank")
    ranked.filter(col("rank") <= 200)
      .crossJoin(broadcast(occ.agg(count(lit(1)).cast("long").as("n_types"))))
      .groupBy(col("n_types"))
      .agg(count(lit(1)).cast("long").as("n_top"),
        (round(expr("regr_slope(ln(c), ln(rank))"), 4) + lit(0.0))
          .as("zipf_slope"),
        (round(expr("regr_intercept(ln(c), ln(rank))"), 4) + lit(0.0))
          .as("zipf_icept"))
      .select(col("n_types"), col("n_top"), col("zipf_slope"),
        col("zipf_icept"))
  }

  /** q165 Heaps' law vocabulary-growth fit (round 11; q145's Zipf
    * companion): log-log regression of cumulative TYPES vs cumulative
    * TOKENS over ten doc_id-decile prefixes of the corpus — natural
    * text grows V ≈ K·N^β with β ≈ 0.4–0.6; β near 0 means the crawl
    * is re-reading the same material (vocabulary saturated — more
    * data is duplication), β near 1 means garble (every token novel).
    * With q144's novelty curve this is the "is more data worth it"
    * pair: q144 scores document-level novelty, this scores
    * vocabulary-level.
    *
    * One exchange does all the work: types-per-decile comes from the
    * q136 trick — `groupBy(token).agg(min(doc_id))` (vocabulary-sized,
    * map-side combined, the hot-token ceiling collapsed), bucketed by
    * the decile of the FIRST occurrence; token mass per decile is a
    * second group-sized aggregate; the cumulative curve and the
    * regression run over ten rows. */
  def q165(s: SparkSession, d: String): DataFrame = {
    val docs = documents(s, d).select(col("doc_id"),
      expr(graft.operators.TextHashes.toks("text")).as("toks"))
    val mx = docs.agg(max(col("doc_id")).as("mx"))
    val dec = (c: org.apache.spark.sql.Column,
               m: org.apache.spark.sql.Column) =>
      floor(c * lit(10) / (m + lit(1))).cast("long")
    val firsts = docs.select(col("doc_id"), explode(col("toks")).as("token"))
      .groupBy(col("token")).agg(min(col("doc_id")).as("first_doc"))
      .crossJoin(broadcast(mx))
      .groupBy(dec(col("first_doc"), col("mx")).as("decile"))
      .agg(count(lit(1)).as("new_types"))
    val mass = docs.select(col("doc_id"), size(col("toks")).cast("long")
        .as("nt"))
      .crossJoin(broadcast(mx))
      .groupBy(dec(col("doc_id"), col("mx")).as("decile"))
      .agg(sum(col("nt")).as("toks"))
    val wCum = Window.orderBy(col("decile"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val curve = mass.join(firsts, Seq("decile"), "left")
      .select(col("decile"), col("toks"),
        coalesce(col("new_types"), lit(0L)).as("new_types"))
      .select(col("decile"),
        sum(col("toks")).over(wCum).as("cum_tokens"),
        sum(col("new_types")).over(wCum).as("cum_types"))
      .filter(col("cum_tokens") > 0 && col("cum_types") > 0)
    curve.agg(count(lit(1)).as("n_points"),
      max(col("cum_tokens")).as("n_tokens"),
      max(col("cum_types")).as("n_types"),
      (round(expr("regr_slope(ln(cum_types), ln(cum_tokens))"), 4)
        + lit(0.0)).as("heaps_beta"),
      (round(expr("regr_intercept(ln(cum_types), ln(cum_tokens))"), 4)
        + lit(0.0)).as("heaps_logk"))
  }

  /** q146 split distribution-shift audit: per-language document counts
    * and within-split shares across q75's deterministic train/val/test
    * assignment — the eval-hygiene check that a hash split did not
    * concentrate a language into one side (a val set whose language mix
    * drifts from train measures the wrong thing). Shares are
    * floor-truncated exact rationals; two group-sized aggregates and
    * one split-keyed join, nothing row-scale crosses the wire. */
  def q146(s: SparkSession, d: String): DataFrame = {
    val sp = graft.operators.TextPipeline
      .hashSplit(documents(s, d), "doc_id")
      .select(col("lang"), col("split"))
    val cell = sp.groupBy(col("lang"), col("split"))
      .agg(count(lit(1)).as("n"))
    val tot = sp.groupBy(col("split")).agg(count(lit(1)).as("nt"))
    def nOf(sp0: String) = coalesce(
      sum(when(col("split") === sp0, col("n"))), lit(0L))
      .cast("long")
    def shareOf(sp0: String) = coalesce(
      max(when(col("split") === sp0, col("share"))), lit(0.0))
    cell.join(tot, "split")
      .withColumn("share",
        floor(col("n") * lit(10000.0) / col("nt")) / lit(10000.0))
      .groupBy(col("lang"))
      .agg(nOf("train").as("n_train"), nOf("val").as("n_val"),
        nOf("test").as("n_test"),
        shareOf("train").as("train_share"),
        shareOf("val").as("val_share"),
        shareOf("test").as("test_share"))
      .orderBy("lang")
  }

  /** q76 TF-IDF: term frequency × inverse document frequency over the
    * bounded corpus — the classic retrieval/feature weight, composed
    * from one occurrence aggregation and the q74 vocabulary join. IDF's
    * log and the final product stay in double with a fixed rounding
    * boundary (6 digits) for cross-engine parity. */
  def q76(s: SparkSession, d: String): DataFrame = {
    val docs = documents(s, d).filter(col("doc_id") < 100)
    val occ = docs.select(col("doc_id"),
        explode(expr(graft.operators.TextHashes.toks("text"))).as("token"))
    val tf = occ.groupBy(col("doc_id"), col("token"))
      .agg(count(lit(1)).as("tf"))
    val df_ = occ.select(col("doc_id"), col("token")).distinct()
      .groupBy(col("token")).agg(count(lit(1)).as("df"))
    // n_docs from the OCCURRENCES (docs that produced >=1 token), like
    // the oracle — a token-less doc must not shift every IDF
    val nDocs = occ.select(countDistinct(col("doc_id")).as("n_docs"))
    tf.join(df_, "token")
      .crossJoin(broadcast(nDocs))
      .select(col("doc_id"), col("token"), col("tf"), col("df"),
        round(col("tf") * log(col("n_docs") / col("df")), 6).as("tfidf"))
      .orderBy(col("tfidf").desc, col("doc_id").asc, col("token").asc)
      .limit(50)
  }

  /** q54 LSH-bucketed approximate nearest neighbor: axis-aligned
    * sign-LSH (4 dims → 16 buckets) prunes the candidate set; top-3
    * cosine within the probe's bucket. The scale path vs q43's exhaustive
    * scan: candidates partition by bucket, probes broadcast. */
  def q54(s: SparkSession, d: String): DataFrame = {
    val bucket = concat(Seq(1, 17, 33, 49).map(i =>
      when(element_at(col("embedding"), i).cast("double") >= 0, lit("1"))
        .otherwise(lit("0"))): _*)
    val e = embeddings(s, d)
      .select(col("vec_id"), Vectors.asDouble(col("embedding")).as("v"),
        bucket.as("bucket"))
    val probes = e.filter(col("vec_id") < 5)
      .select(col("vec_id").as("probe"), col("v").as("vp"),
        col("bucket").as("bp"))
    val cands = e.filter(col("vec_id") >= 5)
      .select(col("vec_id").as("cand"), col("v").as("vc"),
        col("bucket").as("bc"))
    val w = Window.partitionBy(col("probe"))
      .orderBy(col("sim").desc, col("cand").asc)
    cands.join(broadcast(probes), col("bc") === col("bp"))
      .select(col("probe"), col("bp").as("bucket"), col("cand"),
        round(Vectors.cosine(col("vp"), col("vc")), 4).as("sim"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 3)
      .orderBy("probe", "rank")
  }

  /** q153 BM25 retrieval (round 11): top-15 documents for a fixed
    * 4-term query under Okapi BM25 (k1=1.2, b=0.75, the Lucene-style
    * idf ln(1+(N−df+0.5)/(df+0.5)) that never goes negative) — the
    * ranked-retrieval primitive a curation stack uses to mine topical
    * subsets and build seed sets, one level up from q76's raw TF-IDF
    * weights.
    *
    * Scale shape: the term filter lands BEFORE the tf aggregation, so
    * tf/df exchanges are bounded by query-term occurrences, not the
    * token stream; df and the (N, avgdl) corpus stats are broadcast
    * 1-to-4-row frames; the only doc-sized work is the dl rollup and
    * the final per-doc score aggregate (≤ |terms| rows per doc in).
    * All constants are literal-identical in both faces (2.2, 0.25 —
    * never 1.2+1, whose rounding could differ from the literal);
    * score rounds at 4 and the ORDER uses the rounded value. */
  def q153(s: SparkSession, d: String): DataFrame = {
    val terms = Seq("spark", "merge", "vector", "window")
    val docs = documents(s, d).select(col("doc_id"),
      expr(graft.operators.TextHashes.toks("text")).as("toks"))
    val dl = docs.select(col("doc_id"), size(col("toks")).cast("long").as("dl"))
    val st = dl.agg(count(lit(1)).as("n"), avg(col("dl")).as("avgdl"))
    val tf = docs.select(col("doc_id"), explode(col("toks")).as("term"))
      .filter(col("term").isin(terms: _*))
      .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    val dfT = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    tf.join(broadcast(dfT), "term")
      .join(dl, "doc_id")
      .crossJoin(broadcast(st))
      .select(col("doc_id"),
        (log(lit(1.0) +
            (col("n") - col("df") + lit(0.5)) / (col("df") + lit(0.5))) *
          col("tf") * lit(2.2) /
          (col("tf") + lit(1.2) *
            (lit(0.25) + lit(0.75) * col("dl") / col("avgdl"))))
          .as("c"))
      .groupBy(col("doc_id")).agg(round(sum(col("c")), 4).as("score"))
      .orderBy(col("score").desc, col("doc_id").asc)
      .limit(15)
  }

  /** q159 LSH configuration audit (round 11): precision/recall of the
    * q46 MinHash-LSH candidate generator (8 hashes, 4 bands × 2 rows)
    * against exact shingle-set Jaccard ≥ 0.8 ground truth, on the
    * bounded doc_id < 120 probe corpus — the measurement a curator
    * runs BEFORE unleashing a banding config on 100 TB: recall says
    * what the dedup will miss, precision what the verify stage will
    * pay. One summary row: |truth|, |candidates|, |∩|, floor-truncated
    * precision/recall (q136's portability rule; 0 when the
    * denominator is empty).
    *
    * Plan: signatures are narrow array_min folds over the per-doc
    * shingle array (q46's shape); candidates join on (band index,
    * band key) — never all-pairs; ground truth reuses q47's
    * inverted-index intersection join. All three counts are 1-row
    * aggregates cross-joined broadcast. */
  def q159(s: SparkSession, d: String): DataFrame = {
    val base = documents(s, d).filter(col("doc_id") < 120)
      .select(col("doc_id"),
        expr(graft.operators.TextHashes.toks("text")).as("toks"))
      .filter(size(col("toks")) >= 3)
    // exact-Jaccard ground truth (q47's inverted-index shape)
    val cnt = base.select(col("doc_id"),
      expr(s"size(${graft.operators.TextHashes.shingleSet("toks")})").as("n"))
    val inv = base.select(col("doc_id"),
        explode(expr(
          graft.operators.TextHashes.shingleTransform("toks"))).as("s"))
      .distinct()
    val truth = inv.toDF("a", "s")
      .join(inv.toDF("b", "s2"), col("s") === col("s2") && col("a") < col("b"))
      .groupBy(col("a"), col("b")).agg(count(lit(1)).as("inter"))
      .join(broadcast(cnt.toDF("a", "na")), "a")
      .join(broadcast(cnt.toDF("b", "nb")), "b")
      .filter(col("inter") / (col("na") + col("nb") - col("inter")) >= 0.8)
      .select(col("a"), col("b"))
    // LSH candidates (q46's banding)
    val mj = (j: Int) =>
      array_min(expr(s"transform(sh, x -> md5(concat('$j:', x)))"))
    val bands = shingleSets(documents(s, d).filter(col("doc_id") < 120))
      .select(col("doc_id") +: (0 until 8).map(j => mj(j).as(s"m$j")): _*)
      .select(col("doc_id"), posexplode(array(
        concat(col("m0"), col("m1")), concat(col("m2"), col("m3")),
        concat(col("m4"), col("m5")), concat(col("m6"), col("m7"))))
        .as(Seq("bi", "bk")))
    val cand = bands.select(col("doc_id").as("a"), col("bi"), col("bk"))
      .join(bands.select(col("doc_id").as("b"), col("bi"), col("bk")),
        Seq("bi", "bk"))
      .filter(col("a") < col("b"))
      .select(col("a"), col("b")).distinct()
    val tp = cand.join(truth, Seq("a", "b"), "left_semi")
    truth.agg(count(lit(1)).as("n_truth"))
      .crossJoin(broadcast(cand.agg(count(lit(1)).as("n_cand"))))
      .crossJoin(broadcast(tp.agg(count(lit(1)).as("n_tp"))))
      .select(col("n_truth"), col("n_cand"), col("n_tp"),
        coalesce(floor(col("n_tp") * 10000.0 / nullif(col("n_cand"), lit(0)))
          / 10000.0, lit(0.0)).as("precision"),
        coalesce(floor(col("n_tp") * 10000.0 / nullif(col("n_truth"), lit(0)))
          / 10000.0, lit(0.0)).as("recall"))
  }

  /** q162 b-bit minhash fidelity audit (round 11): for every
    * shingle-sharing pair in the doc_id < 60 probe corpus, the exact
    * shingle Jaccard vs two signature estimates — the FULL 8-hash
    * agreement fraction, and the 1-BIT estimate ĵ = 2·A − 1 (A = the
    * fraction of agreeing lowest minhash bits; Li & König's b-bit
    * minwise hashing, where a random non-match still agrees with
    * probability 1/2) — plus both absolute errors. This is the
    * storage/recall dial for a signature store: 1 bit per hash is a
    * 128× smaller index than the full hex signatures, and this audit
    * prices the fidelity it costs (q111 plays the same role for
    * embedding quantization, q159 for banding).
    *
    * Estimates are exact binary rationals (counts over 8 — no
    * rounding shim needed); only the exact Jaccard and the errors
    * round at 4. Narrow per-doc signature arrays (array_min folds),
    * pair generation via q47's inverted-index join — never all-pairs. */
  def q162(s: SparkSession, d: String): DataFrame = {
    val base = documents(s, d).filter(col("doc_id") < 60)
      .select(col("doc_id"),
        expr(graft.operators.TextHashes.toks("text")).as("toks"))
      .filter(size(col("toks")) >= 3)
    val cnt = base.select(col("doc_id"),
      expr(s"size(${graft.operators.TextHashes.shingleSet("toks")})").as("n"))
    val inv = base.select(col("doc_id"),
        explode(expr(
          graft.operators.TextHashes.shingleTransform("toks"))).as("s"))
      .distinct()
    val exact = inv.toDF("a", "s")
      .join(inv.toDF("b", "s2"), col("s") === col("s2") && col("a") < col("b"))
      .groupBy(col("a"), col("b")).agg(count(lit(1)).as("inter"))
      .join(broadcast(cnt.toDF("a", "na")), "a")
      .join(broadcast(cnt.toDF("b", "nb")), "b")
      .select(col("a"), col("b"),
        (col("inter") / (col("na") + col("nb") - col("inter"))).as("j"))
    val mj = (j: Int) =>
      array_min(expr(s"transform(sh, x -> md5(concat('$j:', x)))"))
    // lowest bit of the signature's LAST nibble — the "b=1" sketch
    val sig = shingleSets(documents(s, d).filter(col("doc_id") < 60))
      .select(col("doc_id") +: (0 until 8).map(j => mj(j).as(s"m$j")): _*)
    def bit(name: String) = expr(
      s"pmod(instr('0123456789abcdef', substr($name, 32, 1)) - 1, 2)")
    val sa = sig.select(col("doc_id").as("a") +:
      (0 until 8).flatMap(j => Seq(col(s"m$j").as(s"ma$j"),
        bit(s"m$j").as(s"ba$j"))): _*)
    val sb = sig.select(col("doc_id").as("b") +:
      (0 until 8).flatMap(j => Seq(col(s"m$j").as(s"mb$j"),
        bit(s"m$j").as(s"bb$j"))): _*)
    val agreeFull = (0 until 8).map(j =>
      when(col(s"ma$j") === col(s"mb$j"), 1).otherwise(0)).reduce(_ + _)
    val agreeBit = (0 until 8).map(j =>
      when(col(s"ba$j") === col(s"bb$j"), 1).otherwise(0)).reduce(_ + _)
    exact.join(sa, "a").join(sb, "b")
      .select(col("a"), col("b"), round(col("j"), 4).as("j"),
        (agreeFull / lit(8.0)).as("est8"),
        ((agreeBit * 2 - 8) / lit(8.0)).as("est1"),
        round(abs(agreeFull / lit(8.0) - col("j")), 4).as("err8"),
        round(abs((agreeBit * 2 - 8) / lit(8.0) - col("j")), 4).as("err1"))
      .orderBy("a", "b")
  }

  /** q160 dataset card (round 11): the one-row corpus datasheet a
    * snapshot ships with — sizes (docs, token occurrences, langs,
    * sources), duplication (docs inside >1-member bag-of-words
    * fingerprint families, q137's fingerprint, as count + floor-rate)
    * and the dominant language with its share. Every component is a
    * 1-row (or |langs|-row) aggregate; the final row is broadcast
    * cross-joins of scalars — nothing wider than a partial-agg
    * exchange at any corpus size. */
  def q160(s: SparkSession, d: String): DataFrame = {
    val docs = documents(s, d)
    val t = docs.select(col("doc_id"), col("lang"), col("source"),
      expr(graft.operators.TextHashes.toks("text")).as("toks"))
    val sizes = t.agg(count(lit(1)).as("n_docs"),
      sum(size(col("toks"))).cast("long").as("n_tokens"),
      countDistinct(col("lang")).as("n_langs"),
      countDistinct(col("source")).as("n_sources"))
    val fp = t.select(md5(concat_ws(" ",
      array_sort(array_distinct(col("toks"))))).as("fp"))
    val dup = fp.groupBy(col("fp")).agg(count(lit(1)).as("n"))
      .filter(col("n") > 1)
      .agg(coalesce(sum(col("n")), lit(0L)).as("n_dup_docs"))
    val top = docs.groupBy(col("lang")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("lang").asc).limit(1)
      .select(col("lang").as("top_lang"), col("n").as("top_lang_docs"))
    sizes.crossJoin(broadcast(dup)).crossJoin(broadcast(top))
      .select(col("n_docs"), col("n_tokens"), col("n_langs"),
        col("n_sources"), col("n_dup_docs"),
        (floor(col("n_dup_docs") * 10000.0 / col("n_docs")) / 10000.0)
          .as("dup_rate"),
        col("top_lang"),
        (floor(col("top_lang_docs") * 10000.0 / col("n_docs")) / 10000.0)
          .as("top_lang_share"))
  }

  /** q161 out-of-vocabulary rate per language (round 11): the share of
    * each language's token OCCURRENCES outside the corpus's top-20
    * vocabulary (frequency desc, token asc — a total order) — the
    * tokenizer-fit diagnostic: a language whose OOV rate spikes will
    * fragment into byte-fallback tokens and pay a fertility penalty.
    * The vocabulary is a 20-row broadcast from a partial-aggregated
    * global count; membership is a broadcast LEFT ANTI join; the
    * rollup is |langs| rows. */
  def q161(s: SparkSession, d: String): DataFrame = {
    val occ = documents(s, d).select(col("lang"),
      explode(expr(graft.operators.TextHashes.toks("text"))).as("tok"))
    val vocab = occ.groupBy(col("tok")).agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("tok").asc).limit(20)
      .select(col("tok"))
    val oov = occ.join(broadcast(vocab), Seq("tok"), "left_anti")
      .groupBy(col("lang")).agg(count(lit(1)).as("n_oov"))
    occ.groupBy(col("lang")).agg(count(lit(1)).as("n_occ"))
      .join(oov, Seq("lang"), "left")
      .select(col("lang"), col("n_occ"),
        coalesce(col("n_oov"), lit(0L)).as("n_oov"))
      .withColumn("oov_rate",
        floor(col("n_oov") * 10000.0 / col("n_occ")) / 10000.0)
      .orderBy("lang")
  }

  /** q167 Jensen–Shannon divergence between the unigram distributions
    * of two corpus halves (even vs odd doc_id) — the standard
    * split-drift / mixture-balance audit for a training corpus: JS = 0
    * means the halves are token-distribution-identical, ln 2 means
    * disjoint; unlike KL it is symmetric and finite on disjoint
    * support, so it needs no smoothing shim.
    *
    * Plan: ONE token-explode pass aggregates BOTH halves' counts per
    * token (conditional sums — a single vocabulary-bounded exchange,
    * map-side combined), the two totals ride a 1-row broadcast, and
    * the JS sum is a second vocabulary-bounded partial aggregate.
    * p·ln(p/m) terms are zero-guarded per side; round(4) on the final
    * sum (irrational log terms — q126's rule; the per-term arithmetic
    * is the identical long→double division + ln on both engines). */
  def q167(s: SparkSession, d: String): DataFrame = {
    val occ = documents(s, d).select(
      (col("doc_id") % 2 === 0).as("is_a"),
      explode(expr(graft.operators.TextHashes.toks("text"))).as("tok"))
    val counts = occ.groupBy(col("tok"))
      .agg(sum(when(col("is_a"), 1L).otherwise(0L)).as("ca"),
        sum(when(!col("is_a"), 1L).otherwise(0L)).as("cb"))
    val tot = counts.agg(sum(col("ca")).as("na"), sum(col("cb")).as("nb"))
    counts.crossJoin(broadcast(tot))
      .select(col("na"), col("nb"),
        (col("ca") / col("na")).as("p"), (col("cb") / col("nb")).as("q"))
      .withColumn("m", (col("p") + col("q")) / 2)
      .select(col("na"), col("nb"),
        (when(col("p") > 0, col("p") * log(col("p") / col("m")))
          .otherwise(0.0) * 0.5 +
          when(col("q") > 0, col("q") * log(col("q") / col("m")))
            .otherwise(0.0) * 0.5).as("term"))
      .groupBy(col("na").as("n_tokens_even"), col("nb").as("n_tokens_odd"))
      .agg(count(lit(1)).as("vocab_union"),
        (round(sum(col("term")), 4) + lit(0.0)).as("js_divergence"))
  }

  /** q168 Good–Turing frequency-of-frequencies audit: N_r = how many
    * token types occur exactly r times, the unseen-mass estimate
    * p₀ = N₁/N (the probability the NEXT token drawn is a new type —
    * the classic coverage dial for "is this corpus big enough"), and
    * the Good–Turing adjusted count r* = (r+1)·N_{r+1}/N_r over the 5
    * SMALLEST occupied counts — the low tail wherever the corpus puts
    * it (a small-vocabulary corpus may have no singletons at all).
    *
    * Plan: token counts are one vocabulary-bounded aggregate; counts-
    * of-counts collapse that to ≤ max-count rows; everything after is
    * ≤ 5-row work against a 1-row broadcast. r* and p₀ are ratios of
    * exact integers — both faces use integer floor division scaled by
    * 10⁴ (q136's portability rule: a rational CAN land exactly on a
    * .xxxx5 boundary where round() diverges across engines). */
  def q168(s: SparkSession, d: String): DataFrame = {
    val cnt = documents(s, d)
      .select(explode(expr(graft.operators.TextHashes.toks("text")))
        .as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("c"))
    val fof = cnt.groupBy(col("c").as("r")).agg(count(lit(1)).as("n_r"))
    val tot = fof.agg(sum(col("r") * col("n_r")).as("n_total"),
      sum(when(col("r") === 1, col("n_r")).otherwise(0L)).as("n1"))
    val nxt = fof.select((col("r") - 1).as("r"), col("n_r").as("n_r_next"))
    // the 5 SMALLEST OCCUPIED counts, not a fixed r <= 5: a small-
    // vocabulary corpus (sf0.001: minimum token count 29) has no
    // singleton tail at all, and a fixed cutoff would return an empty
    // frame; the low tail is wherever the data puts it. r* is NULL
    // when r+1 is unoccupied (the estimate needs the neighbor).
    fof.orderBy(col("r").asc).limit(5)
      .join(nxt, Seq("r"), "left")
      .crossJoin(broadcast(tot))
      .select(col("r"), col("n_r"),
        (floor((col("r") + 1) * col("n_r_next") * 10000.0 / col("n_r"))
          / 10000.0).as("r_star"),
        (floor(col("n1") * 10000.0 / col("n_total")) / 10000.0)
          .as("p0_unseen"))
      .orderBy("r")
  }

  /** q171 token burstiness: for the corpus's top total-count tokens
    * (document frequency ≥ 10), the variance-to-mean ratio of the
    * per-document occurrence counts over the documents CONTAINING the
    * token — VMR ≈ 1 is Poisson scatter (function words), VMR ≫ 1 is
    * bursty topical clumping; the content-word detector behind
    * burstiness-aware quality filters and tf saturation tuning.
    *
    * Plan: per-(doc, token) counts partial-aggregate the exploded
    * stream; per-token (df, Σx, Σx²) is a vocabulary-bounded second
    * aggregate; the top-k is a 20-row sort. VMR = (df·Σx² − (Σx)²) /
    * (df·Σx) is exact integer arithmetic until one final scaled floor
    * division (q136's rule). */
  def q171(s: SparkSession, d: String): DataFrame = {
    val dt = documents(s, d)
      .select(col("doc_id"),
        explode(expr(graft.operators.TextHashes.toks("text"))).as("tok"))
      .groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("x"))
    dt.groupBy(col("tok"))
      .agg(count(lit(1)).as("df"), sum(col("x")).as("total"),
        sum(col("x") * col("x")).as("s2"))
      .filter(col("df") >= 10)
      .select(col("tok").as("token"), col("df"), col("total"),
        (floor((col("df") * col("s2") - col("total") * col("total")) *
          10000.0 / (col("df") * col("total"))) / 10000.0).as("vmr"))
      .orderBy(col("total").desc, col("token").asc)
      .limit(20)
  }

  /** q172 hapax-ratio document scoring: the fraction of each document's
    * token occurrences that are corpus hapax legomena (global count =
    * 1) — a high ratio flags OCR garble, random identifiers, or
    * boilerplate-free noise (every token unique corpus-wide), the
    * cheap lexical-novelty face of the quality gate (q119 scores form,
    * q152 scores content likelihood, this scores lexical grounding).
    *
    * Plan: per-(doc, token) counts feed BOTH the global count (re-
    * aggregate — vocabulary-bounded) and the per-doc rollup; hapax
    * membership is a LEFT SEMI join on the token (no broadcast hint —
    * q114's rule, AQE promotes a sane vocabulary). Ratio is one scaled
    * integer floor division; ties order by doc_id. */
  def q172(s: SparkSession, d: String): DataFrame = {
    val dt = documents(s, d)
      .select(col("doc_id"),
        explode(expr(graft.operators.TextHashes.toks("text"))).as("tok"))
      .groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("x"))
    val hapax = dt.groupBy(col("tok")).agg(sum(col("x")).as("g"))
      .filter(col("g") === 1).select(col("tok"))
    val perDoc = dt.groupBy(col("doc_id")).agg(sum(col("x")).as("n_toks"))
    val hap = dt.join(hapax, Seq("tok"), "left_semi")
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_hapax"))
    perDoc.join(hap, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_toks"),
        coalesce(col("n_hapax"), lit(0L)).as("n_hapax"))
      .withColumn("hapax_ratio",
        floor(col("n_hapax") * 10000.0 / col("n_toks")) / 10000.0)
      .orderBy(col("hapax_ratio").desc, col("doc_id").asc)
      .limit(15)
  }

  /** q173 MATTR — moving-average type-token ratio at window 25, the
    * length-invariant lexical-diversity score (raw TTR collapses as
    * documents grow; a fixed-window moving average is the standard
    * correction): per document, the mean over every 25-token sliding
    * window of (distinct types in window)/25.
    *
    * Plan: entirely NARROW — the sliding windows are a per-row
    * `transform(sequence(...), i -> size(array_distinct(slice(toks,
    * i, 25))))` higher-order-function chain inside whole-stage
    * codegen; no explode, no exchange at all until the final
    * order-by. Σ(distinct counts) and the window count are exact
    * integers; one scaled floor division ends it (q136's rule). Cost
    * is O(n_toks · 25) per document — constant per row, trivially
    * data-parallel at any scale. */
  def q173(s: SparkSession, d: String): DataFrame = {
    val w = 25
    // scan-parallelism floor (round 19, guide §2.5): the O(n_toks·25)
    // per-row window fold on an unsplittable tiny scan ran as ONE
    // task (×0.45 in the A/B); self-disabling at real volumes
    graft.Tables.withParallelismFloor(documents(s, d), "doc_id")
      .select(col("doc_id"),
        expr(graft.operators.TextHashes.toks("text")).as("toks"))
      .filter(size(col("toks")) >= w)
      .select(col("doc_id"), size(col("toks")).cast("long").as("n_toks"),
        expr(s"""aggregate(
            transform(sequence(1, size(toks) - ${w - 1}),
              i -> size(array_distinct(slice(toks, i, $w)))),
            0L, (a, x) -> a + x)""").as("dsum"),
        (size(col("toks")) - (w - 1)).cast("long").as("n_wins"))
      .select(col("doc_id"), col("n_toks"),
        (floor(col("dsum") * 10000.0 / (col("n_wins") * w)) / 10000.0)
          .as("mattr"))
      .orderBy("doc_id")
  }

  /** q178 vocabulary coverage curve: the fraction of total TOKEN MASS
    * covered by the top-k most frequent types at k ∈ {1,5,10,20,50} —
    * the Zipf-mass companion to q145's exponent fit and q161's OOV
    * rate: it answers "how big must the vocabulary be" directly (a
    * curve reaching 0.9 at k=50 means a 50-type vocab covers 90% of
    * occurrences).
    *
    * Plan: one vocabulary-bounded count aggregate; the top-50 is a
    * TakeOrdered; the cumulative window runs over ≤50 rows (metric-
    * frame-sized). Exact-integer cumulative shares → scaled floor
    * division (q136's rule). */
  def q178(s: SparkSession, d: String): DataFrame = {
    val cnt = documents(s, d)
      .select(explode(expr(graft.operators.TextHashes.toks("text")))
        .as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("c"))
    val tot = cnt.agg(sum(col("c")).as("n"))
    val wC = Window.orderBy(col("c").desc, col("tok").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cnt.orderBy(col("c").desc, col("tok").asc).limit(50)
      .withColumn("k", row_number().over(
        Window.orderBy(col("c").desc, col("tok").asc)))
      .withColumn("cum", sum(col("c")).over(wC))
      .filter(col("k").isin(1, 5, 10, 20, 50))
      .crossJoin(broadcast(tot))
      .select(col("k").cast("long").as("k"), col("cum").as("cum_tokens"),
        (floor(col("cum") * 10000.0 / col("n")) / 10000.0).as("coverage"))
      .orderBy("k")
  }

  /** q183 semantic dedup (SemDeDup, Abbas et al. 2023 arXiv:2303.09540
    * — the dedup modality sign-LSH can't reach: paraphrases share a
    * semantic REGION, not a sign pattern):
    * [[graft.operators.Dedup.semanticAudit]] over the full embeddings
    * table — cluster-assign (argmax cosine), min-id representative per
    * cluster, drop members with cosine ≥ 0.35 to their representative
    * (the corpus's observed similarity tail — 6 drops at sf0.001, 8 at
    * sf0.01, so the keep rule is exercised at every verify SF). One row
    * per vector: (vec_id, cid, rep_id, sim, kept). Centroids are the 8
    * pinned pivot vectors vec_id < 8 — q79's discipline: k-means
    * centroid bits are merge-order-sensitive at the ulp level, so the
    * ORACLE contract pins them; [[graft.operators.Ann.trainCentroids]]
    * supplies them at scale (SemanticDedupSpec proves that
    * composition). The keep rule compares the ROUNDED similarity so
    * float formatting can't flutter the gate; `+ 0.0` normalizes a
    * possible −0.0 at the exact-orthogonality boundary (§2.9 rule). */
  def q183(s: SparkSession, d: String): DataFrame = {
    val e = embeddings(s, d)
    val cents = e.filter(col("vec_id") < 8)
      .select(col("vec_id").as("cid"), col("embedding"))
    graft.operators.Dedup.semanticAudit(
        e.select("vec_id", "embedding"), "vec_id", "embedding",
        cents, "cid", "embedding")
      .withColumn("rsim", round(col("sim"), 4))
      .select(col("vec_id"), col("cid"), col("rep_id"),
        (col("rsim") + 0.0).as("sim"),
        (col("vec_id") === col("rep_id") || col("rsim") < 0.35).as("kept"))
      .orderBy("vec_id")
  }

  /** q184 intra-document repeated-span removal (C4's rule, Raffel et
    * al. 2020 arXiv:1910.10683 §2.2 — the TRANSFORM whose effect q109
    * only measures): segment each document into consecutive 2-token
    * spans (this corpus has no intrinsic line breaks; 2 tokens is the
    * span length at which the synthetic generator's repetitions
    * actually recur — 174 docs carry a duplicate at sf0.001), keep the
    * first occurrence of each distinct span
    * ([[graft.operators.TextPipeline.dedupSpanList]]), and emit the
    * cleaned document as an md5 digest plus the span census. Narrow
    * per-row HOF chain end-to-end (q173's discipline) — zero
    * exchanges before the contract sort. dup_frac is a ratio of exact
    * integers → the floor idiom (§2.9). The span count is clamped at 0
    * for zero-token documents: Spark's `sequence(1, 0)` runs DESCENDING
    * ([1, 0] — two fabricated empty spans) while the oracle's
    * `generate_series(1, 0)` is empty, the exact divergence
    * [[graft.operators.TextPipeline.dsirLogWeights]] guards with
    * `greatest(..., 0)` — here the empty case short-circuits to an
    * empty span list so both faces agree (latent on this corpus, which
    * has no empty-text docs, but the guard keeps the faces aligned). */
  def q184(s: SparkSession, d: String): DataFrame =
    // scan-parallelism floor (round 19, guide §2.5): the tokenize +
    // span-dedup chain ran as TWO ~0.45 s single tasks at sf0.1 (the
    // contract sort's range sampling re-evaluates the narrow chain);
    // self-disabling at real volumes
    graft.Tables.withParallelismFloor(documents(s, d), "doc_id")
      // span build as ONE greedy regex pass (round 19 — spanFrame's
      // ×8.8 rewrite at span width 2): `[^ ]+( [^ ]+){0,1}` over the
      // space-collapsed trimmed text consumes exactly 2 single-space
      // tokens per non-overlapping match (final match = remainder) —
      // byte-identical to array_join(slice(toks, (g-1)*2+1, 2), ' ')
      .select(col("doc_id"), expr(
        """regexp_extract_all(
          |  regexp_replace(trim(text), ' +', ' '),
          |  '[^ ]+( [^ ]+){0,1}', 0)""".stripMargin).as("ls"))
      .withColumn("kls",
        graft.operators.TextPipeline.dedupSpanList(col("ls")))
      .select(col("doc_id"),
        size(col("ls")).cast("long").as("n_spans"),
        size(col("kls")).cast("long").as("n_kept"),
        (floor((size(col("ls")) - size(col("kls"))) * 10000.0 /
          size(col("ls"))) / 10000.0).as("dup_frac"),
        md5(array_join(col("kls"), "\n")).as("clean_md5"))
      .orderBy("doc_id")

  /** q185 distributed BPE vocabulary training
    * ([[graft.operators.TextPipeline.bpeTrain]], Sennrich et al. 2016
    * arXiv:1508.07909): 8 merge rounds over the corpus vocabulary —
    * the corpus is aggregated ONCE into word counts; every round is a
    * vocabulary-bounded pair-count aggregate, a 1-row argmax
    * (ties by pair lexicographic), and a broadcast merge application.
    * Output: the merge table (step, lhs, rhs, freq) — the DETERMINISTIC
    * artifact a tokenizer replays; the oracle replays the identical 8
    * rounds as unrolled CTE blocks. */
  def q185(s: SparkSession, d: String): DataFrame =
    graft.operators.TextPipeline.bpeTrain(
      documents(s, d), "doc_id", "text", merges = 8)

  /** q186 BPE encode with the learned merges
    * ([[graft.operators.TextPipeline.bpeSegment]]): train the q185
    * 8-round merge table, then segment every distinct `'_'`-free token
    * of the corpus with it — the round-trip face of the tokenizer story
    * (symbols always concatenate back to the token;
    * TextPipelineSpec pins the property, this query pins the exact
    * segmentation against the oracle's replayed replace chain). The
    * merge table is K=8 rows of driver metadata, so the application is
    * a narrow per-row replace chain over the |vocab|-row distinct-token
    * frame — the corpus-sized work is q185's one word-count
    * aggregate. */
  def q186(s: SparkSession, d: String): DataFrame = {
    val docs = documents(s, d)
    val table = graft.operators.TextPipeline.bpeTrain(
      docs, "doc_id", "text", merges = 8)
    graft.operators.TextPipeline.bpeSegment(docs, "doc_id", "text", table)
      .select(col("token"),
        size(col("symbols")).cast("long").as("n_symbols"),
        array_join(col("symbols"), " ").as("segmented"))
      .orderBy("token")
  }

  /** q187 DSIR importance weights
    * ([[graft.operators.TextPipeline.dsirLogWeights]], Xie et al. 2023
    * arXiv:2302.03169): hashed-n-gram log importance of every document
    * against the English subcorpus as the target distribution — the
    * quality-targeted selection signal. `logw` is a sum of ln terms →
    * the §2.9 round-4 rule, and it is CANCELLABLE (target-like and
    * pool-like features offset), so both faces ride `+ 0.0` to
    * normalize a possible −0.0 at the rounding boundary. */
  def q187(s: SparkSession, d: String): DataFrame =
    graft.operators.TextPipeline.dsirLogWeights(
        documents(s, d), "doc_id", "text", isTarget = col("lang") === "en")
      .select(col("doc_id"), col("n_feats"),
        (round(col("logw"), 4) + 0.0).as("logw"))
      .orderBy("doc_id")

  /** q190 cross-source vocabulary overlap (round 14): exact Jaccard of
    * the distinct-token vocabularies of every source pair — the
    * mirror-site / shared-scraper detector that runs BEFORE expensive
    * per-document dedup (two sources with Jaccard ≈ 1 are the same
    * crawl twice; a source pair at ≈ 0 across the same language is a
    * domain split worth preserving in the mixture).
    *
    * Scale shape: the corpus collapses ONCE into distinct
    * (source, token) pairs — a vocabulary×|sources|-bounded hash
    * aggregate fed by a narrow per-doc `array_distinct` explode. The
    * intersection is a token-keyed self-join of that frame (UNHINTED —
    * q114's rule: a natural-language vocabulary broadcasts under AQE,
    * an id-domain one must be allowed to shuffle), partial-aggregated
    * to |sources|² cells; per-source sizes re-aggregate the same frame.
    * All-pair completeness (zero-overlap pairs included) comes from the
    * |sources|-row size table joined to itself, never from the corpus.
    * Jaccard is a ratio of exact integers → the floor idiom, identical
    * double ops both faces. */
  def q190(s: SparkSession, d: String): DataFrame = {
    val vs = documents(s, d)
      .select(col("source"),
        expr(s"array_distinct(${graft.operators.TextHashes.toks("text")})")
          .as("toks"))
      .select(col("source"), explode(col("toks")).as("tok"))
      .distinct()
    val sizes = vs.groupBy(col("source")).agg(count(lit(1)).as("nv"))
    val inter = vs.select(col("source").as("src_a"), col("tok"))
      .join(vs.select(col("source").as("src_b"), col("tok").as("tok_b")),
        col("tok") === col("tok_b") && col("src_a") < col("src_b"))
      .groupBy(col("src_a"), col("src_b"))
      .agg(count(lit(1)).as("n_shared"))
    sizes.select(col("source").as("src_a"), col("nv").as("nv_a"))
      .join(sizes.select(col("source").as("src_b"), col("nv").as("nv_b")),
        col("src_a") < col("src_b"))
      .join(inter, Seq("src_a", "src_b"), "left")
      .na.fill(0L, Seq("n_shared"))
      .select(col("src_a"), col("src_b"), col("nv_a"), col("nv_b"),
        col("n_shared"),
        (floor(col("n_shared") * 10000.0 /
          (col("nv_a") + col("nv_b") - col("n_shared"))) / 10000.0)
          .as("jaccard"))
      .orderBy("src_a", "src_b")
  }

  /** q193 tokenizer fertility per language (round 14): corpus-weighted
    * symbols-per-token and chars-per-symbol under q185's learned BPE
    * merges — THE acceptance metric for a tokenizer (a language whose
    * fertility stays near its character count is under-served by the
    * merge budget and will burn sequence length; the standard
    * cross-lingual tokenizer-equity audit). Completes the tokenizer
    * story: q185 trains, q186 encodes, q193 grades the encoding.
    *
    * Scale shape: q185's vocabulary-bounded training + q186's
    * vocab-frame segmentation, plus ONE per-(lang, token) count
    * aggregate (vocabulary×|langs|-bounded, partial-agg'd — token
    * volume appears only in the narrow explode) joined to the
    * segmentation on the token key (vocab-sized both sides, unhinted —
    * q114's rule). Fertility ratios are exact-integer ratios → the
    * floor idiom, identical double ops both faces. */
  def q193(s: SparkSession, d: String): DataFrame = {
    val docs = documents(s, d)
    val table = graft.operators.TextPipeline.bpeTrain(
      docs, "doc_id", "text", merges = 8)
    val seg = graft.operators.TextPipeline
      .bpeSegment(docs, "doc_id", "text", table)
      .select(col("token"),
        size(col("symbols")).cast("long").as("nsym"),
        length(col("token")).cast("long").as("nchr"))
    val tf = docs
      .select(col("lang"),
        explode(expr(graft.operators.TextHashes.toks("text"))).as("token"))
      .filter(!col("token").contains("_"))
      .groupBy(col("lang"), col("token")).agg(count(lit(1)).as("f"))
    tf.join(seg, "token")
      .groupBy(col("lang"))
      .agg(sum(col("f")).as("n_tokens"),
        sum(col("f") * col("nsym")).as("tot_sym"),
        sum(col("f") * col("nchr")).as("tot_chr"))
      .select(col("lang"), col("n_tokens"),
        (floor(col("tot_sym") * 10000.0 / col("n_tokens")) / 10000.0)
          .as("fertility"),
        (floor(col("tot_chr") * 10000.0 / col("tot_sym")) / 10000.0)
          .as("chars_per_symbol"))
      .orderBy("lang")
  }

  /** q198 BPE encode against the PERSISTED merge store (round 15, r14
    * verdict #2): q185's merge table is trained ONCE and landed as a
    * catalog table ([[graft.sources.Lake.writeBpeTable]] under
    * [[graft.sources.Lake.ensureTable]]'s pay-once memo — q103's
    * `writeSigIndex` discipline), and the segmentation reads the STORE
    * ([[graft.sources.Lake.readBpeTable]]), never the trainer — the
    * train-once/serve-many shape a production tokenizer runs (q101's
    * persisted-vocab discipline applied to subwords). The oracle is
    * q186's verbatim (q97's shared-oracle rule): the hash gate proves
    * the round-tripped store reproduces the inline-trained
    * segmentation bit-for-bit; BpeStoreSpec adds the fresh-JVM
    * visibility proof (CatalogSpec's pattern). */
  def q198(s: SparkSession, d: String): DataFrame = {
    val docs = documents(s, d)
    val tbl = s"graft_bpe_merges${d.replaceAll("[^A-Za-z0-9]", "_")}"
    graft.sources.Lake.ensureTable(s, tbl) {
      graft.sources.Lake.writeBpeTable(
        graft.operators.TextPipeline.bpeTrain(
          docs, "doc_id", "text", merges = 8), tbl)
    }
    graft.operators.TextPipeline.bpeSegment(docs, "doc_id", "text",
        graft.sources.Lake.readBpeTable(s, tbl))
      .select(col("token"),
        size(col("symbols")).cast("long").as("n_symbols"),
        array_join(col("symbols"), " ").as("segmented"))
      .orderBy("token")
  }

  /** q199 per-document subword ID sequences — the TRAINER artifact
    * (round 15, r14 verdict #3): merges trained on the doc_id < 50
    * half (q101's split), every doc of the 50–99 half encoded to the
    * id sequence a model consumes ([[graft.operators.TextPipeline
    * .bpeEncode]] over [[graft.operators.TextPipeline.bpeVocab]]'s
    * alphabet+step id scheme). Because ids derive from the TRAINING
    * half and the merge table alone, they are stable under growth by
    * disjoint documents — QueriesSpec pins the membership-stability
    * property (q101's discipline); symbols outside the training
    * alphabet encode as 0 (OOV). Output mirrors q96's face: (doc_id,
    * n_ids, ids16). */
  def q199(s: SparkSession, d: String): DataFrame = {
    val docs = documents(s, d)
    val train = docs.filter(col("doc_id") < 50)
    val table = graft.operators.TextPipeline.bpeTrain(
      train, "doc_id", "text", merges = 8)
    val vocab = graft.operators.TextPipeline.bpeVocab(
      train, "doc_id", "text", table)
    graft.operators.TextPipeline.bpeEncode(
        docs.filter(col("doc_id").between(50, 99)), "doc_id", "text",
        table, vocab)
      .select(col("doc_id"),
        size(col("ids")).cast("long").as("n_ids"),
        expr("array_join(transform(slice(ids, 1, 16), x -> cast(x as string)), ',')")
          .as("ids16"))
      .orderBy("doc_id")
  }

  /** q200 DSIR step 2 — deterministic importance RESAMPLING (round 15,
    * r14 verdict #4; Xie et al. 2023 arXiv:2302.03169 §3: sample
    * ∝ exp(logw) without replacement). The Gumbel-top-k identity makes
    * the draw a pure ranking: key = logw + Gumbel(0,1), and the top-k
    * keys ARE a weighted sample without replacement — with the Gumbel
    * built from a replayable salted-md5 uniform (q155's A-ES
    * discipline: first 8 nibbles + 0.5 over 2³², salt `dsel:`), the
    * kept set is identical across engines and reruns. logw is rounded
    * to 4 BEFORE the key sum on both faces (the §2.9 cancellable-sum
    * rule — the Gumbel term is bit-deterministic, so the rank order
    * is too); the budget is data-relative (top 20%, ceil — QueriesSpec's
    * fixed-cutoff rule), with N from the parquet count (metadata-only).
    * Ranking rides [[graft.operators.Ranking.runningAgg]]'s
    * range-partitioned pass over the total order (neg_key, doc_id) —
    * never a single-partition window, never a driver-side top-k
    * collect: at 100 TB the selection is a filter on a distributed
    * rank column. */
  def q200(s: SparkSession, d: String): DataFrame =
    dsirSelection(s, d).orderBy("doc_id")

  /** q200's body without the contract sort — factored round 16 so the
    * q210 composition audit consumes the SAME selection (one
    * definition of "kept"). */
  private def dsirSelection(s: SparkSession, d: String): DataFrame = {
    val docs = documents(s, d)
    val n = math.ceil(0.2 * docs.count()).toLong
    def nib(i: Int) =
      s"(instr('0123456789abcdef', substr(md5(concat('dsel:', cast(doc_id as string))),$i,1)) - 1)"
    val v32 = (1 to 8).map(i => s"${nib(i)} * ${1L << (4 * (8 - i))}L")
      .mkString(" + ")
    val keyed = graft.operators.TextPipeline.dsirLogWeights(
        docs, "doc_id", "text", isTarget = col("lang") === "en")
      .select(col("doc_id"), (round(col("logw"), 4) + 0.0).as("logw"))
      .withColumn("key", col("logw") +
        expr(s"-ln(-ln((($v32) + 0.5D) / 4294967296.0D))"))
      .withColumn("neg_key", -col("key"))
      .withColumn("one", lit(1L))
    graft.operators.Ranking.runningAgg(keyed,
        orderCols = Seq("neg_key", "doc_id"), valueCol = "one",
        fn = "sum", outCol = "cum_before", inclusive = false)
      .select(col("doc_id"), col("logw"),
        (round(col("key"), 4) + 0.0).as("key"),
        (coalesce(col("cum_before"), lit(0L)) + 1L).as("sel_rank"),
        (coalesce(col("cum_before"), lit(0L)) + 1L <= n).as("kept"))
  }

  /** q201 dedup-modality agreement audit (r14 verdict stretch #8):
    * sign-LSH near-dup pairs (q60's generator,
    * [[graft.operators.Dedup.embeddingCosinePairs]]) vs SemDeDup
    * member↔rep pairs (q183's [[graft.operators.Dedup.semanticAudit]]
    * with the pinned vec_id < 8 centroids) vs the BRUTE-FORCE cosine
    * truth, all at θ = 0.3 over the vec_id < 300 probe universe
    * (q110's discipline: the contract face is bounded; the full-scale
    * behavior of each modality is the probes' job). One summary row:
    * per-modality predicted/true-positive counts, precision and recall
    * (floor idiom over exact integers; `nullif` guards an empty
    * prediction set), and the pair-set overlap matrix (both / only-LSH
    * / only-semantic) — the measurement behind "which dedup modality do
    * I trust where": both generators verify with exact cosine so
    * precision is 1 by construction here, while recall quantifies what
    * each candidate scheme can even SEE (2×8-bit sign bands collide on
    * ~5% of θ≈0.3 pairs; SemDeDup only ever scores member↔rep edges).
    *
    * Plan shape: the three pair sets are built once each and meet in
    * TWO tagged full-outer joins feeding ONE global aggregate — no
    * scalar-agg subtrees re-running upstream frames (the r14 AQE
    * lesson), no checkpoint needed at probe scale. The truth self-join
    * is a broadcast NLJ over the 300-row bounded universe. */
  def q201(s: SparkSession, d: String): DataFrame = {
    val th = 0.3
    // the §2.9 floor idiom in DOUBLE arithmetic (a SQL-parsed `10000.0`
    // literal is DECIMAL and would change the result type); an empty
    // prediction set yields NULL, the oracle's nullif
    def ratio(tp: Column, denom: Column): Column =
      floor(tp * lit(10000.0) /
        when(denom === 0, lit(null)).otherwise(denom)) / 10000.0
    val u = embeddings(s, d).filter(col("vec_id") < 300)
      .select("vec_id", "embedding")
    val uv = u.select(col("vec_id"),
      graft.functions.Vectors.asDouble(col("embedding")).as("v"))
    val truth = uv.toDF("a", "__va")
      .join(broadcast(uv.toDF("b", "__vb")), col("a") < col("b"))
      .filter(graft.functions.Vectors.cosine(col("__va"), col("__vb")) >= th)
      .select(col("a"), col("b"), lit(1L).as("t"))
    val lsh = graft.operators.Dedup.embeddingCosinePairs(
        u, "vec_id", "embedding", th, maxBucketSize = Int.MaxValue)
      .select(col("a"), col("b"), lit(1L).as("l"))
    val cents = embeddings(s, d).filter(col("vec_id") < 8)
      .select(col("vec_id").as("cid"), col("embedding"))
    val sem = graft.operators.Dedup.semanticAudit(
        u, "vec_id", "embedding", cents, "cid", "embedding")
      .filter(col("vec_id") =!= col("rep_id") && col("sim") >= th)
      .select(least(col("vec_id"), col("rep_id")).as("a"),
        greatest(col("vec_id"), col("rep_id")).as("b"), lit(1L).as("m"))
    truth.join(lsh, Seq("a", "b"), "full_outer")
      .join(sem, Seq("a", "b"), "full_outer")
      .select(coalesce(col("t"), lit(0L)).as("t"),
        coalesce(col("l"), lit(0L)).as("l"),
        coalesce(col("m"), lit(0L)).as("m"))
      .agg(sum(col("t")).as("n_truth"),
        sum(col("l")).as("lsh_pred"),
        sum(col("t") * col("l")).as("lsh_tp"),
        sum(col("m")).as("sem_pred"),
        sum(col("t") * col("m")).as("sem_tp"),
        sum(col("l") * col("m")).as("n_both"))
      .select(col("n_truth"), col("lsh_pred"), col("lsh_tp"),
        ratio(col("lsh_tp"), col("lsh_pred")).as("lsh_prec"),
        ratio(col("lsh_tp"), col("n_truth")).as("lsh_rec"),
        col("sem_pred"), col("sem_tp"),
        ratio(col("sem_tp"), col("sem_pred")).as("sem_prec"),
        ratio(col("sem_tp"), col("n_truth")).as("sem_rec"),
        col("n_both"),
        (col("lsh_pred") - col("n_both")).as("lsh_only"),
        (col("sem_pred") - col("n_both")).as("sem_only"))
  }

  /** q202 CROSS-document boilerplate span removal (round 15) — the
    * corpus-global companion to q184's intra-document rule and the
    * second half of C4's line filter (Raffel et al. 2020
    * arXiv:1910.10683 §2.2: "we discarded any line that occurred more
    * than [a threshold] in the dataset"; CCNet dedups paragraphs
    * globally the same way). Segment every document into consecutive
    * 4-token spans, compute each span's document frequency over
    * DISTINCT (doc, span), and flag spans carried by ≥ 1% of the corpus
    * (the data-relative form of C4's absolute cutoff — exact-integer
    * cross-multiplication `df * 100 >= n_docs`, no double ever gates).
    * Per doc: span census, boilerplate fraction (floor idiom), and an
    * order-faithful digest of the CLEANED document — kept spans enter a
    * commutative SUM of 32-bit md5-nibble hashes of `pos:span` (q200's
    * nibble idiom; position baked into each term makes the unordered
    * sum order-faithful, and a plain SUM is partial-aggregable where an
    * ordered string_agg would not be engine-portable).
    *
    * Scale shape: one corpus tokenize feeding posexplode; the df
    * aggregate is |distinct spans|-bounded; the boilerplate gate joins
    * a tiny df-filtered frame back on the span key (unhinted — q114's
    * rule); the per-doc fold is one partial-aggregable pass. The
    * n_docs total is a column-pruned second scan (q183's rescan-narrow
    * trade — pinning the corpus to avoid a count scan would cost
    * more). */
  def q202(s: SparkSession, d: String): DataFrame = {
    // span frame / gate / fold all ride TextPipeline's shared helpers
    // (round 16 — factored for the q211 store-backed face, which must
    // be the SAME fold over a committed gate; bodies unchanged).
    // ONE span frame feeds gate AND fold (round 19, guide §1.2): the
    // tokenize+span chain used to run twice — once for the tagged
    // fold, once inside boilerplateGate; the lazy pin shares it (the
    // gate's distinct is the materializing first consumer). Gate rule,
    // fold, and the column-pruned n_docs scan are unchanged — oracle
    // q202-verbatim.
    val docs = documents(s, d)
    val spans = graft.operators.TextPipeline.spanFrame(
      docs, "doc_id", "text").localCheckpoint(false)
    val bp = graft.operators.TextPipeline.gateOfSpans(
        spans, docs, "doc_id")
      .select(col("span"), lit(1L).as("isbp"))
    graft.operators.TextPipeline.boilerplateFold(
        spans.join(bp, Seq("span"), "left_outer")
          .withColumn("isbp", coalesce(col("isbp"), lit(0L))),
        "doc_id")
      .orderBy("doc_id")
  }

  /** q203 winnowing document fingerprints (round 15; Schleimer,
    * Wilkerson & Aiken 2003, "Winnowing: Local Algorithms for Document
    * Fingerprinting", SIGMOD — the MOSS algorithm): hash every 3-token
    * k-gram (32-bit md5-nibble hash, q200's idiom), slide a w = 4
    * window over the hash sequence, keep each window's MINIMUM hash;
    * the DISTINCT selected hashes are the document's fingerprint set.
    * Winnowing guarantees any shared run of ≥ k + w − 1 tokens shares
    * at least one fingerprint (the local-selection property q53's
    * single rolling hash lacks) while storing only ~2/(w+1) of the
    * k-gram hashes — the standard plagiarism/copy detector unit. Docs
    * shorter than k + w − 1 tokens fall back to one window over all
    * hashes (the paper's boundary case; the corpus minimum of 10
    * tokens keeps every doc ≥ 1 window regardless).
    *
    * Per doc: k-gram count, fingerprint count, selection density
    * (floor idiom), and the minimum fingerprint as a spot value. Pure
    * narrow per-row HOF chain — zero exchanges before the contract
    * sort (q173's discipline); the pair-level application (docs
    * sharing a fingerprint) is exactly q151's inverted-index shape and
    * stays with that family. */
  def q203(s: SparkSession, d: String): DataFrame =
    // scan-parallelism floor (round 19, guide §2.5): the md5-per-k-gram
    // narrow chain on an unsplittable tiny scan ran as ONE task (×0.35
    // in the A/B); self-disabling at real volumes
    graft.Tables.withParallelismFloor(documents(s, d), "doc_id")
      .select(col("doc_id"),
        expr(graft.operators.TextHashes.toks("text")).as("toks"))
      .withColumn("hs",
        expr(graft.operators.TextHashes.winnowKgramHashes("toks")))
      .withColumn("fps",
        expr(graft.operators.TextHashes.winnowSelect("hs")))
      .select(col("doc_id"),
        size(col("hs")).cast("long").as("n_kgrams"),
        size(col("fps")).cast("long").as("n_fp"),
        (floor(size(col("fps")) * lit(10000.0) /
          when(size(col("hs")) === 0, lit(null))
            .otherwise(size(col("hs")))) / 10000.0).as("density"),
        array_min(col("fps")).as("fp_min"))
      .orderBy("doc_id")

  /** q204 hard-negative mining for contrastive training (round 15):
    * for each probe vector, the top-3 corpus vectors whose cosine
    * falls in the HARD-NEGATIVE band [0.2, 0.6) — similar enough to be
    * informative, below the near-dup region (the standard in-batch /
    * mined-negatives recipe for embedding-model training; cf. the
    * band-gating in dense-retrieval hard-negative pipelines). Probes
    * are the bounded vec_id < 20 batch (q79/q115's probe-batch
    * contract); ties break (sim DESC, candidate id).
    *
    * Scale shape: the PROBE side broadcasts, so the corpus-sized
    * candidate scan never exchanges — each candidate row computes
    * |probes| cosines map-side and the band filter drops ~95% before
    * the per-probe top-3 window (rank ≤ 3 ⇒ WindowGroupLimit prunes
    * map-side, q39's discipline; the window partitions on the bounded
    * probe key, never a corpus-sized domain). */
  def q204(s: SparkSession, d: String): DataFrame = {
    val e = embeddings(s, d).select(col("vec_id"),
      graft.functions.Vectors.asDouble(col("embedding")).as("v"))
    val pr = e.filter(col("vec_id") < 20).toDF("p", "__vp")
    val ca = e.filter(col("vec_id") >= 20).toDF("c", "__vc")
    val sim = graft.functions.Vectors.cosine(col("__vp"), col("__vc"))
    val banded = ca.join(broadcast(pr), sim >= 0.2 && sim < 0.6)
      .select(col("p"), col("c"), sim.as("s"))
    val w = Window.partitionBy("p").orderBy(col("s").desc, col("c"))
    banded.withColumn("n_rank", row_number().over(w))
      .filter(col("n_rank") <= 3)
      .select(col("p").as("probe"), col("n_rank").cast("long").as("n_rank"),
        col("c").as("neg_id"), (round(col("s"), 4) + 0.0).as("sim"))
      .orderBy("probe", "n_rank")
  }

  /** q207 per-source character-class census (round 15): corpus bytes
    * decomposed into letter / digit / space / other fractions — the
    * character-level health audit behind Gopher-style symbol-ratio
    * rules and mojibake triage (a source whose `other_frac` spikes is
    * carrying markup, encoding damage, or binary spill; q51's word
    * stats can't see it). Every count is an EXACT integer (length
    * minus class-stripped length), so the fractions ride the floor
    * idiom with no float anywhere before the final division — unlike
    * the moment family there is nothing to round. One partial-
    * aggregable pass, |sources|-row frame. */
  def q207(s: SparkSession, d: String): DataFrame = {
    def stripped(cls: String) =
      length(regexp_replace(col("text"), cls, ""))
    documents(s, d)
      .select(col("source"),
        length(col("text")).cast("long").as("nc"),
        (length(col("text")) - stripped("[A-Za-z]")).cast("long").as("let"),
        (length(col("text")) - stripped("[0-9]")).cast("long").as("dig"),
        (length(col("text")) - stripped(" ")).cast("long").as("spc"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("nc")).as("n_chars"),
        sum(col("let")).as("letters"), sum(col("dig")).as("digits"),
        sum(col("spc")).as("spaces"))
      .select(col("source"), col("n_docs"), col("n_chars"),
        (floor(col("letters") * lit(10000.0) / col("n_chars")) / 10000.0)
          .as("letter_frac"),
        (floor(col("digits") * lit(10000.0) / col("n_chars")) / 10000.0)
          .as("digit_frac"),
        (floor(col("spaces") * lit(10000.0) / col("n_chars")) / 10000.0)
          .as("space_frac"),
        (floor((col("n_chars") - col("letters") - col("digits") -
          col("spaces")) * lit(10000.0) / col("n_chars")) / 10000.0)
          .as("other_frac"))
      .orderBy("source")
  }

  /** q208 per-document subword ids from the PERSISTED store (round 16,
    * r15 verdict #2): q199 re-trains the merge table AND derives the
    * vocab inline every run; production trains once and serves ids
    * from the committed artifact. The store is
    * [[graft.sources.Lake.writeBpeStore]] — merges + symbol-id vocab
    * landed as ONE versioned table with a single view-swap commit
    * point, so an encoder can never read a torn new-merges/old-vocab
    * pair — built pay-once under [[graft.sources.Lake.ensureTable]]'s
    * memo (q198's discipline extended to the id face). Oracle = q199
    * VERBATIM (q97/q198's shared-oracle rule): the hash gate proves
    * the round-tripped store reproduces the inline-trained id
    * sequences bit-for-bit; BpeStoreSpec carries the commit-protocol
    * and fresh-JVM proofs. */
  def q208(s: SparkSession, d: String): DataFrame = {
    val docs = documents(s, d)
    val base = s"graft_bpe_ids${d.replaceAll("[^A-Za-z0-9]", "_")}"
    graft.sources.Lake.ensureTable(s, base) {
      val train = docs.filter(col("doc_id") < 50)
      val table = graft.operators.TextPipeline.bpeTrain(
        train, "doc_id", "text", merges = 8)
      graft.sources.Lake.writeBpeStore(table,
        graft.operators.TextPipeline.bpeVocab(
          train, "doc_id", "text", table),
        base)
    }
    val (mt, vb) = graft.sources.Lake.readBpeStore(s, base)
    graft.operators.TextPipeline.bpeEncode(
        docs.filter(col("doc_id").between(50, 99)), "doc_id", "text",
        mt, vb)
      .select(col("doc_id"),
        size(col("ids")).cast("long").as("n_ids"),
        expr("array_join(transform(slice(ids, 1, 16), x -> cast(x as string)), ',')")
          .as("ids16"))
      .orderBy("doc_id")
  }

  /** q209 winnowing PAIR detection (round 16, r15 verdict #3 —
    * [[graft.operators.Dedup.winnowingPairs]]'s contract face; MOSS's
    * matcher over q203's per-doc fingerprints): documents sharing ≥ 1
    * selected-and-gram-verified fingerprint, with the shared count and
    * the overlap score n_shared / min(|fps|). By the winnowing
    * guarantee any pair sharing a ≥ k + w − 1 = 6-token run MUST
    * appear (QueriesSpec pins the planted-run property); the
    * gram-witness join keeps 32-bit collisions from fabricating a
    * pair (q151's exactness rule). The operator's `maxDf` valve stays
    * OFF here so the oracle sees the complete pair set; the scale
    * probe drives the index under id-salted replication, where
    * candidate volume must track shared-fingerprint mass, never
    * doc × doc. */
  def q209(s: SparkSession, d: String): DataFrame =
    graft.operators.Dedup.winnowingPairs(
        documents(s, d).select("doc_id", "text"), "doc_id", "text")
      .orderBy("a", "b")

  /** q210 DSIR end-to-end composition audit (round 16, r15 verdict
    * #7): the check a pipeline runs before trusting q187 → q200 — the
    * kept set's per-(source, lang) composition vs the raw corpus and
    * vs the target slice (Xie et al. 2023's distribution-matching
    * claim, checkable with exact integers: a working selection moves
    * frac_kept toward frac_target and away from frac_corpus on the
    * target cells). `kept` is [[dsirSelection]] — the SAME frame q200
    * serves, one definition of the selection. Scale shape: the
    * selection is q200's probed chain; the attribution join keys on
    * the doc id (docs-row, unhinted); everything after is a
    * |sources × langs|-bounded frame with totals via one whole-frame
    * window (q177's precedent). Fractions ride the floor idiom;
    * `nullif` guards empty kept/target slices. */
  def q210(s: SparkSession, d: String): DataFrame = {
    val sel = dsirSelection(s, d).select(col("doc_id"), col("kept"))
    val cells = documents(s, d)
      .select(col("doc_id"), col("source"), col("lang"))
      .join(sel, Seq("doc_id"), "left")
      .withColumn("kept", coalesce(col("kept"), lit(false)))
      .groupBy(col("source"), col("lang"))
      .agg(count(lit(1)).as("n_corpus"),
        sum(when(col("kept"), 1L).otherwise(0L)).as("n_kept"),
        sum(when(col("lang") === "en", 1L).otherwise(0L)).as("n_target"))
    val whole = Window.partitionBy().rowsBetween(
      Window.unboundedPreceding, Window.unboundedFollowing)
    def frac(n: Column, tot: Column): Column =
      floor(n * lit(10000.0) /
        when(tot === 0, lit(null)).otherwise(tot)) / 10000.0
    cells
      .withColumn("t_c", sum(col("n_corpus")).over(whole))
      .withColumn("t_k", sum(col("n_kept")).over(whole))
      .withColumn("t_t", sum(col("n_target")).over(whole))
      .select(col("source"), col("lang"), col("n_corpus"),
        col("n_kept"), col("n_target"),
        frac(col("n_corpus"), col("t_c")).as("frac_corpus"),
        frac(col("n_kept"), col("t_k")).as("frac_kept"),
        frac(col("n_target"), col("t_t")).as("frac_target"))
      .orderBy("source", "lang")
  }

  /** q211 boilerplate cleaning from the PERSISTED gate (round 16, r15
    * verdict #6): q202 re-aggregates the global span-df table every
    * run; production lands the gate once — the span-df table IS the
    * cleaning contract (q103/q198's discipline) — and serves every
    * batch against the committed store
    * ([[graft.operators.TextPipeline.saveBoilerplateStore]] under the
    * versioned-commit protocol; pay-once via
    * [[graft.operators.TextPipeline.ensureBoilerplateStore]]'s
    * per-JVM memo). Oracle = q202 VERBATIM: the hash gate proves
    * store-served cleaning ≡ the inline aggregate bit-for-bit.
    * StreamingOpsSpec drives the micro-batch face
    * (`boilerplateServeStream`) against the same store with restart
    * determinism. */
  def q211(s: SparkSession, d: String): DataFrame = {
    val docs = documents(s, d)
    val wh = s.conf.get("spark.sql.warehouse.dir")
    val path =
      s"$wh/graft_bp_store${d.replaceAll("[^A-Za-z0-9]", "_")}"
    graft.operators.TextPipeline.ensureBoilerplateStore(
      docs, "doc_id", "text", path)
    graft.operators.TextPipeline.boilerplateServe(
        s, path, docs, "doc_id", "text")
      .orderBy("doc_id")
  }

  /** q212 winnowing matches from the PERSISTED index (round 16 —
    * MOSS as a service): q209 re-fingerprints the whole corpus per
    * run; production lands the corpus-side fingerprint index once
    * ([[graft.operators.Dedup.saveWinnowIndex]] under the
    * versioned-commit protocol, `maxDf` applied AT BUILD so the
    * committed index IS the matching contract) and checks each batch
    * against it ([[graft.operators.Dedup.winnowServe]]). Serving the
    * corpus against its own committed index and keeping each unordered
    * pair once reproduces q209 exactly — oracle = q209 VERBATIM (the
    * hash gate proves store-served matching ≡ the inline self-join
    * bit-for-bit). StreamingOpsSpec drives the micro-batch face
    * (`winnowServeStream`) with restart determinism. */
  def q212(s: SparkSession, d: String): DataFrame = {
    val docs = documents(s, d).select("doc_id", "text")
    val wh = s.conf.get("spark.sql.warehouse.dir")
    val path =
      s"$wh/graft_winnow_store${d.replaceAll("[^A-Za-z0-9]", "_")}"
    graft.operators.Dedup.ensureWinnowIndex(docs, "doc_id", "text", path)
    graft.operators.Dedup.winnowServe(s, path, docs, "doc_id", "text")
      .filter(col("doc_id") < col("corpus_id"))
      .select(col("doc_id").as("a"), col("corpus_id").as("b"),
        col("n_shared"), col("sim"))
      .orderBy("a", "b")
  }

  /** q213 DSIR scoring from the PERSISTED log-ratio table (round 16):
    * q187 estimates the target/raw bucket distributions AND scores in
    * one query; the paper's deployment estimates ONCE (on a reference
    * corpus or sample) and scores everything against the fixed 256-row
    * table — [[graft.operators.TextPipeline.saveDsirStore]] /
    * [[graft.operators.TextPipeline.dsirServe]] under the
    * versioned-commit protocol. Serving the reference corpus against
    * its own committed table reproduces q187 — oracle = q187 VERBATIM
    * (round-4 on the cancellable ln sum, both faces). At 100 TB this
    * is the shape that matters: the estimate pass runs on the sample,
    * the scoring pass is one broadcast join per corpus scan, and the
    * selection threshold can be re-tuned without re-estimating. */
  def q213(s: SparkSession, d: String): DataFrame = {
    val docs = documents(s, d)
    val wh = s.conf.get("spark.sql.warehouse.dir")
    val path =
      s"$wh/graft_dsir_store${d.replaceAll("[^A-Za-z0-9]", "_")}"
    graft.operators.TextPipeline.ensureDsirStore(
      docs, "doc_id", "text", col("lang") === "en", path)
    graft.operators.TextPipeline.dsirServe(s, path, docs, "doc_id", "text")
      .select(col("doc_id"), col("n_feats"),
        (round(col("logw"), 4) + 0.0).as("logw"))
      .orderBy("doc_id")
  }

  /** q214 Count-Min heavy hitters (round 16 —
    * [[graft.operators.Sketches.cmsCounters]]/`cmsEstimate`'s contract
    * face; Cormode & Muthukrishnan 2005): tokens whose CMS estimate
    * crosses the 1% heavy-hitter bar, with the exact count and the
    * collision overcount alongside — the audit a pipeline runs to pick
    * a sketch width before trusting it at 100 TB. est ≥ exact ALWAYS
    * (CMS never undercounts — SketchesSpec pins the property); the
    * est·100 ≥ N gate means no true ≥1% token is ever missed.
    *
    * Scale shape: the counter matrix has a FIXED 4×16-cell key space —
    * map-side partials collapse every partition to ≤ 64 rows, so the
    * sketch build's exchange is metadata-sized at any corpus size. The
    * audit face additionally pays the exact |vocab|-keyed count (that
    * is what it audits); the production path is the counters + the
    * broadcast estimate join alone. All arithmetic is exact integers —
    * no float anywhere. */
  def q214(s: SparkSession, d: String): DataFrame = {
    // scan-parallelism floor (round 19, guide §2.5): the tokenize +
    // explode map ran as ONE ~0.6 s task at sf0.1; self-disabling at
    // real volumes
    val toks = graft.Tables.withParallelismFloor(documents(s, d), "doc_id")
      .select(explode(expr(graft.operators.TextHashes.toks("text")))
        .as("tok"))
    val counters = graft.operators.Sketches.cmsCounters(toks, "tok")
    val exact = toks.groupBy(col("tok")).agg(count(lit(1)).as("n_exact"))
    val tot = exact.agg(sum(col("n_exact")).as("n_total"))
    graft.operators.Sketches.cmsEstimate(exact.select("tok"), "tok", counters)
      .join(exact, "tok")
      .crossJoin(broadcast(tot))
      .filter(col("est") * 100 >= col("n_total"))
      .select(col("tok").as("token"), col("est"), col("n_exact"),
        (col("est") - col("n_exact")).as("overcount"))
      .orderBy(col("est").desc, col("token"))
  }

  /** q215 Bloom-filter decontamination screen (round 16 —
    * [[graft.operators.Sketches.bloomBits]]/`bloomScreen`'s contract
    * face; Bloom 1970): a 4096-bit / 3-hash filter built from the
    * eval slice's (doc_id < 20) distinct shingles, then every
    * training doc screened against it — per doc, total shingles,
    * Bloom-positive shingles, EXACT matches, and the false-positive
    * count their difference isolates (no false negatives ever:
    * n_bloom ≥ n_exact, pinned in SketchesSpec).
    *
    * Scale shape: the filter is a fixed 64-long array broadcast to
    * every executor — the corpus side tests membership with row-level
    * bit arithmetic and never exchanges before its own per-doc
    * rollup. The AUDIT face additionally pays the exact eval-set join
    * (that difference IS what it measures); the production screen is
    * [[graft.operators.Sketches.bloomServe]] alone — one broadcast
    * scan, which is why a Bloom pre-screen in front of q108's exact
    * decontamination join is sound: flagged-only rows reach the join,
    * missed contamination is impossible. */
  def q215(s: SparkSession, d: String): DataFrame = {
    // single-level generator over the shingle TRANSFORM + row-level
    // distinct — never explode the pre-built set array (q47's
    // InferFiltersFromGenerate rule: the inferred size(sh) > 0 filter
    // re-inlines the whole shingle chain as an interpreted per-scan-row
    // predicate). This query's first cut tripped it AND paid the
    // corpus twice (separate screen + exact-join passes): 10.1 s at
    // sf0.1, vs 1.4 s for this shape (one generator pass, one fused
    // audit aggregate — bloomScreenAudit)
    val shx = shingleRows(documents(s, d))
    val ev = shx.filter(col("doc_id") < 20).select("s").distinct()
    val tr = shx.filter(col("doc_id") >= 20)
    val bits = graft.operators.Sketches.bloomBits(ev, "s")
    graft.operators.Sketches.bloomScreenAudit(tr, "doc_id", "s", bits, ev)
      .select(col("doc_id"), col("n_items").as("n_sh"), col("n_bloom"),
        col("n_exact"), (col("n_bloom") - col("n_exact")).as("n_fp"))
      .orderBy("doc_id")
  }

  /** q216 TextRank keyword extraction (round 16 —
    * [[graft.operators.Graphs.textRank]]'s contract face; Mihalcea &
    * Tarau 2004): top-30 tokens by 5-iteration fixed-point PageRank
    * over the corpus co-occurrence graph. The fixed-point BIGINT
    * contract (every division floors, every intermediate an exact
    * integer — see the operator doc) is what makes an ITERATIVE graph
    * computation differentially testable at all: a float PageRank
    * compounds summation-order ulps across iterations. Ordering rides
    * the exact `r_fp`, never the display double. */
  def q216(s: SparkSession, d: String): DataFrame =
    // scan-parallelism floor (round 19, guide §2.5): the tokenize +
    // edge-explode map ran as ONE ~0.48 s task at sf0.1;
    // self-disabling at real volumes
    graft.operators.Graphs.textRank(
      graft.Tables.withParallelismFloor(documents(s, d), "doc_id"), "text")
      .orderBy(col("r_fp").desc, col("token"))
      .limit(30)

  /** q217 reciprocal-rank-fusion hybrid retrieval (round 16; Cormack,
    * Clarke & Buettcher 2009): BM25 lexical top-20 (q153's exact
    * scoring, df/avgdl over the candidate corpus) fused with
    * embedding-cosine top-20 (q49's exact similarity) per probe query
    * — rrf = Σ_retrievers 1/(60 + rank), missing-from-one-list terms
    * contribute 0 — keeping the fused top-10. The shape RAG data
    * curation runs to pick retrieval candidates from both signals
    * without score calibration.
    *
    * Determinism: BM25 ranks on the ROUND-4 score (a float SUM of
    * per-term contributions is summation-order-sensitive; q153's
    * rule), cosine ranks on the raw fixed-fold similarity (q204's
    * rule), both tiebroken by id; rrf itself is a fixed-order 2-term
    * sum of exact divisions. Scale shape: the probe set is bounded by
    * contract and broadcasts (q204's rule), so the candidate scan
    * never exchanges; both top-20s ride WindowGroupLimit on the
    * bounded probe key; the fusion join is |probes|·20 rows. */
  def q217(s: SparkSession, d: String): DataFrame = {
    val docs = documents(s, d).select(col("doc_id"),
      expr(graft.operators.TextHashes.toks("text")).as("toks"))
    val cand = docs.filter(col("doc_id").between(5, 199))
    val dl = cand.select(col("doc_id"), size(col("toks")).cast("long").as("dl"))
    val st = dl.agg(count(lit(1)).as("n"), avg(col("dl")).as("avgdl"))
    val tf = cand.select(col("doc_id"), explode(col("toks")).as("term"))
      .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    val dfT = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val qterms = docs.filter(col("doc_id") < 5)
      .select(col("doc_id").as("probe"),
        explode(expr("array_distinct(toks)")).as("term"))
    val bm = qterms.join(tf, "term")
      .join(broadcast(dfT), "term")
      .join(dl, "doc_id")
      .crossJoin(broadcast(st))
      .select(col("probe"), col("doc_id").as("id"),
        (log(lit(1.0) +
            (col("n") - col("df") + lit(0.5)) / (col("df") + lit(0.5))) *
          col("tf") * lit(2.2) /
          (col("tf") + lit(1.2) *
            (lit(0.25) + lit(0.75) * col("dl") / col("avgdl"))))
          .as("c"))
      .groupBy(col("probe"), col("id"))
      .agg(round(sum(col("c")), 4).as("bscore"))
    val wA = Window.partitionBy(col("probe"))
      .orderBy(col("bscore").desc, col("id"))
    val ra = bm.select(col("probe"), col("id"),
        row_number().over(wA).as("bm25_rank"))
      .filter(col("bm25_rank") <= 20)
    val e = embeddings(s, d).select(col("vec_id"),
      Vectors.asDouble(col("embedding")).as("v"))
    val pv = e.filter(col("vec_id") < 5)
      .select(col("vec_id").as("probe"), col("v").as("vp"))
    val cs = e.filter(col("vec_id").between(5, 199))
      .select(col("vec_id").as("id"), col("v").as("vc"))
      .join(broadcast(pv))
      .select(col("probe"), col("id"),
        Vectors.cosine(col("vp"), col("vc")).as("cs"))
    val wB = Window.partitionBy(col("probe"))
      .orderBy(col("cs").desc, col("id"))
    val rb = cs.select(col("probe"), col("id"),
        row_number().over(wB).as("cos_rank"))
      .filter(col("cos_rank") <= 20)
    val wF = Window.partitionBy(col("probe"))
      .orderBy(col("rrf").desc, col("id"))
    ra.join(rb, Seq("probe", "id"), "full")
      .withColumn("rrf",
        coalesce(lit(1.0) / (lit(60) + col("bm25_rank")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(60) + col("cos_rank")), lit(0.0)))
      .withColumn("n_rank", row_number().over(wF))
      .filter(col("n_rank") <= 10)
      .select(col("probe"), col("n_rank").cast("long").as("n_rank"),
        col("id"), (round(col("rrf"), 6) + 0.0).as("rrf"),
        col("bm25_rank").cast("long").as("bm25_rank"),
        col("cos_rank").cast("long").as("cos_rank"))
      .orderBy("probe", "n_rank")
  }

  /** q218 Bloom screening from the PERSISTED filter (round 16): q215
    * rebuilds the filter per run; production lands it once from the
    * benchmark/eval suite ([[graft.operators.Sketches.saveBloomStore]]
    * under the versioned-commit protocol, pay-once via
    * `ensureBloomStore`'s per-JVM memo) and screens every ingest batch
    * against the committed artifact — the cheapest serve shape in the
    * store family: a broadcast 64-long array tested with row-level bit
    * arithmetic, no index join at all. Oracle = q215 VERBATIM (q198's
    * shared-oracle rule): the hash gate proves the round-tripped
    * packed filter screens bit-identically to the inline build.
    * StreamingOpsSpec drives the micro-batch face
    * (`bloomServeStream`) against the same store with restart
    * determinism. */
  def q218(s: SparkSession, d: String): DataFrame = {
    val wh = s.conf.get("spark.sql.warehouse.dir")
    val path =
      s"$wh/graft_bloom_store${d.replaceAll("[^A-Za-z0-9]", "_")}"
    val shx = shingleRows(documents(s, d))
    val ev = shx.filter(col("doc_id") < 20).select("s").distinct()
    graft.operators.Sketches.ensureBloomStore(ev, "s", path)
    graft.operators.Sketches.bloomServeAudit(s, path,
        shx.filter(col("doc_id") >= 20), "doc_id", "s", ev)
      .select(col("doc_id"), col("n_items").as("n_sh"), col("n_bloom"),
        col("n_exact"), (col("n_bloom") - col("n_exact")).as("n_fp"))
      .orderBy("doc_id")
  }

  /** q219 portable HyperLogLog audit (round 16 —
    * [[graft.operators.Sketches.hllRegisters]]/`hllEstimate`'s
    * contract face; Flajolet et al. 2007): per-source distinct-token
    * estimate vs the exact count. The third portable sketch (CMS
    * q214, Bloom q215): register index + ρ from ONE md5 digest via
    * pure integer CASE logic, the harmonic sum over exact dyadic
    * 2^-M terms (order-free in IEEE), α₁₆/linear-counting constants
    * as literals both faces — an ESTIMATOR whose every bit the
    * DuckDB gate replays, something the DataSketches binary
    * ([[graft.operators.Sketches.hllDistinct]], the production
    * primitive) can never offer a differential harness.
    *
    * Scale shape: the register aggregate's key space is |sources|·16
    * — map-side partials collapse every partition to it no matter
    * how many tokens stream through (q214's cell-space argument);
    * register tables merge by cell-wise max. The AUDIT face
    * additionally pays the exact |source×vocab|-keyed distinct (that
    * is what it audits). */
  def q219(s: SparkSession, d: String): DataFrame = {
    val toks = documents(s, d).select(col("source"),
      explode(expr(graft.operators.TextHashes.toks("text"))).as("tok"))
    val est = graft.operators.Sketches.hllEstimate(
      graft.operators.Sketches.hllRegisters(toks, "source", "tok"),
      "source")
    val exact = toks.groupBy(col("source"))
      .agg(count_distinct(col("tok")).as("n_exact"))
    est.join(exact, "source")
      .select(col("source"), col("n_exact"), col("v_empty"),
        (round(col("raw"), 4) + 0.0).as("raw"),
        (round(col("est"), 4) + 0.0).as("est"))
      .orderBy("source")
  }

  /** q220 curation funnel card (round 16): the stage-attrition audit a
    * pipeline publishes with every dataset build — docs and tokens
    * surviving each stage of raw → quality gate (20 ≤ tokens ≤ 1000
    * and type-token ratio ≥ 0.3 via exact cross-multiply) → exact
    * dedup (min-id survivor per content hash, among gate survivors —
    * q41's semantics) → language filter (en) → per-source 50% quota
    * (smallest ids, ceil — rank·2 ≤ count+1 exact-integer form). One
    * row per stage, exact integers end-to-end.
    *
    * Scale shape: ONE corpus pass computes every per-doc flag (the
    * per-doc projection is narrow; the dedup survivor join is the
    * |distinct hashes| frame; the quota window partitions by source
    * over gate survivors only — group-sized); the five stage rows
    * fall out of ONE final aggregate exploded into the card. The
    * funnel never re-scans per stage — the difference between an
    * audit you run per build and one you skip at 100 TB. */
  def q220(s: SparkSession, d: String): DataFrame = {
    val base = documents(s, d)
      .select(col("doc_id"), col("source"), col("lang"),
        md5(lower(trim(col("text")))).as("h"),
        expr(graft.operators.TextHashes.toks("text")).as("toks"))
      .select(col("doc_id"), col("source"), col("lang"), col("h"),
        size(col("toks")).cast("long").as("n_toks"),
        expr("size(array_distinct(toks))").cast("long").as("n_types"))
      .withColumn("q",
        col("n_toks") >= 20 && col("n_toks") <= 1000 &&
          col("n_types") * 10 >= col("n_toks") * 3)
    val surv = base.filter(col("q"))
      .groupBy(col("h")).agg(min(col("doc_id")).as("__keep"))
    val f2 = base.join(surv, Seq("h"), "left")
      .withColumn("dd", col("q") && col("doc_id") === col("__keep"))
      .withColumn("ll", col("dd") && col("lang") === "en")
    val lRows = f2.filter(col("ll")).select(col("doc_id"), col("source"))
    val cnts = lRows.groupBy(col("source")).agg(count(lit(1)).as("__cnt"))
    val wq = Window.partitionBy(col("source")).orderBy(col("doc_id"))
    val kept = lRows
      .select(col("doc_id"), col("source"),
        row_number().over(wq).as("__rk"))
      .join(cnts, "source")
      .filter(col("__rk") * 2 <= col("__cnt") + 1)
      .select(col("doc_id"), lit(true).as("kk"))
    f2.join(kept, Seq("doc_id"), "left")
      .withColumn("kk", coalesce(col("kk"), lit(false)))
      .agg(
        count(lit(1)).as("n0"), sum(col("n_toks")).as("t0"),
        sum(when(col("q"), 1L).otherwise(0L)).as("n1"),
        sum(when(col("q"), col("n_toks")).otherwise(0L)).as("t1"),
        sum(when(col("dd"), 1L).otherwise(0L)).as("n2"),
        sum(when(col("dd"), col("n_toks")).otherwise(0L)).as("t2"),
        sum(when(col("ll"), 1L).otherwise(0L)).as("n3"),
        sum(when(col("ll"), col("n_toks")).otherwise(0L)).as("t3"),
        sum(when(col("kk"), 1L).otherwise(0L)).as("n4"),
        sum(when(col("kk"), col("n_toks")).otherwise(0L)).as("t4"))
      .select(explode(expr(
        """array(
          |  named_struct('stage', 0L, 'name', 'raw',     'n_docs', n0, 'n_tokens', t0),
          |  named_struct('stage', 1L, 'name', 'quality', 'n_docs', n1, 'n_tokens', t1),
          |  named_struct('stage', 2L, 'name', 'dedup',   'n_docs', n2, 'n_tokens', t2),
          |  named_struct('stage', 3L, 'name', 'lang',    'n_docs', n3, 'n_tokens', t3),
          |  named_struct('stage', 4L, 'name', 'quota',   'n_docs', n4, 'n_tokens', t4))"""
          .stripMargin)).as("st"))
      .select(col("st.stage").as("stage"), col("st.name").as("name"),
        col("st.n_docs").as("n_docs"), col("st.n_tokens").as("n_tokens"))
      .orderBy("stage")
  }

  /** q221 CMS heavy hitters from the PERSISTED counter matrix (round
    * 16): q214 re-counts the matrix per run; production estimates the
    * reference corpus ONCE ([[graft.operators.Sketches.saveCmsStore]]
    * under the versioned-commit protocol — the landed artifact is
    * 64 rows) and scores every batch against the committed counters.
    * Serving the corpus's own tokens against its committed matrix
    * reproduces q214 exactly — oracle = q214 VERBATIM (the hash gate
    * proves the round-tripped matrix estimates bit-identically).
    * StreamingOpsSpec drives the micro-batch face (`cmsServeStream`)
    * with replay idempotence. */
  def q221(s: SparkSession, d: String): DataFrame = {
    val wh = s.conf.get("spark.sql.warehouse.dir")
    val path = s"$wh/graft_cms_store${d.replaceAll("[^A-Za-z0-9]", "_")}"
    val toks = documents(s, d)
      .select(explode(expr(graft.operators.TextHashes.toks("text")))
        .as("tok"))
    graft.operators.Sketches.ensureCmsStore(toks, "tok", path)
    val exact = toks.groupBy(col("tok")).agg(count(lit(1)).as("n_exact"))
    val tot = exact.agg(sum(col("n_exact")).as("n_total"))
    graft.operators.Sketches.cmsServe(s, path, exact.select("tok"), "tok")
      .join(exact, "tok")
      .crossJoin(broadcast(tot))
      .filter(col("est") * 100 >= col("n_total"))
      .select(col("tok").as("token"), col("est"), col("n_exact"),
        (col("est") - col("n_exact")).as("overcount"))
      .orderBy(col("est").desc, col("token"))
  }

  /** q222 merge-on-read distinct from PERSISTED per-slice HLL
    * registers (round 16): the lambda-architecture shape q219's merge
    * property exists for — each ingest slice sketched ONCE at landing
    * ([[graft.operators.Sketches.saveHllStore]], here two disjoint
    * halves of the corpus under one versioned commit so a reader can
    * never see a torn slice set), any later distinct question answered
    * by cell-wise max over the committed registers + the estimate
    * ([[graft.operators.Sketches.hllServe]]) — rows never re-scanned.
    * By the merge property (spec'd) this equals the single-pass sketch
    * bit-for-bit — oracle = q219 VERBATIM. */
  def q222(s: SparkSession, d: String): DataFrame = {
    val wh = s.conf.get("spark.sql.warehouse.dir")
    val path = s"$wh/graft_hll_store${d.replaceAll("[^A-Za-z0-9]", "_")}"
    def toks(p: Column) = documents(s, d).filter(p)
      .select(col("source"),
        explode(expr(graft.operators.TextHashes.toks("text"))).as("tok"))
    graft.operators.Sketches.ensureHllStore(
      Seq(toks(col("doc_id") % 2 === 0), toks(col("doc_id") % 2 === 1)),
      s, "source", "tok", path)
    val all = toks(lit(true))
    val exact = all.groupBy(col("source"))
      .agg(count_distinct(col("tok")).as("n_exact"))
    graft.operators.Sketches.hllServe(s, path, "source")
      .join(exact, "source")
      .select(col("source"), col("n_exact"), col("v_empty"),
        (round(col("raw"), 4) + 0.0).as("raw"),
        (round(col("est"), 4) + 0.0).as("est"))
      .orderBy("source")
  }

  /** q223 top principal component by fixed-point power iteration
    * (round 16 — [[graft.operators.Linalg.topComponent]]'s contract
    * face): the anisotropy diagnostic of the embedding corpus — the
    * dominant direction whose strength decides whether raw cosine
    * similarity is trustworthy (Ethayarajh 2019). The second member
    * of the fixed-point-iteration class (q216's TextRank): quantized
    * integer covariance (one exact identity, no mean subtraction, no
    * float sums), six exactly-renormalized BIGINT iterations —
    * engine-bit-identical, which is what lets a DuckDB gate replay a
    * PCA at all. */
  def q223(s: SparkSession, d: String): DataFrame =
    graft.operators.Linalg.topComponent(
        embeddings(s, d), "vec_id", "embedding")
      .orderBy("dim")

  /** q224 fixed-point Lloyd k-means (round 16 —
    * [[graft.operators.Linalg.kmeansQuantized]]'s contract face): two
    * assign→update rounds over the quantized embedding corpus, K = 8
    * seeded by the smallest ids — the estimate stage behind q183's
    * SemDeDup centroids, as a differentially-testable operator (the
    * third fixed-point-iteration member after q216/q223: exact BIGINT
    * distances, smallest-cid ties, exact floor centroid means, empty
    * clusters keep their previous centroid). Output = the centroid
    * table + final membership counts. */
  def q224(s: SparkSession, d: String): DataFrame =
    graft.operators.Linalg.kmeansQuantized(
        embeddings(s, d), "vec_id", "embedding")
      .orderBy("cid", "dim")

  /** q225 Gopher quality-rule battery (round 16 —
    * [[graft.operators.Profile.gopherRules]]'s contract face; Rae et
    * al. 2021 Table A1 constants verbatim): per doc, the exact-integer
    * counters and per-rule verdicts behind the standard pre-training
    * quality gate — word-count bounds, mean-word-length bounds,
    * symbol ratio, alphabetic-word fraction, stop-word presence, and
    * the AND. Fully narrow (one tokenize, per-row HOF folds) — at
    * 100 TB this gate is pure scan work, the cheapest shape a filter
    * can have. q51/q119 keep their own heuristics; this face is the
    * PAPER's battery, constants and all. */
  def q225(s: SparkSession, d: String): DataFrame =
    graft.operators.Profile.gopherRules(documents(s, d), "doc_id", "text")
      .orderBy("doc_id")

  /** q226 trigram stupid-backoff LM scoring (round 16; Brants et al.
    * 2007 "Large Language Models in Machine Translation" — the
    * web-scale backoff that made KenLM-class corpus scoring feasible
    * without discounting): n-gram tables from the doc_id < 250 TRAIN
    * slice, every other doc scored trigram-by-trigram with the
    * 3→2→1 backoff chain (α = 0.4 per level, Laplace unigram floor so
    * OOV words score instead of crashing) — per doc the backoff-level
    * census (exact integers, the strong hash signal) and the average
    * log score (round-4 on the cancellable ln sum, §2.9's rule).
    * q107/q152 stop at bigrams with interpolation; this face is the
    * production backoff shape.
    *
    * Scale: count tables are vocabulary-bounded (|V|³ worst case,
    * far below token volume in practice) and join UNHINTED against
    * the trigram stream (q114's rule — at real vocabulary they flip
    * to SMJ exactly when they should; a 100-TB deployment lands them
    * once under a q198-style store, bucketed by (w1, w2)). The
    * stream explode is narrow; the only data-sized exchange is the
    * per-doc rollup. */
  def q226(s: SparkSession, d: String): DataFrame = {
    // scan-parallelism floor (round 19, guide §2.5) on the SCORED
    // batch only, applied AFTER its doc_id filter so the predicate
    // still pushes into the parquet scan. Measured and rejected on the
    // train side: its three count maps run CONCURRENTLY under the
    // lmScore broadcast builds, so the single-task maps already
    // overlap — flooring them added an exchange + 32-task scheduling
    // per job for no critical-path win (×1.15); and flooring ABOVE the
    // filter shuffles the whole corpus to keep 5%. Self-disabling at
    // real volumes.
    val docs = documents(s, d)
    val (uni, bi, tri, nv) = graft.operators.TextPipeline.lmCounts(
      docs.filter(col("doc_id") < 250), "text")
    graft.operators.TextPipeline.lmScore(
        graft.Tables.withParallelismFloor(
          docs.filter(col("doc_id") >= 250), "doc_id"), "doc_id", "text",
        uni, bi, tri, nv)
      .orderBy("doc_id")
  }

  /** q227 dedup threshold sensitivity curve (round 16): the tuning
    * table a curator reads BEFORE picking the near-dup threshold —
    * for each candidate threshold (percent scale {1,2,3,5,10,50,80} —
    * spanning the corpus's similarity tail AND the planted-dup regime,
    * q60's tune-to-the-tail rule), how many document pairs exceed it
    * and how many documents are touched. Jaccard comparisons are
    * exact cross-multiplies (100·inter ≥ t·union — no float ever
    * enters the predicate); the pair set is q47's
    * inverted-index join over the bounded doc_id < 100 audit universe
    * (the production estimator for the full corpus is q118's banded
    * sampling — this face is the exact audit that CALIBRATES it).
    * The 5-threshold sweep re-reads the ONE pair frame — thresholds
    * explode against it, never recompute it. */
  def q227(s: SparkSession, d: String): DataFrame = {
    val base = documents(s, d).filter(col("doc_id") < 100)
      .select(col("doc_id"),
        expr(graft.operators.TextHashes.toks("text")).as("toks"))
      .filter(size(col("toks")) >= 3)
    val cnt = base.select(col("doc_id"),
      expr(s"size(${graft.operators.TextHashes.shingleSet("toks")})")
        .cast("long").as("n"))
    val inv = base.select(col("doc_id"),
        explode(expr(graft.operators.TextHashes.shingleTransform("toks")))
          .as("sh"))
      .distinct()
    val pairs = inv.toDF("a", "sh")
      .join(inv.toDF("b", "sh2"),
        col("sh") === col("sh2") && col("a") < col("b"))
      .groupBy(col("a"), col("b")).agg(count(lit(1)).as("inter"))
      .join(cnt.toDF("a", "na"), "a")
      .join(cnt.toDF("b", "nb"), "b")
      .select(col("a"), col("b"), col("inter"),
        (col("na") + col("nb") - col("inter")).as("uni"))
    val thr = s.range(1)
      .select(explode(expr("array(1, 2, 3, 5, 10, 50, 80)")).as("t100"))
    val kept = pairs.crossJoin(broadcast(thr))
      .filter(col("inter") * 100 >= col("t100") * col("uni"))
    val nPairs = kept.groupBy(col("t100"))
      .agg(count(lit(1)).as("n_pairs"))
    val nDocs = kept
      .select(col("t100"), explode(array(col("a"), col("b"))).as("d"))
      .distinct()
      .groupBy(col("t100")).agg(count(lit(1)).as("n_docs"))
    thr
      .join(nPairs, Seq("t100"), "left")
      .join(nDocs, Seq("t100"), "left")
      .select((col("t100") / lit(100.0)).as("threshold"),
        coalesce(col("n_pairs"), lit(0L)).as("n_pairs"),
        coalesce(col("n_docs"), lit(0L)).as("n_docs"))
      .orderBy("threshold")
  }

  /** q228 LM scoring from the PERSISTED count tables (round 16): q226
    * re-trains the n-gram tables per run; production lands them once
    * from the reference corpus
    * ([[graft.operators.TextPipeline.saveLmStore]] — all four tables
    * under ONE versioned commit, the q208 torn-pair rule) and scores
    * every batch against the committed store
    * ([[graft.operators.TextPipeline.lmServe]]) — CCNet's perplexity-
    * gate deploy shape: train the LM on the reference, score the
    * crawl, re-tune the keep threshold without re-training. Oracle =
    * q226 VERBATIM (the hash gate proves store-served scoring ≡ the
    * inline train-and-score bit-for-bit). StreamingOpsSpec drives the
    * micro-batch face (`lmServeStream`) with restart determinism. */
  def q228(s: SparkSession, d: String): DataFrame = {
    val wh = s.conf.get("spark.sql.warehouse.dir")
    val path = s"$wh/graft_lm_store${d.replaceAll("[^A-Za-z0-9]", "_")}"
    // scan-parallelism floor (round 19, guide §2.5): the serve-side
    // trigram stream map ran single-task at sf0.1; applied AFTER the
    // doc_id filters so the predicates still push into the scan
    // (q226's lesson); self-disabling at real volumes
    val docs = documents(s, d)
    graft.operators.TextPipeline.ensureLmStore(
      docs.filter(col("doc_id") < 250), "text", path)
    graft.operators.TextPipeline.lmServe(s, path,
        graft.Tables.withParallelismFloor(
          docs.filter(col("doc_id") >= 250), "doc_id"), "doc_id", "text")
      .orderBy("doc_id")
  }

  /** q229 per-cluster embedding outlier census (round 16 —
    * [[graft.operators.Linalg.embeddingOutliers]]'s contract face):
    * vectors assigned to the 8 fixed seed centroids (vec_id < 8,
    * q183's fixed-centroid convention), members flagged > 3σ above
    * their cluster's mean distance (one-sided: the sign guard keeps
    * near-clones of the seed — 3σ BELOW the mean — from being
    * miscounted) with the WHOLE test in exact integers — the
    * n²-scaled cross-multiply n·d − Σd > 0 AND (n·d − Σd)² >
    * 9·(n·Σd² − (Σd)²). Bound analysis for the 2^53-exactness: the
    * scaled distance d ≤ 64·933²/1000 ≈ 5.6e4; n·d ≤ 2.8e7 (square
    * 7.8e14); n·Σd² ≤ 7.8e14, ×9 = 7e15 — all < 2^53. The hygiene
    * pass an embedding corpus gets before dedup/retrieval trusts its
    * cosines. */
  def q229(s: SparkSession, d: String): DataFrame = {
    val e = embeddings(s, d)
    val cents = e.filter(col("vec_id") < 8)
      .select(col("vec_id").cast("int").as("cid"),
        expr("transform(embedding, x -> cast(floor(cast(x as double) * 1000) as bigint))")
          .as("c"))
    graft.operators.Linalg.embeddingOutliers(e, "vec_id", "embedding",
        cents)
      .orderBy("cid")
  }

  /** q230 cross-document repeated-substring removal (round 17 —
    * [[graft.operators.Dedup.removeSharedRuns]]'s contract face; Lee
    * et al. 2021's ExactSubstr transform, the r16 verdict's #1 ask):
    * every ≥ 5-token passage appearing verbatim in an earlier document
    * is deleted, min-id keeper retains the canonical copy. The face
    * emits the per-doc census (token count, removed positions, maximal
    * removed segments) plus the order-faithful commutative digest of
    * the kept (pos:token) pairs (q202's idiom — the digest pins the
    * EXACT cleaned sequence cross-engine without an engine-ordered
    * string aggregate); the operator itself also returns the cleaned
    * text, exercised by `DedupSpec`.
    *
    * The oracle is the brute-force cover identity over the WHOLE
    * corpus — no bounded universe needed, because the formulation has
    * no pair join to bound: remove a position iff a duplicated 5-gram
    * covers it and this doc is not that gram's min-id keeper
    * (equivalent to maximal-shared-run removal — the identity is
    * proved in the operator doc). minRun = 5 is the corpus-relative
    * contract value (the production default for BPE-token streams is
    * the paper's 50). */
  def q230(s: SparkSession, d: String): DataFrame =
    graft.operators.Dedup.removeSharedRuns(documents(s, d), "doc_id",
        "text")
      .select("doc_id", "n_toks", "n_removed", "n_runs", "clean_sig")
      .orderBy("doc_id")

  // ---- product quantization family (round 17, r16 verdict #2) --------

  /** The q231–q235 codebook contract: 8 subspaces × 8 dims, K = 16,
    * 2 Lloyd rounds under the fixed-point contract, trained on the
    * INDEXED corpus slice (vec_id ≥ 10 — train on what you index; the
    * q115/q139 probe batch stays held out). */
  private def pqBooks(s: SparkSession, d: String): DataFrame =
    graft.operators.Pq.trainCodebooks(
      embeddings(s, d).filter(col("vec_id") >= 10), "vec_id", "embedding")

  /** q231 PQ codebook training (round 17 —
    * [[graft.operators.Pq.trainCodebooks]]'s contract face; Jégou et
    * al. 2011): all 8 per-subspace K=16 codebooks from ONE Lloyd loop
    * keyed by (sub, cid, dim) — q224's fixed-point k-means contract per
    * subspace (exact BIGINT distances, smallest-cid ties, floor means,
    * TakeOrdered smallest-id seeding, empty clusters keep centroids),
    * which is exactly what lets the DuckDB oracle replay the training
    * as one CTE chain with `sub` threaded through q224's shape. Update
    * cells collapse map-side to the fixed 8·16·8 = 1,024-cell space;
    * assignment partials are (vector, sub)-keyed. */
  def q231(s: SparkSession, d: String): DataFrame =
    pqBooks(s, d)
      .select(col("sub").cast("long").as("sub"),
        col("cid").cast("long").as("cid"),
        posexplode(col("c")).as(Seq("__d0", "c")))
      .select(col("sub"), col("cid"),
        (col("__d0") + 1).cast("long").as("dim"), col("c"))
      .orderBy("sub", "cid", "dim")

  /** q232 PQ corpus encoding (round 17): each indexed vector becomes
    * its 8 nearest-centroid codes — 8 half-bytes standing in for 256
    * float bytes, the compression a 100-TB vector store actually
    * ships. Same assignment shape as training (broadcast codebooks,
    * (vector, sub)-keyed argmin partial); the hash gate pins every
    * code exactly, because encoding is argmin over exact integers. */
  def q232(s: SparkSession, d: String): DataFrame =
    graft.operators.Pq.encode(
        embeddings(s, d).filter(col("vec_id") >= 10), "vec_id",
        "embedding", pqBooks(s, d))
      .select(col("vec_id"), col("sub").cast("long").as("sub"),
        col("code").cast("long").as("code"))
      .orderBy("vec_id", "sub")

  /** q233 PQ asymmetric-distance search (round 17): the q115 probe
    * batch (vec_id 4–9) searched against the encoded corpus — each
    * probe precomputes its 8×16 exact-integer LUT (broadcast), every
    * candidate's distance is 8 lookups summed, top-3 per probe by
    * (adc, cand) through a WindowGroupLimit-pruned rank. The corpus
    * side never does vector arithmetic at query time — the ADC
    * property that makes PQ serve from codes alone. */
  def q233(s: SparkSession, d: String): DataFrame = {
    val e = embeddings(s, d)
    graft.operators.Pq.search(
        e.filter(col("vec_id") >= 10)
          .select(col("vec_id").as("cand"), col("embedding")), "cand",
        e.filter(col("vec_id").between(4, 9))
          .select(col("vec_id").as("probe"), col("embedding")), "probe",
        "embedding", pqBooks(s, d))
      .orderBy("probe", "rk")
  }

  /** q234 PQ recall audit (round 17 — q115/q139's pattern closing the
    * PQ compression loop): ADC top-3 vs top-3 by the EXACT quantized
    * full-vector distance (the same 1e3 fixed point, so the truth
    * ranking is itself engine-exact), recall@3 per probe. q111 prices
    * int8 per-pair error, q139 int8 ranking, q115 IVF pruning — this
    * prices the 64× PQ code compression. Probe batch bounded (6) by
    * the audit contract; the brute-force side is probes×corpus,
    * explicitly NOT the serving path. The synthetic corpus is
    * near-uniform noise — the HARDEST case for PQ (neighbor margins
    * are thin, so code distortion swamps them) — and the low recall it
    * reports is the honest price; on clustered corpora (the planted
    * PqSpec geometry) the same contract recalls perfectly. That gap is
    * exactly what this audit exists to measure before anyone ships
    * codes. */
  def q234(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val e = embeddings(s, d)
    val probes = e.filter(col("vec_id").between(4, 9))
      .select(col("vec_id").as("probe"), col("embedding"))
    val cands = e.filter(col("vec_id") >= 10)
      .select(col("vec_id").as("cand"), col("embedding"))
    val adc = graft.operators.Pq.search(cands, "cand", probes, "probe",
        "embedding", pqBooks(s, d))
      .select(col("probe"), col("cand"))
    def quant(c: String) = expr(
      s"transform($c, x -> cast(floor(cast(x as double) * 1000) as bigint))")
    val w = Window.partitionBy(col("probe"))
      .orderBy(col("dist").asc, col("cand").asc)
    val exact = probes.select(col("probe"), quant("embedding").as("qp"))
      .crossJoin(cands.select(col("cand"), quant("embedding").as("qc")))
      .select(col("probe"), col("cand"), expr(
        "aggregate(zip_with(qp, qc, (a, b) -> (a - b) * (a - b)), 0L, (acc, x) -> acc + x)")
        .as("dist"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
      .select(col("probe"), col("cand"))
    val hits = adc.join(exact, Seq("probe", "cand"))
      .groupBy(col("probe")).agg(count(lit(1)).as("n_hit"))
    probes.select(col("probe"))
      .join(hits, Seq("probe"), "left")
      .select(col("probe"),
        coalesce(col("n_hit"), lit(0L)).as("n_hit"),
        round(coalesce(col("n_hit"), lit(0L)).cast("double") / 3.0, 4)
          .as("recall"))
      .orderBy("probe")
  }

  /** The q240/q241 coarse quantizer: the 8 fixed seed centroids
    * (vec_id < 8, quantized — q183/q229's pinned-pivot convention). */
  private def pqCoarse(s: SparkSession, d: String): DataFrame =
    embeddings(s, d).filter(col("vec_id") < 8)
      .select(col("vec_id").cast("int").as("cid"),
        expr("transform(embedding, x -> cast(floor(cast(x as double) * 1000) as bigint))")
          .as("c"))

  /** q240 IVF-ADC search, inline (round 17 —
    * [[graft.operators.Pq.ivfAdcSearch]]'s contract face; Jégou 2011
    * §IV): corpus vectors assign to their nearest of the 8 pinned
    * coarse centroids, PQ codebooks train on the exact-integer
    * RESIDUALS, each probe searches only its nprobe = 2 nearest lists
    * through a per-(probe, list) residual LUT. This is the composition
    * the store-serve probe adjudicated as PQ's at-scale escape (q233's
    * flat ADC scans every code; here candidate mass is the probed
    * lists' share) — and the whole chain stays in the fixed-point
    * contract, so the oracle replays coarse assignment, residual
    * training, encoding, and the probed-list ADC bit-for-bit. */
  def q240(s: SparkSession, d: String): DataFrame = {
    val e = embeddings(s, d)
    graft.operators.Pq.ivfAdcSearch(
        e.filter(col("vec_id") >= 10)
          .select(col("vec_id").as("cand"), col("embedding")), "cand",
        e.filter(col("vec_id").between(4, 9))
          .select(col("vec_id").as("probe"), col("embedding")), "probe",
        "embedding", pqCoarse(s, d))
      .orderBy("probe", "rk")
  }

  /** q241 IVF-ADC from the COMMITTED partition-pruned store (round
    * 17): coarse centroids + residual codebooks + codes PARTITIONED BY
    * list id under ONE versioned commit
    * ([[graft.operators.Pq.saveIvfAdcStore]]); at serve time the
    * probed list ids resolve driver-side (metadata, ≤ nprobe·|probes|)
    * and push down as PARTITION filters, so the codes scan reads the
    * probed directories only — `Ann.saveIndex`'s pruning discipline
    * applied to PQ codes. The committed artifact is COARSE-AGNOSTIC
    * (round 19, r18 verdict #4): this face pins the 8 pivots only to
    * share q240's oracle — a deployment commits
    * `Linalg.kmeansQuantized`-trained centroids through the SAME
    * save/serve pair (`PqSpec` round-trips exactly that), and the
    * serve resolves assignments against whatever (cid, c) frame the
    * store carries. Oracle = q240 VERBATIM (store-served ≡ inline
    * bit-for-bit). */
  def q241(s: SparkSession, d: String): DataFrame = {
    val wh = s.conf.get("spark.sql.warehouse.dir")
    val path = s"$wh/graft_ivfadc_store${d.replaceAll("[^A-Za-z0-9]", "_")}"
    val e = embeddings(s, d)
    graft.operators.Pq.ensureIvfAdcStore(s,
      e.filter(col("vec_id") >= 10)
        .select(col("vec_id").as("cand"), col("embedding")),
      "cand", "embedding", pqCoarse(s, d), path)
    graft.operators.Pq.searchIvfAdcStore(s, path,
        e.filter(col("vec_id").between(4, 9))
          .select(col("vec_id").as("probe"), col("embedding")),
        "probe", "embedding")
      .orderBy("probe", "rk")
  }

  /** q242 IVF-ADC recall/nprobe sensitivity audit (round 18, r17
    * verdict #3 — q115's grading + q227's sweep shape applied to the
    * COMPOSED index): recall@3 and candidate mass vs
    * nprobe ∈ {1, 2, 4, 8} against the engine-exact quantized
    * full-vector truth (q234's discipline), with the coarse quantizer
    * TRAINED — [[graft.operators.Linalg.kmeansQuantized]] over the
    * indexed corpus (K = 8, 2 rounds, the q224 contract), not q240's
    * pinned pivots — so the audit grades the composition a deployment
    * actually ships (`trainCentroids`-style learned lists + residual
    * PQ), and nprobe, the knob that deployment actually tunes, gets
    * its measured curve. One index build serves the whole sweep:
    * [[graft.operators.Pq.ivfAdcCandidates]] carries each candidate's
    * list rank `lrk`, so every nprobe row is a filter over ONE
    * (probe, cand, adc, lrk) frame — never a re-search. At nprobe = 8
    * (= nlist) the probed share is the whole corpus, so n_cand pins
    * the full-ADC ceiling the sweep converges to. The whole chain
    * stays in the fixed-point contract, so the DuckDB oracle replays
    * coarse TRAINING, assignment, residual training, encoding, the
    * sweep, and the exact-truth ranking bit-for-bit. */
  def q242(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val e = embeddings(s, d)
    val cands = e.filter(col("vec_id") >= 10)
      .select(col("vec_id").as("cand"), col("embedding"))
    val probes = e.filter(col("vec_id").between(4, 9))
      .select(col("vec_id").as("probe"), col("embedding"))
    // trained coarse as kmeansQuantized's LOCAL centroid relation
    // (round 19): identical centroid values, without the contract
    // face's membership-counts pass — Catalyst cannot prune that
    // left-joined pass through the (cid, dim)→array regroup this
    // consumer used to do, so the sweep paid a whole extra corpus
    // assignment it never read
    val coarse = graft.operators.Linalg.kmeansCoarseLocal(
      cands, "cand", "embedding", k = 8, iterations = 2)
    // the sweep frame feeds BOTH the candidate-mass census and the
    // top-3 ranking (q185's sibling-consumer rule: unpinned, the whole
    // train+encode chain would re-run per consumer); ≤ |probes|·|corpus|
    // rows by the bounded-probe-batch contract
    val cf = graft.operators.Pq.ivfAdcCandidates(cands, "cand",
        probes, "probe", "embedding", coarse, maxNprobe = 8)
      .localCheckpoint(false) // lazy pin (round 19): all consumers full-scan
    val sw = cf.crossJoin(
        broadcast(s.range(1).select(explode(expr("array(1, 2, 4, 8)"))
          .as("nprobe"))))
      .filter(col("lrk") <= col("nprobe"))
    val w = Window.partitionBy(col("nprobe"), col("probe"))
      .orderBy(col("adc").asc, col("cand").asc)
    val top3 = sw
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
      .select(col("nprobe"), col("probe"), col("cand"))
    def quant(c: String) = expr(
      s"transform($c, x -> cast(floor(cast(x as double) * 1000) as bigint))")
    val wx = Window.partitionBy(col("probe"))
      .orderBy(col("dist").asc, col("cand").asc)
    val exact = probes.select(col("probe"), quant("embedding").as("qp"))
      .crossJoin(cands.select(col("cand"), quant("embedding").as("qc")))
      .select(col("probe"), col("cand"), expr(
        "aggregate(zip_with(qp, qc, (a, b) -> (a - b) * (a - b)), 0L, (acc, x) -> acc + x)")
        .as("dist"))
      .withColumn("rk", row_number().over(wx))
      .filter(col("rk") <= 3)
      .select(col("probe"), col("cand"))
      .localCheckpoint(false) // n_true + the hit join (sibling consumers; lazy pin r19)
    val nTrue = exact.agg(count(lit(1)).as("n_true"))
    val mass = sw.groupBy(col("nprobe"))
      .agg(count(lit(1)).as("n_cand"))
    val hits = top3.join(exact, Seq("probe", "cand"))
      .groupBy(col("nprobe")).agg(count(lit(1)).as("n_hit"))
    mass.join(hits, Seq("nprobe"), "left")
      .crossJoin(broadcast(nTrue))
      .select(col("nprobe").cast("long").as("nprobe"), col("n_cand"),
        coalesce(col("n_hit"), lit(0L)).as("n_hit"),
        (floor(coalesce(col("n_hit"), lit(0L)) * lit(10000.0) /
          when(col("n_true") === 0, lit(null)).otherwise(col("n_true")))
          / 10000.0).as("recall"))
      .orderBy("nprobe")
  }

  /** q245 IVFADC+R re-ranked search (round 18; Jégou 2011 §V — the
    * deployment pattern that buys back the recall PQ codes give up):
    * q240's geometry (8 pinned coarse pivots, nprobe = 2) produces an
    * ADC shortlist of R = 10 candidates per probe, and the refine step
    * re-ranks ONLY those 60 candidates by the EXACT quantized
    * full-vector distance — R source-vector reads per probe against
    * the 64× compression everywhere else. R is the second knob a
    * deployment tunes (q242's nprobe is the first); q234 prices what
    * the codes lose, this face is the standard buy-back. Both stages
    * are exact BIGINT, so the oracle replays shortlist AND refine
    * bit-for-bit. */
  def q245(s: SparkSession, d: String): DataFrame = {
    val e = embeddings(s, d)
    graft.operators.Pq.ivfAdcRerank(
        e.filter(col("vec_id") >= 10)
          .select(col("vec_id").as("cand"), col("embedding")), "cand",
        e.filter(col("vec_id").between(4, 9))
          .select(col("vec_id").as("probe"), col("embedding")), "probe",
        "embedding", pqCoarse(s, d))
      .orderBy("probe", "rk")
  }

  /** q237 iterative subword-vocabulary training (round 17, r16 verdict
    * #4 — [[graft.operators.TextPipeline.subwordTrain]]'s contract
    * face): hard-EM with greedy longest-match segmentation, the
    * deterministic variant of Kudo 2018's unigram-LM trainer in the
    * WordPiece encode style (Schuster & Nakajima 2012) — the declared
    * trade is stated in the operator doc (forward-backward EXPECTED
    * counts are float state no hash gate can replay; greedy hard-EM
    * keeps every trainer state a string or BIGINT, so the oracle
    * replays the seed → segment → prune → re-segment loop CTE by CTE,
    * the q216/q223/q224 discipline applied to a tokenizer). Contract:
    * pieces ≤ 4 chars, words ≤ 12 chars, minCount 5, 2 rounds; output
    * = the final round's exact usage table. */
  def q237(s: SparkSession, d: String): DataFrame =
    graft.operators.TextPipeline.subwordTrain(documents(s, d), "text")
      .orderBy("piece")

  /** q238 subword encode face (round 17): greedy segmentation of the
    * word universe under q237's final vocabulary
    * ([[graft.operators.TextPipeline.subwordVocab]] — multi-char rows
    * verbatim, no re-prune: greedy walks depend only on pieces picked
    * at visited positions, so this REPLAYS the final training round
    * bit-for-bit; q186's train→encode story for the subword family). */
  def q238(s: SparkSession, d: String): DataFrame = {
    val docs = documents(s, d)
    graft.operators.TextPipeline.subwordSegment(docs, "text",
        graft.operators.TextPipeline.subwordVocab(
          graft.operators.TextPipeline.subwordTrain(docs, "text")))
      .orderBy("token")
  }

  /** q239 subword fertility per language (round 17 — q193's audit for
    * the subword family): occurrence-weighted pieces/token per lang
    * under q237's vocabulary; the number that says whether the learned
    * pieces actually compress each language or just memorize the head
    * (fertility → 1 means whole words survive; → word length means
    * the vocab degenerated to characters). Token volume appears only
    * in the narrow explode feeding one (lang, token) count; the
    * fertility join is vocabulary-sized both sides (unhinted). */
  def q239(s: SparkSession, d: String): DataFrame = {
    val docs = documents(s, d)
    val seg = graft.operators.TextPipeline.subwordSegment(docs, "text",
      graft.operators.TextPipeline.subwordVocab(
        graft.operators.TextPipeline.subwordTrain(docs, "text")))
    val tl = docs.select(col("lang"),
        explode(expr(graft.operators.TextHashes.toks("text"))).as("token"))
      .filter(length(col("token")) <= 12)
      .groupBy(col("lang"), col("token")).agg(count(lit(1)).as("cnt"))
    tl.join(seg, Seq("token"))
      .groupBy(col("lang"))
      .agg(sum(col("cnt")).as("n_tokens"),
        sum(col("cnt") * col("n_pieces")).as("n_pieces"))
      .select(col("lang"), col("n_tokens"), col("n_pieces"),
        (floor(col("n_pieces") * lit(10000.0) /
          when(col("n_tokens") === 0, lit(null)).otherwise(col("n_tokens")))
          / 10000.0).as("fertility"))
      .orderBy("lang")
  }

  /** q236 sign-LSH banding-configuration audit (round 17, r16 verdict
    * #5 — q159's audit pattern for the EMBEDDING modality, q227's
    * sweep shape): measured precision/recall of sign-LSH CANDIDATE
    * generation against brute-force cosine ≥ 0.4 truth (q60's θ
    * contract) on the bounded vec_id < 300 universe (q201's), swept
    * over the [[graft.operators.Dedup.signLshAuditConfigs]] sweep
    * (eight configs) — including q60's 2×8 default as
    * the (2, 8) row, from [[graft.operators.Dedup.signLshAuditConfigs]]
    * (ONE definition feeds face and oracle). q201 pinned the 2×8
    * recall at θ≈0.3 as a single point; this face supplies the CURVE a
    * recall target can be read off. Truth pairs are audit-bounded
    * (universe², the q49/q201 discipline); candidate pairs are
    * band-bucket equi-joins, never all-pairs.
    *
    * **What the measured curve adjudicates (sf0.01, 19 true pairs,
    * 44,850 all-pairs):** 2×8 (q60's banding) recalls 0.0 at θ=0.4;
    * recall 0.47 needs 4×4 at 23% of all-pairs; recall 0.95 needs 16×4
    * at 65% of all-pairs. A ≥0.9 recall target at θ=0.4 therefore
    * costs sign-LSH its pruning — the scale-correct operator for the
    * gray zone is SemDeDup's cluster-then-threshold (q183, one cosine
    * per member), and q60's 2×8 banding is re-derived as the
    * NEAR-DUP-regime choice (θ→1 pairs agree on every sign and collide
    * in every band), its gray-zone blindness now a measured, cited
    * property instead of a surprise. */
  def q236(s: SparkSession, d: String): DataFrame = {
    val cfgs = graft.operators.Dedup.signLshAuditConfigs
    val e = embeddings(s, d).filter(col("vec_id") < 300)
      .select(col("vec_id").as("id"),
        expr("transform(embedding, x -> cast(x as double))").as("v"))
    val truth = e.toDF("a", "va")
      .join(e.toDF("b", "vb"), col("a") < col("b"))
      .filter(graft.functions.Vectors.cosine(col("va"), col("vb")) >= 0.4)
      .select(col("a"), col("b"))
      // lazy pin (round 19): the hit join and the n_true census both
      // full-scan the truth pairs — unpinned, the bounded-universe
      // cosine NLJ re-ran once per consumer
      .localCheckpoint(false)
    val bandCols: Seq[Column] = for {
      (bb, rr) <- cfgs
      j <- 0 until bb
    } yield struct(lit(bb.toLong).as("bands"), lit(rr.toLong).as("bits"),
      lit(j).as("band"),
      concat((0 until rr).map { i =>
        val dim = graft.operators.Dedup.signLshDim(bb, rr, j, i)
        when(element_at(col("v"), dim) >= 0, lit("1")).otherwise(lit("0"))
      }: _*).as("key"))
    val buckets = e.select(col("id"), explode(array(bandCols: _*)).as("bk"))
      .select(col("id"), col("bk.bands").as("bands"),
        col("bk.bits").as("bits"), col("bk.band").as("band"),
        col("bk.key").as("key"))
    val cand = buckets.toDF("a", "bands", "bits", "band", "key")
      .join(buckets.toDF("b", "bands2", "bits2", "band2", "key2"),
        col("bands") === col("bands2") && col("bits") === col("bits2") &&
          col("band") === col("band2") && col("key") === col("key2") &&
          col("a") < col("b"))
      .select(col("bands"), col("bits"), col("a"), col("b"))
      .distinct()
      // lazy pin (round 19): n_cand census + truth hit join both
      // full-scan the candidate set — unpinned, the band self-join
      // re-ran once per consumer
      .localCheckpoint(false)
    val nc = cand.groupBy(col("bands"), col("bits"))
      .agg(count(lit(1)).as("n_cand"))
    val hit = cand.join(truth, Seq("a", "b"))
      .groupBy(col("bands"), col("bits"))
      .agg(count(lit(1)).as("n_hit"))
    val tc = truth.agg(count(lit(1)).as("n_true"))
    nc.join(hit, Seq("bands", "bits"), "left")
      .crossJoin(broadcast(tc))
      .select(col("bands"), col("bits"), col("n_true"),
        col("n_cand"), coalesce(col("n_hit"), lit(0L)).as("n_hit"),
        (floor(coalesce(col("n_hit"), lit(0L)) * lit(10000.0) /
          when(col("n_cand") === 0, lit(null)).otherwise(col("n_cand")))
          / 10000.0).as("precision"),
        (floor(coalesce(col("n_hit"), lit(0L)) * lit(10000.0) /
          when(col("n_true") === 0, lit(null)).otherwise(col("n_true")))
          / 10000.0).as("recall"))
      .orderBy("bands", "bits")
  }

  /** q235 PQ search from the COMMITTED store (round 17): codebooks AND
    * codes landed under ONE versioned commit
    * ([[graft.operators.Pq.saveStore]] — the q208 torn-pair rule:
    * codes are meaningless against any other codebook generation),
    * probes served from the store with the raw vector corpus never
    * read. Oracle = q233 VERBATIM (the hash gate proves store-served
    * ADC ≡ inline train-encode-search bit-for-bit). */
  def q235(s: SparkSession, d: String): DataFrame = {
    val wh = s.conf.get("spark.sql.warehouse.dir")
    val path = s"$wh/graft_pq_store${d.replaceAll("[^A-Za-z0-9]", "_")}"
    val e = embeddings(s, d)
    graft.operators.Pq.ensureStore(s,
      e.filter(col("vec_id") >= 10)
        .select(col("vec_id").as("cand"), col("embedding")),
      "cand", "embedding", path)
    graft.operators.Pq.searchStore(s, path,
        e.filter(col("vec_id").between(4, 9))
          .select(col("vec_id").as("probe"), col("embedding")),
        "probe", "embedding")
      .orderBy("probe", "rk")
  }

  /** q243 subword segmentation from the COMMITTED store (round 18,
    * r17 verdict #5 — the q198/q208 discipline for the subword
    * family): the trained usage table AND the training geometry land
    * under one versioned commit
    * ([[graft.operators.TextPipeline.saveSubwordStore]]); the batch is
    * segmented against the committed vocabulary with the training
    * corpus never re-read. Oracle = q238 VERBATIM (the hash gate
    * proves store-served segmentation ≡ inline train→encode
    * bit-for-bit — every other trained artifact in the repo serves
    * train-once/serve-many, and the tokenizer a pipeline actually
    * deploys is the committed one). */
  def q243(s: SparkSession, d: String): DataFrame = {
    val wh = s.conf.get("spark.sql.warehouse.dir")
    val path = s"$wh/graft_subword_store${d.replaceAll("[^A-Za-z0-9]", "_")}"
    graft.operators.TextPipeline.ensureSubwordStore(s,
      documents(s, d), "text", path)
    graft.operators.TextPipeline.subwordServe(s, path,
        documents(s, d), "text")
      .orderBy("token")
  }

  /** q244 cross-document substring removal from the COMMITTED gate
    * (round 18, r17 verdict #6 — ExactSubstr's deploy shape, the
    * q202→q211 convention applied to q230): the duplicated-gram keeper
    * gate commits once ([[graft.operators.Dedup.saveSubstrStore]],
    * minRun pinned in the artifact); every batch cleans against the
    * COMMITTED gate — CCNet's clean-new-data-against-a-reference
    * stance, replay-deterministic in the streaming face
    * (`substrServeStream`). Oracle = q230 VERBATIM (serving the corpus
    * against its own gate replays the inline removal bit-for-bit);
    * serve-only shuffle ≤ inline is plan-pinned in DedupSpec. */
  def q244(s: SparkSession, d: String): DataFrame = {
    val wh = s.conf.get("spark.sql.warehouse.dir")
    val path = s"$wh/graft_substr_store${d.replaceAll("[^A-Za-z0-9]", "_")}"
    graft.operators.Dedup.ensureSubstrStore(s,
      documents(s, d), "doc_id", "text", path)
    graft.operators.Dedup.substrServe(s, path, documents(s, d),
        "doc_id", "text")
      .select("doc_id", "n_toks", "n_removed", "n_runs", "clean_sig")
      .orderBy("doc_id")
  }

  /** q246 IVFADC+R from the COMMITTED store (round 19, r18 verdict #2
    * — the q245 deploy shape made a committed-store face, the
    * q240→q241 convention): ONE versioned commit lands coarse +
    * residual codebooks + list-partitioned packed codes + the
    * QUANTIZED source vectors id-clustered for point lookups
    * ([[graft.operators.Pq.saveIvfAdcStore]] `withVectors = true`);
    * the serve takes its R = 10 shortlist from the partition-pruned
    * codes and refines against the committed vectors — the raw corpus
    * is never re-read (trust-mode serves it against a deleted corpus,
    * `StoresTrustSpec`'s stance). Oracle = q245 VERBATIM (the hash
    * gate proves store-served shortlist+refine ≡ inline
    * bit-for-bit). */
  def q246(s: SparkSession, d: String): DataFrame = {
    val wh = s.conf.get("spark.sql.warehouse.dir")
    val path = s"$wh/graft_ivfadcr_store${d.replaceAll("[^A-Za-z0-9]", "_")}"
    val e = embeddings(s, d)
    graft.operators.Pq.ensureIvfAdcStore(s,
      e.filter(col("vec_id") >= 10)
        .select(col("vec_id").as("cand"), col("embedding")),
      "cand", "embedding", pqCoarse(s, d), path, withVectors = true)
    graft.operators.Pq.searchIvfAdcStoreRerank(s, path,
        e.filter(col("vec_id").between(4, 9))
          .select(col("vec_id").as("probe"), col("embedding")),
        "probe", "embedding")
      .orderBy("probe", "rk")
  }

  /** q247 IVFADC+R recall-vs-R sensitivity audit (round 19, r18
    * verdict #5 — q242's one-frame sweep trick applied to the SECOND
    * deployment knob): q245's geometry (8 pinned coarse pivots,
    * nprobe = 2) shortlists and refines ONCE at maxShortlist = 20
    * ([[graft.operators.Pq.ivfAdcRerankCandidates]] carries each
    * refined pair's shortlist rank `srk`), and every
    * R ∈ {3, 5, 10, 20} row is a FILTER `srk <= R` + re-rank over
    * that one frame — never a re-search, never a re-refine. Graded
    * against the engine-exact quantized full-vector top-3 (q234's
    * truth): `n_refine` prices the refine work R buys, `recall` what
    * it buys back — the measured curve for the knob q245 fixes at 10.
    * At R = 20 ≥ the probed share the curve hits the nprobe = 2
    * ceiling: past that, nprobe (q242's knob) is the binding one.
    * Exact BIGINT both stages; the oracle replays shortlist, refine,
    * sweep, and truth. */
  def q247(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val e = embeddings(s, d)
    val cands = e.filter(col("vec_id") >= 10)
      .select(col("vec_id").as("cand"), col("embedding"))
    val probes = e.filter(col("vec_id").between(4, 9))
      .select(col("vec_id").as("probe"), col("embedding"))
    // the refined frame feeds BOTH the refine-mass census and the
    // per-R ranking (q185's sibling-consumer rule)
    val rf = graft.operators.Pq.ivfAdcRerankCandidates(cands, "cand",
        probes, "probe", "embedding", pqCoarse(s, d), maxShortlist = 20)
      .localCheckpoint(false) // lazy pin (round 19): all consumers full-scan
    val sw = rf.crossJoin(
        broadcast(s.range(1).select(explode(expr("array(3, 5, 10, 20)"))
          .as("r"))))
      .filter(col("srk") <= col("r"))
    val w = Window.partitionBy(col("r"), col("probe"))
      .orderBy(col("dist").asc, col("cand").asc)
    val top3 = sw
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
      .select(col("r"), col("probe"), col("cand"))
    def quant(c: String) = expr(
      s"transform($c, x -> cast(floor(cast(x as double) * 1000) as bigint))")
    val wx = Window.partitionBy(col("probe"))
      .orderBy(col("dist").asc, col("cand").asc)
    val exact = probes.select(col("probe"), quant("embedding").as("qp"))
      .crossJoin(cands.select(col("cand"), quant("embedding").as("qc")))
      .select(col("probe"), col("cand"), expr(
        "aggregate(zip_with(qp, qc, (a, b) -> (a - b) * (a - b)), 0L, (acc, x) -> acc + x)")
        .as("dist"))
      .withColumn("rk", row_number().over(wx))
      .filter(col("rk") <= 3)
      .select(col("probe"), col("cand"))
      .localCheckpoint(false) // n_true + the hit join (sibling consumers; lazy pin r19)
    val nTrue = exact.agg(count(lit(1)).as("n_true"))
    val mass = sw.groupBy(col("r"))
      .agg(count(lit(1)).as("n_refine"))
    val hits = top3.join(exact, Seq("probe", "cand"))
      .groupBy(col("r")).agg(count(lit(1)).as("n_hit"))
    mass.join(hits, Seq("r"), "left")
      .crossJoin(broadcast(nTrue))
      .select(col("r").cast("long").as("r"), col("n_refine"),
        coalesce(col("n_hit"), lit(0L)).as("n_hit"),
        (floor(coalesce(col("n_hit"), lit(0L)) * lit(10000.0) /
          when(col("n_true") === 0, lit(null)).otherwise(col("n_true")))
          / 10000.0).as("recall"))
      .orderBy("r")
  }

  /** q248 substring removal from the GRAM-BUCKETED gate (round 19,
    * r18 verdict #1 — the q244 scale note made real, q212's
    * winnow-index discipline for this family): the duplicated-gram
    * keeper gate lands as a gram-BUCKETED catalog table
    * ([[graft.operators.Dedup.saveSubstrGateBucketed]], minRun pinned
    * in the params companion), so a standing serve's cover join runs
    * on the store's bucket partitioning and exchanges ONLY the batch
    * side — on a dup-heavy corpus whose gate is past broadcast range,
    * the layout that deletes the per-batch gate re-shuffle
    * (plan-pinned in `PlanContractSpec`; q244's path store remains the
    * modest-gate/object-store shape). Oracle = q230 VERBATIM (the hash
    * gate proves the layout is invisible to semantics — serving the
    * corpus against its own bucketed gate replays the inline removal
    * bit-for-bit; `DedupSpec` additionally pins parity between the
    * two store layouts). */
  def q248(s: SparkSession, d: String): DataFrame = {
    val table = s"graft_substr_gate${d.replaceAll("[^A-Za-z0-9]", "_")}"
    graft.operators.Dedup.ensureSubstrGateBucketed(s,
      documents(s, d), "doc_id", "text", table)
    graft.operators.Dedup.substrServeBucketed(s, table,
        documents(s, d), "doc_id", "text")
      .select("doc_id", "n_toks", "n_removed", "n_runs", "clean_sig")
      .orderBy("doc_id")
  }
}
