package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
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

  /** Non-empty whitespace tokens per document (the reference's text unit —
    * its CSV rows carry whitespace-delimited titles; cf. C3 tokenize,
    * SURVEY §2.5). */
  private def tokens(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      expr("filter(split(trim(text), ' '), x -> x != '')").as("toks"))

  /** Word 3-gram shingles per document — the unit of all shingle-based
    * dedup (MinHash/Jaccard/fingerprint). `dedup=true` gives set semantics
    * (needed when counting intersections); min-based consumers (MinHash)
    * skip the extra distinct shuffle since min(multiset) == min(set). */
  private def shingles(docs: DataFrame, dedup: Boolean = true): DataFrame = {
    val exploded = tokens(docs).filter(size(col("toks")) >= 3)
      .select(col("doc_id"), explode(expr(
        """transform(sequence(1, size(toks)-2),
          |  i -> concat(element_at(toks,i),' ',element_at(toks,i+1),' ',element_at(toks,i+2)))"""
          .stripMargin)).as("s"))
    if (dedup) exploded.distinct() else exploded
  }

  /** q46 MinHash signatures + LSH band keys (8 salted md5 min-hashes,
    * 4 bands × 2 rows). Documents sharing any band key are near-dup
    * candidates; at scale dedup is a self-join on the band columns. */
  def q46(s: SparkSession, d: String): DataFrame = {
    // dedup=false: min-hash is invariant to duplicate shingles, so the
    // distinct() exchange would be a wasted shuffle.
    val sh = shingles(documents(s, d).filter(col("doc_id") < 100), dedup = false)
    val mins = (0 until 8).map(j =>
      min(md5(concat(lit(s"$j:"), col("s")))).as(s"m$j"))
    sh.groupBy(col("doc_id"))
      .agg(mins.head, mins.tail: _*)
      .select(col("doc_id"),
        concat(col("m0"), col("m1")).as("band0"),
        concat(col("m2"), col("m3")).as("band1"),
        concat(col("m4"), col("m5")).as("band2"),
        concat(col("m6"), col("m7")).as("band3"))
      .orderBy("doc_id")
  }

  /** q47 n-gram Jaccard near-dup: top-20 most-similar document pairs by
    * 3-gram shingle Jaccard. The pair generation is an equi-join on the
    * shingle (inverted-index join), not a cross join. */
  def q47(s: SparkSession, d: String): DataFrame = {
    val sh = shingles(documents(s, d).filter(col("doc_id") < 60))
    val cnt = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val inter = sh.toDF("a", "s")
      .join(sh.toDF("b", "s2"), col("s") === col("s2") && col("a") < col("b"))
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
    * Near-dup = small Hamming distance between signatures. */
  def q48(s: SparkSession, d: String): DataFrame = {
    val tok = tokens(documents(s, d).filter(col("doc_id") < 100))
      .select(col("doc_id"), explode(col("toks")).as("tok"))
      .distinct()
    val nib = (i: Int) => s"(instr('0123456789abcdef', substr(md5(tok),$i,1)) - 1)"
    val hv = s"(${nib(1)}*4096 + ${nib(2)}*256 + ${nib(3)}*16 + ${nib(4)})"
    val withHv = tok.withColumn("hv", expr(hv))
    val bitSums = (0 until 16).map(b =>
      sum(when(expr(s"(hv div ${1 << b}) % 2") === 1, 1).otherwise(-1)).as(s"s$b"))
    val sig = (0 until 16).map(b =>
      when(col(s"s$b") > 0, lit(1L << b)).otherwise(lit(0L)))
      .reduce(_ + _)
    withHv.groupBy(col("doc_id"))
      .agg(bitSums.head, bitSums.tail: _*)
      .select(col("doc_id"), sig.cast("long").as("simhash"))
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
  def q53(s: SparkSession, d: String): DataFrame = {
    val sel = substring(md5(col("s")), 32, 1) === "0"
    shingles(documents(s, d).filter(col("doc_id") < 100))
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_shingles"),
        count(when(sel, lit(1))).as("n_sel"),
        min(when(sel, md5(col("s")))).as("fp_min"))
      .orderBy("doc_id")
  }

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
    graft.operators.Dedup.minhashLsh(
        documents(s, d).filter(col("doc_id") < 100).select("doc_id", "text"),
        "doc_id", "text", threshold = 0.8)
      .select("doc_id")
      .orderBy("doc_id")

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
}
