package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-level deduplication API (builder mandate: the operators a
  * training-data pipeline calls, not just their verification queries).
  * Each function takes a corpus and returns the corpus with duplicates
  * removed — smallest id wins, matching the q41/q46 query semantics.
  *
  * Scale design: no operator materializes an O(n²) pair set. Exact dedup
  * is one hash aggregation; MinHash-LSH generates candidate pairs via an
  * equi-join on band keys (only same-bucket docs ever meet); SimHash
  * prunes through bucket prefixes. Dominated-doc removal is a left-anti
  * join — one shuffle on the id.
  */
object Dedup {

  /** Exact dedup on normalized content: keep the smallest id per
    * md5(lower(trim(text))) digest (q41's operator face). */
  def exact(corpus: DataFrame, idCol: String, textCol: String): DataFrame = {
    val keep = corpus
      .groupBy(md5(lower(trim(col(textCol)))).as("__h"))
      .agg(min(col(idCol)).as(idCol))
      .select(idCol)
    corpus.join(keep, idCol)
  }

  /** MinHash-LSH near-dedup, two-stage (the standard production shape):
    *
    *  1. **Candidates** — docs sharing any of `bands` LSH band keys (each
    *     the concat of `rowsPerBand` salted min-hashes over word 3-gram
    *     shingles). Generated per band bucket, so the corpus never
    *     self-joins globally.
    *  2. **Verification** — true shingle-set Jaccard is computed for the
    *     candidate pairs only; a doc is dropped iff a smaller-id candidate
    *     partner has Jaccard ≥ `threshold`. LSH recall errs toward extra
    *     candidates; verification removes the false positives.
    *
    * Docs with <3 tokens have no shingles and are always kept. */
  def minhashLsh(corpus: DataFrame, idCol: String, textCol: String,
                 threshold: Double = 0.8,
                 bands: Int = 4, rowsPerBand: Int = 2): DataFrame = {
    val numHashes = bands * rowsPerBand
    val shAll = corpus.select(col(idCol).as("__id"),
        expr(s"filter(split(trim($textCol), ' '), x -> x != '')").as("toks"))
      .filter(size(col("toks")) >= 3)
      .select(col("__id"), explode(expr(
        """transform(sequence(1, size(toks)-2),
          |  i -> concat(element_at(toks,i),' ',element_at(toks,i+1),' ',element_at(toks,i+2)))"""
          .stripMargin)).as("s"))
    val sh = shAll.distinct() // set semantics for the Jaccard stage
    val mins = (0 until numHashes).map(j =>
      min(md5(concat(lit(s"$j:"), col("s")))).as(s"m$j"))
    val sigs = shAll.groupBy(col("__id")).agg(mins.head, mins.tail: _*)
    val bandCols = (0 until bands).map(b =>
      struct(lit(b).as("band"),
        concat((0 until rowsPerBand).map(r => col(s"m${b * rowsPerBand + r}")): _*)
          .as("key")).as(s"b$b"))
    val buckets = sigs.select(col("__id"),
        explode(array(bandCols: _*)).as("bk"))
      .select(col("__id"), col("bk.band").as("band"), col("bk.key").as("key"))
    // stage 1: candidate pairs from shared buckets (a < b)
    val cand = buckets.toDF("a", "band", "key")
      .join(buckets.toDF("b", "band2", "key2"),
        col("band") === col("band2") && col("key") === col("key2") &&
          col("a") < col("b"))
      .select(col("a"), col("b")).distinct()
    // stage 2: true Jaccard on candidates only
    val cnt = sh.groupBy(col("__id")).agg(count(lit(1)).as("n"))
    val shared = cand
      .join(sh.toDF("a", "s"), "a")
      .join(sh.toDF("b", "s2"), Seq("b"))
      .filter(col("s") === col("s2"))
      .groupBy(col("a"), col("b")).agg(count(lit(1)).as("inter"))
    val dominated = shared
      .join(broadcast(cnt.toDF("a", "na")), "a")
      .join(broadcast(cnt.toDF("b", "nb")), "b")
      .filter(col("inter") / (col("na") + col("nb") - col("inter")) >= threshold)
      .select(col("b").as("__id")).distinct()
    corpus.join(dominated.withColumnRenamed("__id", idCol), Seq(idCol), "left_anti")
  }

  /** SimHash near-dedup: 16-bit signatures over distinct tokens; docs
    * whose signatures collide exactly (Hamming 0 — the conservative
    * bucket) dedup to the smallest id. Raising `prefixBits` below 16
    * trades precision for recall by bucketing on a signature prefix. */
  def simhash(corpus: DataFrame, idCol: String, textCol: String,
              prefixBits: Int = 16): DataFrame = {
    require(prefixBits >= 1 && prefixBits <= 16)
    val tok = corpus.select(col(idCol).as("__id"),
        explode(expr(s"filter(split(trim($textCol), ' '), x -> x != '')")).as("tok"))
      .distinct()
    def nib(i: Int) = s"(instr('0123456789abcdef', substr(md5(tok),$i,1)) - 1)"
    val hv = s"(${nib(1)}*4096 + ${nib(2)}*256 + ${nib(3)}*16 + ${nib(4)})"
    val withHv = tok.withColumn("hv", expr(hv))
    val bitSums = (0 until 16).map(b =>
      sum(when(expr(s"(hv div ${1 << b}) % 2") === 1, 1).otherwise(-1)).as(s"s$b"))
    val sig = (16 - prefixBits until 16).map(b =>
      when(col(s"s$b") > 0, lit(1L << b)).otherwise(lit(0L))).reduce(_ + _)
    val sigs = withHv.groupBy(col("__id"))
      .agg(bitSums.head, bitSums.tail: _*)
      .select(col("__id"), sig.as("__sig"))
    val dominated = sigs
      .withColumn("__min", min(col("__id"))
        .over(org.apache.spark.sql.expressions.Window.partitionBy("__sig")))
      .filter(col("__id") > col("__min"))
      .select(col("__id"))
    corpus.join(dominated.withColumnRenamed("__id", idCol), Seq(idCol), "left_anti")
  }

  /** Embedding near-dedup: within sign-LSH buckets (the q54 structure),
    * drop any vector whose cosine to a smaller-id same-bucket vector is
    * ≥ `threshold`. Bucket dims spread probes across 2^dims.length
    * buckets, so the pair join is per-bucket, never global. */
  def embeddingCosine(corpus: DataFrame, idCol: String, vecCol: String,
                      threshold: Double,
                      bucketDims: Seq[Int] = Seq(1, 17, 33, 49)): DataFrame = {
    val bucket = concat(bucketDims.map(i =>
      when(element_at(col(vecCol), i).cast("double") >= 0, lit("1"))
        .otherwise(lit("0"))): _*)
    val e = corpus.select(col(idCol).as("__id"),
      expr(s"transform($vecCol, x -> cast(x as double))").as("__v"),
      bucket.as("__b"))
    val sim = graft.functions.Vectors.cosine(col("__va"), col("__vb"))
    val dominated = e.toDF("__a", "__va", "__ba")
      .join(e.toDF("__b2", "__vb", "__bb"),
        col("__ba") === col("__bb") && col("__a") < col("__b2"))
      .filter(sim >= threshold)
      .select(col("__b2").as("__id")).distinct()
    corpus.join(dominated.withColumnRenamed("__id", idCol), Seq(idCol), "left_anti")
  }
}
