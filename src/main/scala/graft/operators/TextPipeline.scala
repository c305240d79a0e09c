package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-preparation operators for training-data pipelines (builder
  * mandate, SURVEY §2.5 C3 expanded): the per-document transforms that
  * run over every row of a 100-TB corpus before tokenization/training.
  * All are NARROW — pure codegen'd expression chains, no UDFs, no
  * shuffles except where an aggregation is the semantics (vocabulary).
  * Every hash is portable md5 so each operator is DuckDB-verifiable.
  */
object TextPipeline {

  /** Canonical text normalization: lowercase, strip non-alphanumerics
    * (keeping spaces), collapse whitespace runs, trim. The standard
    * pre-tokenization cleanup; deterministic and idempotent. */
  def normalize(text: Column): Column =
    trim(regexp_replace(
      regexp_replace(lower(text), "[^a-z0-9 ]", " "), " +", " "))

  /** Chunk a document into token windows of `size` with `overlap`
    * tokens shared between consecutive chunks (stride = size−overlap) —
    * the context-window preparation step. One output row per chunk:
    * (id, chunk_idx, chunk_text, n_tokens); any non-empty doc yields at
    * least one chunk. Narrow: tokenization, window arithmetic, and
    * slicing are array expressions; the explode is single-level (see
    * PipelineQueries.q47 on why that matters). */
  def chunk(corpus: DataFrame, idCol: String, textCol: String,
            size: Int, overlap: Int): DataFrame = {
    require(size > overlap && overlap >= 0, "need 0 <= overlap < size")
    val stride = size - overlap
    corpus
      .select(col(idCol),
        expr(TextHashes.toks(textCol)).as("toks"))
      .filter(org.apache.spark.sql.functions.size(col("toks")) > 0)
      .select(col(idCol),
        org.apache.spark.sql.functions.size(col("toks")).cast("long")
          .as("__n"),
        posexplode(expr(
          s"""transform(
             |  sequence(0, greatest(ceil((size(toks) - $overlap) / $stride), 1) - 1),
             |  i -> array_join(slice(toks, cast(i as int) * $stride + 1, $size), ' '))"""
            .stripMargin)))
      .select(col(idCol), col("pos").cast("long").as("chunk_idx"),
        col("col").as("chunk_text"), col("__n").as("n_tokens"))
  }

  /** Remove stopwords, preserving original token order. Returns the
    * filtered text plus the surviving token count. */
  def removeStopwords(corpus: DataFrame, idCol: String, textCol: String,
                      stopwords: Seq[String]): DataFrame = {
    val stopArr = array(stopwords.map(lit): _*)
    corpus.select(col(idCol),
        filter(expr(TextHashes.toks(textCol)),
          t => !array_contains(stopArr, t)).as("__kept"))
      .select(col(idCol), array_join(col("__kept"), " ").as(textCol),
        org.apache.spark.sql.functions.size(col("__kept")).cast("long")
          .as("n_kept"))
  }

  /** Corpus vocabulary by document frequency: token → number of distinct
    * documents containing it. The one genuinely aggregating op here —
    * the per-doc `array_distinct` happens BEFORE the explode, so the
    * aggregation is a plain count and the exchange carries |vocab|
    * partial counts, not |token occurrences|. */
  def vocabulary(corpus: DataFrame, idCol: String, textCol: String): DataFrame =
    corpus.select(col(idCol),
        explode(expr(s"array_distinct(${TextHashes.toks(textCol)})"))
          .as("token"))
      .groupBy(col("token"))
      .agg(count(lit(1)).as("df"))

  /** Deterministic train/val/test split on a portable content-free hash
    * of the id (first md5 nibble: 0–12 train, 13–14 val, 15 test ≈
    * 81/12.5/6%). Reproducible across engines and runs — the property a
    * corpus split must have. */
  def hashSplit(corpus: DataFrame, idCol: String): DataFrame = {
    val nib = expr(
      s"instr('0123456789abcdef', substr(md5(cast($idCol as string)), 1, 1)) - 1")
    corpus.withColumn("split",
      when(nib <= 12, lit("train"))
        .when(nib <= 14, lit("val"))
        .otherwise(lit("test")))
  }
}
