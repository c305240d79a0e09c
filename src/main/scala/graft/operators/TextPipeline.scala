package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
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

  /** The encoding id order: token ids 1..|vocab| by document frequency
    * (ties alphabetical), so the mapping is deterministic and the most
    * common tokens get the smallest ids (the usual convention). Input:
    * a (token, df) frame like [[vocabulary]]'s output. The ranking is
    * [[Ranking.exactRowNumber]] — a range-partitioned parallel rank,
    * never a single-task global-order window, even when the vocabulary
    * itself is large (web-scale corpora reach 10⁸+ distinct tokens). */
  private def rankVocab(v: DataFrame): DataFrame =
    Ranking.exactRowNumber(
        v.withColumn("__negdf", -col("df")), Seq("__negdf", "token"),
        rankCol = "tok_id")
      .drop("__negdf")

  /** Build and rank the encoding vocabulary of a corpus: (token, df,
    * tok_id) with ids assigned by [[rankVocab]]'s order. PERSIST this
    * frame and pass it to the vocabulary-taking [[encode]] overload to
    * keep token ids stable while the corpus grows — re-deriving the
    * vocabulary per increment reshuffles ids whenever frequencies
    * cross (the training-input stability requirement). */
  def rankedVocabulary(corpus: DataFrame, idCol: String,
                       textCol: String): DataFrame =
    rankVocab(vocabulary(corpus, idCol, textCol))

  /** Token-id encoding: map each document's token sequence to vocab ids
    * (the final text→training-input step). This overload derives the
    * vocabulary from the corpus itself ([[rankedVocabulary]]'s order);
    * `unkId` then only labels padding. Output: (idCol, ids array<long>)
    * plus `ids_padded` truncated/padded to `maxLen` when maxLen > 0.
    *
    * Scale shape: tokenization is narrow; the vocabulary aggregation's
    * exchange carries |vocab| (per-doc distinct before explode, like
    * [[vocabulary]]); id ranking is the distributed [[rankVocab]];
    * re-assembly is one (id)-keyed aggregation with order restored by
    * sort_array on (pos, id) structs — no order-dependent collect_list
    * assumption. */
  def encode(corpus: DataFrame, idCol: String, textCol: String,
             maxLen: Int = 0, unkId: Long = 0L): DataFrame = {
    val toks = tokenized(corpus, idCol, textCol)
    val tok = exploded(toks, idCol)
    // vocabulary from the SAME token frame (one tokenization pass)
    val vocab = rankVocab(tok.select(col(idCol), col("__token")).distinct()
      .groupBy(col("__token").as("token")).agg(count(lit(1)).as("df")))
    assemble(toks, tok, vocab, idCol, maxLen, unkId)
  }

  /** [[encode]] against a PERSISTED vocabulary — the incremental-corpus
    * form: `vocab` is a (token, tok_id) frame (extra columns ignored),
    * normally a stored [[rankedVocabulary]] result. Token ids are
    * whatever the vocabulary says — stable across corpus increments and
    * engine runs; tokens absent from the vocabulary encode as `unkId`
    * (the OOV semantics the 2-arg form cannot reach, since its derived
    * vocabulary covers every token). */
  def encode(corpus: DataFrame, idCol: String, textCol: String,
             vocab: DataFrame, maxLen: Int, unkId: Long): DataFrame = {
    val toks = tokenized(corpus, idCol, textCol)
    assemble(toks, exploded(toks, idCol),
      vocab.select(col("token"), col("tok_id").cast("long")),
      idCol, maxLen, unkId)
  }

  /** [[encode]] against a persisted vocabulary, no padding, unkId 0. */
  def encode(corpus: DataFrame, idCol: String, textCol: String,
             vocab: DataFrame): DataFrame =
    encode(corpus, idCol, textCol, vocab, 0, 0L)

  private def tokenized(corpus: DataFrame, idCol: String,
                        textCol: String): DataFrame =
    corpus.select(col(idCol), expr(TextHashes.toks(textCol)).as("__toks"))

  private def exploded(toks: DataFrame, idCol: String): DataFrame =
    toks.select(col(idCol), posexplode(col("__toks")).as(Seq("__pos", "__token")))

  /** Shared encode tail: join tokens to the vocabulary (OOV → `unkId`),
    * reassemble per-document id sequences, re-attach token-less docs
    * (they produce no posexplode rows and would vanish from the groupBy)
    * so the output stays row-complete, then pad. */
  private def assemble(toks: DataFrame, tok: DataFrame, vocab: DataFrame,
                       idCol: String, maxLen: Int, unkId: Long): DataFrame = {
    val nonEmpty = tok
      .join(vocab.select(col("token").as("__token"), col("tok_id").as("__tok_id")),
        Seq("__token"), "left")
      .groupBy(col(idCol))
      .agg(sort_array(collect_list(struct(col("__pos").as("p"),
        coalesce(col("__tok_id"), lit(unkId)).as("id")))).as("__ps"))
      .select(col(idCol), expr("transform(__ps, x -> x.id)").as("ids"))
    val enc = toks.select(col(idCol))
      .join(nonEmpty, Seq(idCol), "left")
      .withColumn("ids",
        coalesce(col("ids"), expr("cast(array() as array<bigint>)")))
    if (maxLen <= 0) enc
    else enc.withColumn("ids_padded",
      expr(s"concat(slice(ids, 1, $maxLen), " +
        s"array_repeat(${unkId}L, greatest(0, $maxLen - size(ids))))"))
  }

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

  /** Keep the FIRST occurrence of each distinct span in a span array,
    * preserving order — the core of C4's intra-document line dedup
    * (Raffel et al. 2020, arXiv:1910.10683 §2.2: "we discarded all but
    * one of any three-sentence span occurring more than once"; the
    * exact-unit form here is the deployed common case). Pure per-row
    * HOF — for each position, membership in the strictly-earlier
    * prefix decides — zero exchanges, embarrassingly parallel (q173's
    * discipline). O(L²) equality checks per document over span COUNT
    * L, which is tokens/span_len — cheap even for book-length docs. */
  def dedupSpanList(spans: Column): Column =
    filter(spans, (x, i) =>
      array_position(slice(spans, lit(1), i), x) === 0L)

  /** Intra-document repeated-span REMOVAL (round 14; the transform
    * whose EFFECT q109's repetition metrics measure): split `text` on
    * `delim`, drop every span that already occurred earlier in the
    * same document, re-join with `delim`.
    *
    * Idempotent by construction: the output's spans are pairwise
    * distinct AND the output re-splits on `delim` into exactly those
    * spans (unit boundaries are intrinsic to the text, not positional),
    * so a second pass keeps everything — clean(clean(x)) == clean(x).
    * That property is why the unit is a delimiter-separated span and
    * not a sliding n-gram window: removing one overlapping window
    * splices new windows into existence and the rule never closes. */
  def dedupSpans(text: Column, delim: String): Column =
    array_join(
      dedupSpanList(split(text, java.util.regex.Pattern.quote(delim))),
      delim)

  /** Boundary-delimited BPE symbol string for one word: `"__"` between
    * and around every symbol (`batch` → `__b__a__t__c__h__`). The
    * double boundary makes greedy merge application a plain string
    * `replace`: pattern `_l__r_` → `_lr_` consumes one boundary char
    * from each side, so adjacent matches in a run (`__a__a__a__a__`)
    * still each see a full leading `_` — exactly BPE's leftmost-
    * non-overlapping rule — while a symbol PREFIX or SUFFIX can never
    * false-match (`l` is preceded by `_` and followed by `__` in the
    * pattern; symbol interiors never touch boundary chars). Requires
    * `'_' `-free symbols — [[bpeTrain]] filters such tokens out. */
  private def bpeDelimited(wordRef: String): String =
    s"concat('__', array_join(transform(sequence(1, length($wordRef)), " +
      s"i -> substring($wordRef, i, 1)), '__'), '__')"

  /** Distributed byte-pair-encoding vocabulary training (round 14;
    * Sennrich et al. 2016, arXiv:1508.07909, over Gage 1994's pair
    * compression): K merge rounds, each ONE vocabulary-bounded
    * aggregate. Returns the merge table — (step, lhs, rhs, freq),
    * `freq` the corpus-weighted adjacent-pair count at merge time;
    * ties break by pair lexicographic (lhs, rhs), both faces.
    *
    * 100-TB posture: the CORPUS is touched exactly once (the word-count
    * aggregate — partial-agg'd, exchange carries |vocab| rows per
    * partition). Every merge round then runs over the distinct-word
    * frame: the pair-count exchange carries at most |vocab|·max_word_len
    * (symbol pairs of distinct words, partial-aggregated), the argmax is
    * a 1-row TakeOrdered, and the merge application is a broadcast of
    * that 1 row — never a corpus pass, never a collect of data. Each
    * round's symbol frame is localCheckpoint-pinned (vocab-sized) so the
    * K-deep lineage doesn't re-derive exponentially.
    *
    * Tokens containing the boundary char `'_'` are filtered out
    * (deterministically, documented): callers with underscored tokens
    * pre-map them. */
  def bpeTrain(corpus: DataFrame, idCol: String, textCol: String,
               merges: Int): DataFrame = {
    require(merges >= 1, s"need merges >= 1, got $merges")
    val words = corpus
      .select(explode(expr(TextHashes.toks(textCol))).as("w"))
      .filter(!col("w").contains("_"))
      .groupBy(col("w")).agg(count(lit(1)).as("cnt"))
    // Round-19 job-count rewrite (guide §1.2/§5 — the winning pair is
    // ONE ROW of driver metadata, not a distributed frame): each round
    // previously ran an eager 1-row checkpoint job, an isEmpty action,
    // a broadcast build of that row, and an eager vocab re-checkpoint
    // — profiled at sf0.1 as q199's 57-job / 2.7 s-of-planning-gaps
    // trace. Now each round is ONE TakeOrdered collect (the best
    // pair), the merge applies as a LITERAL replace (bpeSegment's
    // idiom — same expression, same escaping), the symbol frame is
    // LAZILY pinned (materialized by the next round's collect, no
    // separate job), and the merge table lands as a local relation.
    // Values bit-identical: same aggregates, same (freq desc, lhs,
    // rhs) tie rule, same replace semantics.
    val spark = corpus.sparkSession
    var syms = words
      .select(col("w"), col("cnt"), expr(bpeDelimited("w")).as("s"))
      .localCheckpoint(false)
    val bests =
      scala.collection.mutable.ArrayBuffer.empty[org.apache.spark.sql.Row]
    var r = 1
    var exhausted = false
    while (r <= merges && !exhausted) {
      val pairs = syms
        .select(col("cnt"),
          expr("filter(split(s, '__'), x -> x != '')").as("sy"))
        .filter(expr("size(sy) >= 2"))
        .select(col("cnt"), col("sy"),
          explode(expr("sequence(1, size(sy) - 1)")).as("i"))
        .select(col("cnt"), expr("element_at(sy, i)").as("lhs"),
          expr("element_at(sy, i + 1)").as("rhs"))
        .groupBy(col("lhs"), col("rhs")).agg(sum(col("cnt")).as("freq"))
      val bestRows = pairs
        .orderBy(col("freq").desc, col("lhs").asc, col("rhs").asc)
        .limit(1).collect()
      if (bestRows.isEmpty) exhausted = true // every word fully merged
      else {
        val b = bestRows(0)
        bests += org.apache.spark.sql.Row(
          r.toLong, b.getString(0), b.getString(1), b.getLong(2))
        if (r < merges) {
          def q(v: String) = v.replace("'", "''")
          val l = q(b.getString(0)); val rr = q(b.getString(1))
          syms = syms
            .select(col("w"), col("cnt"),
              expr(s"replace(s, '_${l}__${rr}_', '_$l${rr}_')").as("s"))
            .localCheckpoint(false)
        }
      }
      r += 1
    }
    require(bests.nonEmpty,
      "bpeTrain: corpus yields no adjacent symbol pairs (empty corpus " +
        "or single-char vocabulary)")
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("step",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("lhs",
        org.apache.spark.sql.types.StringType, nullable = true),
      org.apache.spark.sql.types.StructField("rhs",
        org.apache.spark.sql.types.StringType, nullable = true),
      org.apache.spark.sql.types.StructField("freq",
        org.apache.spark.sql.types.LongType, nullable = true)))
    spark.createDataFrame(
        java.util.Arrays.asList(bests.toSeq: _*), schema)
      .orderBy(col("step"))
  }

  /** Apply a learned merge table: one row per distinct `'_'`-free token
    * with its BPE symbol sequence (`symbols` array, merge steps applied
    * in order). The merge table is K rows — driver metadata — so the
    * application is a narrow per-row replace chain; concatenating
    * `symbols` always round-trips to the original token (merges only
    * ever JOIN adjacent symbols). */
  def bpeSegment(corpus: DataFrame, idCol: String, textCol: String,
                 mergeTable: DataFrame): DataFrame = {
    val ms = mergeTable.orderBy(col("step")).collect() // K rows: metadata
    var s = corpus
      .select(explode(expr(TextHashes.toks(textCol))).as("token"))
      .filter(!col("token").contains("_"))
      .distinct()
      .select(col("token"), expr(bpeDelimited("token")).as("__s"))
    ms.foreach { m =>
      def q(v: String) = v.replace("'", "''")
      val l = q(m.getAs[String]("lhs")); val rr = q(m.getAs[String]("rhs"))
      s = s.withColumn("__s",
        expr(s"replace(__s, '_${l}__${rr}_', '_$l${rr}_')"))
    }
    s.select(col("token"),
      expr("filter(split(__s, '__'), x -> x != '')").as("symbols"))
  }

  /** Subword id table for a learned merge table — the TRAINER-facing
    * vocabulary (round 15, r14 verdict #3): ids 1..A for the training
    * corpus's alphabet (distinct single characters of `'_'`-free
    * tokens, ranked lexicographically), A+step for each merge's joined
    * symbol — the standard BPE id scheme (Sennrich et al. 2016
    * arXiv:1508.07909: base alphabet then merge order). A merged
    * string that collides with an earlier entry keeps the SMALLEST id
    * (min over the union), so the table is a function of symbol.
    *
    * STABILITY is the contract: ids derive from the TRAINING corpus
    * and the merge table alone — encode a disjoint increment (q101's
    * membership-stability discipline) and every known symbol keeps its
    * id; unknown symbols (characters outside the training alphabet)
    * encode as 0 downstream. Scale shape: the alphabet frame is
    * charset-bounded (metadata-sized — its global rank window is over
    * ≤ a few hundred rows, q192's bounded-enum precedent), the merge
    * table is K rows; nothing here is corpus-sized except the one
    * distinct-chars aggregate, whose exchange is alphabet-bounded by
    * partial aggregation. Returns (symbol, sym_id). */
  def bpeVocab(trainCorpus: DataFrame, idCol: String, textCol: String,
               mergeTable: DataFrame): DataFrame = {
    val chars = trainCorpus
      .select(explode(expr(TextHashes.toks(textCol))).as("w"))
      .filter(!col("w").contains("_"))
      .select(explode(expr(
        "transform(sequence(1, length(w)), i -> substr(w, i, 1))"))
        .as("symbol"))
      .distinct()
    val whole = Window.partitionBy().rowsBetween(
      Window.unboundedPreceding, Window.unboundedFollowing)
    // alphabet-bounded frame: rank + total in one pass
    val charIds = chars
      .withColumn("ord",
        row_number().over(Window.orderBy(col("symbol"))).cast("long"))
      .withColumn("__a", count(lit(1)).over(whole))
    val aFrame = charIds.select(col("__a")).limit(1)
    val merged = mergeTable.crossJoin(broadcast(aFrame))
      .select(concat(col("lhs"), col("rhs")).as("symbol"),
        (col("__a") + col("step")).as("ord"))
    charIds.select(col("symbol"), col("ord"))
      .unionByName(merged)
      .groupBy(col("symbol")).agg(min(col("ord")).as("sym_id"))
  }

  /** Per-document subword ID SEQUENCES — what a trainer actually
    * consumes (round 15, r14 verdict #3): every token of every
    * document segmented under the learned `mergeTable`
    * ([[bpeSegment]]), each symbol mapped through `vocab`
    * ((symbol, sym_id), normally a [[bpeVocab]] result — persisted or
    * fresh), sequences reassembled in token-then-symbol order.
    * Unknown symbols — and whole `'_'`-containing tokens, which the
    * tokenizer contract excludes from segmentation — encode as a
    * single id 0 (q101's OOV semantics). Output: (idCol,
    * ids array<long>), row-complete (token-less docs keep an empty
    * array — [[encode]]'s re-attachment discipline).
    *
    * Scale shape: segmentation + the symbol→id join live on the
    * |vocab|-row distinct-token frame (token-keyed joins unhinted —
    * q114's rule); the corpus-sized work is one narrow posexplode and
    * ONE (doc)-keyed reassembly aggregate with order restored by
    * sort_array on (pos, ids) structs — [[encode]]'s exact shape, no
    * order-dependent collect_list assumption. */
  def bpeEncode(corpus: DataFrame, idCol: String, textCol: String,
                mergeTable: DataFrame, vocab: DataFrame): DataFrame = {
    val symIds = bpeSegment(corpus, idCol, textCol, mergeTable)
      .select(col("token"),
        posexplode(col("symbols")).as(Seq("__sp", "__sym")))
      .join(vocab.select(col("symbol").as("__sym"),
        col("sym_id").cast("long").as("__sid")), Seq("__sym"), "left")
      .groupBy(col("token"))
      .agg(sort_array(collect_list(struct(col("__sp").as("p"),
        coalesce(col("__sid"), lit(0L)).as("id")))).as("__ps"))
      .select(col("token").as("__token"),
        expr("transform(__ps, x -> x.id)").as("__tids"))
    val toks = corpus
      .select(col(idCol), expr(TextHashes.toks(textCol)).as("__toks"))
    val nonEmpty = toks
      .select(col(idCol),
        posexplode(col("__toks")).as(Seq("__pos", "__token")))
      .join(symIds, Seq("__token"), "left")
      // '_'-containing tokens never reach bpeSegment → one UNK id
      .withColumn("__tids",
        coalesce(col("__tids"), expr("array(0L)")))
      .groupBy(col(idCol))
      .agg(sort_array(collect_list(struct(col("__pos").as("p"),
        col("__tids").as("ids")))).as("__ps"))
      .select(col(idCol),
        expr("flatten(transform(__ps, x -> x.ids))").as("ids"))
    toks.select(col(idCol))
      .join(nonEmpty, Seq(idCol), "left")
      .withColumn("ids",
        coalesce(col("ids"), expr("cast(array() as array<bigint>)")))
  }

  /** [[dsirLogWeights]]'s ONE data-sized frame — per-(doc, bucket≤256)
    * feature counts, checkpoint-pinned. Factored out (round 15, driver
    * ADVICE) so the scale probe can measure THIS exchange in isolation:
    * it is the operator's only docs-proportional shuffle and must track
    * the data ratio exactly. The FULL operator's total additionally
    * carries the final `groupBy(doc)` partial feed over the pinned
    * frame — the frame is hash-partitioned by (doc, tgt, bucket), so a
    * doc's ≤256 rows straddle partitions and each partition emits one
    * partial per doc present: `docs × min(#partitions, buckets/doc)`
    * records, a factor that GROWS with AQE's coalesced partition count
    * in the probed range (~1.6/doc at base, ~23/doc at ×30) while
    * staying absolutely capped at ≤256/doc — i.e. total shuffle ≤
    * 2 × docs × 256 at ANY scale. Repartitioning the frame by doc
    * before the pin would zero that feed but costs a full docs×256-row
    * exchange (no map-side combine on a repartition) — strictly more
    * records than the ≤min(32,256)/doc partial feed it removes, so the
    * decomposed bound is the right contract, not a new exchange.
    *
    * Checkpoint-pinned (q185's discipline): the frame feeds BOTH the
    * marginals (under a BroadcastExchange, where AQE plans the
    * subtree independently and does NOT reuse the main path's
    * exchange) and the final per-doc weight join — without the pin
    * the corpus scan+explode+aggregate ran TWICE (m10 probe: shuffle
    * ×10.9 at ×10 data). The pinned frame is docs × ≤256 rows — at
    * 1e9 docs ~1-2 GB per executor on a 1000-way cluster, strictly
    * cheaper than a second full corpus pass. */
  private[graft] def dsirPerDoc(corpus: DataFrame, idCol: String,
                                textCol: String,
                                isTarget: Column): DataFrame = {
    def nib(i: Int) =
      s"(instr('0123456789abcdef', substr(md5(__f), $i, 1)) - 1)"
    // scan-parallelism floor (round 19, guide §2.5): the tokenize +
    // bigram + md5-per-feature chain on an unsplittable tiny scan ran
    // as ONE ~0.9 s task at sf0.1 (q187/q200/q210/q213 profiles);
    // self-disabling at real volumes
    val feats = graft.Tables.withParallelismFloor(corpus, idCol)
      .select(col(idCol), isTarget.as("__tgt"),
        expr(TextHashes.toks(textCol)).as("__toks"))
      // unigrams ++ adjacent bigrams; the zip_with over two shifted
      // slices stays empty-safe for 0/1-token docs (greatest clamps the
      // slice length at 0; Spark's sequence() would run DESCENDING on
      // n-1 < 1 and fabricate bigrams)
      .select(col(idCol), col("__tgt"),
        explode(concat(col("__toks"), expr(
          """zip_with(
            |  slice(__toks, 1, greatest(size(__toks) - 1, 0)),
            |  slice(__toks, 2, greatest(size(__toks) - 1, 0)),
            |  (a, b) -> concat(a, ' ', b))""".stripMargin))).as("__f"))
      .select(col(idCol), col("__tgt"),
        expr(s"${nib(1)} * 16 + ${nib(2)}").as("__b"))
    feats
      .groupBy(col(idCol), col("__tgt"), col("__b"))
      .agg(count(lit(1)).as("__cnt"))
      // LAZY pin (round 19): both consumers (the marginals under the
      // broadcast, the per-doc weight join) scan every partition, so
      // the first consumer job materializes it — one fewer eager job
      .localCheckpoint(false)
  }

  /** DSIR-style hashed n-gram importance weights (Xie et al. 2023,
    * "Data Selection for Language Models via Importance Resampling",
    * public arXiv:2302.03169 §3): score every raw document by how much
    * more likely its hashed n-gram features are under a TARGET
    * distribution than under the raw pool — the standard
    * quality-targeted selection signal (sample ∝ exp(logw) picks
    * target-like documents).
    *
    * Features are unigrams + adjacent bigrams of the whitespace
    * tokenization, hashed into 256 buckets via the first two md5
    * nibbles (portable across engines — the same instr-on-hex idiom as
    * every other hash here). Bucket distributions are Laplace-smoothed
    * (+1 per bucket over the 256-bucket domain); the per-document
    * weight is `logw = Σ_b cnt_b(doc) · [ln p̂_b − ln q̂_b]` where p̂ is
    * the target (rows matching `isTarget`) and q̂ the raw pool.
    *
    * 100-TB posture: one narrow explode feeds ONE (doc, bucket)
    * partial-aggregated count frame (≤ 256 rows per doc crossing the
    * exchange); bucket marginals re-aggregate THAT frame (256-row
    * result), and the per-doc weight is a broadcast join of the
    * 256-row log-ratio table back onto the same frame — the corpus is
    * scanned once, and no exchange carries more than docs × 256 rows.
    *
    * Returns (idCol, n_feats, logw) with `logw` the raw double —
    * query faces round; sums of ln terms follow the §2.9 round-4 rule
    * there, not here. */
  def dsirLogWeights(corpus: DataFrame, idCol: String, textCol: String,
                     isTarget: Column): DataFrame = {
    val perDoc = dsirPerDoc(corpus, idCol, textCol, isTarget)
    // the log-ratio table derives from the SAME checkpointed perDoc
    // frame the final score join consumes (never a second corpus pass
    // — the fused form leaves exactly two identical perDoc subplans,
    // which ReusedExchange collapses; see dsirLogRatios for the
    // lessons baked into its shape)
    perDoc.join(broadcast(dsirLogRatios(perDoc)), Seq("__b"))
      .groupBy(col(idCol))
      .agg(sum(col("__cnt")).as("n_feats"),
        sum(col("__cnt") * col("__lr")).as("logw"))
  }

  /** The 256-row Laplace-smoothed bucket log-ratio table `(__b, __lr)`
    * from a [[dsirPerDoc]] frame — factored round 16 so the persisted
    * scoring store ([[saveDsirStore]]) lands EXACTLY the table the
    * inline face uses. Shape lessons (r14 m10 probe, kept verbatim):
    * BOTH marginals come from one re-aggregation of the per-doc frame
    * (separate raw/target aggregates re-planned the perDoc exchange
    * per consumer — shuffle ×11.5 at ×10 data; buckets absent from
    * the target keep an explicit 0 so the smoothing sees the full 256
    * domain), and the totals ride a whole-frame window over the
    * ≤256-row marginal frame (a `marg.agg(...)` + crossJoin scalar
    * subtree re-planned the entire corpus pass under the broadcast).
    * ONE correctly-rounded division + ln per side (q180's
    * discipline): exact-long numerators, the +256.0 denominator
    * promotes to double. */
  private def dsirLogRatios(perDoc: DataFrame): DataFrame = {
    val marg = perDoc.groupBy(col("__b"))
      .agg(sum(col("__cnt")).as("__r"),
        sum(when(col("__tgt"), col("__cnt")).otherwise(0L)).as("__t"))
    val whole = Window.partitionBy().rowsBetween(
      Window.unboundedPreceding, Window.unboundedFollowing)
    marg
      .withColumn("__tTot", sum(col("__t")).over(whole))
      .withColumn("__rTot", sum(col("__r")).over(whole))
      .select(col("__b"),
        (log((col("__t") + lit(1L)) / (col("__tTot") + lit(256.0))) -
          log((col("__r") + lit(1L)) / (col("__rTot") + lit(256.0))))
          .as("__lr"))
  }

  // ---- cross-document boilerplate store (round 16, r15 verdict #6) --

  /** Positional 4-token span frame — q202's unit, factored so the
    * inline face, the gate builder, and the serving path share ONE
    * definition: (idCol, pos, span), pos 1-based over ceil(n/4)
    * non-overlapping spans. Narrow (tokenize + slice + posexplode). */
  private[graft] def spanFrame(docs: DataFrame, idCol: String,
                               textCol: String): DataFrame =
    // scan-parallelism floor (round 19, guide §2.5): the span chain on
    // an unsplittable tiny scan ran as ONE ~1.1 s task at sf0.1;
    // self-disabling at real volumes.
    //
    // Span build as ONE greedy regex pass (round 19, guide §1.2 "per-
    // task work"): the previous form materialized the token array and
    // ran an interpreted slice + array_join per span (~60 allocations
    // per doc — 1.30 s single-job at sf0.1 vs 0.15 s for this form,
    // ×8.8). `[^ ]+( [^ ]+){0,3}` over the space-collapsed trimmed
    // text consumes exactly 4 single-space-split tokens per
    // non-overlapping match (the final match takes the remainder),
    // which IS `array_join(slice(toks, (g-1)*4+1, 4), ' ')` for toks =
    // filter(split(trim(text), ' '), x -> x != '') — byte-identical
    // output proven by a full-corpus exceptAll in both directions
    // (0 rows) plus the standing oracle gate. Null/empty/all-space
    // texts yield a null/empty array and drop at the posexplode in
    // both forms.
    graft.Tables.withParallelismFloor(docs, idCol)
      .select(col(idCol), posexplode(expr(
        s"""regexp_extract_all(
           |  regexp_replace(trim($textCol), ' +', ' '),
           |  '[^ ]+( [^ ]+){0,3}', 0)""".stripMargin))
        .as(Seq("pos0", "span")))
      .select(col(idCol), (col("pos0") + 1).cast("long").as("pos"),
        col("span"))

  /** q202's per-doc cleaning fold over a span frame already tagged
    * with the boilerplate gate (`isbp` 0/1): span census, boilerplate
    * fraction (floor idiom), and the order-faithful cleaned-doc digest
    * (commutative SUM of positional md5-nibble hashes over KEPT spans
    * — partial-aggregable where an ordered string_agg is not
    * portable). */
  private[graft] def boilerplateFold(tagged: DataFrame,
                                     idCol: String): DataFrame =
    tagged
      .withColumn("m", md5(concat(col("pos").cast("string"), lit(":"),
        col("span"))))
      .withColumn("h", expr(TextHashes.nib32("m")))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_spans"),
        sum(col("isbp")).as("n_bp"),
        coalesce(sum(when(col("isbp") === 0, col("h"))), lit(0L))
          .as("clean_sig"))
      .select(col(idCol), col("n_spans"), col("n_bp"),
        (floor(col("n_bp") * lit(10000.0) / col("n_spans")) / 10000.0)
          .as("bp_frac"),
        col("clean_sig"))

  /** The C4 global-line cleaning GATE as a persistable frame: DISTINCT
    * spans carried by ≥ 1% of documents (exact-integer cross-multiply
    * — q202's data-relative rule), with the df and corpus size that
    * justified each admission. |boilerplate spans|-row — tiny. */
  def boilerplateGate(docs: DataFrame, idCol: String,
                      textCol: String): DataFrame =
    gateOfSpans(spanFrame(docs, idCol, textCol), docs, idCol)

  /** [[boilerplateGate]] over an ALREADY-BUILT span frame — factored
    * (round 19) so q202's inline face derives gate AND fold from ONE
    * pinned span frame instead of tokenizing the corpus twice. The
    * `n_docs` total stays a column-pruned second scan of `docs`
    * (q183's rescan-narrow trade). */
  private[graft] def gateOfSpans(spans: DataFrame, docs: DataFrame,
                                 idCol: String): DataFrame = {
    val nd = docs.agg(count(lit(1)).as("n_docs"))
    spans
      .select(col(idCol), col("span")).distinct()
      .groupBy(col("span")).agg(count(lit(1)).as("df"))
      .crossJoin(broadcast(nd))
      .filter(col("df") * 100 >= col("n_docs"))
      .select(col("span"), col("df"), col("n_docs"))
  }

  private val BpStoreMarker = "_graft_bpstore_committed"

  /** Persist the boilerplate cleaning CONTRACT (r15 verdict #6 —
    * q103/q198's discipline applied to q202): the span-df gate is
    * computed ONCE over the reference corpus and landed at
    * `<path>/v<N>/spans` under [[graft.sources.Stores]]'
    * versioned-commit protocol; every subsequent batch or micro-batch
    * cleans against the COMMITTED gate instead of re-aggregating the
    * corpus — so cleaning decisions are stable across serving runs and
    * replay-deterministic in the streaming face. Build cost is the
    * pay-once span-df pass; the landed artifact is |boilerplate
    * spans|-row metadata. */
  def saveBoilerplateStore(docs: DataFrame, idCol: String,
                           textCol: String, path: String): Unit =
    graft.sources.Stores.commitVersioned(docs.sparkSession, path,
        BpStoreMarker) { dir =>
      boilerplateGate(docs, idCol, textCol)
        .write.mode("overwrite").parquet(s"$dir/spans")
    }

  /** Clean a batch against a COMMITTED [[saveBoilerplateStore]] gate:
    * q202's exact output contract ((idCol, n_spans, n_bp, bp_frac,
    * clean_sig)) with the gate supplied by the store — decisions
    * depend only on committed state + the row's own text
    * (`Dedup.semanticServeAudit`'s serving stance). The gate join is
    * unhinted (q114's rule: AQE broadcasts a sane gate; a degenerate
    * span domain degrades to a shuffle join instead of a driver OOM).
    * Refuses an uncommitted/torn store. */
  def boilerplateServe(spark: org.apache.spark.sql.SparkSession,
                       path: String, docs: DataFrame, idCol: String,
                       textCol: String): DataFrame = {
    val dir = graft.sources.Stores
      .resolveCommitted(spark, path, BpStoreMarker)
      .getOrElse(throw new IllegalArgumentException(
        s"requirement failed: boilerplate store at $path has no commit " +
          s"marker ($BpStoreMarker) — it is mid-build, torn, or absent; " +
          "rebuild with saveBoilerplateStore"))
    val gate = spark.read.parquet(s"$dir/spans")
      .select(col("span"), lit(1L).as("isbp"))
    boilerplateFold(
      spanFrame(docs, idCol, textCol)
        .join(gate, Seq("span"), "left_outer")
        .withColumn("isbp", coalesce(col("isbp"), lit(0L))),
      idCol)
  }

  /** Resolve the COMMITTED version directory of a
    * [[saveBoilerplateStore]] artifact — [[graft.operators.Dedup]]'s
    * `semanticStoreDir` twin for specs and tooling. */
  private[graft] def boilerplateStoreDir(
      spark: org.apache.spark.sql.SparkSession, path: String): String =
    graft.sources.Stores.resolveCommitted(spark, path, BpStoreMarker)
      .getOrElse(throw new IllegalArgumentException(
        s"requirement failed: boilerplate store at $path has no commit " +
          "marker"))

  /** Pay-once build for the q211 face —
    * [[graft.sources.Stores.ensureCommitted]]'s per-JVM memo. */
  def ensureBoilerplateStore(docs: DataFrame, idCol: String,
                             textCol: String, path: String): Unit =
    graft.sources.Stores.ensureCommitted(docs.sparkSession, path,
      BpStoreMarker)(saveBoilerplateStore(docs, idCol, textCol, path))

  // ---- DSIR scoring store (round 16) --------------------------------

  private val DsirStoreMarker = "_graft_dsirstore_committed"

  /** Persist the DSIR SCORING artifact — the 256-row bucket log-ratio
    * table `(__b, __lr)` (round 16): this is the paper's actual
    * deployment shape (Xie et al. 2023 §3 — estimate the hashed-n-gram
    * target/raw distributions ONCE, on a reference corpus or sample,
    * then score everything against the fixed table), where
    * [[dsirLogWeights]] is the self-contained estimate-and-score form.
    * Landed under [[graft.sources.Stores]]' versioned-commit protocol;
    * the artifact is 256 rows — metadata — so build cost is one
    * reference-corpus [[dsirPerDoc]] pass and serving never
    * re-estimates. */
  def saveDsirStore(reference: DataFrame, idCol: String, textCol: String,
                    isTarget: Column, path: String): Unit =
    graft.sources.Stores.commitVersioned(reference.sparkSession, path,
        DsirStoreMarker) { dir =>
      dsirLogRatios(dsirPerDoc(reference, idCol, textCol, isTarget))
        .write.mode("overwrite").parquet(s"$dir/logratios")
    }

  /** Score a batch against a COMMITTED [[saveDsirStore]] table:
    * (idCol, n_feats, logw) — [[dsirLogWeights]]'s contract with the
    * store supplying the log-ratios, so a row's score depends only on
    * committed state + its own text (the serving stance every store
    * face shares). The per-doc feature pass is [[dsirPerDoc]] with the
    * target flag irrelevant at serve time; the 256-row table
    * broadcasts. Refuses an uncommitted/torn store. */
  def dsirServe(spark: org.apache.spark.sql.SparkSession, path: String,
                docs: DataFrame, idCol: String,
                textCol: String): DataFrame = {
    val dir = graft.sources.Stores
      .resolveCommitted(spark, path, DsirStoreMarker)
      .getOrElse(throw new IllegalArgumentException(
        s"requirement failed: DSIR store at $path has no commit marker " +
          s"($DsirStoreMarker) — it is mid-build, torn, or absent; " +
          "rebuild with saveDsirStore"))
    val lr = spark.read.parquet(s"$dir/logratios")
    dsirPerDoc(docs, idCol, textCol, isTarget = lit(false))
      .join(broadcast(lr), Seq("__b"))
      .groupBy(col(idCol))
      .agg(sum(col("__cnt")).as("n_feats"),
        sum(col("__cnt") * col("__lr")).as("logw"))
  }

  /** Pay-once build for the q213 face. */
  def ensureDsirStore(reference: DataFrame, idCol: String,
                      textCol: String, isTarget: Column,
                      path: String): Unit =
    graft.sources.Stores.ensureCommitted(reference.sparkSession, path,
      DsirStoreMarker)(
      saveDsirStore(reference, idCol, textCol, isTarget, path))

  // ---------------------------------------------------------------
  // Trigram stupid-backoff LM (Brants et al. 2007) — train-once /
  // score-many. q226 is the inline contract face; the store faces
  // land the count tables under the versioned-commit protocol so a
  // perplexity gate scores every ingest batch (or stream) without
  // touching the reference corpus again — CCNet's deploy shape.
  // ---------------------------------------------------------------

  /** The n-gram count tables of a training corpus: `(uni(w, cu),
    * bi(w1, w2, cb), tri(w1, w2, w3, ct), nv(nn, vv))`. Vocabulary-
    * bounded frames; size guards before every transform (q184's
    * sequence(1,0) trap). */
  def lmCounts(train: DataFrame, textCol: String)
      : (DataFrame, DataFrame, DataFrame, DataFrame) = {
    val t = train.select(expr(TextHashes.toks(textCol)).as("toks"))
    val uni = t.select(explode(col("toks")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("cu"))
    val bi = t.filter(size(col("toks")) >= 2)
      .select(explode(expr(
        """transform(sequence(1, size(toks) - 1),
          |  i -> named_struct('w1', element_at(toks, i),
          |                    'w2', element_at(toks, i + 1)))"""
          .stripMargin)).as("b"))
      .select(col("b.w1").as("w1"), col("b.w2").as("w2"))
      .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("cb"))
    val tri = t.filter(size(col("toks")) >= 3)
      .select(explode(expr(
        """transform(sequence(1, size(toks) - 2),
          |  i -> named_struct('w1', element_at(toks, i),
          |                    'w2', element_at(toks, i + 1),
          |                    'w3', element_at(toks, i + 2)))"""
          .stripMargin)).as("g"))
      .select(col("g.w1").as("w1"), col("g.w2").as("w2"),
        col("g.w3").as("w3"))
      .groupBy(col("w1"), col("w2"), col("w3"))
      .agg(count(lit(1)).as("ct"))
    val nv = uni.agg(sum(col("cu")).as("nn"), count(lit(1)).as("vv"))
    (uni, bi, tri, nv)
  }

  /** Score `docs` trigram-by-trigram against count tables (the 3→2→1
    * stupid-backoff chain, α = 0.4 per level, Laplace unigram floor):
    * per doc `(idCol, n_tri, n_tri_hit, n_bi_hit, n_uni, avg_ll)` —
    * the backoff-level census (exact integers) + the round-4 average
    * ln score. Count-table joins are UNHINTED (q114's rule): at real
    * vocabulary they flip to SMJ exactly when they should; the only
    * data-sized exchange is the per-doc rollup. */
  def lmScore(docs: DataFrame, idCol: String, textCol: String,
              uni: DataFrame, bi: DataFrame, tri: DataFrame,
              nv: DataFrame): DataFrame = {
    val stream = docs
      .select(col(idCol), expr(TextHashes.toks(textCol)).as("toks"))
      .filter(size(col("toks")) >= 3)
      .select(col(idCol), explode(expr(
        """transform(sequence(1, size(toks) - 2),
          |  i -> named_struct('w1', element_at(toks, i),
          |                    'w2', element_at(toks, i + 1),
          |                    'w3', element_at(toks, i + 2)))"""
          .stripMargin)).as("g"))
      .select(col(idCol), col("g.w1").as("w1"),
        col("g.w2").as("w2"), col("g.w3").as("w3"))
    stream
      .join(tri, Seq("w1", "w2", "w3"), "left")
      .join(bi, Seq("w1", "w2"), "left")
      .join(bi.toDF("w2", "w3", "cb2"), Seq("w2", "w3"), "left")
      .join(uni.toDF("w2", "cu2"), Seq("w2"), "left")
      .join(uni.toDF("w3", "cu3"), Seq("w3"), "left")
      .crossJoin(broadcast(nv))
      .withColumn("lvl",
        when(col("ct").isNotNull, 3)
          .when(col("cb2").isNotNull, 2).otherwise(1))
      .withColumn("sc",
        when(col("ct").isNotNull, col("ct") / col("cb"))
          .when(col("cb2").isNotNull,
            lit(0.4) * col("cb2") / col("cu2"))
          .otherwise(lit(0.16) * (coalesce(col("cu3"), lit(0L)) + 1) /
            (col("nn") + col("vv"))))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tri"),
        sum(when(col("lvl") === 3, 1L).otherwise(0L)).as("n_tri_hit"),
        sum(when(col("lvl") === 2, 1L).otherwise(0L)).as("n_bi_hit"),
        sum(when(col("lvl") === 1, 1L).otherwise(0L)).as("n_uni"),
        (round(sum(log(col("sc"))) / count(lit(1)), 4) + 0.0)
          .as("avg_ll"))
  }

  private val LmStoreMarker = "_graft_lmstore_committed"

  /** Persist the count tables under [[graft.sources.Stores]]' protocol
    * — all four artifacts under ONE versioned commit (the q208
    * torn-pair rule: a scorer can never read new trigrams against old
    * unigrams). */
  def saveLmStore(train: DataFrame, textCol: String, path: String): Unit =
    graft.sources.Stores.commitVersioned(train.sparkSession, path,
        LmStoreMarker) { dir =>
      val (uni, bi, tri, nv) = lmCounts(train, textCol)
      uni.write.mode("overwrite").parquet(s"$dir/uni")
      bi.write.mode("overwrite").parquet(s"$dir/bi")
      tri.write.mode("overwrite").parquet(s"$dir/tri")
      nv.write.mode("overwrite").parquet(s"$dir/nv")
    }

  /** Score a batch against a COMMITTED [[saveLmStore]] artifact.
    * Refuses an uncommitted/torn store. */
  def lmServe(spark: org.apache.spark.sql.SparkSession, path: String,
              docs: DataFrame, idCol: String,
              textCol: String): DataFrame = {
    val dir = graft.sources.Stores
      .resolveCommitted(spark, path, LmStoreMarker)
      .getOrElse(throw new IllegalArgumentException(
        s"requirement failed: LM store at $path has no commit marker " +
          s"($LmStoreMarker) — it is mid-build, torn, or absent; " +
          "rebuild with saveLmStore"))
    lmScore(docs, idCol, textCol,
      spark.read.parquet(s"$dir/uni"),
      spark.read.parquet(s"$dir/bi"),
      spark.read.parquet(s"$dir/tri"),
      spark.read.parquet(s"$dir/nv"))
  }

  /** Pay-once build for the q228 face. */
  def ensureLmStore(train: DataFrame, textCol: String,
                    path: String): Unit =
    graft.sources.Stores.ensureCommitted(train.sparkSession, path,
      LmStoreMarker)(saveLmStore(train, textCol, path))

  // ---- iterative subword-vocabulary trainer (round 17, verdict #4) --

  /** Distinct-word frame `(word, wc, len)` — occurrence counts over
    * whitespace tokens, capped at `maxWordLen` chars (longer words are
    * out of the training universe by contract; they are tail noise on
    * this corpus and a fixed cap is what lets the oracle unroll the
    * segmentation walk as a bounded CTE chain). */
  private def wordFrame(docs: DataFrame, textCol: String,
                        maxWordLen: Int): DataFrame =
    docs.select(explode(expr(TextHashes.toks(textCol))).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("wc"))
      .withColumn("len", length(col("word")))
      .filter(col("len") <= maxWordLen)

  /** Seed candidate pieces: every 2..maxPieceLen-char substring whose
    * occurrence-weighted count reaches `minCount`. Single characters
    * are IMPLICIT vocabulary (the segmenter's unconditional fallback),
    * so no piece table ever carries them. */
  private def seedPieces(words: DataFrame, maxPieceLen: Int,
                         minCount: Long): DataFrame =
    words
      .select(col("wc"), explode(expr(
        s"""flatten(transform(sequence(2, $maxPieceLen), l ->
           |  CASE WHEN len < l THEN cast(array() as array<string>)
           |  ELSE transform(sequence(1, len - l + 1),
           |    p -> substring(word, cast(p as int), cast(l as int)))
           |  END))""".stripMargin)).as("piece"))
      .groupBy(col("piece")).agg(sum(col("wc")).as("cnt"))
      .filter(col("cnt") >= minCount)
      .select(col("piece"))

  /** Longest-match step table: for every (word, position) the piece a
    * greedy segmenter takes there — the longest vocab piece matching
    * at `pos` (three unhinted left joins, maxPieceLen..2), single-char
    * fallback. `substring` truncates at the word end on both engines,
    * so an end-of-word probe can only match a correspondingly shorter
    * piece — which IS the longest match there. */
  private def stepFrame(words: DataFrame, vocab: DataFrame,
                        maxPieceLen: Int): DataFrame = {
    val pos = words.select(col("word"),
      explode(expr("sequence(1, len)")).as("pos"))
    val joined = (maxPieceLen to 2 by -1).foldLeft(pos) { (df, l) =>
      df.join(vocab.select(col("piece").as(s"__p$l")),
        expr(s"substring(word, pos, $l)") === col(s"__p$l"), "left")
    }
    val pick = coalesce(
      ((maxPieceLen to 2 by -1).map(l => col(s"__p$l")) :+
        expr("substring(word, pos, 1)")): _*)
    joined.select(col("word"), col("pos"), pick.as("piece"))
  }

  /** Greedy longest-match segmentation of the word frame under a
    * piece vocabulary: `(word, wc, len, n_pieces, seg)` with `seg` the
    * pieces joined by ' '. The per-position step table collapses to
    * one array per word (q96's positional reassembly), and the walk is
    * a NARROW aggregate over at most `maxWordLen` steps — no iteration
    * ever re-joins the corpus. */
  private[graft] def greedySegment(words: DataFrame, vocab: DataFrame,
                                   maxPieceLen: Int = 4,
                                   maxWordLen: Int = 12): DataFrame = {
    val arr = stepFrame(words, vocab, maxPieceLen)
      .groupBy(col("word"))
      .agg(expr(
        "transform(sort_array(collect_list(struct(pos, piece))), z -> z.piece)")
        .as("pieces"))
    words.join(arr, Seq("word"))
      .withColumn("__w", expr(
        s"""aggregate(sequence(1, $maxWordLen),
           |  named_struct('pos', 1, 'np', 0, 'seg', ''),
           |  (st, x) -> CASE WHEN st.pos > len THEN st
           |    ELSE named_struct(
           |      'pos', st.pos + length(element_at(pieces, st.pos)),
           |      'np', st.np + 1,
           |      'seg', CASE WHEN st.seg = '' THEN element_at(pieces, st.pos)
           |             ELSE concat(st.seg, ' ', element_at(pieces, st.pos))
           |             END)
           |    END)""".stripMargin))
      .select(col("word"), col("wc"), col("len"),
        col("__w.np").as("n_pieces"), col("__w.seg").as("seg"))
  }

  /** Iterative subword-vocabulary trainer (round 17, r16 verdict #4 —
    * the BPE sibling): HARD-EM with greedy longest-match segmentation,
    * the deterministic variant of Kudo 2018's unigram-LM trainer
    * (SentencePiece) in the WordPiece encode style (Schuster &
    * Nakajima 2012). Kudo's E-step is forward-backward EXPECTED counts
    * — float sums a differential gate cannot replay bit-for-bit; the
    * hard-EM E-step segments each word greedily (exact string matching
    * only), the M-step recounts piece usage in exact integers, and the
    * between-round prune is a plain threshold — every trainer state is
    * a string or a BIGINT, so DuckDB replays the whole training run
    * (the q216/q223/q224 fixed-point-iteration discipline applied to a
    * tokenizer). Declared variant, stated openly: greedy-match hard-EM
    * maximizes a different objective than unigram-LM marginal
    * likelihood; what it keeps is the train/prune/re-segment loop and
    * the subword vocabulary shape.
    *
    * Protocol: seed = all 2..maxPieceLen-char substrings with count ≥
    * minCount; each round segments the word universe and keeps pieces
    * with usage ≥ minCount; the returned table is the FINAL round's
    * usage (single characters included as the implicit fallback they
    * are; multi-char rows are exactly the final vocabulary, since the
    * last segmentation only uses survivors).
    *
    * Scale shape: ONE corpus pass (the token count behind the word
    * frame, checkpoint-pinned); everything after is word-vocabulary-
    * bounded — (word, pos) step joins ≤ maxWordLen·|words| rows,
    * usage aggregates |pieces|-bounded, the walk narrow. Train-once /
    * serve-many like BPE (q185's family). */
  def subwordTrain(docs: DataFrame, textCol: String,
                   maxPieceLen: Int = 4, maxWordLen: Int = 12,
                   minCount: Long = 5, rounds: Int = 2): DataFrame = {
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    // LAZY pins (round 19): every consumer (the per-round stepFrame
    // joins and usage aggregates) is a full-partition scan, so the
    // first consumer job materializes each pin — same single-
    // evaluation guarantee as the eager form, without its extra jobs
    val words = wordFrame(docs, textCol, maxWordLen).localCheckpoint(false)
    var vocab = seedPieces(words, maxPieceLen, minCount)
      .localCheckpoint(false)
    var usage: DataFrame = null
    for (r <- 1 to rounds) {
      usage = greedySegment(words, vocab, maxPieceLen, maxWordLen)
        .select(col("wc"), explode(split(col("seg"), " ")).as("piece"))
        .groupBy(col("piece")).agg(sum(col("wc")).as("usage"))
      if (r < rounds)
        vocab = usage
          .filter(length(col("piece")) >= 2 && col("usage") >= minCount)
          .select(col("piece"))
          .localCheckpoint(false)
    }
    usage
  }

  /** The final-vocabulary piece set a [[subwordTrain]] table implies:
    * its multi-char rows, NO usage re-filter — every multi-char row
    * was picked by the final segmentation pass, and greedy walks
    * depend only on pieces picked at visited positions, so segmenting
    * the same universe under exactly these pieces REPLAYS the final
    * training round bit-for-bit (a second prune here would knock out
    * low-usage survivors and silently change the encode). Single
    * chars are the implicit fallback and never live in a table. */
  def subwordVocab(trained: DataFrame): DataFrame =
    trained.filter(length(col("piece")) >= 2)
      .select(col("piece"))

  /** Greedy segmentation of a corpus' word universe under a trained
    * vocabulary — `(token, n_pieces, seg)`; replays the trainer's
    * final round exactly when given [[subwordVocab]] of its output. */
  def subwordSegment(docs: DataFrame, textCol: String, vocab: DataFrame,
                     maxPieceLen: Int = 4,
                     maxWordLen: Int = 12): DataFrame =
    greedySegment(wordFrame(docs, textCol, maxWordLen), vocab,
        maxPieceLen, maxWordLen)
      .select(col("word").as("token"),
        col("n_pieces").cast("long").as("n_pieces"), col("seg"))

  // ---- subword vocabulary store (round 18, r17 verdict #5) ----------

  private val SubwordStoreMarker = "_graft_subwordstore_committed"

  /** Persist the TRAINED subword tokenizer (r17 verdict #5 — the
    * q198/q208 discipline applied to [[subwordTrain]]): the final
    * usage table lands at `<path>/v<N>/usage` under the versioned-
    * commit protocol, together with a one-row `params` table pinning
    * the training geometry (maxPieceLen/maxWordLen/minCount/rounds) —
    * a served segmentation must replay the trainer's final round, and
    * segmenting under a different piece-length cap than the one the
    * vocabulary was trained with would silently change every walk, so
    * the geometry travels WITH the artifact (the q208 torn-pair rule
    * for hyper-parameters). Build pays the one-corpus-pass train;
    * the landed artifact is |pieces|-row metadata. */
  def saveSubwordStore(docs: DataFrame, textCol: String, path: String,
                       maxPieceLen: Int = 4, maxWordLen: Int = 12,
                       minCount: Long = 5, rounds: Int = 2): Unit = {
    val spark = docs.sparkSession
    graft.sources.Stores.commitVersioned(spark, path,
        SubwordStoreMarker) { dir =>
      subwordTrain(docs, textCol, maxPieceLen, maxWordLen, minCount,
          rounds)
        .write.mode("overwrite").parquet(s"$dir/usage")
      spark.range(1)
        .select(lit(maxPieceLen).as("max_piece_len"),
          lit(maxWordLen).as("max_word_len"),
          lit(minCount).as("min_count"), lit(rounds).as("rounds"))
        .write.mode("overwrite").parquet(s"$dir/params")
    }
  }

  /** Segment a batch's word universe under a COMMITTED
    * [[saveSubwordStore]] vocabulary: q238's exact output contract
    * (`(token, n_pieces, seg)`) with the vocabulary AND geometry
    * supplied by the store — decisions depend only on committed state
    * + the batch's own text. Serving the training corpus replays the
    * trainer's final round bit-for-bit ([[subwordVocab]]'s no-re-prune
    * rule), which is exactly what the q243 hash gate proves. Per-batch
    * cost: one batch tokenize + word-vocabulary-bounded step joins;
    * the training corpus is never re-read. Refuses an
    * uncommitted/torn store. */
  def subwordServe(spark: org.apache.spark.sql.SparkSession,
                   path: String, docs: DataFrame,
                   textCol: String): DataFrame = {
    val dir = graft.sources.Stores
      .resolveCommitted(spark, path, SubwordStoreMarker)
      .getOrElse(throw new IllegalArgumentException(
        s"requirement failed: subword store at $path has no commit " +
          s"marker ($SubwordStoreMarker) — it is mid-build, torn, or " +
          "absent; rebuild with saveSubwordStore"))
    val p = spark.read.parquet(s"$dir/params").first()
    subwordSegment(docs, textCol,
      subwordVocab(spark.read.parquet(s"$dir/usage")),
      maxPieceLen = p.getAs[Int]("max_piece_len"),
      maxWordLen = p.getAs[Int]("max_word_len"))
  }

  /** Pay-once build for the q243 face. `docs` is BY-NAME: under
    * trust-committed serving ([[graft.sources.Stores.TrustConf]]) a
    * fresh process serves the committed vocabulary without even
    * CONSTRUCTING the corpus frame. */
  def ensureSubwordStore(spark: org.apache.spark.sql.SparkSession,
                         docs: => DataFrame, textCol: String,
                         path: String, maxPieceLen: Int = 4,
                         maxWordLen: Int = 12, minCount: Long = 5,
                         rounds: Int = 2): Unit =
    graft.sources.Stores.ensureCommitted(spark, path,
      SubwordStoreMarker)(saveSubwordStore(docs, textCol, path,
        maxPieceLen, maxWordLen, minCount, rounds))
}
