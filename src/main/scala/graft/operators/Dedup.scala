package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-level deduplication API (builder mandate: the operators a
  * training-data pipeline calls, not just their verification queries).
  * Each function takes a corpus and returns the corpus with duplicates
  * removed — smallest id wins, matching the q41/q46 query semantics.
  *
  * Scale design: no operator materializes an O(n²) pair set. Exact dedup
  * is one hash aggregation; MinHash-LSH generates candidate pairs via an
  * equi-join on band keys (only same-bucket docs ever meet); SimHash
  * prunes through bucket prefixes or bit-bands. Dominated-doc removal is
  * a left-anti join — one shuffle on the id.
  *
  * Hot buckets: a band bucket holding m boilerplate near-dups produces
  * m² candidate pairs under a naive self-join — the classic LSH
  * blow-up. Buckets larger than `maxBucketSize` switch to star linking:
  * every member pairs with the bucket's K smallest ids (K·m pairs, K=2).
  * For a true duplicate cluster that loses nothing — every member is
  * verified against the eventual survivor; for a spurious hot bucket the
  * verification stage rejects the linear (not quadratic) candidate set,
  * and K>1 centers bound the residual recall loss (a similar pair is
  * missed only when neither member is among the K smallest AND the two
  * share no other band).
  *
  * No broadcast hints anywhere: per-document side tables (shingle
  * counts, signatures) grow with the corpus, so a forced broadcast is an
  * OOM at 100 TB. All joins are plain equi-joins — AQE broadcasts them
  * only when runtime stats say they fit.
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

  /** Candidate pairs (a < b) from bucket assignments `(__id, band, key)`,
    * with the hot-bucket star-linking cap described in the object doc.
    *
    * Oversized buckets link every member to the bucket's `starCenters`
    * smallest ids rather than a single minimum: with one center, two
    * genuinely similar docs that are both non-min in a SPURIOUS hot
    * bucket (band-key collision of dissimilar docs) and share no other
    * band would never meet — a recall hole beyond true dup clusters
    * (where the single survivor catches everyone). K centers bound that
    * miss: a pair is lost only if neither member ranks in the bucket's
    * K smallest AND they co-occur in no other band. Cost stays linear —
    * O(K·m) candidates per hot bucket, never O(m²). */
  private[operators] def candidatePairs(buckets: DataFrame, maxBucketSize: Int,
                                        starCenters: Int = 2): DataFrame = {
    val wB = Window.partitionBy(col("band"), col("key"))
    val bk = buckets
      .withColumn("__bn", count(lit(1)).over(wB))
    val small = bk.filter(col("__bn") <= maxBucketSize)
    val candSmall = small.select(col("__id").as("a"), col("band"), col("key"))
      .join(small.select(col("__id").as("b"),
          col("band").as("band2"), col("key").as("key2")),
        col("band") === col("band2") && col("key") === col("key2") &&
          col("a") < col("b"))
      .select(col("a"), col("b"))
    // star link: centers = the K smallest ids in the bucket; the center
    // is always the smaller id of the emitted pair
    val big = bk.filter(col("__bn") > maxBucketSize)
    val centers = big
      .withColumn("__rk", row_number().over(wB.orderBy(col("__id").asc)))
      .filter(col("__rk") <= starCenters)
      .select(col("__id").as("a"), col("band"), col("key"))
    val candBig = big.select(col("__id").as("b"), col("band"), col("key"))
      .join(centers, Seq("band", "key"))
      .filter(col("a") < col("b"))
      .select(col("a"), col("b"))
    candSmall.union(candBig).distinct()
  }

  /** MinHash-LSH near-dedup, two-stage (the standard production shape):
    *
    *  1. **Candidates** — docs sharing any of `bands` LSH band keys (each
    *     the concat of `rowsPerBand` salted min-hashes over word 3-gram
    *     shingles). Generated per band bucket, so the corpus never
    *     self-joins globally; buckets above `maxBucketSize` degrade to
    *     star linking (see object doc) so a boilerplate cluster of m docs
    *     yields O(m) candidates, not O(m²).
    *  2. **Verification** — true shingle-set Jaccard is computed for the
    *     candidate pairs only; a doc is dropped iff a smaller-id candidate
    *     partner has Jaccard ≥ `threshold`. LSH recall errs toward extra
    *     candidates; verification removes the false positives.
    *
    * Docs with <3 tokens have no shingles and are always kept. */
  /** The shared MinHash-LSH pipeline: per-doc shingle sets (narrow) →
    * salted `array_min` signatures (narrow) → band-bucket candidate
    * pairs (hot-capped) → true-Jaccard verification via
    * `array_intersect`, shipped only for LSH candidates, no broadcast
    * hints (AQE decides). Returns verified near-dup edges `(a, b)` with
    * a < b — the single source both [[minhashLsh]] and
    * [[minhashLshClusters]] derive from. */
  private def verifiedPairs(corpus: DataFrame, idCol: String, textCol: String,
                            threshold: Double, bands: Int, rowsPerBand: Int,
                            maxBucketSize: Int,
                            materialize: Boolean = true): DataFrame = {
    val docs = shingleDocs(corpus, idCol, textCol)
    // materialize=false → a fully LAZY, recomputable plan with ZERO
    // pinned blocks (the multi-referenced signature subtree recomputes
    // inside the caller's one action); true → one tokenize pass into a
    // compact checkpoint, released before returning, with the SMALL
    // edge result pinned instead — callers that finish consuming it
    // in-operator (the cluster face) release it, callers that return
    // lazy plans over it must release via
    // `graftbridge.releaseCheckpoint` once their action has run.
    val sigKeyRaw = sigKey(docs, bands * rowsPerBand)
    val sigKeyC =
      if (materialize) sigKeyRaw.localCheckpoint(true) else sigKeyRaw
    try verifiedPairsFrom(docs, sigKeyC, threshold, bands, rowsPerBand,
      maxBucketSize, materialize)
    finally if (materialize)
      org.apache.spark.sql.graftbridge.releaseCheckpoint(sigKeyC)
  }

  /** The increment/corpus `(id, family-hash, signature)` frame — ONE
    * tokenize+hash pass over `docs`, through the SAME signature
    * construction the persisted store uses
    * ([[minhashSignatures]]/[[sigBuckets]]) — one key scheme, so batch
    * and incremental dedup can never drift apart. */
  private def sigKey(docs: DataFrame, numHashes: Int): DataFrame =
    docs.select(col("__id"),
      md5(to_json(struct(array_sort(col("__sh")).as("s")))).as("__fh"),
      sigFromShingles(numHashes).as("mh"))

  /** Family collapse + banding + verification over a PRECOMPUTED
    * `(docs, sigKey)` pair — the shared tail of [[verifiedPairs]] and
    * [[minhashIncrementalIndexed]] (round 10: the incremental face
    * previously re-tokenized the increment inside its within-increment
    * stage; both faces now feed off one signature pass).
    *
    * FAMILY COLLAPSE (round 8): docs with IDENTICAL shingle sets are
    * interchangeable under Jaccard — intra-family similarity is exactly
    * 1 and similarity to any third doc is identical member-to-member —
    * so the pipeline runs over one representative (min id) per family
    * and re-attaches members as rep→member star edges afterwards. The
    * transitive closure (CC clusters) AND the pairwise-domination
    * relation over the emitted edges are PROVABLY equal to the
    * all-members graph's, while a replicated corpus (m identical copies
    * per doc — the SCALE_PROBE shape, and real crawl dumps) generates
    * O(reps²-bounded) verified work plus O(m) family edges instead of
    * O((m·reps)²) candidate/verify pairs.
    *
    * Cost shape: the family stage and banding read the compact sigKey
    * frame (~300 B/doc — no shingle arrays); verification joins the
    * shingle sets lazily for CANDIDATE pairs only (two more tokenize
    * passes over `docs` — the same count the pre-family-collapse
    * operator paid). The SMALL verified-edge result is pinned under
    * `materialize` so the intermediate blocks release before returning
    * (the Ranking.releaseCheckpoint discipline). */
  private def verifiedPairsFrom(docs: DataFrame, sigKeyC: DataFrame,
                                threshold: Double, bands: Int,
                                rowsPerBand: Int, maxBucketSize: Int,
                                materialize: Boolean): DataFrame = {
    val famRep = sigKeyC.groupBy(col("__fh"))
      .agg(min(col("__id")).as("__rep"))
    val famEdges = sigKeyC.select(col("__id"), col("__fh"))
      .join(famRep, "__fh")
      .filter(col("__id") =!= col("__rep"))
      .select(col("__rep").as("a"), col("__id").as("b"))
    val repSigs = sigKeyC.join(
      famRep.select(col("__rep").as("__id")), "__id")
    val buckets = sigBuckets(
      repSigs.select(col("__id"), col("mh")), "__id", bands, rowsPerBand)
    val repEdges = candidatePairs(buckets, maxBucketSize)
      .join(docs.toDF("a", "__sha"), "a")
      .join(docs.toDF("b", "__shb"), Seq("b"))
      .withColumn("__inter",
        size(array_intersect(col("__sha"), col("__shb"))))
      .filter(col("__inter") /
        (size(col("__sha")) + size(col("__shb")) - col("__inter")) >= threshold)
      .select(col("a"), col("b"))
    val out = repEdges.union(famEdges)
    if (materialize) out.localCheckpoint(true) else out
  }

  /** Per-doc distinct word-3-gram shingle sets `(__id, __sh)`; docs
    * with <3 tokens carry no row (no shingles — always kept by every
    * dedup face). The single source for both signature construction
    * and exact-Jaccard verification. */
  private def shingleDocs(corpus: DataFrame, idCol: String,
                          textCol: String): DataFrame =
    corpus.select(col(idCol).as("__id"),
        expr(TextHashes.toks(textCol)).as("toks"))
      .filter(size(col("toks")) >= 3)
      .select(col("__id"), expr(TextHashes.shingleSet("toks")).as("__sh"))

  /** The min-hash array over a `__sh` shingle column: `numHashes`
    * salted-md5 minima. ONE definition — [[minhashSignatures]] (the
    * persisted store) and [[verifiedPairs]] (batch dedup) must emit
    * bit-identical signatures or stored epochs silently stop matching
    * later batches. */
  private def sigFromShingles(numHashes: Int) =
    array((0 until numHashes).map(j =>
      array_min(expr(s"transform(__sh, x -> md5(concat('$j:', x)))"))): _*)

  /** Persistable MinHash signature table: one row per doc with ≥3
    * tokens — (`idCol`, `mh` array<string> of bands·rowsPerBand salted
    * min-hashes). This is the artifact an INCREMENTAL dedup pipeline
    * stores per ingested slice (parquet-append it): later increments
    * dedup against the signatures alone — the corpus text is never
    * re-read, which is the property that makes daily dedup against a
    * 100-TB corpus a signature-table join instead of a corpus scan.
    * Fully narrow (per-doc shingle set → salted `array_min`s). */
  def minhashSignatures(corpus: DataFrame, idCol: String, textCol: String,
                        bands: Int = 4, rowsPerBand: Int = 2): DataFrame =
    shingleDocs(corpus, idCol, textCol)
      .select(col("__id").as(idCol),
        sigFromShingles(bands * rowsPerBand).as("mh"))

  /** Band-key bucket assignments `(__id, band, key)` from a signature
    * table (key = concat of the band's `rowsPerBand` min-hashes). */
  private def sigBuckets(sigs: DataFrame, idCol: String,
                         bands: Int, rowsPerBand: Int): DataFrame = {
    val bandCols = (0 until bands).map(b =>
      struct(lit(b).as("band"),
        concat((0 until rowsPerBand).map(r =>
          element_at(col("mh"), b * rowsPerBand + r + 1)): _*).as("key"))
        .as(s"b$b"))
    sigs.select(col(idCol).as("__id"), explode(array(bandCols: _*)).as("bk"))
      .select(col("__id"), col("bk.band").as("band"), col("bk.key").as("key"))
  }

  /** SERVING-layout signature index: one row per (doc, band) with the
    * band key flattened to a single join column `bkey` = "band|key"
    * (band-scoped equality ≡ bkey equality) and the doc's FULL
    * signature carried INLINE — so incremental serving verifies
    * agreement right on the joined row instead of joining back to the
    * signature table. This is the layout [[writeSigIndex]] lands
    * bucketed: every per-batch serving join/window then runs on the
    * store's bucket partitioning with ZERO store-side exchange. */
  def sigIndexRows(sigs: DataFrame, idCol: String,
                   bands: Int = 4, rowsPerBand: Int = 2): DataFrame = {
    val bandCols = (0 until bands).map(b =>
      concat((lit(s"$b|") +: (0 until rowsPerBand).map(r =>
        element_at(col("mh"), b * rowsPerBand + r + 1))): _*).as(s"b$b"))
    sigs.select(col(idCol).as("__id"), col("mh"),
        explode(array(bandCols: _*)).as("bkey"))
      .select(col("bkey"), col("__id"), col("mh"))
  }

  /** Land a signature table as the band-key-BUCKETED serving index
    * (the q106 pay-once-at-ingest discipline applied to the dedup
    * store): [[sigIndexRows]] bucketed by `bkey` and file-sorted by
    * (bkey, __id), so [[minhashIncrementalIndexed]]'s semi-join prune,
    * representative-cap window, and candidate join all reuse the scan's
    * hash partitioning — the store is never re-shuffled at serving
    * time, which is the difference between O(batch) and O(store) work
    * per daily increment against a 100-TB corpus. */
  def writeSigIndex(sigs: DataFrame, idCol: String, table: String,
                    buckets: Int = 8,
                    bands: Int = 4, rowsPerBand: Int = 2): Unit = {
    graft.sources.Lake.writeBucketed(
      sigIndexRows(sigs, idCol, bands, rowsPerBand), table, "bkey",
      buckets, sortCols = Seq("bkey", "__id"))
    // the table name survives the rewrite, so a serving loop's memoized
    // width OK would too — and a layout change would then slip past the
    // check and silently null-pad agreement terms
    invalidateWidthMemo()
  }

  /** INCREMENTAL MinHash near-dedup: drop every `increment` doc that
    * near-duplicates the EXISTING corpus (represented only by its
    * [[minhashSignatures]] table — no corpus text is touched) or a
    * smaller-id doc within the increment itself. The daily-slice flow:
    *
    * {{{
    * val sigs  = spark.read.parquet(sigStore)            // corpus so far
    * val keep  = Dedup.minhashIncremental(batch, "id", "text", sigs)
    * Dedup.minhashSignatures(keep, "id", "text")
    *   .write.mode("append").parquet(sigStore)           // corpus grows
    * }}}
    *
    * Candidates meet through band-key equi-joins (increment×existing
    * and increment×increment — never corpus×corpus). The existing
    * side's exploded band rows are semi-join-pruned to the band keys
    * the increment actually touches BEFORE anything ranks or joins —
    * per-batch cost is O(batch + matched buckets), never a pass over
    * the store — and a hot matched key caps at its `reprPerBucket`
    * smallest-id representatives (a boilerplate key shared by millions
    * of stored docs needs only a few similar representatives to
    * condemn a new arrival — the star-link recall tradeoff, documented
    * at [[candidatePairs]]).
    *
    * Verification is two-grade: WITHIN the increment both docs'
    * shingles are on hand, so candidates verify by exact shingle
    * Jaccard — identical semantics to [[minhashLsh]] (an empty store
    * reduces this operator to it). AGAINST the store only signatures
    * exist, so those candidates verify by signature-estimated Jaccard
    * (fraction of agreeing min-hashes ≥ `threshold`; granularity
    * 1/(bands·rowsPerBand) — size the hash count to the precision the
    * threshold needs). The store's signature width is validated
    * against bands·rowsPerBand up front: a width mismatch would
    * otherwise null out band keys and agreement terms and silently
    * stop detecting duplicates. Docs with <3 tokens carry no
    * signature and are always kept. */
  def minhashIncremental(increment: DataFrame, idCol: String, textCol: String,
                         existingSigs: DataFrame,
                         threshold: Double = 0.8,
                         bands: Int = 4, rowsPerBand: Int = 2,
                         maxBucketSize: Int = 1000,
                         reprPerBucket: Int = 16,
                         materialize: Boolean = true): DataFrame = {
    val numHashes = bands * rowsPerBand
    existingSigs.select(size(col("mh"))).head(1).foreach { r =>
      require(r.getInt(0) == numHashes,
        s"signature store carries ${r.getInt(0)} min-hashes per doc but " +
          s"bands*rowsPerBand = $numHashes — the store must be read with " +
          "the hash layout it was written with")
    }
    minhashIncrementalIndexed(increment, idCol, textCol,
      sigIndexRows(existingSigs, idCol, bands, rowsPerBand),
      threshold, bands, rowsPerBand, maxBucketSize, reprPerBucket,
      materialize)
  }

  /** Width-validation memo for serving indexes: the check needs a
    * (tiny) Spark job, and a per-batch serving loop re-reading the SAME
    * catalog table would otherwise pay that job on every call. Keyed by
    * the index plan's semantic hash — a different table, path, or
    * subquery re-validates; a re-read of the same relation doesn't. A
    * mismatch never memoizes (every call keeps failing loudly), and a
    * REWRITE never serves stale OKs: [[writeSigIndex]] (and the catalog
    * publish face) call [[invalidateWidthMemo]], because a re-landed
    * table keeps its name — and therefore its semantic hash — while its
    * layout may change. Size-bounded: past [[WidthMemoMax]] entries the
    * memo clears wholesale (re-validation is one tiny job; an unbounded
    * key set in a long-lived serving JVM is a leak). */
  private val indexWidthOk =
    java.util.concurrent.ConcurrentHashMap.newKeySet[(Int, Int)]()

  private val WidthMemoMax = 1024

  /** Drop every memoized width OK — call after anything rewrites a
    * serving index in place (same name/path, possibly new layout). */
  def invalidateWidthMemo(): Unit = indexWidthOk.clear()

  private def validateIndexWidth(index: DataFrame, numHashes: Int): Unit = {
    val key = (org.apache.spark.sql.graftbridge.semanticHash(index),
      numHashes)
    if (indexWidthOk.contains(key)) return
    index.select(size(col("mh"))).head(1).foreach { r =>
      require(r.getInt(0) == numHashes,
        s"signature index carries ${r.getInt(0)} min-hashes per doc but " +
          s"bands*rowsPerBand = $numHashes — the index must be read with " +
          "the hash layout it was written with")
    }
    if (indexWidthOk.size >= WidthMemoMax) indexWidthOk.clear()
    indexWidthOk.add(key)
    ()
  }

  /** [[minhashIncremental]] against a store already in the SERVING
    * layout ([[sigIndexRows]] — ideally the bucketed table
    * [[writeSigIndex]] lands, whose scan partitioning the whole store
    * side of this plan then reuses: semi-join prune, representative
    * window, and candidate join all run WITHOUT re-exchanging the
    * store; only batch-sized increment rows ever move). The inline
    * signatures also delete the r8 shape's two join-backs (candidate
    * pairs → increment sigs → store sigs): agreement is verified
    * directly on the joined row, so a pair matched in several bands
    * verifies redundantly (8 string equalities) instead of paying a
    * pair-distinct exchange — strictly cheaper at every scale. */
  def minhashIncrementalIndexed(increment: DataFrame, idCol: String,
                                textCol: String, index: DataFrame,
                                threshold: Double = 0.8,
                                bands: Int = 4, rowsPerBand: Int = 2,
                                maxBucketSize: Int = 1000,
                                reprPerBucket: Int = 16,
                                materialize: Boolean = true): DataFrame = {
    val numHashes = bands * rowsPerBand
    validateIndexWidth(index, numHashes)
    // ONE tokenize+hash pass feeds BOTH faces — the vs-store band rows
    // AND the within-increment family/band stages (round 10: the r9
    // shape paid a second full signature pass + checkpoint inside
    // verifiedPairs). materialize=false skips the pin — zero session
    // residue, the shared subtree recomputes inside the caller's single
    // action; the materialize=true result plan references these blocks,
    // so callers release the RESULT with graftbridge.releaseCheckpoint
    // post-action.
    val docs = shingleDocs(increment, idCol, textCol)
    val sigKeyRaw = sigKey(docs, numHashes)
    val sigKeyC =
      if (materialize) sigKeyRaw.localCheckpoint(true) else sigKeyRaw
    val incRows = sigIndexRows(
      sigKeyC.select(col("__id").as(idCol), col("mh")), idCol,
      bands, rowsPerBand)
    // prune the store's band rows to keys the increment touches, THEN
    // cap hot keys (representative choice is per-key, so pruning first
    // changes nothing but the shuffle size)
    val exTouched = index
      .join(incRows.select(col("bkey")).distinct(), Seq("bkey"), "left_semi")
    val wB = Window.partitionBy(col("bkey")).orderBy(col("__id").asc)
    val exRepr = exTouched
      .withColumn("__rk", row_number().over(wB))
      .filter(col("__rk") <= reprPerBucket)
      .select(col("bkey"), col("__id").as("__ex"), col("mh").as("__mhe"))
    val agree = (a: Column, b: Column) =>
      size(filter(zip_with(a, b, (x, y) => x === y), m => m)) /
        lit(numHashes.toDouble)
    // vs existing: ANY similar existing doc condemns the increment doc
    // (the stored corpus is canonical — it already survived dedup)
    val vsExisting = incRows
      .select(col("bkey"), col("__id"), col("mh").as("__mhi"))
      .join(exRepr, Seq("bkey"))
      .filter(agree(col("__mhi"), col("__mhe")) >= threshold)
      .select(col("__id"))
    // within the increment: exact-Jaccard verification, smaller id
    // survives, hot buckets star-link — minhashLsh's semantics exactly,
    // fed from the SAME signature pass as the vs-store face. No
    // separate edge pin: the DOMINATED set pins below, in one job.
    val withinInc = verifiedPairsFrom(docs, sigKeyC, threshold,
        bands, rowsPerBand, maxBucketSize, materialize = false)
      .select(col("b").as("__id"))
    // no distinct before the anti join: LeftAnti tolerates duplicate
    // build-side keys, and deduping first would EXCHANGE the dominated
    // set once extra for nothing (r10 — one fewer stage per serve)
    val dominatedRaw = vsExisting.union(withinInc)
    // PIN the dominated set (r10): a daily increment is typically a
    // UNION (new slice + backfill), and Catalyst pushes LeftAnti
    // through Union by DUPLICATING the build side per branch — lazy,
    // that re-runs the whole serving pipeline once per branch (measured
    // 2x on q103's two-branch increment); pinned, the duplicate is a
    // scan of one batch-sized RDD. Pinning here also retires the
    // signature checkpoint immediately — the caller releases only the
    // RESULT post-action.
    val dominated =
      if (materialize) {
        val d = dominatedRaw.localCheckpoint(true)
        org.apache.spark.sql.graftbridge.releaseCheckpoint(sigKeyC)
        d
      } else dominatedRaw
    increment.join(dominated.withColumnRenamed("__id", idCol),
      Seq(idCol), "left_anti")
  }

  /** EXACT token-set similarity join by prefix filtering (the
    * AllPairs/PPJoin principle): all pairs with token-set Jaccard ≥
    * `threshold`, with NO recall loss — the lossless alternative to LSH
    * when the threshold is a hard contract rather than a heuristic.
    *
    * Why it scales: J(A,B) ≥ t implies |A∩B| ≥ t·|A|, so if A shares NO
    * token with B inside A's first (|A| − ⌈t·|A|⌉ + 1) tokens under a
    * GLOBAL canonical order, then |A∩B| ≤ ⌈t·|A|⌉ − 1 — contradiction.
    * Ordering every document's tokens rarest-first (corpus frequency
    * asc, token asc — a total order) and inverted-indexing only those
    * short prefixes therefore generates a candidate SUPERSET of all
    * qualifying pairs, sized by rare-token collisions rather than
    * all-pairs; exact verification filters it. Plan shape: one token
    * exchange for frequencies, one group-sized doc rollup, a prefix
    * inverted-index equi-join, verification joins shipping token sets
    * to candidates only.
    *
    * Returns `(a, b, j)` with a < b and j = exact Jaccard (unrounded;
    * callers round for contracts). */
  def prefixSimilarityJoin(corpus: DataFrame, idCol: String,
                           textCol: String,
                           threshold: Double): DataFrame = {
    require(threshold > 0 && threshold <= 1,
      s"threshold must be in (0, 1], got $threshold")
    val toksets = corpus.select(col(idCol).as("__id"),
        expr(s"array_sort(array_distinct(${TextHashes.toks(textCol)}))").as("ts"))
      .filter(size(col("ts")) >= 1)
    val tokRows = toksets.select(col("__id"), explode(col("ts")).as("tok"))
    val freq = tokRows.groupBy(col("tok")).agg(count(lit(1)).as("__c"))
    val prefixes = tokRows.join(freq, "tok")
      .groupBy(col("__id"))
      .agg(sort_array(collect_list(struct(col("__c"), col("tok")))).as("o"))
      .select(col("__id"), expr(
        s"transform(slice(o, 1, size(o) - cast(ceil($threshold * size(o)) as int) + 1), x -> x.tok)")
        .as("pfx"))
    val cand = prefixes.select(col("__id").as("a"), explode(col("pfx")).as("tok"))
      .join(prefixes.select(col("__id").as("b"), explode(col("pfx")).as("tok2")),
        col("tok") === col("tok2") && col("a") < col("b"))
      .select(col("a"), col("b")).distinct()
    cand
      .join(toksets.toDF("a", "tsa"), "a")
      .join(toksets.toDF("b", "tsb"), "b")
      .withColumn("__i", size(array_intersect(col("tsa"), col("tsb"))))
      .withColumn("j", col("__i").cast("double") /
        (size(col("tsa")) + size(col("tsb")) - col("__i")))
      .filter(col("j") >= threshold)
      .select(col("a"), col("b"), col("j"))
  }

  /** Verified near-duplicate EDGES `(a, b)` with a < b: LSH band-key
    * candidates filtered by true-Jaccard ≥ `threshold` — the pair
    * source [[minhashLsh]] and [[minhashLshClusters]] both consume,
    * published so audits (cluster statistics, graph exports, manual
    * review queues) read the same edge set dedup acts on instead of
    * re-deriving a drifting approximation. */
  def minhashEdges(corpus: DataFrame, idCol: String, textCol: String,
                   threshold: Double = 0.8,
                   bands: Int = 4, rowsPerBand: Int = 2,
                   maxBucketSize: Int = 1000,
                   materialize: Boolean = true): DataFrame =
    verifiedPairs(corpus, idCol, textCol, threshold, bands, rowsPerBand,
      maxBucketSize, materialize)

  /** UNVERIFIED LSH candidate pairs `(a, b)`, a < b, from a signature
    * table — the raw band-collision set before any Jaccard check,
    * published for calibration audits (q118) that must see the
    * estimator's actual candidate universe. Routes through the SAME
    * [[sigBuckets]] key scheme and hot-capped [[candidatePairs]] as
    * every dedup face (star-linking above `maxBucketSize`), so an audit
    * can never reintroduce the uncapped bucket self-join the module
    * exists to prevent. */
  def lshCandidates(sigs: DataFrame, idCol: String,
                    bands: Int = 4, rowsPerBand: Int = 2,
                    maxBucketSize: Int = 1000): DataFrame =
    candidatePairs(sigBuckets(sigs, idCol, bands, rowsPerBand),
      maxBucketSize)

  /** Pairwise-domination MinHash-LSH dedup. `materialize = true`
    * (default) runs the signature pass once into a checkpoint and
    * returns a plan over the pinned verified edges — fastest, but the
    * edge blocks stay pinned until the caller releases the RESULT via
    * `org.apache.spark.sql.graftbridge.releaseCheckpoint` after its
    * consuming action; `false` returns a fully lazy, recomputable plan
    * with zero pinned state (the right mode for fire-and-forget query
    * faces run repeatedly in a shared session). */
  def minhashLsh(corpus: DataFrame, idCol: String, textCol: String,
                 threshold: Double = 0.8,
                 bands: Int = 4, rowsPerBand: Int = 2,
                 maxBucketSize: Int = 1000,
                 materialize: Boolean = true): DataFrame = {
    // no distinct: LeftAnti tolerates duplicate build-side keys, and
    // deduping costs an extra exchange of the same rows (r10)
    val dominated =
      verifiedPairs(corpus, idCol, textCol, threshold, bands, rowsPerBand,
        maxBucketSize, materialize)
      .select(col("b").as("__id"))
    corpus.join(dominated.withColumnRenamed("__id", idCol), Seq(idCol), "left_anti")
  }

  /** 16-bit SimHash signature per doc: `(__id, __sig)`. Hash = first 4
    * nibbles of md5 (portable); bit b of the signature is the sign of the
    * ±1 vote sum over the doc's distinct tokens. */
  private def simhashSigs(corpus: DataFrame, idCol: String,
                          textCol: String): DataFrame =
    // fully narrow: distinct tokens + per-bit vote sums are array ops —
    // no explode, no aggregation exchange. Token-less docs carry no
    // signature (matching the explode-based form, where they vanished).
    corpus.select(col(idCol).as("__id"),
        expr(TextHashes.hvArray(textCol)).as("__hvs"))
      .filter(size(col("__hvs")) > 0)
      .select(col("__id"),
        expr(s"cast(${TextHashes.simhashSig("__hvs")} as bigint)").as("__sig"))

  /** SimHash near-dedup: 16-bit signatures over distinct tokens; docs
    * whose signatures collide exactly (Hamming 0 — the conservative
    * bucket) dedup to the smallest id. Raising `prefixBits` below 16
    * trades precision for recall by bucketing on a signature prefix.
    * For true Hamming≤k search use [[simhashNear]]. */
  def simhash(corpus: DataFrame, idCol: String, textCol: String,
              prefixBits: Int = 16): DataFrame = {
    require(prefixBits >= 1 && prefixBits <= 16)
    val mask = ((1L << prefixBits) - 1) << (16 - prefixBits)
    val sigs = simhashSigs(corpus, idCol, textCol)
      .select(col("__id"), col("__sig").bitwiseAND(lit(mask)).as("__sig"))
    val dominated = sigs
      .withColumn("__min", min(col("__id")).over(Window.partitionBy("__sig")))
      .filter(col("__id") > col("__min"))
      .select(col("__id"))
    corpus.join(dominated.withColumnRenamed("__id", idCol), Seq(idCol), "left_anti")
  }

  /** SimHash near-dup search at Hamming distance ≤ `k`: the 16-bit
    * signature splits into `numBands` bit-bands (pigeonhole: two sigs
    * within Hamming k of each other agree exactly on some band whenever
    * k < numBands). Docs matching on any band become candidates — an
    * equi-join on (band, band bits), hot-capped like MinHash — and are
    * verified by exact Hamming distance (`bit_count(a XOR b) <= k`).
    * Smallest id survives. */
  def simhashNear(corpus: DataFrame, idCol: String, textCol: String,
                  k: Int = 2, numBands: Int = 4,
                  maxBucketSize: Int = 1000): DataFrame = {
    require(numBands > k, "pigeonhole needs more bands than flipped bits")
    require(16 % numBands == 0, "bands must tile the 16-bit signature")
    val bandBits = 16 / numBands
    val sigs = simhashSigs(corpus, idCol, textCol)
    val bandCols = (0 until numBands).map(b =>
      struct(lit(b).as("band"),
        shiftright(col("__sig"), b * bandBits)
          .bitwiseAND(lit((1L << bandBits) - 1)).as("key")).as(s"b$b"))
    val buckets = sigs.select(col("__id"),
        explode(array(bandCols: _*)).as("bk"))
      .select(col("__id"), col("bk.band").as("band"),
        col("bk.key").cast("string").as("key"))
    val cand = candidatePairs(buckets, maxBucketSize)
    val dominated = cand
      .join(sigs.toDF("a", "siga"), "a")
      .join(sigs.toDF("b", "sigb"), Seq("b"))
      .filter(bit_count(expr("siga ^ sigb")) <= k)
      .select(col("b").as("__id"))  // LeftAnti dedups; distinct = extra exchange
    corpus.join(dominated.withColumnRenamed("__id", idCol), Seq(idCol), "left_anti")
  }

  /** Connected components over an undirected edge list `(a, b)` via
    * DELTA-iterated min-label propagation: each round, only labels that
    * CHANGED last round (the frontier) are pushed to their neighbors —
    * converged regions of the graph stop costing anything, instead of
    * being re-joined and re-aggregated every round. Converges in
    * O(component diameter) rounds (near-dup graphs are shallow — dup
    * clusters are dense), bounded by `maxIter`.
    *
    * Scale notes: the symmetric edge list is partitioned by the
    * propagation key ONCE and `localCheckpoint`-pinned, so every
    * round's frontier join moves only the frontier side; the round's
    * shuffles (candidate aggregation + label merge) carry
    * O(frontier-adjacent edges), shrinking as components converge
    * (measured per-round in DedupSpec). Only convergence COUNTS cross
    * to the driver; `localCheckpoint` truncates lineage each round,
    * without which the plan doubles per iteration and the scheduler,
    * not the data, becomes the bottleneck.
    *
    * Returns `(node, label)` — label = the component's minimum id. */
  def connectedComponents(edges: DataFrame, maxIter: Int = 20): DataFrame =
    ccDelta(edges, maxIter, null)

  /** Truncate CC lineage with a real checkpoint every K rounds: between
    * truncations each round only CACHES (preserving the node-hash
    * partitioning, so the labels side of the merge join is never
    * re-exchanged — `localCheckpoint` would drop partitioning and force
    * an O(|nodes|) shuffle every round), and the logical plan's
    * double-reference growth (frontier + labels both view the previous
    * round) stays bounded at 2^K before a checkpoint resets it. */
  private val CcTruncateEvery = 8

  /** [[connectedComponents]] with per-round shuffle-record capture —
    * the instrumented face DedupSpec uses to pin the shrinking-rounds
    * contract. */
  private[operators] def ccDelta(edges: DataFrame, maxIter: Int,
      roundShuffle: scala.collection.mutable.Buffer[Long]): DataFrame = {
    val spark = edges.sparkSession
    val cols = edges.columns
    val sym = edges.toDF("x", "y")
      .union(edges.select(col(cols(1)), col(cols(0))).toDF("x", "y"))
      .repartition(col("y")).localCheckpoint(true)
    var labels = sym.select(col("x").as("node")).distinct()
      .withColumn("label", col("node")).persist()
    // round 0: every node just adopted its self-label, so the whole
    // label set is the initial frontier
    var frontier = labels
    var prevCache = labels
    var frontierN = 1L
    var i = 0
    while (frontierN > 0 && i < maxIter) {
      def round(): Unit = {
        // push ONLY frontier labels to neighbors; min per receiving node
        val cand = sym
          .join(frontier.select(col("node").as("y"), col("label")), "y")
          .groupBy(col("x").as("node")).agg(min(col("label")).as("__cand"))
        // one join per round; frontier + merged labels both derive from
        // it narrowly (zero extra shuffle, no double-computed agg)
        val j0 = labels.join(cand, Seq("node"), "left")
        val joined =
          if ((i + 1) % CcTruncateEvery == 0) j0.localCheckpoint(true)
          else j0.persist()
        frontier = joined
          .filter(col("__cand") < col("label"))
          .select(col("node"), col("__cand").as("label"))
        labels = joined.select(col("node"),
          least(col("label"), coalesce(col("__cand"), col("label")))
            .as("label"))
        // ONE action: counts the new frontier and materializes the
        // round's cache on the way; only this count crosses the driver
        frontierN = frontier.count()
        prevCache.unpersist()
        prevCache = joined
      }
      if (roundShuffle != null)
        roundShuffle += graft.Metrics.shuffleOf(spark)(round()).recordsWritten
      else round()
      i += 1
    }
    require(frontierN == 0,
      s"connectedComponents did not converge in $maxIter rounds — " +
        "raise maxIter for deeper component chains")
    // pin the result and release the loop's state — the round cache AND
    // the symmetric-edge checkpoint (2·|edges| blocks that would
    // otherwise outlive the call): callers get a truncated-lineage
    // frame, not a view over our persisted state
    val out = labels.localCheckpoint(true)
    prevCache.unpersist()
    org.apache.spark.sql.graftbridge.releaseCheckpoint(sym)
    out
  }

  /** MinHash-LSH dedup by CLUSTER: candidate pairs verified by Jaccard
    * form a near-dup graph; connected components pick ONE survivor (the
    * minimum id) per component. Stricter than [[minhashLsh]]'s pairwise
    * domination, which keeps extra docs in star-shaped clusters (a doc
    * whose only verified partners have larger ids survives pairwise
    * even when transitively connected to a smaller doc). */
  def minhashLshClusters(corpus: DataFrame, idCol: String, textCol: String,
                         threshold: Double = 0.8,
                         bands: Int = 4, rowsPerBand: Int = 2,
                         maxBucketSize: Int = 1000,
                         ccMaxIter: Int = 20): DataFrame = {
    val verified = verifiedPairs(corpus, idCol, textCol, threshold, bands,
      rowsPerBand, maxBucketSize)
    // CC materializes its own symmetric-edge checkpoint in its first
    // action, after which the verified-edge blocks have served their
    // last read — release them here (this face consumes the edges
    // in-operator, so it can; the lazy-returning faces document the
    // caller-side release contract instead)
    val dominated =
      try connectedComponents(verified, ccMaxIter)
        .filter(col("node") =!= col("label"))
        .select(col("node").as(idCol))
      finally org.apache.spark.sql.graftbridge.releaseCheckpoint(verified)
    corpus.join(dominated, Seq(idCol), "left_anti")
  }

  /** Embedding near-dedup: multi-band sign-LSH. Each band hashes the
    * vector's signs on its own dimension set into a bucket; candidate
    * pairs share a bucket in ANY band (union of bands, like MinHash
    * banding) and are verified by exact cosine ≥ `threshold`. More bits
    * per band → finer pruning (2^bits buckets per band); more bands →
    * higher recall. The round-1 single-band/16-bucket default stopped
    * pruning at corpus scale; the default here is 2 bands × 8 bits
    * (256 buckets each). Hot buckets star-link via `maxBucketSize`.
    *
    * Choosing `bandDims` is a measured decision — q236's audit sweeps
    * (bands × bits) against brute-force truth: the 2×8 default is the
    * NEAR-DUP-regime config (θ→1 pairs collide in every band; the
    * planted-dup recall DedupSpec pins), while at a θ=0.4 gray-zone
    * threshold the measured curve shows no config both prunes and
    * recalls (0.95 recall ⇒ 16×4 ⇒ 65% of all-pairs) — that regime
    * belongs to [[semantic]]/[[semanticAudit]] (SemDeDup), not to more
    * bands. */
  def embeddingCosine(corpus: DataFrame, idCol: String, vecCol: String,
                      threshold: Double,
                      bandDims: Seq[Seq[Int]] =
                        Seq(Seq(1, 9, 17, 25, 33, 41, 49, 57),
                            Seq(5, 13, 21, 29, 37, 45, 53, 61)),
                      maxBucketSize: Int = 1000): DataFrame = {
    val dominated = embeddingCosinePairs(corpus, idCol, vecCol, threshold,
        bandDims, maxBucketSize)
      .select(col("b").as(idCol)) // LeftAnti dedups; distinct = extra exchange
    corpus.join(dominated, Seq(idCol), "left_anti")
  }

  /** The PAIR face of [[embeddingCosine]] (round 15, the q201 agreement
    * audit needs predictions as pairs, not survivors): banded sign-LSH
    * candidates verified by exact cosine ≥ `threshold`, returned as
    * (`a`, `b`, `sim`) with a < b — exactly the pair set whose `b` side
    * [[embeddingCosine]] anti-joins away. */
  def embeddingCosinePairs(corpus: DataFrame, idCol: String, vecCol: String,
                           threshold: Double,
                           bandDims: Seq[Seq[Int]] =
                             Seq(Seq(1, 9, 17, 25, 33, 41, 49, 57),
                                 Seq(5, 13, 21, 29, 37, 45, 53, 61)),
                           maxBucketSize: Int = 1000): DataFrame = {
    def bucketKey(dims: Seq[Int]): Column = concat(dims.map(i =>
      when(element_at(col(vecCol), i).cast("double") >= 0, lit("1"))
        .otherwise(lit("0"))): _*)
    val bandCols = bandDims.zipWithIndex.map { case (dims, b) =>
      struct(lit(b).as("band"), bucketKey(dims).as("key")).as(s"b$b")
    }
    val e = corpus.select(col(idCol).as("__id"),
      expr(s"transform($vecCol, x -> cast(x as double))").as("__v"),
      array(bandCols: _*).as("__bands"))
    val buckets = e.select(col("__id"), explode(col("__bands")).as("bk"))
      .select(col("__id"), col("bk.band").as("band"), col("bk.key").as("key"))
    val cand = candidatePairs(buckets, maxBucketSize)
    val vecs = e.select(col("__id"), col("__v"))
    val sim = graft.functions.Vectors.cosine(col("__va"), col("__vb"))
    cand
      .join(vecs.toDF("a", "__va"), "a")
      .join(vecs.toDF("b", "__vb"), Seq("b"))
      .filter(sim >= threshold)
      .select(col("a"), col("b"), sim.as("sim"))
  }

  /** SemDeDup-style semantic dedup, assignment + audit face (round 14;
    * the one dedup modality LSH can't reach: [[embeddingCosine]]'s
    * sign-LSH bands catch near-IDENTICAL vectors, but paraphrases land
    * in the same semantic REGION with differing sign patterns — the
    * cluster-then-threshold family of Abbas et al., "SemDeDup" 2023,
    * public arXiv:2303.09540).
    *
    * Shape: assign every vector to its nearest centroid by cosine
    * ([[Ann.assignNarrow]] — a per-row fold over the one-row broadcast
    * centroid array, NO exchange), elect the min-id member of each
    * cluster as its representative (the only aggregation — its
    * exchange carries |clusters| min-id partials), fetch the
    * representatives' vectors from the ORIGINAL corpus with a
    * broadcast join on rep_id, and score every member against its
    * cluster's representative — exactly ONE cosine per member,
    * candidates bounded by construction (never within-cluster
    * all-pairs, never doc×doc). Centroids come from
    * [[Ann.trainCentroids]] at scale; oracle-checked contracts pin them
    * explicitly (q79's discipline — k-means centroid bits are
    * merge-order-sensitive at the ulp level).
    *
    * 100-TB posture: ZERO corpus-sized exchanges — two column-pruned
    * corpus scans (assignment feeding the audit and the rep election;
    * rescanning narrow beats pinning a vector-carrying frame, q151's
    * trade), a |clusters|-row aggregate, and two broadcasts of the
    * |clusters|-row rep frame (k×dim doubles).
    *
    * Returns one row per corpus vector: `idCol`, `cid` (the centroid
    * id column name from `centroids`), `rep_id`, `sim` (raw double
    * cosine member↔representative; 1.0-ish for the representative
    * itself). Callers decide the keep rule; [[semantic]] applies the
    * standard one. */
  def semanticAudit(corpus: DataFrame, idCol: String, vecCol: String,
                    centroids: DataFrame, cidCol: String, cvecCol: String)
      : DataFrame = {
    val assigned = Ann.assignNarrow(corpus, idCol, vecCol,
      centroids, cidCol, cvecCol, vecOut = "__v")
    // |clusters|-row exchange: min-id partials combine map-side
    val reps = assigned.groupBy(col(cidCol))
      .agg(min(col(idCol)).as("rep_id"))
    // rep vectors come from the ORIGINAL corpus via a broadcast of the
    // |clusters|-row rep frame — never by re-aggregating the corpus
    val repVecs = corpus
      .select(col(idCol).as("rep_id"),
        graft.functions.Vectors.asDouble(col(vecCol)).as("__rv"))
      .join(broadcast(reps), Seq("rep_id"))
    assigned.join(broadcast(repVecs), Seq(cidCol))
      .select(col(idCol), col(cidCol), col("rep_id"),
        graft.functions.Vectors.cosine(col("__v"), col("__rv")).as("sim"))
  }

  /** SemDeDup keep rule over [[semanticAudit]]: within each cluster the
    * min-id representative always survives; any other member with
    * cosine ≥ `threshold` to its representative drops. Returns the
    * surviving corpus rows (all original columns). */
  def semantic(corpus: DataFrame, idCol: String, vecCol: String,
               centroids: DataFrame, cidCol: String, cvecCol: String,
               threshold: Double): DataFrame = {
    val dropped = semanticAudit(corpus, idCol, vecCol,
        centroids, cidCol, cvecCol)
      .filter(col(idCol) =!= col("rep_id") && col("sim") >= threshold)
      .select(col(idCol))
    corpus.join(dropped, Seq(idCol), "left_anti")
  }

  private val SemStoreMarker = "_graft_semstore_committed"

  /** Persist the SemDeDup serving state — the build-once side of the
    * streaming face (r14 verdict #7; `Ann.saveIndex`'s discipline
    * applied to [[semanticAudit]]'s state). VERSIONED layout (round
    * 16, driver ADVICE — the previous overwrite-in-place protocol only
    * guarded readers that checked the marker BEFORE a rebuild started;
    * a reader that passed the `require()` could still see a torn
    * new-reps/old-centroids view mid-overwrite): each rebuild lands a
    * complete `<path>/v<N>/centroids` (`__cid` long, `__cv`
    * array<double>) + `<path>/v<N>/reps` (`__cid`, `rep_id`, `__rv` —
    * each cluster's elected min-id representative and its vector, both
    * |clusters|-row frames) under a FRESH version directory, then
    * commits by atomically pointing the [[SemStoreMarker]] file at it
    * (tmp + rename-with-overwrite — one filesystem op). Readers
    * resolve the version at marker-read time, so a concurrent rebuild
    * is invisible until its single commit point and never torn. The
    * committed version's predecessor is kept one generation as grace
    * for readers that resolved just before the swap; older versions
    * are reaped. Build cost is the pay-once ingest side (one
    * assignment pass over the corpus); serving never re-elects
    * representatives. */
  def saveSemanticStore(corpus: DataFrame, idCol: String, vecCol: String,
                        centroids: DataFrame, cidCol: String,
                        cvecCol: String, path: String): Unit = {
    val spark = corpus.sparkSession
    graft.sources.Stores.commitVersioned(spark, path, SemStoreMarker) {
      dir =>
        val assigned = Ann.assignNarrow(corpus, idCol, vecCol,
          centroids, cidCol, cvecCol, vecOut = "__v")
        val reps = assigned.groupBy(col(cidCol))
          .agg(min(col(idCol)).as("rep_id"))
        corpus
          .select(col(idCol).as("rep_id"),
            graft.functions.Vectors.asDouble(col(vecCol)).as("__rv"))
          .join(broadcast(reps), Seq("rep_id"))
          .select(col(cidCol).cast("long").as("__cid"), col("rep_id"),
            col("__rv"))
          .write.mode("overwrite").parquet(s"$dir/reps")
        centroids
          .select(col(cidCol).cast("long").as("__cid"),
            graft.functions.Vectors.asDouble(col(cvecCol)).as("__cv"))
          .write.mode("overwrite").parquet(s"$dir/centroids")
    }
  }

  /** Resolve the COMMITTED version directory of a [[saveSemanticStore]]
    * artifact (`<path>/v<N>`) — the reader-side entry the serving faces
    * and specs share, so nothing but the commit pointer ever decides
    * which build is live. Throws on an uncommitted/torn store. */
  private[graft] def semanticStoreDir(
      spark: org.apache.spark.sql.SparkSession, path: String): String =
    graft.sources.Stores.resolveCommitted(spark, path, SemStoreMarker)
      .getOrElse(throw new IllegalArgumentException(
        s"requirement failed: semantic store at $path has no commit " +
          s"marker ($SemStoreMarker) — it is mid-build, torn, or " +
          "absent; rebuild with saveSemanticStore"))

  /** Score a (micro-)batch of vectors against a COMMITTED
    * [[saveSemanticStore]] artifact: nearest committed centroid via the
    * per-row broadcast fold ([[Ann.assignNarrow]] — no exchange), one
    * cosine against that cluster's committed representative. Returns
    * (`idCol`, `cid`, `rep_id`, `sim`) — the [[semanticAudit]] contract
    * with the store supplying the election, so a batch row's decision
    * depends ONLY on committed state + its own vector (deterministic
    * across replays and restarts; the store is read-only here, exactly
    * [[Ann.searchIndex]]'s serving stance). Refuses a store without the
    * commit marker (mid-build or torn).
    *
    * Row-per-batch-row contract (round 16, driver ADVICE): a cluster
    * whose centroid attracted ZERO corpus members at build time has no
    * rep row — realistic with user-supplied or k-means-derived
    * centroid sets — so the rep join is LEFT: a batch vector nearest a
    * rep-less cluster returns (`rep_id` null, `sim` null) instead of
    * silently vanishing, and the serving keep rule defaults such rows
    * to keep (there is no committed representative to be a near-dup
    * of). */
  def semanticServeAudit(spark: org.apache.spark.sql.SparkSession,
                         path: String, batch: DataFrame,
                         idCol: String, vecCol: String): DataFrame = {
    val dir = semanticStoreDir(spark, path)
    val cents = spark.read.parquet(s"$dir/centroids")
    val reps = spark.read.parquet(s"$dir/reps")
    Ann.assignNarrow(batch, idCol, vecCol, cents, "__cid", "__cv",
        vecOut = "__v")
      .join(broadcast(reps), Seq("__cid"), "left")
      .select(col(idCol), col("__cid").as("cid"), col("rep_id"),
        graft.functions.Vectors.cosine(col("__v"), col("__rv")).as("sim"))
  }

  /** Winnowing PAIR detection (round 16, r15 verdict #3 — the operator
    * q203's per-doc fingerprints exist for; Schleimer, Wilkerson &
    * Aiken 2003 §4, the MOSS matcher): documents sharing at least one
    * selected fingerprint, with the shared count and an overlap score.
    * By the winnowing guarantee, any pair sharing a token run of
    * length ≥ k + w − 1 = 6 shares ≥ 1 fingerprint and MUST appear
    * here — the local-selection property a random subsample of k-grams
    * cannot give.
    *
    * Exactness cannot hinge on hash luck (q151's rule): each index
    * entry carries its k-gram STRING as a verification witness, and
    * the pair join matches on (fingerprint, gram) — a 32-bit collision
    * between two DIFFERENT grams never fabricates a shared
    * fingerprint. `n_shared` counts distinct verified fingerprints;
    * `sim` = n_shared / min(|fps_a|, |fps_b|) under the floor idiom.
    *
    * Scale shape: exactly q151's inverted-index discipline — the index
    * is the |selected fingerprints| frame (~2/(w+1) of the k-grams),
    * the candidate join keys on the fingerprint (unhinted — q114's
    * rule), and candidate volume is Σ_fp df² — the SHARED-fingerprint
    * mass, never doc × doc (probed under id-salted replication, where
    * dup density stays constant). `maxDf` drops fingerprints carried
    * by more than that many docs BEFORE the join — the production
    * valve for boilerplate fingerprints (a fp in d docs is d² pair
    * rows; MOSS itself drops over-common fingerprints the same way).
    * The contract face leaves it off: the oracle must see the complete
    * pair set. */
  def winnowingPairs(docs: DataFrame, idCol: String, textCol: String,
                     maxDf: Option[Long] = None): DataFrame = {
    // checkpoint-pin the index: BOTH join sides (and the df filter,
    // when capped) consume it, and an unpinned self-join re-runs the
    // md5-per-k-gram scan once per side (q185's discipline; A/B at
    // sf0.1: 4.5 → 2.3 s warm). The pinned frame is |selected
    // fingerprints| rows — ~2/(w+1) of the k-grams, strictly smaller
    // than a second corpus pass at any scale.
    val pinned = winnowEntries(docs, idCol, textCol).localCheckpoint(false) // lazy pin (r19): both join sides full-scan
    val idx = capDf(pinned, maxDf)
    idx.toDF("a", "n_fp_a", "fp", "gram")
      .join(idx.toDF("b", "n_fp_b", "fp", "gram"), Seq("fp", "gram"))
      .filter(col("a") < col("b"))
      .groupBy(col("a"), col("b"), col("n_fp_a"), col("n_fp_b"))
      .agg(count_distinct(col("fp")).as("n_shared"))
      .select(col("a"), col("b"), col("n_shared"),
        winnowSim(col("n_shared"), col("n_fp_a"), col("n_fp_b")))
  }

  /** The winnowing fingerprint INDEX entries — (`__id`, `n_fp`, `fp`,
    * `gram`): one row per (doc, selected fingerprint, witness k-gram).
    * Factored round 16 so [[winnowingPairs]]' self-join and the
    * committed index ([[saveWinnowIndex]]/[[winnowServe]]) derive the
    * SAME rows from one definition. */
  private def winnowEntries(docs: DataFrame, idCol: String,
                            textCol: String): DataFrame =
    // scan-parallelism floor (round 19, guide §2.5): the tokenize +
    // md5-per-k-gram + winnow-select chain on an unsplittable tiny
    // scan ran as ONE task; self-disabling at real volumes
    graft.Tables.withParallelismFloor(docs, idCol)
      .select(col(idCol).as("__id"),
        expr(TextHashes.toks(textCol)).as("toks"))
      .withColumn("hs", expr(TextHashes.winnowKgramHashes("toks")))
      .withColumn("fps", expr(TextHashes.winnowSelect("hs")))
      .withColumn("grams", expr(
        """CASE WHEN size(toks) < 3 THEN cast(array() as array<string>)
          |ELSE transform(sequence(1, cast(size(toks) - 2 as bigint)),
          |  g -> array_join(slice(toks, cast(g as int), 3), ' '))
          |END""".stripMargin))
      .select(col("__id"), size(col("fps")).cast("long").as("n_fp"),
        explode(expr("array_distinct(filter(arrays_zip(hs, grams), " +
          "z -> array_contains(fps, z.hs)))")).as("z"))
      .select(col("__id"), col("n_fp"), col("z.hs").as("fp"),
        col("z.grams").as("gram"))

  /** The maxDf boilerplate valve over an entries frame: drop
    * fingerprints carried by more than `cap` docs BEFORE any pair
    * join (MOSS's own over-common-fingerprint rule). */
  private def capDf(entries: DataFrame,
                    maxDf: Option[Long]): DataFrame = maxDf match {
    case None => entries
    case Some(cap) =>
      val dfF = entries.select(col("fp"), col("__id")).distinct()
        .groupBy(col("fp")).agg(count(lit(1)).as("__df"))
        .filter(col("__df") <= cap)
        .select(col("fp"))
      entries.join(dfF, Seq("fp"))
  }

  private def winnowSim(nShared: Column, nFpA: Column,
                        nFpB: Column): Column =
    (floor(nShared * lit(10000.0) / least(nFpA, nFpB)) / 10000.0)
      .as("sim")

  private val WinnowStoreMarker = "_graft_winnowstore_committed"

  /** Persist the winnowing fingerprint INDEX (round 16 — MOSS as a
    * service): the corpus-side entries frame landed once under
    * [[graft.sources.Stores]]' versioned-commit protocol, so incoming
    * documents can be checked for shared runs against a FIXED corpus
    * without re-fingerprinting it. `maxDf` is applied AT BUILD — the
    * committed index IS the matching contract (q211's gate
    * discipline), so serving decisions can't drift with batch
    * composition. The landed artifact is the selected-fingerprint
    * frame (~2/(w+1) of the corpus k-grams). */
  def saveWinnowIndex(docs: DataFrame, idCol: String, textCol: String,
                      path: String, maxDf: Option[Long] = None): Unit =
    graft.sources.Stores.commitVersioned(docs.sparkSession, path,
        WinnowStoreMarker) { dir =>
      capDf(winnowEntries(docs, idCol, textCol), maxDf)
        .toDF("corpus_id", "n_fp_corpus", "fp", "gram")
        .write.mode("overwrite").parquet(s"$dir/index")
    }

  /** Match a batch against a COMMITTED [[saveWinnowIndex]] artifact:
    * for each batch doc, every corpus doc sharing ≥ 1
    * selected-and-gram-verified fingerprint, with [[winnowingPairs]]'
    * (n_shared, sim) contract — (idCol, corpus_id, n_shared, sim).
    * Decisions depend only on committed state + the row's own text
    * (the shared serving stance); a batch doc carrying a corpus doc's
    * id matches everything EXCEPT itself (self-pairs are excluded by
    * id). The fp-keyed join is unhinted (q114's rule): a micro-batch's
    * entries are tiny, so AQE broadcasts THEM and the index side
    * streams map-side — per-batch cost is one column-pruned index scan
    * (embarrassingly parallel) + a small aggregate, never an exchange
    * of the index. When even the scan-per-batch is too much (very hot
    * serving paths), the layout answer is an fp-bucketed/sorted index
    * land (Lake.writeBucketed's discipline) so row-group pruning takes
    * over — the committed-artifact protocol here is layout-agnostic.
    * Refuses an uncommitted/torn store. */
  def winnowServe(spark: org.apache.spark.sql.SparkSession, path: String,
                  batch: DataFrame, idCol: String,
                  textCol: String): DataFrame = {
    val dir = graft.sources.Stores
      .resolveCommitted(spark, path, WinnowStoreMarker)
      .getOrElse(throw new IllegalArgumentException(
        s"requirement failed: winnowing index at $path has no commit " +
          s"marker ($WinnowStoreMarker) — it is mid-build, torn, or " +
          "absent; rebuild with saveWinnowIndex"))
    val idx = spark.read.parquet(s"$dir/index")
    winnowEntries(batch, idCol, textCol)
      .toDF("__probe", "n_fp_probe", "fp", "gram")
      .join(idx, Seq("fp", "gram"))
      .filter(col("__probe") =!= col("corpus_id"))
      .groupBy(col("__probe"), col("corpus_id"), col("n_fp_probe"),
        col("n_fp_corpus"))
      .agg(count_distinct(col("fp")).as("n_shared"))
      .select(col("__probe").as(idCol), col("corpus_id"),
        col("n_shared"),
        winnowSim(col("n_shared"), col("n_fp_probe"),
          col("n_fp_corpus")))
  }

  /** Pay-once build for the q212 face. */
  def ensureWinnowIndex(docs: DataFrame, idCol: String, textCol: String,
                        path: String, maxDf: Option[Long] = None): Unit =
    graft.sources.Stores.ensureCommitted(docs.sparkSession, path,
      WinnowStoreMarker)(
      saveWinnowIndex(docs, idCol, textCol, path, maxDf))

  /** The q236 banding-audit sweep: (bands, bits) sign-LSH configs.
    * Shared by the face AND the oracle generator so the two can never
    * drift (TextHashes' one-definition rule). Dim layout per config:
    * band j's bit i reads dim [[signLshDim]] — stride 64/bits with
    * per-band offset j·(64/(bits·bands)), which reproduces
    * [[embeddingCosine]]'s default 2×8 interleave exactly as the
    * (2, 8) row. */
  val signLshAuditConfigs: Seq[(Int, Int)] =
    Seq((1, 8), (2, 8), (4, 8), (8, 8), (2, 4), (4, 4), (8, 4), (16, 4))

  /** 1-based embedding dim read by band `j`'s bit `i` under config
    * (bands, bits); requires bands·bits ≤ 64. */
  def signLshDim(bands: Int, bits: Int, j: Int, i: Int): Int =
    1 + j * (64 / (bits * bands)) + i * (64 / bits)

  /** Cross-document repeated-substring REMOVAL at arbitrary length
    * (round 17; Lee et al. 2021, "Deduplicating Training Data Makes
    * Language Models Better", the ExactSubstr transform): delete from
    * each document every token passage of length ≥ `minRun` that also
    * appears verbatim in an EARLIER document, keeping one canonical
    * copy. The dedup family so far only DETECTS shared runs
    * ([[winnowingPairs]]' fingerprint witnesses, q151/q205's
    * whole-stream containment, q202's fixed 4-token corpus-common
    * spans); this is the transform that actually removes them.
    *
    * **The cover identity — why no pair join exists.** "Remove every
    * maximal cross-document shared run of length ≥ L" is EXACTLY
    * "remove every token position covered by some L-gram whose
    * cross-document frequency is ≥ 2": a shared run of length R ≥ L
    * covers each of its positions with at least one L-window lying
    * fully inside the run, and conversely a duplicated L-gram IS a
    * shared run of length ≥ L containing every position it covers. So
    * the transform needs only the L-gram document-frequency table —
    * never the identity of the partner document, never a doc×doc (or
    * even candidate-pair) join. Candidate volume is the
    * duplicated-gram occurrence mass, strictly below the winnowing
    * route (anchor at a shared fingerprint, extend by pairwise token
    * comparison), which must materialize pairs before extending.
    *
    * **Keeper contract (deterministic keep-one-copy).** Each
    * duplicated gram's KEEPER is the smallest doc id containing it; a
    * position is removed iff some covering gram has df ≥ 2 AND this
    * doc is not that gram's keeper. For a passage shared by docs
    * a < b < …, doc a keeps it and every later doc loses it — the
    * paper's remove-all-but-one-copy, pinned to min-id so any engine
    * replays it. (A position in the keeper itself can still fall to a
    * DIFFERENT overlapping gram kept by an even earlier doc — the
    * per-gram-keeper semantics, stated here so the contract is exact.)
    *
    * **Output is segment-preserving.** `kept_text` joins surviving
    * segments with '\n' (tokens within a segment by ' '): downstream
    * L-grams can never span a removal point, which is what makes a
    * second pass a no-op on the planted regime (every duplicated gram
    * survives only in its keeper, so its df collapses to 1) —
    * re-cleaning cleaned text is spec-tested.
    *
    * `maxDf` is a SEMANTIC dial here, not a scale valve (no pair join
    * exists to blow up): grams in more than `maxDf` docs are
    * corpus-common boilerplate better handled by q202's span gate, and
    * a caller can exclude them from run removal. The contract face
    * leaves it off.
    *
    * Scale shape: one tokenize pass (checkpoint-pinned — the gram
    * index and the final reassembly both consume it, q185's rule); the
    * df/keeper aggregate exchanges |distinct L-grams| rows; the cover
    * join ships the tiny dup-gram table against gram occurrences
    * UNHINTED (q114's rule); covered positions collapse per doc in one
    * partial-aggregable collect_set (bounded by doc length); the final
    * doc-keyed marry joins token arrays to the docs-with-removals
    * frame (AQE broadcasts it in the sparse-dup regime; when dup mass
    * is corpus-scale the key-partitioned join is intrinsic to the
    * transform). Returns `(idCol, n_toks, n_removed, n_runs,
    * clean_sig, kept_text)` — census, removed-segment count, the
    * order-faithful commutative digest of kept (pos:token) pairs
    * (q202's idiom — differential gates can't hash engine-ordered
    * strings, so position bakes into each term of a plain SUM), and
    * the cleaned text itself. */
  def removeSharedRuns(docs: DataFrame, idCol: String, textCol: String,
                       minRun: Int = 5,
                       maxDf: Option[Long] = None): DataFrame = {
    require(minRun >= 2, s"minRun must be >= 2, got $minRun")
    val toksF = runToks(docs, idCol, textCol).localCheckpoint(false) // lazy pin (r19): gate + cover + marry all full-scan
    applyRunGate(toksF, gateOf(runGrams(toksF, minRun), maxDf), minRun,
      idCol)
  }

  /** `(__id, toks)` token frame of a doc batch — the shared input of
    * the run-gate build and the gate apply. */
  private def runToks(docs: DataFrame, idCol: String,
                      textCol: String): DataFrame =
    // scan-parallelism floor (round 19, guide §2.5): the tokenize +
    // gram-explode chain fused onto an unsplittable tiny scan ran as
    // ONE task; self-disabling at real volumes
    graft.Tables.withParallelismFloor(docs, idCol)
      .select(col(idCol).as("__id"),
      expr(TextHashes.toks(textCol)).as("toks"))

  /** minRun-gram occurrence frame `(__id, pos, gram)`. */
  private def runGrams(toksF: DataFrame, minRun: Int): DataFrame =
    toksF
      .filter(size(col("toks")) >= minRun)
      .select(col("__id"), posexplode(expr(
        s"""transform(sequence(1, size(toks) - ${minRun - 1}),
           |  g -> array_join(slice(toks, cast(g as int), $minRun), ' '))"""
          .stripMargin)).as(Seq("__p0", "gram")))
      .select(col("__id"), (col("__p0") + 1).as("pos"), col("gram"))

  /** The duplicated-gram KEEPER GATE over a gram frame:
    * `(gram, keeper)` for grams with 2 ≤ df (≤ maxDf). */
  private def gateOf(grams: DataFrame,
                     maxDf: Option[Long]): DataFrame =
    grams
      .groupBy(col("gram"))
      .agg(count_distinct(col("__id")).as("df"),
        min(col("__id")).as("keeper"))
      .filter(col("df") >= 2 &&
        maxDf.map(cap => col("df") <= cap).getOrElse(lit(true)))
      .select(col("gram"), col("keeper"))

  /** The [[removeSharedRuns]] keeper gate as a standalone frame —
    * what [[saveSubstrStore]] commits. */
  private[graft] def sharedRunGate(docs: DataFrame, idCol: String,
                                   textCol: String, minRun: Int = 5,
                                   maxDf: Option[Long] = None): DataFrame =
    gateOf(runGrams(runToks(docs, idCol, textCol), minRun), maxDf)

  /** [[removeSharedRuns]]'s cover-and-reassemble body against a
    * supplied `(gram, keeper)` gate — a position is removed iff a gate
    * gram covers it and this doc is not that gram's keeper (a batch
    * doc absent from the gate's training corpus keeps nothing it
    * shares with the gate — its id is never the keeper). */
  private def applyRunGate(toksF: DataFrame, gate: DataFrame,
                           minRun: Int, idCol: String): DataFrame = {
    val covered = runGrams(toksF, minRun).join(gate, Seq("gram"))
      .filter(col("__id") =!= col("keeper"))
      .select(col("__id"),
        explode(expr(s"sequence(pos, pos + ${minRun - 1})")).as("cpos"))
      .groupBy(col("__id"))
      .agg(sort_array(collect_set(col("cpos"))).as("covered"))
    toksF.join(covered, Seq("__id"), "left")
      .withColumn("covered",
        coalesce(col("covered"), expr("cast(array() as array<int>)")))
      // zero-token docs (empty/whitespace-only input, or a fully-
      // removed doc re-cleaned): sequence(1, 0) is the DESCENDING
      // [1, 0] (the CurationQueries.scala:35 trap) and position 0
      // would blow up element_at below — guard to an empty kept set,
      // matching the oracle's generate_series(1, 0) = ∅ (r17 ADVICE)
      .withColumn("kept",
        when(size(col("toks")) > 0,
          expr("array_except(sequence(1, size(toks)), covered)"))
          .otherwise(expr("cast(array() as array<int>)")))
      .select(col("__id").as(idCol),
        size(col("toks")).cast("long").as("n_toks"),
        size(col("covered")).cast("long").as("n_removed"),
        // maximal removed segments: covered positions whose
        // predecessor position is not covered (i is the lambda's
        // 0-based index; element_at is 1-based, so element_at(covered,
        // i) IS the previous element — the i = 0 branch short-circuits
        // before the would-be element_at(covered, 0) error)
        expr("""cast(size(filter(covered, (x, i) ->
          |  i = 0 OR element_at(covered, i) <> x - 1)) as bigint)"""
          .stripMargin).as("n_runs"),
        // commutative order-faithful digest of the kept (pos:token)
        // pairs — md5 once per kept token (the two-step map, nib32's
        // rule), nibbles folded in the aggregate
        expr(s"""cast(aggregate(
          |  transform(kept, p -> md5(concat(cast(p as string), ':',
          |    element_at(toks, p)))),
          |  0L, (acc, m) -> acc + ${TextHashes.nib32("m")}) as bigint)"""
          .stripMargin).as("clean_sig"),
        // segments joined by newline (char(10) — ANSI mode leaves
        // '\n' as two literal characters) so re-tokenization cannot
        // form grams across a removal point
        expr("""concat_ws('', transform(kept, (p, i) -> concat(
          |  case when i = 0 then ''
          |       when element_at(kept, i) = p - 1 then ' '
          |       else char(10) end,
          |  element_at(toks, p))))""".stripMargin).as("kept_text"))
  }

  // ---- substring-removal store (round 18, r17 verdict #6) -----------

  private val SubstrStoreMarker = "_graft_substrstore_committed"

  /** Persist the [[removeSharedRuns]] keeper gate (r17 verdict #6 —
    * ExactSubstr's deploy shape, the q202→q211 convention): the
    * duplicated-gram `(gram, keeper)` table is computed ONCE over the
    * reference corpus and landed at `<path>/v<N>/grams` under the
    * versioned-commit protocol, with a one-row `params` table pinning
    * `minRun`/`maxDf` — cleaning against a gate built at a different
    * gram length is a different transform, so the geometry travels
    * WITH the artifact (the q208 torn-pair rule for hyper-parameters).
    * Every subsequent batch cleans against the COMMITTED gate instead
    * of re-aggregating the corpus, so removal decisions are stable
    * across serving runs and replay-deterministic in the streaming
    * face — CCNet's clean-new-data-against-a-reference stance. Build
    * cost is the pay-once tokenize + gram-df pass; the landed artifact
    * is |duplicated grams|-row. */
  def saveSubstrStore(docs: DataFrame, idCol: String, textCol: String,
                      path: String, minRun: Int = 5,
                      maxDf: Option[Long] = None): Unit = {
    require(minRun >= 2, s"minRun must be >= 2, got $minRun")
    val spark = docs.sparkSession
    graft.sources.Stores.commitVersioned(spark, path,
        SubstrStoreMarker) { dir =>
      sharedRunGate(docs, idCol, textCol, minRun, maxDf)
        .write.mode("overwrite").parquet(s"$dir/grams")
      spark.range(1)
        .select(lit(minRun).as("min_run"),
          lit(maxDf.getOrElse(-1L)).as("max_df"))
        .write.mode("overwrite").parquet(s"$dir/params")
    }
  }

  /** Clean a batch against a COMMITTED [[saveSubstrStore]] gate:
    * q230's exact output contract (`(idCol, n_toks, n_removed,
    * n_runs, clean_sig, kept_text)`) with the gate supplied by the
    * store — a position is removed iff a committed duplicated gram
    * covers it and this doc is not that gram's keeper, so a NEW doc
    * (id absent from the training corpus) loses every passage the
    * reference corpus already carries, and serving the training
    * corpus against its own gate replays [[removeSharedRuns]]
    * bit-for-bit (the q244 hash gate). The gate join is unhinted
    * (q114's rule); per-batch cost is one batch tokenize + the gram
    * join — the training corpus is never re-read. Refuses an
    * uncommitted/torn store.
    *
    * Scale note: the committed gate is |duplicated grams|-row —
    * spans-gate-sized on clean corpora but corpus-scale on dup-heavy
    * ones. Unhinted, AQE broadcasts a sane gate; past broadcast range
    * the join degrades to a shuffle join whose GATE-side exchange
    * repeats per batch. A standing high-throughput deployment over a
    * corpus-scale gate wants [[saveSubstrGateBucketed]] /
    * [[substrServeBucketed]] instead (round 19, r18 verdict #1 — the
    * q212 winnow-index discipline made real for this family): the
    * gate lands as a GRAM-BUCKETED catalog table, so every serve's
    * join runs on the store's bucket partitioning and exchanges ONLY
    * the batch side. This path-store face remains the right shape for
    * modest gates (versioned-commit + trust semantics, object-store
    * friendly). */
  def substrServe(spark: SparkSession, path: String, docs: DataFrame,
                  idCol: String, textCol: String): DataFrame = {
    val dir = graft.sources.Stores
      .resolveCommitted(spark, path, SubstrStoreMarker)
      .getOrElse(throw new IllegalArgumentException(
        s"requirement failed: substring-removal store at $path has no " +
          s"commit marker ($SubstrStoreMarker) — it is mid-build, " +
          "torn, or absent; rebuild with saveSubstrStore"))
    val minRun = spark.read.parquet(s"$dir/params")
      .first().getAs[Int]("min_run")
    applyRunGate(runToks(docs, idCol, textCol),
      spark.read.parquet(s"$dir/grams"), minRun, idCol)
  }

  /** Pay-once build for the q244 face. `docs` is BY-NAME: under
    * trust-committed serving ([[graft.sources.Stores.TrustConf]]) a
    * fresh process serves the committed gate without even
    * CONSTRUCTING the corpus frame. */
  def ensureSubstrStore(spark: SparkSession, docs: => DataFrame,
                        idCol: String, textCol: String, path: String,
                        minRun: Int = 5,
                        maxDf: Option[Long] = None): Unit =
    graft.sources.Stores.ensureCommitted(spark, path,
      SubstrStoreMarker)(saveSubstrStore(docs, idCol, textCol, path,
        minRun, maxDf))

  // ---- gram-bucketed substring gate (round 19, r18 verdict #1) ------

  /** Land the [[removeSharedRuns]] keeper gate as a GRAM-BUCKETED
    * catalog table (round 19, r18 verdict #1 — the scale-safe layout
    * the [[substrServe]] scale note names, [[writeSigIndex]]'s
    * zero-store-side-exchange discipline / q212's shape): the
    * `(gram, keeper)` table buckets by `gram` and file-sorts by
    * `gram`, so a standing serve's cover join runs on the SCAN's hash
    * partitioning — the gate side is NEVER re-shuffled, per batch only
    * the batch's own gram occurrences exchange. On a dup-heavy corpus
    * whose gate is corpus-scale (past broadcast range), this is the
    * difference between O(batch) and O(batch + gate) exchange per
    * serve — the q106 pay-once-at-ingest argument. The training
    * geometry (minRun/maxDf) pins in a `<table>_params` companion
    * (one metadata row — the q208 torn-pair rule for
    * hyper-parameters), written AFTER the gate so a reader that sees
    * params sees the matching gate generation. */
  def saveSubstrGateBucketed(docs: DataFrame, idCol: String,
                             textCol: String, table: String,
                             minRun: Int = 5,
                             maxDf: Option[Long] = None,
                             buckets: Int = 8): Unit = {
    require(minRun >= 2, s"minRun must be >= 2, got $minRun")
    val spark = docs.sparkSession
    graft.sources.Lake.writeBucketed(
      sharedRunGate(docs, idCol, textCol, minRun, maxDf), table,
      "gram", buckets, sortCols = Seq("gram"))
    graft.sources.Lake.writeSmallTable(
      spark.range(1)
        .select(lit(minRun).as("min_run"),
          lit(maxDf.getOrElse(-1L)).as("max_df")),
      s"${table}_params")
  }

  /** Clean a batch against the BUCKETED [[saveSubstrGateBucketed]]
    * gate: q230's exact output contract, bit-identical to
    * [[substrServe]] over the same corpus (layout is invisible to
    * semantics — the q106 hash-gate stance), with the gate side of the
    * cover join exchange-FREE: the bucketed scan already hash-
    * partitions on `gram`, so only the batch's gram occurrences
    * shuffle (plan-pinned in `PlanContractSpec`). Geometry reads from
    * the params companion, never the caller. */
  def substrServeBucketed(spark: SparkSession, table: String,
                          docs: DataFrame, idCol: String,
                          textCol: String): DataFrame = {
    val minRun = spark.table(s"${table}_params")
      .first().getAs[Int]("min_run")
    applyRunGate(runToks(docs, idCol, textCol),
      spark.table(table).select(col("gram"), col("keeper")), minRun,
      idCol)
  }

  /** Pay-once build for the q248 face ([[graft.sources.Lake]]'s
    * `ensureTable` memo — q106's discipline: the layout is
    * pay-once-at-ingest and a repeated query invocation must not
    * re-shuffle the corpus into fresh buckets). */
  def ensureSubstrGateBucketed(spark: SparkSession, docs: => DataFrame,
                               idCol: String, textCol: String,
                               table: String, minRun: Int = 5,
                               maxDf: Option[Long] = None,
                               buckets: Int = 8): Unit =
    graft.sources.Lake.ensureTable(spark, table)(
      saveSubstrGateBucketed(docs, idCol, textCol, table, minRun,
        maxDf, buckets))
}
