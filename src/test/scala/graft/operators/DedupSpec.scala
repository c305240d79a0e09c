package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Corpus-level dedup API: planted duplicates must be removed (smallest
  * id kept), unrelated docs must survive, and the real corpus (no dups)
  * must pass through unchanged. */
class DedupSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private lazy val planted = {
    import spark.implicits._
    val real = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .select("doc_id", "text").limit(40)
    val dups = real.filter(col("doc_id") < 5)
      .select((col("doc_id") + 1000).as("doc_id"), col("text"))
    val nearDups = real.filter(col("doc_id") >= 5 && col("doc_id") < 8)
      .select((col("doc_id") + 2000).as("doc_id"),
        concat(col("text"), lit("extra tail token")).as("text"))
    real.unionByName(dups).unionByName(nearDups)
  }

  test("exact dedup removes planted copies, keeps originals") {
    val out = Dedup.exact(planted, "doc_id", "text")
    val ids = out.select("doc_id").collect().map(_.getLong(0)).toSet
    assert((1000 until 1005).forall(i => !ids.contains(i.toLong)),
      "planted exact copies must be dropped")
    assert((0 until 5).forall(i => ids.contains(i.toLong)),
      "originals must survive")
    assert(ids.count(_ >= 2000) == 3, "near-dups are NOT exact dups")
  }

  test("minhash LSH two-stage: drops verified near-dups, keeps LSH false positives") {
    val out = Dedup.minhashLsh(planted, "doc_id", "text", threshold = 0.8)
    val ids = out.select("doc_id").collect().map(_.getLong(0)).toSet
    assert((1000 until 1005).forall(i => !ids.contains(i.toLong)),
      "exact copies share every band and have J=1 -> dropped")
    assert((5 until 8).map(_ + 2000L).forall(i => !ids.contains(i)),
      "tail-appended near-dups have J>0.8 -> dropped")
    assert((0 until 8).forall(i => ids.contains(i.toLong)),
      "originals must survive")
    // the generator itself planted one near-dup in this slice: doc 12 is
    // doc 8 plus a "dup dup dup" tail (true Jaccard 0.974). The two-stage
    // pass must find exactly that one and reject every chance LSH band
    // collision (verified: all other true J < 0.01).
    val realOnly = Dedup.minhashLsh(
      planted.filter(col("doc_id") < 1000), "doc_id", "text", threshold = 0.8)
    val realIds = realOnly.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(!realIds.contains(12L), "planted near-dup of doc 8 must be dropped")
    assert(realIds.contains(8L))
    assert(realOnly.count() == 39)
  }

  test("materialize=false LSH path: identical result, zero session residue") {
    val before = spark.sparkContext.getPersistentRDDs.size
    val lazyIds = Dedup.minhashLsh(planted, "doc_id", "text",
        threshold = 0.8, materialize = false)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // <= not ==: ContextCleaner may asynchronously reap entries pinned
    // by EARLIER tests during this one — only growth is a leak
    assert(spark.sparkContext.getPersistentRDDs.size <= before,
      "the lazy face must pin no blocks in the shared session")
    val pinnedIds = Dedup.minhashLsh(planted, "doc_id", "text",
        threshold = 0.8)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(lazyIds == pinnedIds,
      "recompute and checkpoint modes must keep the same survivors")
    // the cluster face consumes the edges in-operator: after its action,
    // only the CC label checkpoint (the result's basis) may remain
    val b2 = spark.sparkContext.getPersistentRDDs.size
    Dedup.minhashLshClusters(planted, "doc_id", "text", threshold = 0.8)
      .count()
    assert(spark.sparkContext.getPersistentRDDs.size <= b2 + 1,
      "cluster dedup must release the edge + symmetric-edge checkpoints")
  }

  test("simhash dedup drops identical-signature docs only") {
    val out = Dedup.simhash(planted, "doc_id", "text")
    val ids = out.select("doc_id").collect().map(_.getLong(0)).toSet
    assert((1000 until 1005).forall(i => !ids.contains(i.toLong)),
      "identical token sets -> identical simhash -> dropped")
    assert((0 until 5).forall(i => ids.contains(i.toLong)))
  }

  test("minhash LSH hot-bucket cap: 1000-duplicate cluster dedups via star linking") {
    import spark.implicits._
    // 1001 identical docs land in ONE bucket per band; with the cap far
    // below the cluster size the candidate stage must star-link (O(m)
    // pairs against the bucket min), yet still remove every duplicate.
    val cluster = spark.range(0, 1001)
      .select(col("id").as("doc_id"),
        lit("boilerplate header the quick brown fox jumps over the lazy dog").as("text"))
    val distinctDocs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .filter(col("doc_id") < 20)
      .select((col("doc_id") + 5000).as("doc_id"), col("text"))
    val corpus = cluster.unionByName(distinctDocs)
    val out = Dedup.minhashLsh(corpus, "doc_id", "text",
      threshold = 0.8, maxBucketSize = 10)
    val ids = out.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids.contains(0L), "cluster minimum survives")
    assert(!(1 until 1001).exists(i => ids.contains(i.toLong)),
      "every non-min cluster member is dominated by the star center")
    // docs 0-19 contain the generator-planted near-dup (12 ~ 8, J=0.974),
    // which the pass must still find alongside the capped cluster.
    assert(!ids.contains(5012L) && ids.contains(5008L))
    assert(ids.count(_ >= 5000) == 19, "the 19 distinct docs survive")
  }

  test("family collapse: m identical copies emit O(m) edges (rep star), " +
      "clusters and survivors unchanged") {
    import spark.implicits._
    // 50 identical copies of each of 5 distinct texts: verified work
    // runs over the 5 representatives only; every other member attaches
    // by ONE rep->member edge, so the edge count is exactly linear —
    // the all-members graph would carry 5 * C(50,2) = 6125 intra-family
    // pairs before any rep-level edge.
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .filter(col("doc_id") < 5).select(col("doc_id"), col("text"))
    val corpus = spark.range(0, 50).crossJoin(docs)
      .select((col("doc_id") + col("id") * 100).as("doc_id"), col("text"))
    val edges = Dedup.minhashEdges(corpus, "doc_id", "text",
      threshold = 0.8, maxBucketSize = Int.MaxValue).collect()
    // each family: 49 rep->member star edges; rep-level cross-text edges
    // only if two of the 5 base texts are near-dups (none are here)
    assert(edges.length == 5 * 49,
      s"family star must be linear in members: ${edges.length} edges")
    val clusters = Dedup.connectedComponents(
      Dedup.minhashEdges(corpus, "doc_id", "text", threshold = 0.8,
        maxBucketSize = Int.MaxValue)).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // every copy of base doc d clusters to the family minimum (= d)
    for (d <- 0L until 5L; k <- 0L until 50L if k > 0)
      assert(clusters(d + k * 100) == d,
        s"member ${d + k * 100} must label to family min $d")
    // pairwise-domination face: exactly the 5 family minima survive
    val kept = Dedup.minhashLsh(corpus, "doc_id", "text", threshold = 0.8,
      maxBucketSize = Int.MaxValue)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == (0L until 5L).toSet,
      s"one survivor per identical-text family: $kept")
  }

  test("hot-bucket star linking samples K centers, stays linear") {
    import spark.implicits._
    // one oversized bucket of ids 1..5, cap 3, K=2 centers: every
    // member links to centers {1, 2} — 7 pairs (2m-3), never the 10 of
    // the full m^2/2 self-join. Two non-min members (4, 5) still reach
    // center 2, the recall hole a single-center star leaves open.
    val buckets = Seq(1L, 2L, 3L, 4L, 5L)
      .map(i => (i, 0, "k")).toDF("__id", "band", "key")
    val pairs = Dedup.candidatePairs(buckets, maxBucketSize = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L), (1L, 3L), (1L, 4L), (1L, 5L),
      (2L, 3L), (2L, 4L), (2L, 5L)))
  }

  test("simhashNear removes a near-dup within Hamming<=2, exact simhash misses it") {
    import spark.implicits._
    // A single-token doc's signature IS its token's 16-bit hash (one vote
    // per bit), so we can plant an exact Hamming distance: scan a token
    // pool for a pair whose hashes differ in 1..2 bits.
    val hvs = spark.range(0, 300)
      .select(concat(lit("tok"), col("id")).as("tok"))
      .selectExpr("tok",
        """cast((instr('0123456789abcdef', substr(md5(tok),1,1))-1)*4096 +
          |(instr('0123456789abcdef', substr(md5(tok),2,1))-1)*256 +
          |(instr('0123456789abcdef', substr(md5(tok),3,1))-1)*16 +
          |(instr('0123456789abcdef', substr(md5(tok),4,1))-1) as bigint) as hv"""
          .stripMargin)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val pair = (for {
      (ta, ha) <- hvs.iterator; (tb, hb) <- hvs.iterator
      d = java.lang.Long.bitCount(ha ^ hb) if ta < tb && d >= 1 && d <= 2
    } yield (ta, tb)).toSeq.headOption
    assert(pair.nonEmpty, "300 tokens must contain a Hamming<=2 hash pair")
    val (ta, tb) = pair.get
    val (tFar, _) = hvs.find(t =>
      java.lang.Long.bitCount(hvs.find(_._1 == ta).get._2 ^ t._2) > 6).get
    val corpus = Seq((1L, ta), (2L, tb), (3L, tFar)).toDF("doc_id", "text")
    val out = Dedup.simhashNear(corpus, "doc_id", "text", k = 2)
    val ids = out.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids == Set(1L, 3L),
      "Hamming<=2 near-dup dropped, original + distant doc survive")
    // exact-collision dedup does NOT catch a Hamming>0 pair:
    assert(Dedup.simhash(corpus, "doc_id", "text").count() == 3)
  }

  test("incremental minhash dedups a new batch against stored signatures only") {
    import spark.implicits._
    // deterministic slice (an unordered limit() could omit doc 3 and
    // make the stored-copy assertion below pass vacuously)
    val existing = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .select("doc_id", "text").filter(col("doc_id") < 30)
    // the signature STORE is all the increment ever sees of the corpus
    val sigStore = Dedup.minhashSignatures(existing, "doc_id", "text")
    val copyOfExisting = existing.filter(col("doc_id") === 3)
      .select(lit(1L).as("doc_id"), col("text"))  // id SMALLER than 3:
      // the stored corpus must dominate regardless of id order
    val freshText = "completely original sentence about glaciers and " +
      "tectonic plates drifting slowly across deep geological time"
    val fresh = Seq((5000L, freshText)).toDF("doc_id", "text")
    val dupText = "another unique paragraph mentioning wind turbines " +
      "solar arrays and long transmission lines across the open plains"
    val internalDup = Seq((6000L, dupText), (6001L, dupText))
      .toDF("doc_id", "text")
    val tiny = Seq((7000L, "two tokens")).toDF("doc_id", "text")
    val increment = copyOfExisting.unionByName(fresh)
      .unionByName(internalDup).unionByName(tiny)
    val kept = Dedup.minhashIncremental(increment, "doc_id", "text", sigStore)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(5000L, 6000L, 7000L),
      s"existing-copy and larger-internal-dup must drop, fresh/first/" +
        s"short-doc must survive: $kept")
    // appending the survivors' signatures reproduces the full-store
    // state: a SECOND run of the same increment now drops everything
    // that has a signature (only the signature-less tiny doc survives)
    val grown = sigStore.unionByName(
      Dedup.minhashSignatures(
        increment.filter(col("doc_id").isin(5000L, 6000L)),
        "doc_id", "text"))
    val rerun = Dedup.minhashIncremental(increment, "doc_id", "text", grown)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(rerun == Set(7000L),
      s"a re-ingested slice must dedup against its own stored signatures: $rerun")
    // against an EMPTY store the semantics reduce to within-batch dedup
    val empty = sigStore.filter(lit(false))
    val solo = Dedup.minhashIncremental(increment, "doc_id", "text", empty)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(solo == Set(1L, 5000L, 6000L, 7000L),
      s"empty store: only the internal dup drops: $solo")
  }

  test("serving-index width check re-validates after an in-JVM rewrite " +
      "of the same table") {
    import spark.implicits._
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .select("doc_id", "text").filter(col("doc_id") < 20)
    val tbl = "dedupspec_width_memo"
    Dedup.writeSigIndex(
      Dedup.minhashSignatures(docs, "doc_id", "text"), "doc_id", tbl)
    val inc = Seq((9000L, "a perfectly unique paragraph about migrating " +
      "songbirds crossing high mountain passes at night")).toDF("doc_id", "text")
    // first serve memoizes the 4x2 width OK for this table
    assert(Dedup.minhashIncrementalIndexed(inc, "doc_id", "text",
      spark.table(tbl)).count() == 1)
    // rewrite the SAME table with a 2x2 layout: the semantic hash is
    // unchanged, so a stale memo would skip the check and silently
    // null-dilute agreement — the rewrite must invalidate it
    Dedup.writeSigIndex(
      Dedup.minhashSignatures(docs, "doc_id", "text",
        bands = 2, rowsPerBand = 2),
      "doc_id", tbl, bands = 2, rowsPerBand = 2)
    val e = intercept[IllegalArgumentException] {
      Dedup.minhashIncrementalIndexed(inc, "doc_id", "text",
        spark.table(tbl)).count()
    }
    assert(e.getMessage.contains("min-hashes"),
      s"stale-layout serve must fail the width check: ${e.getMessage}")
    // the rewritten layout serves fine
    assert(Dedup.minhashIncrementalIndexed(inc, "doc_id", "text",
      spark.table(tbl), bands = 2, rowsPerBand = 2).count() == 1)
  }

  test("connectedComponents: min label per component, deep chains converge, delta rounds shrink") {
    import spark.implicits._
    // two components: a 12-node chain (tests iteration depth + lineage
    // truncation) and a triangle, plus an isolated edge
    val chain = (1L until 12L).map(i => (i, i + 1))
    val edges = (chain ++ Seq((20L, 21L), (21L, 22L), (20L, 22L), (30L, 31L)))
      .toDF("a", "b")
    val rounds = scala.collection.mutable.Buffer.empty[Long]
    val labels = Dedup.ccDelta(edges, 20, rounds)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert((1L to 12L).forall(labels(_) == 1L), "chain collapses to min id")
    assert(Seq(20L, 21L, 22L).forall(labels(_) == 20L))
    assert(labels(30L) == 30L && labels(31L) == 30L)
    // delta contract: converged regions stop costing — the triangle and
    // isolated edge finish in 2 rounds and the chain's frontier shrinks
    // one node per round, so late rounds must shuffle strictly less
    // than the all-nodes first round
    assert(rounds.size >= 5, s"chain must take many rounds: $rounds")
    assert(rounds.takeRight(2).sum < rounds.take(2).sum / 2,
      s"per-round shuffle must shrink as the frontier contracts: $rounds")
  }

  test("cluster dedup drops star members that pairwise domination keeps") {
    import spark.implicits._
    // star: hub 5 is a near-dup of 1 AND of 2, but 1 and 2 share
    // nothing. Pairwise: 5 dominated (by 1), 2 survives (its only
    // partner, 5, has a larger id). Cluster semantics: {1,2,5} is one
    // component -> only 1 survives.
    val hub = "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
      "one two three four five six seven eight nine ten"
    val a = "alpha beta gamma delta epsilon zeta eta theta iota kappa x y"
    val b = "one two three four five six seven eight nine ten p q"
    val filler = "completely different words nothing shared here at all today"
    val corpus = Seq((1L, a), (2L, b), (5L, hub), (9L, filler))
      .toDF("doc_id", "text")
    val thr = 0.3 // hub shares 10 of ~20 tokens' shingles with each spoke
    val pairwise = Dedup.minhashLsh(corpus, "doc_id", "text", threshold = thr,
        bands = 16, rowsPerBand = 1)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val clustered = Dedup.minhashLshClusters(corpus, "doc_id", "text",
        threshold = thr, bands = 16, rowsPerBand = 1)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(clustered.contains(9L) && pairwise.contains(9L))
    assert(clustered == Set(1L, 9L),
      s"one survivor per component expected, got $clustered")
    assert(pairwise == Set(1L, 2L, 9L),
      s"pairwise keeps the second spoke, got $pairwise")
  }

  test("embedding cosine dedup removes planted identical vectors") {
    import spark.implicits._
    val real = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select("vec_id", "embedding").limit(50)
    val dupVecs = real.filter(col("vec_id") < 3)
      .select((col("vec_id") + 1000).as("vec_id"), col("embedding"))
    val corpus = real.unionByName(dupVecs)
    val out = Dedup.embeddingCosine(corpus, "vec_id", "embedding", 0.999)
    val ids = out.select("vec_id").collect().map(_.getLong(0)).toSet
    assert((1000 until 1003).forall(i => !ids.contains(i.toLong)),
      "identical vectors (cos=1) must be dropped")
    assert((0 until 3).forall(i => ids.contains(i.toLong)))
    // distinct random vectors (max observed cos ~0.4) all survive
    assert(ids.size == 50)
  }

  test("embedding cosine multi-band: perturbed near-identical vectors are recalled") {
    import spark.implicits._
    val real = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select("vec_id", "embedding").limit(50)
    // Perturb dims outside every band's dimension set: cosine drops below
    // 1 but every band bucket is unchanged — the candidate MUST surface
    // through the banding, and verification must confirm it.
    val near = real.filter(col("vec_id") < 3)
      .select((col("vec_id") + 2000).as("vec_id"),
        expr("""transform(embedding,
                |  (x, i) -> case when i in (1, 2, 3)
                |            then x + cast(0.05 as float) else x end)"""
          .stripMargin).as("embedding"))
    val corpus = real.unionByName(near)
    val out = Dedup.embeddingCosine(corpus, "vec_id", "embedding", 0.99)
    val ids = out.select("vec_id").collect().map(_.getLong(0)).toSet
    assert((2000 until 2003).forall(i => !ids.contains(i.toLong)),
      "perturbed near-identical vectors must be dropped")
    assert(ids.size == 50, "all originals survive")
  }

  test("q113's cap-free contract: the default-capped path yields the " +
      "same clusters and survivors on the audit corpus") {
    // q113 runs minhashEdges cap-FREE to hash-match its recursive-CTE
    // oracle (the complete edge set); this pins the production story:
    // on the same corpus the DEFAULT cap (1000) produces identical
    // cluster labels and identical dedup survivors, so the uncapped
    // setting is an oracle-parity requirement, not a scale posture.
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.01")
      .filter(col("doc_id") < 100).select(col("doc_id"), col("text"))
    def clusters(cap: Int) = {
      val edges = Dedup.minhashEdges(docs, "doc_id", "text",
        threshold = 0.8, maxBucketSize = cap)
      Dedup.connectedComponents(edges).toDF("doc_id", "cluster")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    }
    assert(clusters(1000) == clusters(Int.MaxValue),
      "capped and cap-free clustering must agree on the audit corpus")
    def survivors(cap: Int) =
      Dedup.minhashLsh(docs, "doc_id", "text", threshold = 0.8,
          maxBucketSize = cap)
        .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(survivors(1000) == survivors(Int.MaxValue),
      "capped and cap-free dedup must keep the same documents")
  }

  test("semanticAudit composed with trainCentroids matches a scalar " +
      "brute-force SemDeDup: assignment, representatives, similarities") {
    val e = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select("vec_id", "embedding")
    val cents = Ann.trainCentroids(e, "vec_id", "embedding", k = 4, iters = 3)
    val audit = Dedup.semanticAudit(e, "vec_id", "embedding",
        cents, "cid", "embedding")
      .collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap
    // scalar reference over the SAME centroids (collected — k x dim)
    val cs = cents.collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    val vs = e.collect()
      .map(r => r.getLong(0) ->
        r.getSeq[Float](1).map(_.toDouble).toArray)
      .toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
      }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val refAssign = vs.map { case (id, v) =>
      id -> cs.toSeq.map { case (cid, c) => (cos(v, c), -cid, cid) }
        .max._3
    }
    val refReps = refAssign.groupBy(_._2).map { case (cid, m) =>
      cid -> m.keys.min
    }
    assert(audit.keySet == vs.keySet, "one audit row per vector")
    audit.foreach { case (id, (cid, repId, sim)) =>
      assert(cid == refAssign(id), s"vec $id assigned to $cid, " +
        s"reference says ${refAssign(id)}")
      assert(repId == refReps(cid), s"cluster $cid rep $repId != " +
        s"reference min-id ${refReps(cid)}")
      assert(math.abs(sim - cos(vs(id), vs(repId))) < 1e-12,
        s"vec $id sim to rep drifts")
    }
  }

  test("semantic keep rule on controlled geometry: scaled same-direction " +
      "members drop (cosine scale-invariance), min-id reps survive, " +
      "orthogonal clusters never cross-contaminate") {
    import spark.implicits._
    // two orthogonal directions; ids 2 and 4 are scaled copies (cos = 1)
    val corpus = Seq(
      (1L, Seq(1.0f, 0.0f, 0.1f, 0.0f)),
      (2L, Seq(1.5f, 0.0f, 0.15f, 0.0f)), // 1.5 x vector 1 -> sim 1 to rep 1
      (3L, Seq(0.0f, 1.0f, 0.0f, 0.1f)),
      (4L, Seq(0.0f, 2.0f, 0.0f, 0.2f)), // 2 x vector 3 -> sim 1 to rep 3
      (5L, Seq(0.0f, 1.0f, 0.0f, 0.9f)) // same half-space as 3, sim < .95
    ).toDF("vec_id", "embedding")
    val cents = Ann.trainCentroids(corpus, "vec_id", "embedding",
      k = 2, iters = 3)
    val kept = Dedup.semantic(corpus, "vec_id", "embedding",
        cents, "cid", "embedding", threshold = 0.95)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 3L, 5L),
      s"expected scaled members 2 and 4 to drop, got survivors $kept")
    // audit consistency on the REAL corpus: survivors are exactly the
    // audit's under-threshold members plus representatives
    val e = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select("vec_id", "embedding")
    val rcents = Ann.trainCentroids(e, "vec_id", "embedding", k = 4, iters = 3)
    val audit = Dedup.semanticAudit(e, "vec_id", "embedding",
        rcents, "cid", "embedding").collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getDouble(3)))
    val keptReal = Dedup.semantic(e, "vec_id", "embedding",
        rcents, "cid", "embedding", threshold = 0.35)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val expectDrop = audit
      .filter(a => a._1 != a._2 && a._3 >= 0.35).map(_._1).toSet
    assert(keptReal == audit.map(_._1).toSet -- expectDrop,
      "survivors must be exactly corpus minus over-threshold members")
    assert(audit.map(_._2).toSet.subsetOf(keptReal),
      "every representative survives")
  }

  // ---- removeSharedRuns (q230): Lee et al. 2021 ExactSubstr ----------

  /** Scalar reference of the cover contract: a position is removed iff
    * some duplicated minRun-gram covers it and this doc is not that
    * gram's min-id keeper. Returns (n_toks, n_removed, n_runs,
    * clean_sig, kept_text) per doc. */
  private def scalarRemoveRuns(docs: Seq[(Long, String)], minRun: Int)
      : Map[Long, (Long, Long, Long, Long, String)] = {
    def h32(s: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      (0 until 8).map { i =>
        val c = hex(i)
        val v = if (c <= '9') c - '0' else c - 'a' + 10
        v.toLong << (4 * (7 - i))
      }.sum
    }
    val toks: Map[Long, Array[String]] = docs.map { case (id, t) =>
      id -> t.trim.split(" ").filter(_.nonEmpty) }.toMap
    val occ = for {
      (id, ts) <- toks.toSeq
      if ts.length >= minRun
      i <- 1 to ts.length - minRun + 1
    } yield (ts.slice(i - 1, i - 1 + minRun).mkString(" "), id, i)
    val keeper: Map[String, Long] = occ.groupBy(_._1).collect {
      case (g, os) if os.map(_._2).distinct.size >= 2 => g -> os.map(_._2).min
    }
    val covered: Map[Long, Set[Int]] = occ
      .filter(o => keeper.get(o._1).exists(_ != o._2))
      .flatMap(o => (o._3 until o._3 + minRun).map(p => o._2 -> p))
      .groupBy(_._1).map { case (id, ps) => id -> ps.map(_._2).toSet }
    toks.map { case (id, ts) =>
      val cov = covered.getOrElse(id, Set.empty[Int])
      val kept = (1 to ts.length).filterNot(cov)
      val runs = cov.count(p => !cov(p - 1))
      val sb = new StringBuilder
      kept.zipWithIndex.foreach { case (p, i) =>
        if (i > 0) sb.append(if (kept(i - 1) == p - 1) " " else "\n")
        sb.append(ts(p - 1))
      }
      val sig = kept.map(p => h32(s"$p:${ts(p - 1)}")).sum
      id -> ((ts.length.toLong, cov.size.toLong, runs.toLong, sig, sb.toString))
    }
  }

  private def runsOut(df: org.apache.spark.sql.DataFrame)
      : Map[Long, (Long, Long, Long, Long, String)] =
    df.collect().map(r => r.getLong(0) ->
      ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getString(5)))).toMap

  test("removeSharedRuns: planted run — keeper keeps, later doc loses " +
      "exactly the run as one segment gap") {
    import spark.implicits._
    val run = "r1 r2 r3 r4 r5 r6 r7"
    val docs = Seq(
      (1L, s"a1 a2 $run a3 a4"),
      (2L, s"b1 b2 b3 $run b4"),
      (3L, "c1 c2 c3 c4 c5 c6 c7 c8")
    ).toDF("doc_id", "text")
    val out = runsOut(Dedup.removeSharedRuns(docs, "doc_id", "text"))
    assert(out(1L)._5 == s"a1 a2 $run a3 a4", "min-id keeper is intact")
    assert(out(1L)._2 == 0L)
    assert(out(2L)._5 == "b1 b2 b3\nb4",
      s"later doc loses exactly the run: ${out(2L)}")
    assert(out(2L)._2 == 7L && out(2L)._3 == 1L)
    assert(out(3L)._2 == 0L, "unrelated doc untouched")
  }

  test("removeSharedRuns: a shared run shorter than minRun is untouched; " +
      "intra-doc repetition alone never removes (cross-document only)") {
    import spark.implicits._
    val docs = Seq(
      (1L, "s1 s2 s3 s4 x1 x2 x3 x4 x5 x6"),
      (2L, "s1 s2 s3 s4 y1 y2 y3 y4 y5 y6"), // shares only 4 tokens
      (3L, "p1 p2 p3 p4 p5 z9 p1 p2 p3 p4 p5") // 5-gram twice, ONE doc
    ).toDF("doc_id", "text")
    val out = runsOut(Dedup.removeSharedRuns(docs, "doc_id", "text"))
    assert(out.values.forall(_._2 == 0L),
      s"nothing reaches the df>=2 5-gram bar: $out")
  }

  test("removeSharedRuns: zero-token docs (empty, whitespace-only) and a " +
      "fully-removed doc survive the reassembly (r17 ADVICE)") {
    import spark.implicits._
    val run = "r1 r2 r3 r4 r5"
    val docs = Seq(
      (1L, run),            // keeper — keeps the whole text
      (2L, run),            // later doc — fully removed
      (3L, ""),             // empty input
      (4L, "   "),          // whitespace-only input
      (5L, "k1 k2 k3 k4 k5 k6")
    ).toDF("doc_id", "text")
    val out = runsOut(Dedup.removeSharedRuns(docs, "doc_id", "text"))
    assert(out(1L) == ((5L, 0L, 0L, out(1L)._4, run)), "keeper intact")
    assert(out(2L) == ((5L, 5L, 1L, 0L, "")), s"fully removed: ${out(2L)}")
    assert(out(3L) == ((0L, 0L, 0L, 0L, "")), s"empty doc: ${out(3L)}")
    assert(out(4L) == ((0L, 0L, 0L, 0L, "")), s"whitespace doc: ${out(4L)}")
  }

  test("substrServe (q244): serving the training corpus against its " +
      "own COMMITTED gate replays removeSharedRuns; a NEW doc loses " +
      "the reference passage; minRun travels with the artifact; an " +
      "uncommitted store is refused") {
    import spark.implicits._
    val run = "r1 r2 r3 r4 r5 r6"
    val docs = Seq(
      (1L, s"a1 a2 $run a3"),
      (2L, s"b1 $run b2"),
      (3L, "c1 c2 c3 c4 c5 c6")
    ).toDF("doc_id", "text")
    val path = java.nio.file.Files
      .createTempDirectory("graft_substrstore").toString + "/store"
    intercept[IllegalArgumentException] {
      Dedup.substrServe(spark, path, docs, "doc_id", "text").collect()
    }
    Dedup.saveSubstrStore(docs, "doc_id", "text", path)
    val inline = runsOut(Dedup.removeSharedRuns(docs, "doc_id", "text"))
    val served = runsOut(
      Dedup.substrServe(spark, path, docs, "doc_id", "text"))
    assert(served == inline,
      "serving the corpus against its own gate must replay the inline removal")
    // CCNet's deploy stance: a NEW doc (id 99, absent from the training
    // corpus — never a keeper) loses the passage the reference corpus
    // already carries, and keeps its own content as two segments
    val out = runsOut(Dedup.substrServe(spark, path,
      Seq((99L, s"n1 $run n2")).toDF("doc_id", "text"),
      "doc_id", "text"))
    assert(out(99L)._5 == "n1\nn2" && out(99L)._2 == 6L && out(99L)._3 == 1L,
      s"new doc must lose the committed passage: ${out(99L)}")
    // minRun is pinned IN the artifact: a gate built at minRun = 3
    // removes a 3-token shared phrase that the default-5 gate ignores
    val path3 = java.nio.file.Files
      .createTempDirectory("graft_substrstore3").toString + "/store"
    val short3 = Seq((1L, "s1 s2 s3 x1"), (2L, "y1 s1 s2 s3"))
      .toDF("doc_id", "text")
    Dedup.saveSubstrStore(short3, "doc_id", "text", path3, minRun = 3)
    val out3 = runsOut(Dedup.substrServe(spark, path3,
      Seq((99L, "z1 s1 s2 s3 z2")).toDF("doc_id", "text"),
      "doc_id", "text"))
    assert(out3(99L)._2 == 3L && out3(99L)._5 == "z1\nz2",
      s"the committed minRun=3 must drive the serve: ${out3(99L)}")
  }

  test("substr store under trust-committed serving: ensure never " +
      "CONSTRUCTS the corpus frame when a commit exists; hermetic " +
      "default still rebuilds") {
    import spark.implicits._
    val docs = Seq((1L, "t1 t2 t3 t4 t5 x"), (2L, "y t1 t2 t3 t4 t5"))
      .toDF("doc_id", "text")
    val path = java.nio.file.Files
      .createTempDirectory("graft_substr_trust").toString + "/store"
    // committed DIRECTLY (saveSubstrStore does not touch the ensure
    // memo — the same state a fresh serving process sees)
    Dedup.saveSubstrStore(docs, "doc_id", "text", path)
    var touched = 0
    def poisoned: org.apache.spark.sql.DataFrame = { touched += 1; docs }
    spark.conf.set(graft.sources.Stores.TrustConf, "true")
    try {
      Dedup.ensureSubstrStore(spark, poisoned, "doc_id", "text", path)
      assert(touched == 0,
        "trust-committed ensure must not even construct the corpus frame")
    } finally spark.conf.unset(graft.sources.Stores.TrustConf)
    // hermetic default on a DIFFERENT path: the thunk must evaluate
    val path2 = java.nio.file.Files
      .createTempDirectory("graft_substr_trust2").toString + "/store"
    Dedup.ensureSubstrStore(spark, poisoned, "doc_id", "text", path2)
    assert(touched == 1, "hermetic default must rebuild from the corpus")
  }

  test("removeSharedRuns: 40 random shared-phrase corpora match the " +
      "scalar cover reference, and re-cleaning cleaned text is a no-op") {
    import spark.implicits._
    val rnd = new scala.util.Random(17)
    for (c <- 1 to 40) {
      val pool = (0 until 6).map(_ =>
        Array.fill(3 + rnd.nextInt(6))(s"w${rnd.nextInt(9)}").mkString(" "))
      val nDocs = 6 + rnd.nextInt(8)
      val docs = (0 until nDocs).map { i =>
        val parts = (0 until 2 + rnd.nextInt(3)).map(_ =>
          if (rnd.nextBoolean()) pool(rnd.nextInt(pool.size))
          else Array.fill(2 + rnd.nextInt(6))(s"u${i}_${rnd.nextInt(50)}")
            .mkString(" "))
        (i.toLong, parts.mkString(" "))
      }
      val expect = scalarRemoveRuns(docs, 5)
      val got = runsOut(Dedup.removeSharedRuns(
        docs.toDF("doc_id", "text"), "doc_id", "text"))
      assert(got == expect, s"case $c: corpus $docs")
      // idempotence: every duplicated gram survives only in its keeper,
      // so a second pass sees df = 1 everywhere; the '\n' segment joins
      // keep re-tokenized grams from spanning removal points. Fully-
      // removed (empty) docs feed back in UNFILTERED — the r17 ADVICE
      // case: a zero-token doc must come back (0, 0, 0, 0, ""), not
      // trip sequence(1, 0)'s descending-[1, 0] position-0 trap
      val cleaned = got.toSeq.map { case (id, v) => (id, v._5) }
      val again = runsOut(Dedup.removeSharedRuns(
        cleaned.toDF("doc_id", "text"), "doc_id", "text"))
      cleaned.foreach { case (id, t) =>
        assert(again(id)._2 == 0L && again(id)._5 == t,
          s"case $c: re-clean must be a no-op for doc $id")
      }
    }
  }

  test("substrServeBucketed (q248): the gram-bucketed gate layout is " +
      "invisible to semantics — parity with the path store AND the " +
      "inline removal; geometry reads from the params companion") {
    import spark.implicits._
    val run = "g1 g2 g3 g4 g5 g6"
    val docs = Seq(
      (1L, s"a1 a2 $run a3"),
      (2L, s"b1 $run b2"),
      (3L, "c1 c2 c3 c4 c5 c6")
    ).toDF("doc_id", "text")
    val table = "graft_test_substr_gate_parity"
    Dedup.saveSubstrGateBucketed(docs, "doc_id", "text", table)
    val inline = runsOut(Dedup.removeSharedRuns(docs, "doc_id", "text"))
    val bucketed = runsOut(
      Dedup.substrServeBucketed(spark, table, docs, "doc_id", "text"))
    assert(bucketed == inline,
      "bucketed-gate serve must replay the inline removal bit-for-bit")
    val path = java.nio.file.Files
      .createTempDirectory("graft_substr_parity").toString + "/store"
    Dedup.saveSubstrStore(docs, "doc_id", "text", path)
    val served = runsOut(
      Dedup.substrServe(spark, path, docs, "doc_id", "text"))
    assert(bucketed == served,
      "the two gate layouts must serve identical removals")
    // a NEW doc against the bucketed gate — CCNet's deploy stance,
    // same as the path store's
    val out = runsOut(Dedup.substrServeBucketed(spark, table,
      Seq((99L, s"n1 $run n2")).toDF("doc_id", "text"),
      "doc_id", "text"))
    assert(out(99L)._5 == "n1\nn2" && out(99L)._2 == 6L,
      s"new doc must lose the committed passage: ${out(99L)}")
    // minRun pins in the params companion: a minRun = 3 gate removes a
    // 3-token phrase the default-5 gate ignores
    val t3 = "graft_test_substr_gate_min3"
    Dedup.saveSubstrGateBucketed(
      Seq((1L, "s1 s2 s3 x1"), (2L, "y1 s1 s2 s3")).toDF("doc_id", "text"),
      "doc_id", "text", t3, minRun = 3)
    val out3 = runsOut(Dedup.substrServeBucketed(spark, t3,
      Seq((99L, "z1 s1 s2 s3 z2")).toDF("doc_id", "text"),
      "doc_id", "text"))
    assert(out3(99L)._2 == 3L && out3(99L)._5 == "z1\nz2",
      s"the committed minRun=3 must drive the serve: ${out3(99L)}")
  }
}
