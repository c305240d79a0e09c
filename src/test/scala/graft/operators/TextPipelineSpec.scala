package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** TextPipeline invariants beyond the oracle checks: chunk coverage and
  * overlap algebra, normalization idempotence, split determinism. */
class TextPipelineSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("regex span build == slice+array_join span build on edge texts " +
      "(round-19 rewrite equivalence: empty/single/multi-space/tab/" +
      "non-multiple-of-4 token counts)") {
    val docs = Seq(
      (1L, ""), (2L, "   "), (3L, "one"),
      (4L, "a b c"), (5L, "a b c d"), (6L, "a b c d e"),
      (7L, "a  b   c d  e f g h i"), // multi-space runs collapse
      (8L, "ta\tb c d e"),            // tab stays INSIDE a token
      (9L, " lead and trail pad  "),
      (10L, (1 to 23).map(i => s"w$i").mkString(" ")))
      .toDF("doc_id", "text")
    val rx = TextPipeline.spanFrame(docs, "doc_id", "text")
    // the pre-round-19 reference form, verbatim
    val ref = docs
      .select(col("doc_id"),
        expr(TextHashes.toks("text")).as("toks"))
      .withColumn("ls", expr(
        """CASE WHEN size(toks) = 0 THEN cast(array() as array<string>)
          |ELSE transform(sequence(1, cast(ceil(size(toks) / 4.0) as bigint)),
          |  g -> array_join(slice(toks, cast((g-1)*4+1 as int), 4), ' '))
          |END""".stripMargin))
      .select(col("doc_id"), posexplode(col("ls")).as(Seq("pos0", "span")))
      .select(col("doc_id"), (col("pos0") + 1).cast("long").as("pos"),
        col("span"))
    assert(rx.exceptAll(ref).count() == 0 && ref.exceptAll(rx).count() == 0,
      "regex span frame must be row-identical to the slice+join form")
    // spot shape: 23 tokens -> 6 spans, last span 3 tokens
    val d10 = rx.filter(col("doc_id") === 10).orderBy("pos").collect()
    assert(d10.length == 6)
    assert(d10.last.getString(2) == "w21 w22 w23")
  }

  test("chunks cover every token; consecutive chunks share the overlap") {
    val text = (1 to 47).map(i => s"t$i").mkString(" ")
    val corpus = Seq((1L, text)).toDF("doc_id", "text")
    val chunks = TextPipeline.chunk(corpus, "doc_id", "text", 20, 5)
      .orderBy("chunk_idx").collect()
      .map(r => (r.getLong(1), r.getString(2).split(" ").toSeq))
    // stride 15 over 47 tokens -> ceil(42/15)=3 chunks
    assert(chunks.length == 3)
    assert(chunks(0)._2.size == 20 && chunks(1)._2.size == 20)
    assert(chunks(2)._2.size == 17, "last chunk clamps at the end")
    // coverage: concatenating de-overlapped chunks reconstructs the doc
    val rebuilt = chunks(0)._2 ++ chunks(1)._2.drop(5) ++ chunks(2)._2.drop(5)
    assert(rebuilt == text.split(" ").toSeq)
    // overlap: last 5 of chunk k == first 5 of chunk k+1
    assert(chunks(0)._2.takeRight(5) == chunks(1)._2.take(5))
    // a doc shorter than the overlap still yields one chunk
    val tiny = TextPipeline.chunk(
      Seq((2L, "a b c")).toDF("doc_id", "text"), "doc_id", "text", 20, 5)
    assert(tiny.count() == 1)
    assert(tiny.first().getString(2) == "a b c")
  }

  test("normalize is idempotent and ascii-canonical") {
    val df = Seq((1L, "  Hello,   WORLD!! (42) \t"), (2L, "already clean"))
      .toDF("doc_id", "text")
      .select(col("doc_id"),
        TextPipeline.normalize(col("text")).as("n1"))
      .select(col("doc_id"), col("n1"),
        TextPipeline.normalize(col("n1")).as("n2"))
    val rows = df.collect().map(r => (r.getString(1), r.getString(2)))
    assert(rows.head._1 == "hello world 42")
    assert(rows.forall { case (a, b) => a == b }, "normalize(normalize(x)) == normalize(x)")
  }

  test("hashSplit is deterministic and disjoint-exhaustive") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .select("doc_id")
    val s1 = TextPipeline.hashSplit(docs, "doc_id")
    val s2 = TextPipeline.hashSplit(docs, "doc_id")
    assert(s1.collect().toSet == s2.collect().toSet, "same ids -> same split")
    val counts = s1.groupBy("split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.keySet == Set("train", "val", "test"))
    assert(counts.values.sum == docs.count())
    assert(counts("train") > counts("val") && counts("val") >= counts("test"),
      s"expected ~81/12.5/6 proportions, got $counts")
  }

  test("encode maps tokens to df-ranked ids, preserves order, pads/truncates") {
    import spark.implicits._
    // df: b appears in 3 docs, a in 2, c in 1 -> ids b=1, a=2, c=3
    val docs = Seq(
      (1L, "a b c b"),
      (2L, "b a"),
      (3L, "b"),
      (4L, "   ")).toDF("doc_id", "text") // token-less doc must survive
    val enc = TextPipeline.encode(docs, "doc_id", "text", maxLen = 3)
      .collect().map(r => r.getLong(0) ->
        (r.getSeq[Long](1), r.getSeq[Long](2))).toMap
    assert(enc(1L)._1 == Seq(2L, 1L, 3L, 1L), "order must follow the text")
    assert(enc(1L)._2 == Seq(2L, 1L, 3L), "over-length docs truncate")
    assert(enc(2L)._1 == Seq(1L, 2L))
    assert(enc(2L)._2 == Seq(1L, 2L, 0L), "short docs pad with unkId")
    assert(enc(3L)._2 == Seq(1L, 0L, 0L))
    assert(enc(4L)._1 == Seq() && enc(4L)._2 == Seq(0L, 0L, 0L),
      "token-less docs keep an empty/all-pad row, not disappear")
  }

  test("encode against a persisted vocabulary: OOV -> unkId, stable ids") {
    import spark.implicits._
    val v1 = Seq((1L, "a b c b"), (2L, "b a"), (3L, "b"))
      .toDF("doc_id", "text")
    // vocab from the v1 corpus: b=1 (3 docs), a=2 (2), c=3 (1)
    val vocab = TextPipeline.rankedVocabulary(v1, "doc_id", "text")
    assert(vocab.orderBy("tok_id").collect()
      .map(r => r.getString(0) -> r.getLong(2)).toSeq ==
      Seq("b" -> 1L, "a" -> 2L, "c" -> 3L))
    // OOV: tokens outside the vocabulary encode as unkId
    val oov = TextPipeline.encode(
        Seq((9L, "a zzz b")).toDF("doc_id", "text"), "doc_id", "text",
        vocab, 0, -1L)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(oov(9L) == Seq(2L, -1L, 1L), "unknown token must become unkId")
    // stability: growing the corpus until frequencies cross does NOT
    // move ids when encoding against the persisted vocabulary...
    val v2 = v1.union(Seq((4L, "c d"), (5L, "c d"), (6L, "c d"), (7L, "c d"))
      .toDF("doc_id", "text"))
    val stable = TextPipeline.encode(v2, "doc_id", "text", vocab)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(stable(1L) == Seq(2L, 1L, 3L, 1L) && stable(2L) == Seq(1L, 2L)
      && stable(3L) == Seq(1L), "v1 docs must encode exactly as before")
    assert(stable(4L) == Seq(3L, 0L), "c keeps its old id; new token d -> unkId")
    // ...whereas the self-deriving form reshuffles them (c outranks a
    // in v2 — the instability persisted vocabularies exist to prevent)
    val reshuffled = TextPipeline.encode(v2, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(reshuffled(2L) != stable(2L) || reshuffled(1L) != stable(1L),
      "re-derived vocabulary should rank differently on the grown corpus")
  }

  test("dedupSpans: C4 line rule — first occurrence wins, order is " +
      "preserved, foreign lines survive, and the pass is idempotent") {
    val df = Seq(
      (1L, "alpha\nbeta\nalpha\ngamma\nbeta"),
      (2L, "x\nx\nx"),
      (3L, "only one line"))
      .toDF("doc_id", "text")
      .select(col("doc_id"),
        TextPipeline.dedupSpans(col("text"), "\n").as("c1"))
      .select(col("doc_id"), col("c1"),
        TextPipeline.dedupSpans(col("c1"), "\n").as("c2"))
    val rows = df.collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getString(2))).toMap
    assert(rows(1L)._1 == "alpha\nbeta\ngamma")
    assert(rows(2L)._1 == "x")
    assert(rows(3L)._1 == "only one line")
    assert(rows.values.forall { case (a, b) => a == b },
      "clean(clean(x)) == clean(x)")
  }

  test("dedupSpans idempotence + first-occurrence property over 200 " +
      "seeded-random span lists (span alphabet sized to force repeats)") {
    val rnd = new scala.util.Random(421447)
    val docs = (0 until 200).map { i =>
      val n = 1 + rnd.nextInt(30)
      val spans = Seq.fill(n)(s"s${rnd.nextInt(6)}")
      (i.toLong, spans.mkString("|"), spans)
    }
    val out = docs.map(d => (d._1, d._2)).toDF("doc_id", "text")
      .select(col("doc_id"),
        TextPipeline.dedupSpans(col("text"), "|").as("c1"))
      .select(col("doc_id"), col("c1"),
        TextPipeline.dedupSpans(col("c1"), "|").as("c2"))
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getString(2)))
      .toMap
    docs.foreach { case (id, _, spans) =>
      val expect = spans.distinct.mkString("|") // Scala distinct = first wins
      assert(out(id)._1 == expect, s"doc $id: ${out(id)._1} != $expect")
      assert(out(id)._2 == out(id)._1, s"doc $id: second pass must be a no-op")
    }
  }

  /** Scalar reference BPE (Sennrich 2016): per-round corpus-weighted
    * adjacent-pair counts over distinct words, argmax with (freq DESC,
    * lhs, rhs) ties, greedy leftmost-non-overlapping merge application. */
  private def refBpe(wordCounts: Map[String, Long], k: Int)
      : Seq[(Long, String, String, Long)] = {
    def applyMerge(sy: List[String], l: String, r: String): List[String] = {
      val b = scala.collection.mutable.ListBuffer.empty[String]
      var i = 0
      while (i < sy.length) {
        if (i + 1 < sy.length && sy(i) == l && sy(i + 1) == r) {
          b += (l + r); i += 2
        } else { b += sy(i); i += 1 }
      }
      b.toList
    }
    var state = wordCounts.map { case (w, c) =>
      w -> (w.map(_.toString).toList, c)
    }
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, String, String, Long)]
    var step = 1
    var done = false
    while (step <= k && !done) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      state.values.foreach { case (sy, c) =>
        sy.zip(sy.tail).foreach(p => counts(p) = counts.getOrElse(p, 0L) + c)
      }
      if (counts.isEmpty) done = true
      else {
        val ((l, r), n) = counts.toSeq
          .sortBy { case ((l, r), n) => (-n, l, r) }.head
        out += ((step.toLong, l, r, n))
        state = state.map { case (w, (sy, c)) => w -> (applyMerge(sy, l, r), c) }
      }
      step += 1
    }
    out.toSeq
  }

  test("bpeTrain matches the scalar reference BPE merge-for-merge on " +
      "the sf0.001 corpus, and bpeSegment round-trips every token") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val wordCounts = docs
      .select(explode(expr(TextHashes.toks("text"))).as("w"))
      .groupBy("w").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val expect = refBpe(wordCounts, 8)
    val got = TextPipeline.bpeTrain(docs, "doc_id", "text", merges = 8)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
      .toSeq
    assert(got == expect, s"merge tables diverge:\n got=$got\n exp=$expect")
    // encode round-trip: concatenating a token's symbols rebuilds it,
    // and the symbols are exactly the reference's post-merge state
    val table = TextPipeline.bpeTrain(docs, "doc_id", "text", merges = 8)
    val segs = TextPipeline.bpeSegment(docs, "doc_id", "text", table)
      .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    assert(segs.keySet == wordCounts.keySet)
    segs.foreach { case (tok, sy) =>
      assert(sy.mkString("") == tok, s"round-trip broke for $tok: $sy")
    }
    // reference post-merge symbol state must agree (proves the string
    // replace IS the greedy merge, runs included)
    def refSegment(w: String): List[String] =
      expect.foldLeft(w.map(_.toString).toList) { case (sy, (_, l, r, _)) =>
        val b = scala.collection.mutable.ListBuffer.empty[String]
        var i = 0
        while (i < sy.length) {
          if (i + 1 < sy.length && sy(i) == l && sy(i + 1) == r) {
            b += (l + r); i += 2
          } else { b += sy(i); i += 1 }
        }
        b.toList
      }
    wordCounts.keySet.foreach { w =>
      assert(segs(w).toList == refSegment(w),
        s"segmentation diverges for $w: ${segs(w)} vs ${refSegment(w)}")
    }
  }

  test("bpeTrain greedy run semantics: a aaa-style run merges leftmost-" +
      "non-overlapping (aa + a), and boundary-char tokens are excluded") {
    val corpus = Seq(
      (1L, "aaa aaa aaa aaa bb_x bb_x"), // aaa x4; '_' token excluded
      (2L, "aaa ab ab ab")).toDF("doc_id", "text")
    // pair counts: (a,a) appears 2x per 'aaa' (overlapping adjacency)
    // x5 = 10; (a,b) 3x. Round 1 merges (a,a) -> 'aaa' becomes [aa, a]
    // (greedy leftmost, NOT [a, aa]); round 2: candidates (aa,a) 5,
    // (a,b) 3 -> merges (aa,a).
    val got = TextPipeline.bpeTrain(corpus, "doc_id", "text", merges = 2)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
      .toSeq
    assert(got == Seq((1L, "a", "a", 10L), (2L, "aa", "a", 5L)), s"got $got")
    val segs = TextPipeline.bpeSegment(corpus, "doc_id", "text",
        TextPipeline.bpeTrain(corpus, "doc_id", "text", merges = 1))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    assert(segs("aaa") == Seq("aa", "a"), s"greedy run split: ${segs("aaa")}")
    assert(!segs.contains("bb_x"), "boundary-char tokens are filtered")
  }

  test("dsirLogWeights matches a scalar reference (same md5 buckets, " +
      "Laplace smoothing) and orders target-like docs above pool-like") {
    // target docs speak vocabulary {alpha..}, pool docs {zeta..}; the
    // mixed doc sits between. Scalar reference replicates the exact
    // bucket/smoothing/ln pipeline in plain Scala.
    val corpus = Seq(
      (1L, "alpha beta gamma alpha", true),
      (2L, "alpha beta beta", true),
      (3L, "zeta eta theta zeta", false),
      (4L, "zeta eta eta", false),
      (5L, "alpha beta zeta eta", false)).toDF("doc_id", "text", "tgt")
    val got = TextPipeline.dsirLogWeights(corpus, "doc_id", "text",
        isTarget = col("tgt"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    // scalar reference
    def bucket(f: String): Int = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(f.getBytes("UTF-8")).map("%02x".format(_)).mkString
      val a = "0123456789abcdef"
      a.indexOf(hex(0)) * 16 + a.indexOf(hex(1))
    }
    def feats(text: String): Seq[Int] = {
      val t = text.trim.split(" ").filter(_.nonEmpty).toSeq
      (t ++ t.zip(t.drop(1)).map { case (a, b) => s"$a $b" }).map(bucket)
    }
    val docs = Seq(1L -> ("alpha beta gamma alpha", true),
      2L -> ("alpha beta beta", true), 3L -> ("zeta eta theta zeta", false),
      4L -> ("zeta eta eta", false), 5L -> ("alpha beta zeta eta", false))
    val all = docs.flatMap { case (_, (t, _)) => feats(t) }
    val tgtF = docs.filter(_._2._2).flatMap { case (_, (t, _)) => feats(t) }
    val rawCnt = all.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val tgtCnt = tgtF.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val T = tgtF.size.toLong; val R = all.size.toLong
    def lr(b: Int): Double =
      math.log((tgtCnt.getOrElse(b, 0L) + 1L) / (T + 256.0)) -
        math.log((rawCnt(b) + 1L) / (R + 256.0))
    docs.foreach { case (id, (t, _)) =>
      val fs = feats(t)
      val expLogw = fs.groupBy(identity).map { case (b, occ) =>
        occ.size.toLong * lr(b) }.sum
      val (nf, lw) = got(id)
      assert(nf == fs.size, s"doc $id n_feats $nf != ${fs.size}")
      assert(math.abs(lw - expLogw) < 1e-9,
        s"doc $id logw $lw != scalar $expLogw")
    }
    // direction: every pure-target doc outscores every pool-only doc,
    // and the half-target mixed doc lands strictly between the camps
    // (absolute sign is smoothing-dependent at this corpus size — with
    // T=12 target features against the +256 Laplace mass every weight
    // sits below 0 — so the contract is the ORDERING, which is what
    // importance RESAMPLING consumes)
    val tgtMin = math.min(got(1L)._2, got(2L)._2)
    val poolMax = math.max(got(3L)._2, got(4L)._2)
    assert(tgtMin > poolMax, s"target camp ($tgtMin) must outscore pool ($poolMax)")
    assert(got(5L)._2 > poolMax && got(5L)._2 < tgtMin,
      s"mixed doc (${got(5L)._2}) sits between the camps")
  }

  // ---- subword trainer (q237–q239): scalar-reference parity ----------

  /** Scalar replay of the hard-EM greedy-match contract. */
  private def scalarSubword(texts: Seq[String], minCount: Long = 5,
      rounds: Int = 2): (Map[String, Long], Set[String]) = {
    val words = texts.flatMap(_.trim.split(" ").filter(_.nonEmpty))
      .filter(_.length <= 12)
    val wc = words.groupBy(identity).map { case (w, o) => w -> o.size.toLong }
    val seedCnt = collection.mutable.Map[String, Long]()
    for ((w, c) <- wc; l <- 2 to 4; p <- 0 to w.length - l) {
      val s = w.substring(p, p + l)
      seedCnt(s) = seedCnt.getOrElse(s, 0L) + c
    }
    def segment(w: String, vocab: Set[String]): Seq[String] = {
      var pos = 0
      val out = collection.mutable.Buffer[String]()
      while (pos < w.length) {
        val cand = Seq(4, 3, 2)
          .map(l => w.substring(pos, math.min(pos + l, w.length)))
        val hit = cand.find(vocab.contains)
          .getOrElse(w.substring(pos, pos + 1))
        out += hit
        pos += hit.length
      }
      out.toSeq
    }
    var vocab: Set[String] = seedCnt.filter(_._2 >= minCount).keySet.toSet
    var usage: Map[String, Long] = Map.empty
    for (r <- 1 to rounds) {
      usage = wc.toSeq
        .flatMap { case (w, c) => segment(w, vocab).map(_ -> c) }
        .groupBy(_._1).map { case (p, xs) => p -> xs.map(_._2).sum }
      if (r < rounds)
        vocab = usage.collect {
          case (p, u) if p.length >= 2 && u >= minCount => p }.toSet
    }
    (usage, usage.keySet.filter(_.length >= 2))
  }

  test("subwordTrain matches the scalar hard-EM reference on the real " +
      "corpus slice; encode replays the final round and reconstructs " +
      "every word") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .filter(col("doc_id") < 120).select("doc_id", "text")
    val texts = docs.select("text").collect().map(_.getString(0)).toSeq
    val (expUsage, expVocab) = scalarSubword(texts)
    val trained = TextPipeline.subwordTrain(docs, "text")
    val gotUsage = trained.collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(gotUsage == expUsage,
      s"usage drift: extra=${(gotUsage.keySet -- expUsage.keySet).take(5)} " +
        s"missing=${(expUsage.keySet -- gotUsage.keySet).take(5)}")
    assert(expVocab.exists(_.length >= 2),
      "the trainer must learn at least one multi-char piece")
    val seg = TextPipeline.subwordSegment(docs, "text",
        TextPipeline.subwordVocab(trained))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2)))
    seg.foreach { case (tok, np, s) =>
      assert(s.replace(" ", "") == tok,
        s"segmentation must reconstruct the word: $tok -> $s")
      assert(np == s.split(" ").length.toLong)
      s.split(" ").foreach(p => assert(p.length <= 4))
    }
    // encode ≡ the final training round: every multi-char piece used
    // by the encode is a trained-vocab piece with matching usage mass
    val encUsage = seg.flatMap { case (tok, _, s) =>
      val c = texts.flatMap(_.trim.split(" ").filter(_.nonEmpty))
        .count(_ == tok).toLong
      s.split(" ").map(_ -> c)
    }.groupBy(_._1).map { case (p, xs) => p -> xs.map(_._2).sum }
    assert(encUsage == expUsage, "encode must replay the final round")
  }

  test("subword trainer: planted corpus learns the repeated stem and " +
      "prunes the one-off junk") {
    import spark.implicits._
    // 'abcd' appears in many words; 'zxqw' appears once
    val docs = ((1 to 10).map(i => (i.toLong, s"abcdef$i abcdxy"))
      ++ Seq((99L, "zxqwpt"))).toDF("doc_id", "text")
    val trained = TextPipeline.subwordTrain(docs, "text")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(trained.contains("abcd"),
      s"the repeated 4-char stem must survive training: $trained")
    assert(!trained.keySet.exists(p => p.length >= 2 && p.contains("zxqw")
        && trained(p) >= 5),
      s"one-off junk must not reach the vocabulary: $trained")
  }

  test("subword store under trust-committed serving: ensure never " +
      "CONSTRUCTS the corpus frame when a commit exists") {
    import spark.implicits._
    val docs = (1 to 8).map(i => (i.toLong, s"abcd$i abcd"))
      .toDF("doc_id", "text")
    val path = java.nio.file.Files
      .createTempDirectory("graft_subword_trust").toString + "/store"
    TextPipeline.saveSubwordStore(docs, "text", path)
    var touched = 0
    def poisoned: org.apache.spark.sql.DataFrame = { touched += 1; docs }
    spark.conf.set(graft.sources.Stores.TrustConf, "true")
    try {
      TextPipeline.ensureSubwordStore(spark, poisoned, "text", path)
      assert(touched == 0,
        "trust-committed ensure must not even construct the corpus frame")
    } finally spark.conf.unset(graft.sources.Stores.TrustConf)
  }

  test("subword store (q243): serving the training corpus replays the " +
      "inline train→segment; the training GEOMETRY travels with the " +
      "artifact; an uncommitted store is refused") {
    import spark.implicits._
    // 'overlong11' (10 chars) exceeds the stored max_word_len = 8 and
    // must be OUT of the served universe (it would fit the default 12)
    val docs = ((1 to 10).map(i => (i.toLong, s"abcdef$i abcdxy wxy wxyz"))
      ++ Seq((99L, "qrs qrs overlong11 overlong11"))).toDF("doc_id", "text")
    val path = java.nio.file.Files
      .createTempDirectory("graft_subwordstore").toString + "/store"
    intercept[IllegalArgumentException] {
      TextPipeline.subwordServe(spark, path, docs, "text").collect()
    }
    // NON-default geometry: pieces ≤ 3 chars, words ≤ 8, minCount 2
    TextPipeline.saveSubwordStore(docs, "text", path,
      maxPieceLen = 3, maxWordLen = 8, minCount = 2, rounds = 2)
    val inline = TextPipeline.subwordSegment(docs, "text",
        TextPipeline.subwordVocab(TextPipeline.subwordTrain(docs, "text",
          maxPieceLen = 3, maxWordLen = 8, minCount = 2, rounds = 2)),
        maxPieceLen = 3, maxWordLen = 8)
      .collect().map(_.toSeq).toSet
    val served = TextPipeline.subwordServe(spark, path, docs, "text")
      .collect().map(_.toSeq).toSet
    assert(served == inline,
      "store-served segmentation must equal the inline train→encode")
    // geometry pinned IN the store: a serve segments under the stored
    // 3-char piece cap and 8-char word cap, not the defaults — a 4-char
    // piece or a 9+-char token in the output would mean the serve
    // ignored the committed params
    served.foreach { r =>
      assert(r(0).toString.length <= 8,
        s"stored max_word_len must bound the served universe: $r")
      r(2).toString.split(' ').foreach(p => assert(p.length <= 3,
        s"stored max_piece_len must bound every served piece: $r"))
    }
    assert(served.exists(_(2).toString.split(' ').exists(_.length == 3)),
      "the planted stem must yield at least one 3-char piece")
  }
}
