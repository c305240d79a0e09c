package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.{SparkEntry, TestSpark}

/** Sanity invariants per query family on sf0.001 (full cross-engine
  * correctness is the driver's DuckDB differential gate; these specs keep
  * `sbt test` meaningful standalone) + the no-oracle C5 sketch bounds. */
class QueriesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"
  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("entry flagship returns one revenue row per region") {
    val rows = SparkEntry.entry(spark).collect()
    assert(rows.length == 5)
    assert(rows.forall(_.getAs[Double]("revenue") > 0))
  }

  test("every declared query runs, respects its contract shape, and " +
      "emits no negative-zero double (the ±0.0 determinism rule)") {
    val collected = SparkEntry.queries.keys.map { k =>
      val df = run(k)
      val dblIdx = df.schema.fields.zipWithIndex.collect {
        case (f, i) if f.dataType ==
          org.apache.spark.sql.types.DoubleType => i
      }
      val rows = df.collect()
      // SURVEY §2.9 rule (round 12): a final double carrying the
      // 0x8000000000000000 bit pattern means an exact-cancellation zero
      // escaped the `+ 0.0` normalizer — the sign is engine-merge-order
      // dependent and the oracle hash gate will flake on it
      rows.foreach { r =>
        dblIdx.foreach { i =>
          if (!r.isNullAt(i)) {
            val bits = java.lang.Double.doubleToRawLongBits(r.getDouble(i))
            assert(bits != 0x8000000000000000L,
              s"$k column ${df.schema(i).name} produced -0.0")
          }
        }
      }
      k -> rows.length.toLong
    }.toMap
    val counts = collected
    // queries over unfiltered base tables must be non-empty (q16 anti-join
    // and q03's IN-list can legitimately be empty at the smallest sf)
    val mustBeNonEmpty = counts.keys.filterNot(
      Set("q16_join_anti", "q03_filter_in_like", "q17_join_theta",
        "q57_between_isnull"))
    mustBeNonEmpty.foreach(k => assert(counts(k) > 0, s"$k returned 0 rows"))
    assert(counts("q01_scan_project") == 5)
    assert(counts("q04_topk") == 10)
    assert(counts("q42_text_topwords") == 20)
    assert(counts("q43_similarity") == 25) // 5 probes x top-5
  }

  test("every query has a DuckDB oracle") {
    assert(SparkEntry.queries.keySet == SparkEntry.oracleSql.keySet)
  }

  test("q38 latest-wins yields exactly one row per customer key") {
    val df = run("q38_upsert_latest")
    assert(df.groupBy("o_custkey").count().filter(col("count") > 1).count() == 0)
  }

  test("q54 LSH pruning never beats the exhaustive scan over its own range") {
    import graft.functions.Vectors
    val e = graft.Tables.embeddings(spark, sf)
      .select(col("vec_id"), Vectors.asDouble(col("embedding")).as("v"))
    // true (unpruned) top-1 per probe over ALL candidates >= 5
    val globalTop = e.filter(col("vec_id") < 5)
      .select(col("vec_id").as("probe"), col("v").as("vp"))
      .crossJoin(e.filter(col("vec_id") >= 5)
        .select(col("vec_id").as("cand"), col("v").as("vc")))
      .groupBy("probe")
      .agg(max(round(Vectors.cosine(col("vp"), col("vc")), 4)).as("best"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val lsh = run("q54_ann_lsh").filter(col("rank") === 1)
      .select("probe", "sim").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    lsh.foreach { case (p, s) =>
      assert(s <= globalTop(p) + 1e-9,
        s"LSH reported sim above the exhaustive optimum for probe $p")
    }
  }

  test("q46 band keys collide for identical documents (LSH recall contract)") {
    import spark.implicits._
    val docs = Seq(
      (0L, "the quick brown fox jumps over the lazy dog again and again"),
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "completely different text with no overlap at all whatsoever here"))
      .toDF("doc_id", "text")
    docs.createOrReplaceTempView("graft_minhash_probe")
    // same pipeline as q46, inlined over the probe table
    val sh = docs.select(col("doc_id"),
        expr("filter(split(trim(text), ' '), x -> x != '')").as("toks"))
      .filter(size(col("toks")) >= 3)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(1, size(toks)-2), i -> concat(element_at(toks,i),' ',element_at(toks,i+1),' ',element_at(toks,i+2)))")).as("s"))
      .distinct()
    val bands = sh.groupBy("doc_id")
      .agg(min(md5(concat(lit("0:"), col("s")))).as("m0"),
        min(md5(concat(lit("1:"), col("s")))).as("m1"))
      .select(col("doc_id"), concat(col("m0"), col("m1")).as("band"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(bands(0L) == bands(1L), "identical docs must share band keys")
    assert(bands(0L) != bands(2L), "unrelated docs must not collide")
  }

  test("q111 int8 quantization keeps cosine within a tight error budget") {
    // 64-dim symmetric int8: worst-case per-element error 0.5/127 of the
    // scale — cosine drift stays well under 0.05 on real vectors, and a
    // violation means the quantizer (not the data) broke
    val rows = run("q111_quantize").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val err = r.getAs[Double]("cos_err")
      assert(err >= 0 && err <= 0.05,
        s"vec ${r.getAs[Long]("vec_id")}: cos_err=$err out of budget")
    }
  }

  test("q108 contamination audit reports every eval doc with a sane fraction") {
    val rows = run("q108_contamination").collect()
    // every eval doc (300-349 with >=3 tokens) reports, zero-hit included
    assert(rows.length == 50)
    rows.foreach { r =>
      val frac = r.getAs[Double]("contamination")
      assert(frac >= 0.0 && frac <= 1.0)
      assert(r.getAs[Long]("n_overlap") <= r.getAs[Long]("n_shingles"))
    }
  }

  test("q110 containment dominates Jaccard for every reported pair") {
    // |A∩B|/min-denominator >= |A∩B|/|A∪B| always: the asymmetric score
    // can only be more sensitive than q47's symmetric one
    val rows = run("q110_containment").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (ca, cb) = (r.getAs[Double]("cont_a"), r.getAs[Double]("cont_b"))
      val cm = r.getAs[Double]("cont_max")
      assert(cm >= ca - 1e-9 && cm >= cb - 1e-9 && cm <= 1.0 + 1e-9)
    }
  }

  test("q188 AUC equals the brute-force pair count (the Mann-Whitney " +
      "identity AUC = [#(click > view) + half the ties] / (n1*n2))") {
    val ev = graft.Tables.events(spark, sf)
      .filter(col("event_type").isin("click", "view"))
      .select("event_type", "value").collect()
    val clicks = ev.filter(_.getString(0) == "click").map(_.getDouble(1))
    val views = ev.filter(_.getString(0) == "view").map(_.getDouble(1))
    var wins = 0L; var ties = 0L
    for (c <- clicks; v <- views)
      if (c > v) wins += 1 else if (c == v) ties += 1
    val brute = (wins + 0.5 * ties) /
      (clicks.length.toDouble * views.length)
    val row = run("q188_auc_mw").collect().head
    assert(row.getLong(0) == clicks.length && row.getLong(1) == views.length)
    assert(math.abs(row.getDouble(2) - brute) <= 5e-5, // round-4 face
      s"AUC ${row.getDouble(2)} vs brute-force $brute")
  }

  test("q191 Luhn validation agrees with a scalar reference and the " +
      "planted valid/invalid split (valid iff doc_id % 8 == 0)") {
    // scalar Luhn over a 16-digit string: from the right, double every
    // second digit (9-wrapped) — the textbook form, written WITHOUT the
    // query's left-position arithmetic so the two derivations check
    // each other
    def luhnOk(s16: String): Boolean = {
      val digits = s16.map(_ - '0')
      val total = digits.reverse.zipWithIndex.map { case (d, i) =>
        if (i % 2 == 1) { val dd = 2 * d; if (dd > 9) dd - 9 else dd }
        else d
      }.sum
      total % 10 == 0
    }
    val rows = run("q191_luhn_card").collect()
    rows.foreach { r =>
      val id = r.getLong(0); val nCand = r.getLong(2); val nValid = r.getLong(3)
      if (id % 4 == 0) {
        assert(nCand == 1L, s"doc $id must carry exactly one planted run")
        // reconstruct the planted card the way the query does
        val d15 = f"${(id * 7919) % 1000000000000000L}%015d"
        val sum15 = d15.zipWithIndex.map { case (c, i0) =>
          val d = c - '0'
          if ((i0 + 1) % 2 == 1) { val dd = 2 * d; if (dd > 9) dd - 9 else dd }
          else d
        }.sum
        val check = (10 - sum15 % 10) % 10
        val digit = if (id % 8 == 0) check else (check + 5) % 10
        val card = d15 + digit.toString
        assert(luhnOk(card) == (id % 8 == 0),
          s"doc $id planted card $card: scalar Luhn disagrees with plant")
        assert(nValid == (if (id % 8 == 0) 1L else 0L),
          s"doc $id n_valid $nValid vs plant rule")
      } else assert(nCand == 0L && nValid == 0L,
        s"unplanted doc $id reported a candidate")
    }
    assert(rows.count(r => r.getLong(3) > 0) > 0, "no valid card detected")
  }

  test("q192 Spearman equals a brute-force average-rank Pearson over " +
      "the collected rows (tie-corrected reference)") {
    val ev = graft.Tables.events(spark, sf)
      .select(col("event_type"), col("value"),
        hour(col("ts")).cast("long").as("hh")).collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
    def avgRanks[T](xs: Seq[T])(implicit ord: Ordering[T]): Seq[Double] = {
      val byV = xs.zipWithIndex.groupBy(_._1)
      val sorted = byV.keys.toSeq.sorted
      val rank = scala.collection.mutable.Map.empty[T, Double]
      var cum = 0L
      sorted.foreach { v =>
        val c = byV(v).size
        rank(v) = cum + (c + 1) / 2.0
        cum += c
      }
      xs.map(rank(_))
    }
    val expect = ev.groupBy(_._1).map { case (t, rows) =>
      val rx = avgRanks(rows.toSeq.map(_._2))
      val ry = avgRanks(rows.toSeq.map(_._3))
      val n = rows.length.toDouble
      val sx = rx.sum; val sy = ry.sum
      val sxx = rx.map(x => x * x).sum; val syy = ry.map(y => y * y).sum
      val sxy = rx.zip(ry).map { case (x, y) => x * y }.sum
      t -> (n * sxy - sx * sy) /
        math.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
    }
    val got = run("q192_spearman").collect()
      .map(r => r.getString(0) -> r.getDouble(2)).toMap
    expect.foreach { case (t, rho) =>
      assert(math.abs(got(t) - rho) <= 5e-5, // round-4 face
        s"type $t: spark ${got(t)} vs brute $rho")
    }
  }

  test("q189 keeps the longest member of every near-dup family (ties " +
      "to the smallest id) and exactly one keeper per cluster") {
    val rows = run("q189_keep_best").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    val chars = graft.Tables.documents(spark, sf)
      .filter(col("doc_id") < 100).select("doc_id", "n_chars").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.groupBy(_._2).foreach { case (cl, members) =>
      val reps = members.map(_._3).distinct
      assert(reps.length == 1, s"cluster $cl has ${reps.length} rep ids")
      val best = members.map(m => chars(m._1)).max
      val expected = members.filter(m => chars(m._1) == best).map(_._1).min
      assert(reps.head == expected,
        s"cluster $cl rep ${reps.head} != argmax-quality $expected")
      assert(members.count(_._4) == 1, s"cluster $cl keeper count != 1")
      members.foreach(m => assert(m._4 == (m._1 == reps.head)))
    }
  }

  test("q194 token-weighted length quantiles match a scalar reference " +
      "(lower weighted quantile over the sorted length distribution)") {
    val docs = graft.Tables.documents(spark, sf)
      .select(col("lang"),
        expr("size(filter(split(trim(text), ' '), x -> x != ''))")
          .cast("long").as("n_tok"))
      .filter(col("n_tok") > 0).collect()
      .map(r => r.getString(0) -> r.getLong(1))
    val got = run("q194_wlen_quantiles").collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    docs.groupBy(_._1).foreach { case (lang, rows) =>
      val lens = rows.map(_._2).sorted
      val w = lens.sum
      def q(alpha4: Long): Long = { // alpha in quarters: 1, 2, 3
        var cum = 0L
        lens.find { l => cum += l; cum * 4 >= w * alpha4 }.get
      }
      val (mass, p25, p50, p75) = got(lang)
      assert(mass == w, s"$lang token mass")
      assert((p25, p50, p75) == (q(1), q(2), q(3)),
        s"$lang quantiles ($p25,$p50,$p75) vs scalar (${q(1)},${q(2)},${q(3)})")
    }
  }

  test("q195 Kendall tau-b equals the brute-force pair count over the " +
      "collected rows (concordant/discordant/ties reference)") {
    val ev = graft.Tables.events(spark, sf)
      .select(col("value"), hour(col("ts")).cast("int").as("hh")).collect()
      .map(r => (r.getDouble(0), r.getInt(1)))
    var c = 0L; var dd = 0L; var tv = 0L; var th = 0L
    for (i <- ev.indices; j <- (i + 1) until ev.length) {
      val (v1, h1) = ev(i); val (v2, h2) = ev(j)
      if (v1 == v2 && h1 == h2) { tv += 1; th += 1 }
      else if (v1 == v2) tv += 1
      else if (h1 == h2) th += 1
      else if ((v1 < v2) == (h1 < h2)) c += 1
      else dd += 1
    }
    val n = ev.length.toLong
    val n0 = n * (n - 1) / 2.0
    val brute = (c - dd) / math.sqrt((n0 - tv) * (n0 - th))
    val row = run("q195_kendall").collect().head
    assert(row.getLong(0) == n)
    assert(math.abs(row.getDouble(1) - brute) <= 5e-5, // round-4 face
      s"tau_b ${row.getDouble(1)} vs brute $brute")
  }

  test("q196 ANOVA F matches the textbook two-pass reference " +
      "(explicit group means, SSB/SSW from deviations)") {
    val ev = graft.Tables.events(spark, sf)
      .select(col("event_type"), col("value")).collect()
      .map(r => r.getString(0) -> r.getDouble(1))
    val byT = ev.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val n = ev.length; val k = byT.size
    val grand = ev.map(_._2).sum / n
    val ssb = byT.values.map { vs =>
      val m = vs.sum / vs.length
      vs.length * (m - grand) * (m - grand)
    }.sum
    val ssw = byT.values.flatMap { vs =>
      val m = vs.sum / vs.length
      vs.map(v => (v - m) * (v - m))
    }.sum
    val f = (ssb / (k - 1)) / (ssw / (n - k))
    val row = run("q196_anova").collect().head
    assert(row.getLong(0) == n && row.getLong(1) == k - 1 &&
      row.getLong(2) == n - k)
    assert(math.abs(row.getDouble(3) - f) <= 5e-4, // round-4 + moment form
      s"F ${row.getDouble(3)} vs two-pass $f")
    assert(math.abs(row.getDouble(4) - ssb / (ssb + ssw)) <= 5e-4)
  }

  test("q197 soft-dedup weights: family members share one unit of " +
      "mass (floor-truncated) and fam_size matches q113's clusters") {
    val rows = run("q197_soft_dedup").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val q113 = run("q113_cc_clusters").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.groupBy(_._2).foreach { case (cl, members) =>
      assert(members.forall(_._3 == members.length),
        s"cluster $cl fam_size != member count")
      val w = members.head._4
      assert(w == math.floor(10000.0 / members.length) / 10000.0)
      // the family's total mass is 1 up to the floor truncation
      assert(members.map(_._4).sum <= 1.0 + 1e-9)
      assert(members.map(_._4).sum > 1.0 - members.length * 1e-4 - 1e-9)
    }
    rows.foreach { case (id, cl, _, _) =>
      assert(q113(id) == cl, s"doc $id cluster drifts from q113") }
  }

  test("q198 store-served segmentation is row-identical to q186's " +
      "inline-trained face (train-once/serve-many contract)") {
    val stored = run("q198_bpe_store").collect().map(_.toString).toSeq
    val inline = run("q186_bpe_encode").collect().map(_.toString).toSeq
    assert(stored.nonEmpty && stored == inline,
      s"store face ${stored.length} rows vs inline ${inline.length}")
  }

  test("q199 subword ids are pointwise and stable under corpus growth " +
      "by disjoint documents (q101's membership-stability discipline)") {
    import graft.operators.TextPipeline
    val docs = graft.Tables.documents(spark, sf)
    val train = docs.filter(col("doc_id") < 50)
    val table = TextPipeline.bpeTrain(train, "doc_id", "text", merges = 8)
    val vocab = TextPipeline.bpeVocab(train, "doc_id", "text", table)
    def idsOf(lo: Long, hi: Long): Map[Long, Seq[Long]] =
      TextPipeline.bpeEncode(
          docs.filter(col("doc_id").between(lo, hi)), "doc_id", "text",
          table, vocab)
        .collect()
        .map(r => r.getLong(0) -> r.getSeq[Long](1).toSeq).toMap
    val full = idsOf(50, 99)
    val part = idsOf(50, 74) // the corpus SHRUNK by disjoint docs
    assert(part.nonEmpty && part.keySet == full.keySet.filter(_ <= 74))
    part.foreach { case (id, ids) =>
      assert(ids == full(id),
        s"doc $id id sequence drifted when disjoint docs were removed")
    }
    // every emitted id is a trained-vocab id or the OOV sentinel 0
    val known = vocab.collect().map(_.getLong(1)).toSet + 0L
    full.values.flatten.foreach(i => assert(known.contains(i)))
    // the q199 face agrees with the operator composition it documents
    val face = run("q199_bpe_ids").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(face == full.view.mapValues(_.length.toLong).toMap)
  }

  test("q200 Gumbel-top-k selection is deterministic across reruns, " +
      "keeps exactly ceil(0.2N), and ranks consistently with its keys") {
    val r1 = run("q200_dsir_select").collect()
    val r2 = run("q200_dsir_select").collect()
    assert(r1.map(_.toString).toSeq == r2.map(_.toString).toSeq,
      "resampling must replay bit-identically (salted-md5 Gumbel)")
    val n = r1.length
    val budget = math.ceil(0.2 * n).toLong
    assert(r1.count(_.getBoolean(4)).toLong == budget)
    assert(r1.map(_.getLong(3)).sorted.toSeq == (1L to n).toSeq,
      "sel_rank must be a permutation of 1..N")
    r1.foreach(r => assert(r.getBoolean(4) == (r.getLong(3) <= budget)))
    // rank order tracks the (rounded) key: descending within tolerance
    val byRank = r1.sortBy(_.getLong(3)).map(_.getDouble(2))
    byRank.sliding(2).foreach { case Array(a, b) =>
      assert(a >= b - 2e-4, s"key order violated: $a then $b")
    }
  }

  test("q203 winnowing guarantee: docs sharing a run of ≥ k+w-1 tokens " +
      "share a fingerprint (Schleimer Thm., 100 random placements)") {
    import graft.operators.TextHashes
    val ss = spark
    import ss.implicits._
    val rnd = new scala.util.Random(42)
    def word() = "w" + rnd.nextInt(5000)
    val cases = (1 to 50).map { i =>
      // a 6-token shared run (k=3, w=4 ⇒ guarantee threshold k+w-1=6)
      // planted at random offsets inside otherwise-random docs
      val shared = Seq.fill(6)(word()).mkString(" ")
      def doc() = {
        val pre = Seq.fill(rnd.nextInt(12))(word()).mkString(" ")
        val post = Seq.fill(rnd.nextInt(12))(word()).mkString(" ")
        s"$pre $shared $post".trim
      }
      (2L * i, 2L * i + 1, doc(), doc())
    }
    val docs = cases.flatMap { case (ia, ib, ta, tb) =>
      Seq((ia, ta), (ib, tb)) }.toDF("doc_id", "text")
    val fps = docs.select(col("doc_id"),
        expr(TextHashes.toks("text")).as("toks"))
      .withColumn("hs", expr(TextHashes.winnowKgramHashes("toks")))
      .withColumn("fps", expr(TextHashes.winnowSelect("hs")))
      .select(col("doc_id"), col("fps")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
    cases.foreach { case (ia, ib, _, _) =>
      assert(fps(ia).intersect(fps(ib)).nonEmpty,
        s"pair ($ia,$ib) shares a 6-token run but no fingerprint")
    }
    // selection stores a fraction of the k-grams (the ~2/(w+1) economy)
    val face = run("q203_winnowing").collect()
    assert(face.forall(r => r.getLong(2) <= r.getLong(1)))
    assert(face.map(r => r.getLong(2)).sum <
      face.map(r => r.getLong(1)).sum * 3 / 4,
      "fingerprints must be a strict sub-selection of k-gram hashes")
    // round 16 (r15 verdict #3): the PAIR face detects every planted
    // pair — the winnowing guarantee lifted from "shares a fingerprint"
    // to "appears in winnowingPairs' output", gram-verified
    val pairs = graft.operators.Dedup.winnowingPairs(
        docs, "doc_id", "text")
      .select(col("a"), col("b")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    cases.foreach { case (ia, ib, _, _) =>
      assert(pairs.contains((ia, ib)),
        s"planted-run pair ($ia,$ib) missing from winnowingPairs")
    }
    // the maxDf valve filters the index BEFORE the pair join: at cap 1
    // every pairable fingerprint (df ≥ 2 by definition) is dropped, so
    // the planted pairs — present above — must all disappear
    val capped = graft.operators.Dedup.winnowingPairs(
      docs, "doc_id", "text", maxDf = Some(1L))
    assert(capped.count() == 0,
      "maxDf = 1 must drop every shared fingerprint from the index")
  }

  test("q208/q211 store-backed faces are value-identical to their " +
      "inline twins (the shared-oracle rule, checked in-process too)") {
    def canon(name: String) = run(name).collect().map(_.toString).toSeq
    assert(canon("q208_bpe_ids_store") == canon("q199_bpe_ids"),
      "ids served from the persisted (merges+vocab) store must equal " +
        "the inline-trained sequences bit-for-bit")
    assert(canon("q211_boilerplate_store") == canon("q202_boilerplate"),
      "cleaning served from the committed span gate must equal the " +
        "inline aggregate bit-for-bit")
    assert(canon("q212_winnow_store") == canon("q209_winnow_pairs"),
      "matching served from the committed fingerprint index must " +
        "equal the inline self-join bit-for-bit")
    assert(canon("q213_dsir_store") == canon("q187_dsir_weights"),
      "scoring served from the committed log-ratio table must equal " +
        "the inline estimate-and-score (round-4 both faces)")
  }

  test("q202 boilerplate census is internally consistent and the gate " +
      "is data-relative") {
    val rows = run("q202_boilerplate").collect()
    assert(rows.forall(r => r.getLong(2) <= r.getLong(1)),
      "n_bp must never exceed n_spans")
    assert(rows.exists(_.getLong(2) > 0),
      "the small-vocab corpus must surface some cross-doc boilerplate")
    assert(rows.exists(r => r.getLong(2) < r.getLong(1)),
      "the df gate must not condemn every span")
    rows.foreach { r =>
      val expect = math.floor(r.getLong(2) * 10000.0 / r.getLong(1)) / 10000.0
      assert(r.getDouble(3) == expect, s"bp_frac drifts on doc ${r.getLong(0)}")
    }
  }

  test("q206 closed-form moments match the textbook two-pass " +
      "central-moment computation") {
    val face = run("q206_moments").collect()
      .map(r => r.getString(0) -> (r.getDouble(3), r.getDouble(4),
        r.getDouble(5))).toMap
    val byType = graft.Tables.events(spark, sf)
      .select(col("event_type"), col("value")).collect()
      .groupBy(_.getString(0)).view
      .mapValues(_.map(_.getDouble(1))).toMap
    byType.foreach { case (t, vs) =>
      val n = vs.length.toDouble
      val mu = vs.sum / n
      val m2 = vs.map(v => math.pow(v - mu, 2)).sum / n
      val m3 = vs.map(v => math.pow(v - mu, 3)).sum / n
      val m4 = vs.map(v => math.pow(v - mu, 4)).sum / n
      val (sd, sk, ku) = face(t)
      assert(math.abs(sd - math.sqrt(m2)) <= 2e-4, s"$t sd")
      assert(math.abs(sk - m3 / math.pow(m2, 1.5)) <= 2e-4, s"$t skew")
      assert(math.abs(ku - (m4 / (m2 * m2) - 3)) <= 2e-4, s"$t kurt")
    }
  }

  test("C5 approx_count_distinct is within rsd bounds of exact") {
    val li = graft.Tables.lineitem(spark, sf)
    val exact = li.select(countDistinct(col("l_partkey"))).first().getLong(0)
    val approx = li.select(approx_count_distinct(col("l_partkey"), 0.05))
      .first().getLong(0)
    assert(math.abs(approx - exact).toDouble / exact < 0.15,
      s"approx=$approx exact=$exact")
  }

  test("q220 funnel is monotone non-increasing in docs AND tokens, " +
      "starts at the corpus, and the quota stage keeps ceil-half") {
    val st = run("q220_funnel").collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3)))
    assert(st.map(_._1).toSeq == Seq(0L, 1L, 2L, 3L, 4L))
    val nraw = graft.Tables.documents(spark, sf).count()
    assert(st.head._2 == nraw, "stage 0 must count the whole corpus")
    st.sliding(2).foreach { case Array((s1, d1, t1), (s2, d2, t2)) =>
      assert(d2 <= d1 && t2 <= t1,
        s"stage $s2 must not grow the survivor set: $d1/$t1 -> $d2/$t2")
    }
    // the quota stage keeps per-source ceil(half) of the lang stage —
    // globally that is at least half of stage 3 and at most half + the
    // per-source ceil slack (< #sources)
    val (d3, d4) = (st(3)._2, st(4)._2)
    val nSources = graft.Tables.documents(spark, sf)
      .select("source").distinct().count()
    assert(d4 * 2 >= d3 && d4 * 2 <= d3 + nSources,
      s"quota must keep ceil-half per source: lang=$d3 quota=$d4")
  }
}
