package graft.queries

/** DuckDB oracle SQL for the pipeline-extension queries q46–q54.
  * Mirrors [[PipelineQueries]] exactly (portable md5-based hashes, double
  * arithmetic over exact integer counts, rounded ordering keys). */
object PipelineOracles {

  /** Shared CTE: non-empty whitespace tokens. */
  private def toksCte(pred: String) =
    s"""t AS (SELECT doc_id, list_filter(string_split(trim(text), ' '), x -> x <> '') AS toks
       |  FROM documents $pred)""".stripMargin

  /** Shared CTE: distinct word 3-gram shingles (requires t). Two-step
    * (positions via unnest-in-SELECT, then 1-based list_extract) so the
    * same text parses on both engines — Spark has no lateral
    * `unnest(...) AS u(i)` table alias. */
  private val shCte =
    """shix AS (SELECT doc_id, toks, unnest(generate_series(1, len(toks) - 2)) AS i
      |  FROM t WHERE len(toks) >= 3),
      |sh AS (SELECT DISTINCT doc_id,
      |    list_extract(toks, i) || ' ' || list_extract(toks, i + 1) || ' ' || list_extract(toks, i + 2) AS s
      |  FROM shix)""".stripMargin

  private val q46 = {
    val mins = (0 until 8).map(j => s"min(md5('$j:' || s)) AS m$j").mkString(", ")
    s"""WITH ${toksCte("WHERE doc_id < 100")},
       |$shCte,
       |m AS (SELECT doc_id, $mins FROM sh GROUP BY doc_id)
       |SELECT doc_id, m0 || m1 AS band0, m2 || m3 AS band1,
       |       m4 || m5 AS band2, m6 || m7 AS band3
       |FROM m ORDER BY doc_id""".stripMargin
  }

  private val q47 =
    s"""WITH ${toksCte("WHERE doc_id < 60")},
       |$shCte,
       |cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
       |p AS (SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS inter
       |      FROM sh x JOIN sh y ON x.s = y.s AND x.doc_id < y.doc_id
       |      GROUP BY 1, 2)
       |SELECT a, b, round(inter / (ca.n + cb.n - inter), 4) AS jaccard
       |FROM p JOIN cnt ca ON ca.doc_id = a JOIN cnt cb ON cb.doc_id = b
       |ORDER BY jaccard DESC, a, b LIMIT 20""".stripMargin

  private val q48 = {
    def nib(i: Int) = s"(instr('0123456789abcdef', substr(md5(tok),$i,1)) - 1)"
    val hv = s"(${nib(1)}*4096 + ${nib(2)}*256 + ${nib(3)}*16 + ${nib(4)})"
    val bitSums = (0 until 16)
      .map(b => s"sum(CASE WHEN (hv & ${1 << b}) <> 0 THEN 1 ELSE -1 END) AS s$b")
      .mkString(", ")
    val sig = (0 until 16)
      .map(b => s"CASE WHEN s$b > 0 THEN ${1L << b} ELSE 0 END")
      .mkString(" + ")
    s"""WITH ${toksCte("WHERE doc_id < 100")},
       |tok AS (SELECT DISTINCT doc_id, tok FROM
       |  (SELECT doc_id, unnest(toks) AS tok FROM t)),
       |h AS (SELECT doc_id, $hv AS hv FROM tok),
       |bits AS (SELECT doc_id, $bitSums FROM h GROUP BY doc_id)
       |SELECT doc_id, CAST($sig AS BIGINT) AS simhash
       |FROM bits ORDER BY doc_id""".stripMargin
  }

  private val cosSql =
    "list_dot_product(%A, %B) / (sqrt(list_dot_product(%A, %A)) * sqrt(list_dot_product(%B, %B)))"
  private def cos(a: String, b: String) =
    cosSql.replace("%A", a).replace("%B", b)

  private val q49 =
    s"""WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
       |  FROM embeddings WHERE vec_id < 100)
       |SELECT x.vec_id AS a, y.vec_id AS b,
       |  round(${cos("x.v", "y.v")}, 4) AS sim
       |FROM e x JOIN e y ON x.vec_id < y.vec_id
       |ORDER BY sim DESC, a, b LIMIT 20""".stripMargin

  private val q50 =
    s"""WITH ${toksCte("")},
       |f AS (SELECT t.doc_id,
       |  CAST(len(toks) AS BIGINT) AS n_tok,
       |  len(list_filter(toks, x -> list_contains(list_value('the','a','of','to','and','in','is'), x))) AS n_stop,
       |  d.lang
       |  FROM t JOIN documents d ON d.doc_id = t.doc_id)
       |SELECT doc_id, n_tok, round(n_stop / n_tok, 4) AS stop_ratio, lang,
       |  CASE WHEN round(n_stop / n_tok, 4) >= 0.08 THEN 'en' ELSE 'unk' END AS pred_lang
       |FROM f ORDER BY doc_id""".stripMargin

  private val q51 =
    s"""WITH ${toksCte("")},
       |f AS (SELECT t.doc_id,
       |  CAST(len(toks) AS BIGINT) AS n_tok,
       |  CAST(len(list_distinct(toks)) AS BIGINT) AS n_distinct,
       |  CAST(length(replace(trim(d.text), ' ', '')) AS BIGINT) AS n_char
       |  FROM t JOIN documents d ON d.doc_id = t.doc_id),
       |g AS (SELECT doc_id, n_tok, n_distinct, n_char,
       |  round(n_distinct / n_tok, 4) AS ttr,
       |  round(n_char / n_tok, 4) AS avg_wlen
       |  FROM f)
       |SELECT doc_id, n_tok, n_distinct, n_char, ttr, avg_wlen,
       |  round(0.5 * ttr + 0.5 * least(avg_wlen / 10.0, 1.0), 6) AS quality
       |FROM g ORDER BY doc_id""".stripMargin

  private val q52 =
    """SELECT doc_id,
      |  CAST(len(list_filter(string_split(trim(text), ' '), x -> x <> '')) AS BIGINT) AS ws_tokens,
      |  CAST(len(regexp_extract_all(text, '[a-z0-9]+', 0)) AS BIGINT) AS re_tokens,
      |  CAST(length(replace(trim(text), ' ', '')) AS BIGINT) AS n_char,
      |  CAST(ceil(length(replace(trim(text), ' ', '')) / 4.0) AS BIGINT) AS bpe_est
      |FROM documents ORDER BY doc_id LIMIT 200""".stripMargin

  private val q53 =
    s"""WITH ${toksCte("WHERE doc_id < 100")},
       |$shCte
       |SELECT doc_id,
       |  CAST(count(*) AS BIGINT) AS n_shingles,
       |  CAST(count(CASE WHEN substr(md5(s), 32, 1) = '0' THEN 1 END) AS BIGINT) AS n_sel,
       |  min(CASE WHEN substr(md5(s), 32, 1) = '0' THEN md5(s) END) AS fp_min
       |FROM sh GROUP BY doc_id ORDER BY doc_id""".stripMargin

  private val q54 = {
    val bucket = Seq(1, 17, 33, 49)
      .map(i => s"(CASE WHEN CAST(list_extract(embedding, $i) AS DOUBLE) >= 0 THEN '1' ELSE '0' END)")
      .mkString(" || ")
    s"""WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v,
       |  $bucket AS bucket FROM embeddings),
       |pairs AS (
       |  SELECT p.vec_id AS probe, p.bucket AS bucket, c.vec_id AS cand,
       |    round(${cos("p.v", "c.v")}, 4) AS sim
       |  FROM e p JOIN e c ON p.bucket = c.bucket
       |  WHERE p.vec_id < 5 AND c.vec_id >= 5),
       |ranked AS (
       |  SELECT probe, bucket, cand, sim,
       |    CAST(row_number() OVER (PARTITION BY probe ORDER BY sim DESC, cand) AS BIGINT) AS rank
       |  FROM pairs)
       |SELECT probe, bucket, cand, sim, rank FROM ranked
       |WHERE rank <= 3 ORDER BY probe, rank""".stripMargin
  }

  private val q58 = {
    val mins = (0 until 8).map(j => s"min(md5('$j:' || s)) AS m$j").mkString(", ")
    val bandSelects = (0 until 4).map(b =>
      s"SELECT doc_id, $b AS band, m${2 * b} || m${2 * b + 1} AS key FROM m")
      .mkString("\n  UNION ALL ")
    s"""WITH ${toksCte("WHERE doc_id < 100")},
       |$shCte,
       |m AS (SELECT doc_id, $mins FROM sh GROUP BY doc_id),
       |bk AS ($bandSelects),
       |cand AS (
       |  SELECT x.doc_id AS a, y.doc_id AS b FROM bk x JOIN bk y
       |  ON x.band = y.band AND x.key = y.key AND x.doc_id < y.doc_id
       |  GROUP BY 1, 2),
       |cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
       |shared AS (
       |  SELECT c.a, c.b, count(*) AS inter FROM cand c
       |  JOIN sh sa ON sa.doc_id = c.a
       |  JOIN sh sb ON sb.doc_id = c.b AND sb.s = sa.s
       |  GROUP BY 1, 2),
       |dom AS (
       |  SELECT DISTINCT b FROM shared
       |  JOIN cnt ca ON ca.doc_id = a
       |  JOIN cnt cb ON cb.doc_id = b
       |  WHERE inter / (ca.n + cb.n - inter) >= 0.8)
       |SELECT doc_id FROM documents
       |WHERE doc_id < 100 AND doc_id NOT IN (SELECT b FROM dom)
       |ORDER BY doc_id""".stripMargin
  }

  private val q59 = {
    def nib(i: Int) = s"(instr('0123456789abcdef', substr(md5(tok),$i,1)) - 1)"
    val hv = s"(${nib(1)}*4096 + ${nib(2)}*256 + ${nib(3)}*16 + ${nib(4)})"
    val bitSums = (0 until 16)
      .map(b => s"sum(CASE WHEN (hv & ${1 << b}) <> 0 THEN 1 ELSE -1 END) AS s$b")
      .mkString(", ")
    val sig = (0 until 16)
      .map(b => s"CASE WHEN s$b > 0 THEN ${1L << b} ELSE 0 END")
      .mkString(" + ")
    // band key only discriminates equality — the masked nibble (sg & mask)
    // partitions identically to (sg // div) % 16 and shares both dialects
    val bands = (0 until 4)
      .map(b => s"SELECT doc_id, $b AS band, (sg & ${15L << (4 * b)}) AS key FROM sig")
      .mkString("\n  UNION ALL ")
    s"""WITH ${toksCte("WHERE doc_id < 200")},
       |tok AS (SELECT DISTINCT doc_id, tok FROM
       |  (SELECT doc_id, unnest(toks) AS tok FROM t)),
       |h AS (SELECT doc_id, $hv AS hv FROM tok),
       |bits AS (SELECT doc_id, $bitSums FROM h GROUP BY doc_id),
       |sig AS (SELECT doc_id, CAST($sig AS BIGINT) AS sg FROM bits),
       |bk AS ($bands),
       |cand AS (SELECT DISTINCT x.doc_id AS a, y.doc_id AS b FROM bk x JOIN bk y
       |  ON x.band = y.band AND x.key = y.key AND x.doc_id < y.doc_id),
       |dom AS (SELECT DISTINCT b FROM cand
       |  JOIN sig sa ON sa.doc_id = a JOIN sig sb ON sb.doc_id = b
       |  WHERE bit_count(xor(sa.sg, sb.sg)) <= 2)
       |SELECT doc_id FROM documents
       |WHERE doc_id < 200 AND doc_id NOT IN (SELECT b FROM dom)
       |ORDER BY doc_id""".stripMargin
  }

  private val q60 = {
    def key(dims: Seq[Int]) = dims
      .map(i => s"(CASE WHEN list_extract(embedding, $i) >= 0 THEN '1' ELSE '0' END)")
      .mkString(" || ")
    val k0 = key(Seq(1, 9, 17, 25, 33, 41, 49, 57))
    val k1 = key(Seq(5, 13, 21, 29, 37, 45, 53, 61))
    s"""WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v,
       |  $k0 AS k0, $k1 AS k1 FROM embeddings),
       |bk AS (SELECT vec_id, 0 AS band, k0 AS key FROM e
       |  UNION ALL SELECT vec_id, 1, k1 FROM e),
       |cand AS (SELECT DISTINCT x.vec_id AS a, y.vec_id AS b FROM bk x JOIN bk y
       |  ON x.band = y.band AND x.key = y.key AND x.vec_id < y.vec_id),
       |dom AS (SELECT DISTINCT b FROM cand
       |  JOIN e ea ON ea.vec_id = a JOIN e eb ON eb.vec_id = b
       |  WHERE ${cos("ea.v", "eb.v")} >= 0.4)
       |SELECT vec_id FROM embeddings
       |WHERE vec_id NOT IN (SELECT b FROM dom)
       |ORDER BY vec_id""".stripMargin
  }

  // q183 semantic dedup (SemDeDup): pinned pivot centroids vec_id < 8,
  // argmax-cosine assignment (ties to the smallest cid — mirrors
  // ivfAssign's (sim, -cid) struct-max), min-id representative per
  // cluster, keep rule on the ROUNDED member↔rep similarity. `+ 0.0`
  // after round per the §2.9 negative-zero rule.
  private val q183 =
    s"""WITH c AS (SELECT vec_id AS cid, embedding AS vc FROM embeddings
       |  WHERE vec_id < 8),
       |a AS (SELECT vec_id, embedding, cid,
       |    row_number() OVER (PARTITION BY vec_id
       |      ORDER BY ${cos("embedding", "vc")} DESC, cid) AS rn
       |  FROM embeddings CROSS JOIN c),
       |asg AS (SELECT vec_id, embedding, cid FROM a WHERE rn = 1),
       |reps AS (SELECT cid, min(vec_id) AS rep_id FROM asg GROUP BY cid),
       |rv AS (SELECT r.cid, r.rep_id, e.embedding AS rvec
       |  FROM reps r JOIN asg e ON e.vec_id = r.rep_id),
       |sc AS (SELECT m.vec_id, m.cid, r.rep_id,
       |    round(${cos("m.embedding", "r.rvec")}, 4) AS rsim
       |  FROM asg m JOIN rv r ON m.cid = r.cid)
       |SELECT vec_id, cid, rep_id, rsim + 0.0 AS sim,
       |  (vec_id = rep_id OR rsim < 0.35) AS kept
       |FROM sc ORDER BY vec_id""".stripMargin

  // q184 repeated-span removal: 2-token segmentation, first-occurrence
  // keep via prefix membership (positions through generate_series —
  // index LAMBDAS are 1-based in the oracle dialect but 0-based in
  // Spark, so the shared text never uses them), dup_frac through the
  // exact-integer floor idiom, cleaned text pinned by md5.
  private val q184 =
    s"""WITH ${toksCte("")},
       |seg AS (SELECT doc_id,
       |    list_transform(generate_series(1, CAST(ceil(len(toks) / 2.0) AS BIGINT)),
       |      g -> array_to_string(array_slice(toks, (g-1)*2+1, (g-1)*2+2), ' ')) AS ls
       |  FROM t),
       |kept AS (SELECT doc_id, ls,
       |    list_filter(list_transform(generate_series(1, len(ls)),
       |        i -> CASE WHEN list_contains(array_slice(ls, 1, i - 1),
       |                 list_extract(ls, i))
       |             THEN NULL ELSE list_extract(ls, i) END),
       |      x -> x IS NOT NULL) AS kls
       |  FROM seg)
       |SELECT doc_id, CAST(len(ls) AS BIGINT) AS n_spans,
       |  CAST(len(kls) AS BIGINT) AS n_kept,
       |  floor((len(ls) - len(kls)) * 10000.0 / len(ls)) / 10000.0 AS dup_frac,
       |  md5(array_to_string(kls, chr(10))) AS clean_md5
       |FROM kept ORDER BY doc_id""".stripMargin

  // q185 BPE merge-table training: the 8 merge rounds unrolled as CTE
  // blocks — each round recounts adjacent symbol pairs over the
  // boundary-delimited word forms (weighted by corpus word count),
  // picks the (freq DESC, lhs, rhs) argmax, and applies the merge via
  // plain string replace on the `_l__r_` → `_lr_` pattern (greedy
  // leftmost-non-overlapping, exactly the builder's rule).
  // The shared 8-round BPE CTE chain (w0 word counts, s0 delimited
  // forms, per round r: p$r pair counts → b$r argmax → s$r applied) —
  // q185 reads the merge table (b1..b8), q186 reads the final symbol
  // state (s8). Each round is EXHAUSTION-SAFE (round 15, driver
  // ADVICE): if merges run dry before round 8, b$r is empty, and the
  // old `prev CROSS JOIN b$r` wiped the symbol frame (zero oracle rows
  // while bpeTrain's early-stop face still returned every token) —
  // `prev LEFT JOIN b$r ON true` with a COALESCE'd replace is a no-op
  // on an empty round, mirroring bpeTrain's `exhausted` semantics.
  private def bpeCtesFor(where: String): String = {
    val delim = "'__' || array_to_string(list_transform(" +
      "generate_series(1, length(w)), i -> substr(w, i, 1)), '__') || '__'"
    val rounds = (1 to 8).map { r =>
      val prev = s"s${r - 1}"
      s"""p$r AS (SELECT lhs, rhs, CAST(sum(cnt) AS BIGINT) AS freq FROM (
         |    SELECT cnt, list_extract(sy, i) AS lhs,
         |      list_extract(sy, i + 1) AS rhs FROM (
         |      SELECT cnt, sy, unnest(generate_series(1, len(sy) - 1)) AS i
         |      FROM (SELECT cnt,
         |          list_filter(string_split(s, '__'), x -> x <> '') AS sy
         |        FROM $prev) z1
         |      WHERE len(sy) >= 2) z2) z3
         |  GROUP BY lhs, rhs),
         |b$r AS (SELECT lhs, rhs, freq FROM p$r
         |  ORDER BY freq DESC, lhs, rhs LIMIT 1),
         |s$r AS (SELECT w, cnt,
         |    coalesce(replace(s, '_' || b.lhs || '__' || b.rhs || '_',
         |      '_' || b.lhs || b.rhs || '_'), s) AS s
         |  FROM $prev LEFT JOIN b$r b ON true)"""
    }.mkString(",\n")
    s"""w0 AS (SELECT tok AS w, CAST(count(*) AS BIGINT) AS cnt
       |  FROM (SELECT unnest(list_filter(string_split(trim(text), ' '),
       |      x -> x <> '')) AS tok FROM documents $where) q
       |  WHERE NOT contains(tok, '_') GROUP BY tok),
       |s0 AS (SELECT w, cnt, $delim AS s FROM w0),
       |$rounds""".stripMargin
  }

  private val bpeCtes: String = bpeCtesFor("")

  private val q185: String = {
    val sel = (1 to 8)
      .map(r => s"SELECT CAST($r AS BIGINT) AS step, lhs, rhs, freq FROM b$r")
      .mkString("\nUNION ALL ")
    s"""WITH $bpeCtes
       |$sel
       |ORDER BY step""".stripMargin
  }

  // q186 BPE encode: the SAME 8 merge rounds, read at the final symbol
  // state — one row per distinct '_'-free token with its segmentation.
  private val q186 =
    s"""WITH $bpeCtes
       |SELECT w AS token, CAST(len(sy) AS BIGINT) AS n_symbols,
       |  array_to_string(sy, ' ') AS segmented
       |FROM (SELECT w, list_filter(string_split(s, '__'), x -> x <> '') AS sy
       |  FROM s8) z
       |ORDER BY token""".stripMargin

  // q193 tokenizer fertility: the SAME 8 merge rounds read at s8, a
  // per-(lang, token) frequency CTE, corpus-weighted symbols-per-token
  // and chars-per-symbol; floor idiom on the exact-integer ratios.
  private val q193 =
    s"""WITH $bpeCtes,
       |seg AS (SELECT w AS token,
       |    CAST(len(list_filter(string_split(s, '__'), x -> x <> ''))
       |      AS BIGINT) AS nsym,
       |    CAST(length(w) AS BIGINT) AS nchr
       |  FROM s8),
       |tf AS (SELECT lang, tok AS token, CAST(count(*) AS BIGINT) AS f
       |  FROM (SELECT lang, unnest(list_filter(string_split(trim(text), ' '),
       |      x -> x <> '')) AS tok FROM documents) q
       |  WHERE NOT contains(tok, '_') GROUP BY lang, tok),
       |ag AS (SELECT lang, CAST(sum(f) AS BIGINT) AS n_tokens,
       |    CAST(sum(f * nsym) AS BIGINT) AS tot_sym,
       |    CAST(sum(f * nchr) AS BIGINT) AS tot_chr
       |  FROM tf JOIN seg ON seg.token = tf.token GROUP BY lang)
       |SELECT lang, n_tokens,
       |  floor(tot_sym * 10000.0 / n_tokens) / 10000.0 AS fertility,
       |  floor(tot_chr * 10000.0 / tot_sym) / 10000.0 AS chars_per_symbol
       |FROM ag ORDER BY lang""".stripMargin

  // q199 per-document subword id sequences (round 15): the BPE chain
  // retrained on the doc_id < 50 half, the alphabet+step id scheme
  // (ids 1..A for sorted training chars, A+step per merge, min-id on
  // string collisions), the 50–99 half's distinct tokens replayed
  // through the same 8 exhaustion-safe merge rounds (e-chain), and the
  // two-level (token pos, symbol pos) order flattened to a single
  // per-doc position via row_number — ids16 then assembles with q96's
  // engine-portable max(CASE) trick; row-complete on token-less docs.
  private val q199: String = {
    val delimTok = "'__' || array_to_string(list_transform(" +
      "generate_series(1, length(token)), i -> substr(token, i, 1)), '__') || '__'"
    val eRounds = (1 to 8).map { r =>
      val prev = s"e${r - 1}"
      s"""e$r AS (SELECT w, coalesce(replace(s,
         |    '_' || b.lhs || '__' || b.rhs || '_',
         |    '_' || b.lhs || b.rhs || '_'), s) AS s
         |  FROM $prev LEFT JOIN b$r b ON true)"""
    }.mkString(",\n")
    val mrows = (1 to 8)
      .map(r => s"SELECT CAST($r AS BIGINT) AS step, lhs, rhs FROM b$r")
      .mkString("\n  UNION ALL ")
    val idsAt16 = (1 to 16)
      .map(p => s"max(CASE WHEN pos = $p THEN id END)").mkString(", ")
    s"""WITH ${bpeCtesFor("WHERE doc_id < 50")},
       |alpha AS (SELECT DISTINCT substr(w, i, 1) AS symbol
       |  FROM (SELECT w, unnest(generate_series(1, length(w))) AS i
       |    FROM w0) z),
       |achr AS (SELECT symbol,
       |    CAST(row_number() OVER (ORDER BY symbol) AS BIGINT) AS ord
       |  FROM alpha),
       |acnt AS (SELECT CAST(count(*) AS BIGINT) AS a FROM alpha),
       |mrg AS (SELECT lhs || rhs AS symbol, a + step AS ord
       |  FROM ($mrows) m CROSS JOIN acnt),
       |vocab AS (SELECT symbol, min(ord) AS sym_id FROM
       |  (SELECT symbol, ord FROM achr
       |   UNION ALL SELECT symbol, ord FROM mrg) u GROUP BY symbol),
       |encd AS (SELECT doc_id,
       |    list_filter(string_split(trim(text), ' '), x -> x <> '') AS toks
       |  FROM documents WHERE doc_id BETWEEN 50 AND 99),
       |tok AS (SELECT doc_id, i AS tpos, list_extract(toks, i) AS token
       |  FROM (SELECT doc_id, toks,
       |      unnest(generate_series(1, len(toks))) AS i
       |    FROM encd WHERE len(toks) >= 1) z),
       |e0 AS (SELECT DISTINCT token AS w, $delimTok AS s
       |  FROM (SELECT DISTINCT token FROM tok
       |    WHERE NOT contains(token, '_')) zt),
       |$eRounds,
       |seg AS (SELECT w AS token,
       |    list_filter(string_split(s, '__'), x -> x <> '') AS sy FROM e8),
       |ts AS (SELECT t.doc_id, t.tpos,
       |    coalesce(g.sy, list_value(t.token)) AS sy
       |  FROM tok t LEFT JOIN seg g ON g.token = t.token),
       |sx AS (SELECT doc_id, tpos, j AS spos, list_extract(sy, j) AS symbol
       |  FROM (SELECT doc_id, tpos, sy,
       |      unnest(generate_series(1, len(sy))) AS j FROM ts) z),
       |idq AS (SELECT doc_id, tpos, spos, coalesce(v.sym_id, 0) AS id
       |  FROM sx LEFT JOIN vocab v ON sx.symbol = v.symbol),
       |posq AS (SELECT doc_id, CAST(row_number() OVER
       |      (PARTITION BY doc_id ORDER BY tpos, spos) AS BIGINT) AS pos,
       |    id FROM idq),
       |agg AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_ids,
       |    array_to_string(list_filter(list_value($idsAt16),
       |      x -> x IS NOT NULL), ',') AS ids16
       |  FROM posq GROUP BY doc_id)
       |SELECT e.doc_id, CAST(coalesce(a.n_ids, 0) AS BIGINT) AS n_ids,
       |  coalesce(a.ids16, '') AS ids16
       |FROM encd e LEFT JOIN agg a ON e.doc_id = a.doc_id
       |ORDER BY e.doc_id""".stripMargin
  }

  // q187 DSIR importance weights: unigram+bigram features hashed into
  // 256 buckets by two md5 nibbles, Laplace-smoothed target (lang='en')
  // vs raw bucket distributions, per-doc Σ cnt·(ln p̂ − ln q̂). Exact
  // integer numerators, ONE division + ln per side (q180's discipline);
  // round-4 + 0.0 on the cancellable sum (§2.9).
  // Shared DSIR CTE chain (round 15 — q187 reads the per-doc weights,
  // q200 extends them with the Gumbel-top-k selection): features,
  // buckets, per-doc counts (db), marginals, totals, log-ratios (lr).
  private val dsirCtes: String = {
    def nib(i: Int) =
      s"(instr('0123456789abcdef', substr(md5(f), $i, 1)) - 1)"
    s"""t AS (SELECT doc_id, lang = 'en' AS tgt,
       |    list_filter(string_split(trim(text), ' '), x -> x <> '') AS toks
       |  FROM documents),
       |ug AS (SELECT doc_id, tgt, unnest(toks) AS f FROM t),
       |bgix AS (SELECT doc_id, tgt, toks,
       |    unnest(generate_series(1, len(toks) - 1)) AS i
       |  FROM t WHERE len(toks) >= 2),
       |bg AS (SELECT doc_id, tgt,
       |    list_extract(toks, i) || ' ' || list_extract(toks, i + 1) AS f
       |  FROM bgix),
       |fe AS (SELECT doc_id, tgt, f FROM ug
       |  UNION ALL SELECT doc_id, tgt, f FROM bg),
       |bk AS (SELECT doc_id, tgt, ${nib(1)} * 16 + ${nib(2)} AS b FROM fe),
       |db AS (SELECT doc_id, tgt, b, CAST(count(*) AS BIGINT) AS cnt
       |  FROM bk GROUP BY doc_id, tgt, b),
       |marg AS (SELECT b, CAST(sum(cnt) AS BIGINT) AS r,
       |    CAST(sum(CASE WHEN tgt THEN cnt ELSE 0 END) AS BIGINT) AS tc
       |  FROM db GROUP BY b),
       |tots AS (SELECT CAST(sum(tc) AS BIGINT) AS tt,
       |    CAST(sum(r) AS BIGINT) AS rt FROM marg),
       |lr AS (SELECT b, ln((tc + 1) / (tt + 256.0)) -
       |    ln((r + 1) / (rt + 256.0)) AS lr FROM marg CROSS JOIN tots)"""
      .stripMargin
  }

  private val q187 =
    s"""WITH $dsirCtes
       |SELECT db.doc_id, CAST(sum(db.cnt) AS BIGINT) AS n_feats,
       |  round(sum(db.cnt * lr.lr), 4) + 0.0 AS logw
       |FROM db JOIN lr ON db.b = lr.b
       |GROUP BY db.doc_id ORDER BY db.doc_id""".stripMargin

  // q200 DSIR deterministic importance resampling (round 15): q187's
  // per-doc logw (rounded to 4 BEFORE the key sum — the cancellable-sum
  // rule, so the rank order is engine-identical), plus a replayable
  // Gumbel from the salted-md5 uniform (q155's A-ES idiom, salt
  // `dsel:`), ranked globally with a doc_id tiebreak; the budget is the
  // data-relative top 20% (ceil).
  // Shared DSIR SELECTION chain (round 16 — q200 reads the ranked
  // selection, q210 audits its composition): per-doc logw, Gumbel key,
  // data-relative budget, global rank.
  private val dsirSelCtes: String = {
    def gnib(i: Int) =
      s"(instr('0123456789abcdef', substr(md5('dsel:' || CAST(doc_id AS STRING)),$i,1)) - 1)"
    val v32 = (1 to 8)
      .map(i => s"${gnib(i)} * CAST(${1L << (4 * (8 - i))} AS BIGINT)")
      .mkString(" + ")
    s"""$dsirCtes,
       |lw AS (SELECT db.doc_id, round(sum(db.cnt * lr.lr), 4) + 0.0 AS logw
       |  FROM db JOIN lr ON db.b = lr.b GROUP BY db.doc_id),
       |kb AS (SELECT doc_id, logw,
       |    logw + (-ln(-ln((($v32) + 0.5) / 4294967296.0))) AS key
       |  FROM lw),
       |nn AS (SELECT CAST(ceil(0.2 * count(*)) AS BIGINT) AS n
       |  FROM documents),
       |rk AS (SELECT doc_id, logw, key,
       |    CAST(row_number() OVER (ORDER BY key DESC, doc_id) AS BIGINT)
       |      AS sel_rank
       |  FROM kb)""".stripMargin
  }

  private val q200 =
    s"""WITH $dsirSelCtes
       |SELECT doc_id, logw, round(key, 4) + 0.0 AS key, sel_rank,
       |  sel_rank <= n AS kept
       |FROM rk CROSS JOIN nn ORDER BY doc_id""".stripMargin

  // q210 DSIR end-to-end composition audit (round 16): the kept set's
  // per-(source, lang) composition vs the corpus and vs the target
  // slice (lang = 'en') — exact-integer cells, totals, floor idiom;
  // nullif guards empty kept/target slices.
  private val q210 =
    s"""WITH $dsirSelCtes,
       |sel AS (SELECT doc_id, sel_rank <= n AS kept
       |  FROM rk CROSS JOIN nn),
       |dm AS (SELECT d.source, d.lang, coalesce(s.kept, false) AS kept
       |  FROM documents d LEFT JOIN sel s ON d.doc_id = s.doc_id),
       |cells AS (SELECT source, lang,
       |    CAST(count(*) AS BIGINT) AS n_corpus,
       |    CAST(sum(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT)
       |      AS n_kept,
       |    CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT)
       |      AS n_target
       |  FROM dm GROUP BY source, lang),
       |ctot AS (SELECT CAST(sum(n_corpus) AS BIGINT) AS t_c,
       |    CAST(sum(n_kept) AS BIGINT) AS t_k,
       |    CAST(sum(n_target) AS BIGINT) AS t_t FROM cells)
       |SELECT source, lang, n_corpus, n_kept, n_target,
       |  floor(n_corpus * 10000.0 / t_c) / 10000.0 AS frac_corpus,
       |  floor(n_kept * 10000.0 / nullif(t_k, 0)) / 10000.0 AS frac_kept,
       |  floor(n_target * 10000.0 / nullif(t_t, 0)) / 10000.0
       |    AS frac_target
       |FROM cells CROSS JOIN ctot ORDER BY source, lang""".stripMargin

  // q209 winnowing pair detection (round 16): brute-force mirror of
  // Dedup.winnowingPairs — per-doc 3-token k-gram hashes (one md5 per
  // gram, then the nibble fold), w = 4 window minima via a range join
  // on positions, distinct selection, and the (fingerprint, gram)
  // verified pair join (a shared fp counts only with an equal
  // underlying gram — the 32-bit-collision guard).
  private val q209 = {
    val v32 = (1 to 8).map(i =>
      s"(instr('0123456789abcdef', substr(m, $i, 1)) - 1)" +
        s" * CAST(${1L << (4 * (8 - i))} AS BIGINT)")
      .mkString("(", " + ", ")")
    s"""WITH ${toksCte("")},
       |h0 AS (SELECT doc_id, toks,
       |    unnest(generate_series(1, len(toks) - 2)) AS i
       |  FROM t WHERE len(toks) >= 3),
       |g AS (SELECT doc_id, CAST(i AS BIGINT) AS i,
       |    array_to_string(array_slice(toks, i, i + 2), ' ') AS gram
       |  FROM h0),
       |hm AS (SELECT doc_id, i, gram, md5(gram) AS m FROM g),
       |h AS (SELECT doc_id, i, gram, $v32 AS hv FROM hm),
       |nk AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n
       |  FROM h GROUP BY doc_id),
       |wj AS (SELECT doc_id,
       |    unnest(generate_series(1, CAST(greatest(n - 3, 1) AS BIGINT)))
       |      AS j
       |  FROM nk),
       |sel AS (SELECT w.doc_id, w.j, min(h.hv) AS fp
       |  FROM wj w JOIN h ON h.doc_id = w.doc_id
       |    AND h.i >= w.j AND h.i <= w.j + 3
       |  GROUP BY w.doc_id, w.j),
       |fps AS (SELECT DISTINCT doc_id, fp FROM sel),
       |nfp AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_fp
       |  FROM fps GROUP BY doc_id),
       |wit AS (SELECT DISTINCT h.doc_id, h.hv AS fp, h.gram
       |  FROM h JOIN fps ON fps.doc_id = h.doc_id AND fps.fp = h.hv),
       |pr AS (SELECT x.doc_id AS a, y.doc_id AS b, x.fp
       |  FROM wit x JOIN wit y ON x.fp = y.fp AND x.gram = y.gram
       |    AND x.doc_id < y.doc_id),
       |sh AS (SELECT a, b, CAST(count(DISTINCT fp) AS BIGINT) AS n_shared
       |  FROM pr GROUP BY a, b)
       |SELECT sh.a, sh.b, sh.n_shared,
       |  floor(sh.n_shared * 10000.0 / least(na.n_fp, nb.n_fp)) / 10000.0
       |    AS sim
       |FROM sh JOIN nfp na ON na.doc_id = sh.a
       |  JOIN nfp nb ON nb.doc_id = sh.b
       |ORDER BY a, b""".stripMargin
  }

  // q201 dedup-modality agreement: brute-force cosine truth vs q60's
  // sign-LSH pair generator vs q183's SemDeDup member↔rep edges, all
  // at θ = 0.3 over the vec_id < 300 probe universe. Assignment ties
  // and the min-id rep election mirror q183's oracle verbatim;
  // precision/recall ride the exact-integer floor idiom with nullif
  // guarding an empty prediction set.
  private val q201 = {
    def key(dims: Seq[Int]) = dims
      .map(i => s"(CASE WHEN list_extract(embedding, $i) >= 0 THEN '1' ELSE '0' END)")
      .mkString(" || ")
    val k0 = key(Seq(1, 9, 17, 25, 33, 41, 49, 57))
    val k1 = key(Seq(5, 13, 21, 29, 37, 45, 53, 61))
    s"""WITH u AS (SELECT vec_id, embedding,
       |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v,
       |    $k0 AS kk0, $k1 AS kk1
       |  FROM embeddings WHERE vec_id < 300),
       |truth AS (SELECT x.vec_id AS a, y.vec_id AS b FROM u x JOIN u y
       |  ON x.vec_id < y.vec_id WHERE ${cos("x.v", "y.v")} >= 0.3),
       |bk AS (SELECT vec_id, 0 AS band, kk0 AS bkey FROM u
       |  UNION ALL SELECT vec_id, 1, kk1 FROM u),
       |lshc AS (SELECT DISTINCT x.vec_id AS a, y.vec_id AS b
       |  FROM bk x JOIN bk y ON x.band = y.band AND x.bkey = y.bkey
       |    AND x.vec_id < y.vec_id),
       |lsh AS (SELECT a, b FROM lshc
       |  JOIN u ua ON ua.vec_id = a JOIN u ub ON ub.vec_id = b
       |  WHERE ${cos("ua.v", "ub.v")} >= 0.3),
       |c AS (SELECT vec_id AS cid, v AS vc FROM u WHERE vec_id < 8),
       |asg AS (SELECT vec_id, v, cid FROM
       |  (SELECT u.vec_id, u.v, c.cid,
       |      row_number() OVER (PARTITION BY u.vec_id
       |        ORDER BY ${cos("u.v", "c.vc")} DESC, cid) AS rn
       |    FROM u CROSS JOIN c) q WHERE rn = 1),
       |reps AS (SELECT cid, min(vec_id) AS rep_id FROM asg GROUP BY cid),
       |rv AS (SELECT r.cid, r.rep_id, e.v AS rvec
       |  FROM reps r JOIN asg e ON e.vec_id = r.rep_id),
       |sem AS (SELECT least(m.vec_id, r.rep_id) AS a,
       |    greatest(m.vec_id, r.rep_id) AS b
       |  FROM asg m JOIN rv r ON m.cid = r.cid
       |  WHERE m.vec_id <> r.rep_id AND ${cos("m.v", "r.rvec")} >= 0.3),
       |mm AS (SELECT
       |  (SELECT count(*) FROM truth) AS n_truth,
       |  (SELECT count(*) FROM lsh) AS lsh_pred,
       |  (SELECT count(*) FROM lsh JOIN truth USING(a, b)) AS lsh_tp,
       |  (SELECT count(*) FROM sem) AS sem_pred,
       |  (SELECT count(*) FROM sem JOIN truth USING(a, b)) AS sem_tp,
       |  (SELECT count(*) FROM sem JOIN lsh USING(a, b)) AS n_both)
       |SELECT n_truth, lsh_pred, lsh_tp,
       |  floor(lsh_tp * 10000.0 / nullif(lsh_pred, 0)) / 10000.0 AS lsh_prec,
       |  floor(lsh_tp * 10000.0 / nullif(n_truth, 0)) / 10000.0 AS lsh_rec,
       |  sem_pred, sem_tp,
       |  floor(sem_tp * 10000.0 / nullif(sem_pred, 0)) / 10000.0 AS sem_prec,
       |  floor(sem_tp * 10000.0 / nullif(n_truth, 0)) / 10000.0 AS sem_rec,
       |  n_both, lsh_pred - n_both AS lsh_only, sem_pred - n_both AS sem_only
       |FROM mm""".stripMargin
  }

  // q202 cross-document boilerplate: 4-token spans, df over DISTINCT
  // (doc, span), boilerplate gate as the exact-integer cross-multiply
  // df * 100 >= n_docs, per-doc census + the commutative SUM of 32-bit
  // md5-nibble hashes of 'pos:span' over KEPT spans (position baked in
  // ⇒ the unordered sum is order-faithful; q200's nibble idiom).
  private val q202 = {
    val v32 = (1 to 8).map(i =>
      s"(instr('0123456789abcdef', substr(md5(CAST(pos AS STRING) || ':' || span), $i, 1)) - 1)" +
        s" * CAST(${1L << (4 * (8 - i))} AS BIGINT)")
      .mkString("(", " + ", ")")
    s"""WITH ${toksCte("")},
       |seg AS (SELECT doc_id,
       |    list_transform(generate_series(1, CAST(ceil(len(toks) / 4.0) AS BIGINT)),
       |      g -> array_to_string(array_slice(toks, (g-1)*4+1, (g-1)*4+4), ' ')) AS ls
       |  FROM t),
       |pe0 AS (SELECT doc_id, ls,
       |    unnest(generate_series(1, len(ls))) AS pos FROM seg),
       |pe AS (SELECT doc_id, CAST(pos AS BIGINT) AS pos,
       |    list_extract(ls, pos) AS span FROM pe0),
       |nd AS (SELECT count(*) AS n_docs FROM documents),
       |bp AS (SELECT span, CAST(1 AS BIGINT) AS isbp
       |  FROM (SELECT span, count(*) AS df
       |    FROM (SELECT DISTINCT doc_id, span FROM pe) GROUP BY span)
       |  CROSS JOIN nd WHERE df * 100 >= n_docs),
       |sc AS (SELECT doc_id, pos, span, isbp, $v32 AS h FROM
       |  (SELECT p.doc_id, p.pos, p.span AS span,
       |      coalesce(b.isbp, 0) AS isbp
       |    FROM pe p LEFT JOIN bp b ON p.span = b.span) q)
       |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_spans,
       |  CAST(sum(isbp) AS BIGINT) AS n_bp,
       |  floor(sum(isbp) * 10000.0 / count(*)) / 10000.0 AS bp_frac,
       |  CAST(coalesce(sum(CASE WHEN isbp = 0 THEN h END), 0) AS BIGINT)
       |    AS clean_sig
       |FROM sc GROUP BY doc_id ORDER BY doc_id""".stripMargin
  }

  // q203 winnowing fingerprints: 3-token k-gram 32-bit md5-nibble
  // hashes, w = 4 window minima, distinct selection. generate_series
  // is naturally empty below the bounds on this engine (the corpus's
  // 10-token minimum keeps every doc ≥ 1 window anyway); density rides
  // the nullif-guarded floor idiom.
  private val q203 = {
    val v32 = (1 to 8).map(i =>
      s"(instr('0123456789abcdef', substr(md5(array_to_string(array_slice(toks, g, g + 2), ' ')), $i, 1)) - 1)" +
        s" * CAST(${1L << (4 * (8 - i))} AS BIGINT)")
      .mkString("(", " + ", ")")
    s"""WITH ${toksCte("")},
       |h AS (SELECT doc_id,
       |    list_transform(generate_series(1, CAST(len(toks) - 2 AS BIGINT)),
       |      g -> $v32) AS hs
       |  FROM t),
       |w AS (SELECT doc_id, hs,
       |    list_distinct(list_filter(list_transform(
       |      generate_series(1, CAST(greatest(len(hs) - 3, 1) AS BIGINT)),
       |      i -> list_min(array_slice(hs, i, i + 3))),
       |      x -> x IS NOT NULL)) AS fps
       |  FROM h)
       |SELECT doc_id, CAST(len(hs) AS BIGINT) AS n_kgrams,
       |  CAST(len(fps) AS BIGINT) AS n_fp,
       |  floor(len(fps) * 10000.0 / nullif(len(hs), 0)) / 10000.0
       |    AS density,
       |  list_min(fps) AS fp_min
       |FROM w ORDER BY doc_id""".stripMargin
  }

  // q204 hard-negative mining: bounded probe batch (vec_id < 20) vs the
  // corpus (vec_id >= 20), cosine band [0.2, 0.6), per-probe top-3 by
  // (sim DESC, candidate id); sim rounded AFTER ranking so float
  // formatting can't flutter the pick.
  private val q204 =
    s"""WITH e AS (SELECT vec_id,
       |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
       |  FROM embeddings),
       |pr AS (SELECT vec_id AS p, v AS vp FROM e WHERE vec_id < 20),
       |ca AS (SELECT vec_id AS c, v AS vc FROM e WHERE vec_id >= 20),
       |b AS (SELECT p, c, s FROM
       |  (SELECT p, c, ${cos("vp", "vc")} AS s FROM pr CROSS JOIN ca) q
       |  WHERE s >= 0.2 AND s < 0.6),
       |r AS (SELECT p, c, s,
       |    row_number() OVER (PARTITION BY p ORDER BY s DESC, c) AS n_rank
       |  FROM b)
       |SELECT p AS probe, n_rank, c AS neg_id, round(s, 4) + 0.0 AS sim
       |FROM r WHERE n_rank <= 3 ORDER BY probe, n_rank""".stripMargin

  // q207 per-source character-class census: exact integer counts
  // (length minus class-stripped length; the 'g' flag maps to Spark's
  // replace-all), fractions via the floor idiom — no float before the
  // final division.
  private val q207 =
    """WITH c AS (SELECT source,
      |    CAST(length(text) AS BIGINT) AS nc,
      |    CAST(length(text) - length(regexp_replace(text, '[A-Za-z]', '', 'g')) AS BIGINT) AS let,
      |    CAST(length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS BIGINT) AS dig,
      |    CAST(length(text) - length(regexp_replace(text, ' ', '', 'g')) AS BIGINT) AS spc
      |  FROM documents),
      |g AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
      |    CAST(sum(nc) AS BIGINT) AS n_chars,
      |    CAST(sum(let) AS BIGINT) AS letters,
      |    CAST(sum(dig) AS BIGINT) AS digits,
      |    CAST(sum(spc) AS BIGINT) AS spaces
      |  FROM c GROUP BY source)
      |SELECT source, n_docs, n_chars,
      |  floor(letters * 10000.0 / n_chars) / 10000.0 AS letter_frac,
      |  floor(digits * 10000.0 / n_chars) / 10000.0 AS digit_frac,
      |  floor(spaces * 10000.0 / n_chars) / 10000.0 AS space_frac,
      |  floor((n_chars - letters - digits - spaces) * 10000.0 / n_chars) / 10000.0 AS other_frac
      |FROM g ORDER BY source""".stripMargin

  // q190 cross-source vocabulary Jaccard: distinct (source, token)
  // pairs once, token-keyed self-join for intersections, |sources|-row
  // size table self-joined for all-pair completeness; floor idiom on
  // the exact-integer ratio.
  private val q190 =
    """WITH vs AS (SELECT DISTINCT source, unnest(
      |    list_distinct(list_filter(string_split(trim(text), ' '),
      |      x -> x <> ''))) AS tok
      |  FROM documents),
      |sizes AS (SELECT source, CAST(count(*) AS BIGINT) AS nv
      |  FROM vs GROUP BY source),
      |inter AS (SELECT a.source AS src_a, b.source AS src_b,
      |    CAST(count(*) AS BIGINT) AS n_shared
      |  FROM vs a JOIN vs b ON a.tok = b.tok AND a.source < b.source
      |  GROUP BY 1, 2),
      |pairs AS (SELECT x.source AS src_a, y.source AS src_b,
      |    x.nv AS nv_a, y.nv AS nv_b
      |  FROM sizes x JOIN sizes y ON x.source < y.source)
      |SELECT p.src_a, p.src_b, nv_a, nv_b,
      |  coalesce(n_shared, 0) AS n_shared,
      |  floor(coalesce(n_shared, 0) * 10000.0 /
      |    (nv_a + nv_b - coalesce(n_shared, 0))) / 10000.0 AS jaccard
      |FROM pairs p LEFT JOIN inter i
      |  ON p.src_a = i.src_a AND p.src_b = i.src_b
      |ORDER BY p.src_a, p.src_b""".stripMargin

  private val q71 =
    s"""WITH ${toksCte("WHERE doc_id < 100")},
       |f AS (SELECT doc_id, toks, len(toks) AS n FROM t WHERE len(toks) > 0),
       |cix AS (SELECT doc_id, toks, n,
       |  unnest(generate_series(0, greatest(CAST(ceil((n - 5) / 15.0) AS BIGINT), 1) - 1)) AS i
       |  FROM f)
       |SELECT doc_id, CAST(i AS BIGINT) AS chunk_idx,
       |  array_to_string(array_slice(toks, CAST(i AS INT)*15+1, CAST(i AS INT)*15+20), ' ') AS chunk_text,
       |  CAST(n AS BIGINT) AS n_tokens
       |FROM cix ORDER BY doc_id, chunk_idx""".stripMargin

  private val q72 =
    """SELECT doc_id,
      |  trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
      |       ' +', ' ', 'g')) AS norm_text
      |FROM documents ORDER BY doc_id LIMIT 300""".stripMargin

  private val q73 =
    s"""WITH ${toksCte("WHERE doc_id < 300")},
       |k AS (SELECT doc_id,
       |  list_filter(toks, x -> NOT list_contains(list_value('the','a','of','to','and','in','is'), x)) AS kept
       |  FROM t)
       |SELECT doc_id, array_to_string(kept, ' ') AS text,
       |  CAST(len(kept) AS BIGINT) AS n_kept
       |FROM k ORDER BY doc_id""".stripMargin

  private val q74 =
    s"""WITH ${toksCte("")},
       |tok AS (SELECT DISTINCT doc_id, unnest(toks) AS token FROM t)
       |SELECT token, CAST(count(*) AS BIGINT) AS df
       |FROM tok GROUP BY token ORDER BY df DESC, token LIMIT 30""".stripMargin

  private val q75 =
    """WITH s AS (SELECT doc_id,
      |  CASE WHEN instr('0123456789abcdef', substr(md5(CAST(doc_id AS STRING)), 1, 1)) - 1 <= 12 THEN 'train'
      |       WHEN instr('0123456789abcdef', substr(md5(CAST(doc_id AS STRING)), 1, 1)) - 1 <= 14 THEN 'val'
      |       ELSE 'test' END AS split
      |  FROM documents)
      |SELECT split, CAST(count(*) AS BIGINT) AS n,
      |  min(doc_id) AS min_id, max(doc_id) AS max_id
      |FROM s GROUP BY split ORDER BY split""".stripMargin

  private val q145 =
    s"""WITH ${toksCte("")},
       |ux AS (SELECT unnest(toks) AS token FROM t),
       |c AS (SELECT token, count(*) AS c FROM ux GROUP BY token),
       |r AS (SELECT c, row_number() OVER (ORDER BY c DESC, token) AS rank
       |  FROM c),
       |top AS (SELECT c, rank FROM r WHERE rank <= 200),
       |ty AS (SELECT CAST(count(*) AS BIGINT) AS n_types FROM c)
       |SELECT n_types, CAST(count(*) AS BIGINT) AS n_top,
       |  round(regr_slope(ln(c), ln(rank)), 4) + 0.0 AS zipf_slope,
       |  round(regr_intercept(ln(c), ln(rank)), 4) + 0.0 AS zipf_icept
       |FROM top, ty GROUP BY n_types""".stripMargin

  private val q146 = {
    def n(sp: String) =
      s"CAST(coalesce(sum(CASE WHEN split = '$sp' THEN n END), 0) AS BIGINT)"
    def share(sp: String) =
      s"coalesce(max(CASE WHEN split = '$sp' THEN share END), 0.0)"
    s"""WITH s AS (SELECT lang,
       |    CASE WHEN instr('0123456789abcdef', substr(md5(CAST(doc_id AS STRING)), 1, 1)) - 1 <= 12 THEN 'train'
       |         WHEN instr('0123456789abcdef', substr(md5(CAST(doc_id AS STRING)), 1, 1)) - 1 <= 14 THEN 'val'
       |         ELSE 'test' END AS split
       |  FROM documents),
       |cell AS (SELECT lang, split, count(*) AS n FROM s GROUP BY 1, 2),
       |tot AS (SELECT split, count(*) AS nt FROM s GROUP BY split),
       |j AS (SELECT lang, cell.split AS split, n,
       |    floor(n * 10000.0 / nt) / 10000.0 AS share
       |  FROM cell JOIN tot ON cell.split = tot.split)
       |SELECT lang,
       |  ${n("train")} AS n_train, ${n("val")} AS n_val,
       |  ${n("test")} AS n_test,
       |  ${share("train")} AS train_share,
       |  ${share("val")} AS val_share,
       |  ${share("test")} AS test_share
       |FROM j GROUP BY lang ORDER BY lang""".stripMargin
  }

  // q153: identical BM25 constants as literals (2.2, 0.25 — never
  // computed forms whose rounding could differ); ln both dialects;
  // avg(dl) = exact integer sum / n in double on both engines; ORDER
  // on the rounded score
  private val q153 =
    s"""WITH ${toksCte("")},
       |dl AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl FROM t),
       |st AS (SELECT CAST(count(*) AS BIGINT) AS n, avg(dl) AS avgdl FROM dl),
       |tf AS (SELECT doc_id, tok AS term, CAST(count(*) AS BIGINT) AS tf
       |  FROM (SELECT doc_id, unnest(toks) AS tok FROM t)
       |  WHERE tok IN ('spark', 'merge', 'vector', 'window')
       |  GROUP BY 1, 2),
       |df AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1),
       |sc AS (SELECT tf.doc_id,
       |    ln(1.0 + (st.n - df.df + 0.5) / (df.df + 0.5))
       |      * tf.tf * 2.2
       |      / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / st.avgdl)) AS c
       |  FROM tf JOIN df USING (term)
       |  JOIN dl ON dl.doc_id = tf.doc_id CROSS JOIN st)
       |SELECT doc_id, round(sum(c), 4) AS score FROM sc
       |GROUP BY 1 ORDER BY score DESC, doc_id LIMIT 15""".stripMargin

  // q159: q46's signature/band CTEs + q47's exact-Jaccard machinery
  // recombined; the unrounded j >= 0.8 gate and the floor-truncated
  // rates are IEEE-identical on both engines
  private val q159 = {
    val mins = (0 until 8).map(j => s"min(md5('$j:' || s)) AS m$j")
      .mkString(", ")
    s"""WITH ${toksCte("WHERE doc_id < 120")},
       |$shCte,
       |m AS (SELECT doc_id, $mins FROM sh GROUP BY doc_id),
       |bl AS (SELECT doc_id, 0 AS bi, m0 || m1 AS bk FROM m
       |  UNION ALL SELECT doc_id, 1, m2 || m3 FROM m
       |  UNION ALL SELECT doc_id, 2, m4 || m5 FROM m
       |  UNION ALL SELECT doc_id, 3, m6 || m7 FROM m),
       |cand AS (SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
       |  FROM bl x JOIN bl y
       |    ON x.bi = y.bi AND x.bk = y.bk AND x.doc_id < y.doc_id),
       |cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
       |p AS (SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS inter
       |  FROM sh x JOIN sh y ON x.s = y.s AND x.doc_id < y.doc_id
       |  GROUP BY 1, 2),
       |truth AS (SELECT a, b FROM p
       |  JOIN cnt ca ON ca.doc_id = a JOIN cnt cb ON cb.doc_id = b
       |  WHERE inter / (ca.n + cb.n - inter) >= 0.8),
       |tt AS (SELECT CAST(count(*) AS BIGINT) AS n_truth FROM truth),
       |cc AS (SELECT CAST(count(*) AS BIGINT) AS n_cand FROM cand),
       |tp AS (SELECT CAST(count(*) AS BIGINT) AS n_tp
       |  FROM cand JOIN truth USING (a, b))
       |SELECT n_truth, n_cand, n_tp,
       |  coalesce(floor(n_tp * 10000.0 / nullif(n_cand, 0)) / 10000.0, 0.0)
       |    AS precision,
       |  coalesce(floor(n_tp * 10000.0 / nullif(n_truth, 0)) / 10000.0, 0.0)
       |    AS recall
       |FROM tt CROSS JOIN cc CROSS JOIN tp""".stripMargin
  }

  // q160: q137's bag-of-words fingerprint for the dup census; the
  // dominant language by (count DESC, lang ASC); floor-truncated rates
  private val q160 =
    s"""WITH ${toksCte("")},
       |tl AS (SELECT t.doc_id, d.lang, d.source, t.toks
       |  FROM t JOIN documents d ON d.doc_id = t.doc_id),
       |sizes AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
       |    CAST(sum(len(toks)) AS BIGINT) AS n_tokens,
       |    CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
       |    CAST(count(DISTINCT source) AS BIGINT) AS n_sources
       |  FROM tl),
       |fp AS (SELECT md5(array_to_string(list_sort(list_distinct(toks)),
       |    ' ')) AS fp FROM tl),
       |dup AS (SELECT CAST(coalesce(sum(n), 0) AS BIGINT) AS n_dup_docs
       |  FROM (SELECT fp, count(*) AS n FROM fp GROUP BY 1
       |        HAVING count(*) > 1) fam),
       |top AS (SELECT lang AS top_lang,
       |    CAST(count(*) AS BIGINT) AS top_lang_docs
       |  FROM tl GROUP BY 1 ORDER BY count(*) DESC, lang LIMIT 1)
       |SELECT n_docs, n_tokens, n_langs, n_sources, n_dup_docs,
       |  floor(n_dup_docs * 10000.0 / n_docs) / 10000.0 AS dup_rate,
       |  top_lang,
       |  floor(top_lang_docs * 10000.0 / n_docs) / 10000.0
       |    AS top_lang_share
       |FROM sizes CROSS JOIN dup CROSS JOIN top""".stripMargin

  // q161: top-20 vocabulary by (frequency DESC, token ASC), OOV share
  // per language over token OCCURRENCES, floor-truncated
  private val q161 =
    """WITH t AS (SELECT lang,
      |    list_filter(string_split(trim(text), ' '), x -> x <> '') AS toks
      |  FROM documents),
      |occ AS (SELECT lang, unnest(toks) AS tok FROM t),
      |v AS (SELECT tok FROM (SELECT tok, count(*) AS c FROM occ
      |  GROUP BY 1 ORDER BY c DESC, tok LIMIT 20) tv),
      |oo AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_occ,
      |    CAST(sum(CASE WHEN tok IN (SELECT tok FROM v) THEN 0 ELSE 1 END)
      |      AS BIGINT) AS n_oov
      |  FROM occ GROUP BY 1)
      |SELECT lang, n_occ, n_oov,
      |  floor(n_oov * 10000.0 / n_occ) / 10000.0 AS oov_rate
      |FROM oo ORDER BY lang""".stripMargin

  // q162: estimates are exact binary rationals (agreement counts over
  // 8); only exact-j and the errors round; identical nibble-parity bit
  private val q162 = {
    val mins = (0 until 8).map(j => s"min(md5('$j:' || s)) AS m$j")
      .mkString(", ")
    val fullAgree = (0 until 8)
      .map(j => s"CASE WHEN x.m$j = y.m$j THEN 1 ELSE 0 END")
      .mkString(" + ")
    def bit(p: String, j: Int) =
      s"((instr('0123456789abcdef', substr($p.m$j, 32, 1)) - 1) % 2)"
    val bitAgree = (0 until 8)
      .map(j => s"CASE WHEN ${bit("x", j)} = ${bit("y", j)} THEN 1 ELSE 0 END")
      .mkString(" + ")
    s"""WITH ${toksCte("WHERE doc_id < 60")},
       |$shCte,
       |cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
       |p AS (SELECT sx.doc_id AS a, sy.doc_id AS b, count(*) AS inter
       |  FROM sh sx JOIN sh sy ON sx.s = sy.s AND sx.doc_id < sy.doc_id
       |  GROUP BY 1, 2),
       |ex AS (SELECT a, b, inter / (ca.n + cb.n - inter) AS j FROM p
       |  JOIN cnt ca ON ca.doc_id = a JOIN cnt cb ON cb.doc_id = b),
       |m AS (SELECT doc_id, $mins FROM sh GROUP BY doc_id)
       |SELECT ex.a, ex.b, round(ex.j, 4) AS j,
       |  ($fullAgree) / 8.0 AS est8,
       |  (($bitAgree) * 2 - 8) / 8.0 AS est1,
       |  round(abs(($fullAgree) / 8.0 - ex.j), 4) AS err8,
       |  round(abs((($bitAgree) * 2 - 8) / 8.0 - ex.j), 4) AS err1
       |FROM ex JOIN m x ON x.doc_id = ex.a JOIN m y ON y.doc_id = ex.b
       |ORDER BY a, b""".stripMargin
  }

  // q165: identical decile arithmetic (·10/(mx+1), floor-of-double),
  // identical first-occurrence bucketing and 10-row cumulative curve;
  // regr_* over ln — both engines' co-moment built-ins, rounded at 4.
  // `+ 0.0` normalizes the IEEE sign of an exact-cancellation zero: at
  // small SF cum_types can be constant, the slope is a catastrophic-
  // cancellation 0 whose sign depends on DuckDB's threaded co-moment
  // merge order (observed both 0x0 and 0x8000000000000000 across runs);
  // -0.0 + 0.0 = +0.0 and every other value is unchanged.
  private val q165 =
    s"""WITH ${toksCte("")},
       |mx AS (SELECT max(doc_id) AS mx FROM t),
       |f AS (SELECT tok, min(doc_id) AS fd
       |  FROM (SELECT doc_id, unnest(toks) AS tok FROM t) o GROUP BY 1),
       |ft AS (SELECT CAST(floor(fd * 10 / (mx.mx + 1)) AS BIGINT)
       |    AS decile, CAST(count(*) AS BIGINT) AS new_types
       |  FROM f CROSS JOIN mx GROUP BY 1),
       |m AS (SELECT CAST(floor(doc_id * 10 / (mx.mx + 1)) AS BIGINT)
       |    AS decile, CAST(sum(len(toks)) AS BIGINT) AS toks
       |  FROM t CROSS JOIN mx GROUP BY 1),
       |c AS (SELECT m.decile,
       |    sum(m.toks) OVER (ORDER BY m.decile
       |      ROWS UNBOUNDED PRECEDING) AS cum_tokens,
       |    sum(coalesce(ft.new_types, 0)) OVER (ORDER BY m.decile
       |      ROWS UNBOUNDED PRECEDING) AS cum_types
       |  FROM m LEFT JOIN ft ON ft.decile = m.decile),
       |cf AS (SELECT * FROM c WHERE cum_tokens > 0 AND cum_types > 0)
       |SELECT CAST(count(*) AS BIGINT) AS n_points,
       |  CAST(max(cum_tokens) AS BIGINT) AS n_tokens,
       |  CAST(max(cum_types) AS BIGINT) AS n_types,
       |  round(regr_slope(ln(cum_types), ln(cum_tokens)), 4) + 0.0
       |    AS heaps_beta,
       |  round(regr_intercept(ln(cum_types), ln(cum_tokens)), 4) + 0.0
       |    AS heaps_logk
       |FROM cf""".stripMargin

  private val q167 =
    s"""WITH ${toksCte("")},
       |occ AS (SELECT doc_id % 2 = 0 AS is_a, unnest(toks) AS tok FROM t),
       |counts AS (SELECT tok,
       |    CAST(sum(CASE WHEN is_a THEN 1 ELSE 0 END) AS BIGINT) AS ca,
       |    CAST(sum(CASE WHEN NOT is_a THEN 1 ELSE 0 END) AS BIGINT) AS cb
       |  FROM occ GROUP BY tok),
       |tot AS (SELECT CAST(sum(ca) AS BIGINT) AS na,
       |    CAST(sum(cb) AS BIGINT) AS nb FROM counts),
       |terms AS (SELECT na, nb, ca / na AS p, cb / nb AS q,
       |    (ca / na + cb / nb) / 2 AS m FROM counts CROSS JOIN tot)
       |SELECT na AS n_tokens_even, nb AS n_tokens_odd,
       |  CAST(count(*) AS BIGINT) AS vocab_union,
       |  round(sum(CASE WHEN p > 0 THEN p * ln(p / m) ELSE 0 END * 0.5 +
       |            CASE WHEN q > 0 THEN q * ln(q / m) ELSE 0 END * 0.5), 4)
       |    + 0.0 AS js_divergence
       |FROM terms GROUP BY na, nb""".stripMargin

  private val q168 =
    s"""WITH ${toksCte("")},
       |cnt AS (SELECT tok, CAST(count(*) AS BIGINT) AS c
       |  FROM (SELECT unnest(toks) AS tok FROM t) GROUP BY tok),
       |fof AS (SELECT c AS r, CAST(count(*) AS BIGINT) AS n_r
       |  FROM cnt GROUP BY c),
       |tot AS (SELECT CAST(sum(r * n_r) AS BIGINT) AS n_total,
       |    CAST(sum(CASE WHEN r = 1 THEN n_r ELSE 0 END) AS BIGINT) AS n1
       |  FROM fof),
       |nxt AS (SELECT r - 1 AS r, n_r AS n_r_next FROM fof),
       |low AS (SELECT r, n_r FROM fof ORDER BY r LIMIT 5)
       |SELECT f.r, f.n_r,
       |  floor((f.r + 1) * nxt.n_r_next * 10000.0 / f.n_r) / 10000.0
       |    AS r_star,
       |  floor(n1 * 10000.0 / n_total) / 10000.0 AS p0_unseen
       |FROM low f LEFT JOIN nxt ON nxt.r = f.r CROSS JOIN tot
       |ORDER BY f.r""".stripMargin

  private val q171 =
    s"""WITH ${toksCte("")},
       |dt AS (SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS x
       |  FROM (SELECT doc_id, unnest(toks) AS tok FROM t)
       |  GROUP BY doc_id, tok),
       |agg AS (SELECT tok, CAST(count(*) AS BIGINT) AS df,
       |    CAST(sum(x) AS BIGINT) AS total,
       |    CAST(sum(x * x) AS BIGINT) AS s2
       |  FROM dt GROUP BY tok)
       |SELECT tok AS token, df, total,
       |  floor((df * s2 - total * total) * 10000.0 / (df * total))
       |    / 10000.0 AS vmr
       |FROM agg WHERE df >= 10
       |ORDER BY total DESC, token LIMIT 20""".stripMargin

  private val q172 =
    s"""WITH ${toksCte("")},
       |dt AS (SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS x
       |  FROM (SELECT doc_id, unnest(toks) AS tok FROM t)
       |  GROUP BY doc_id, tok),
       |hapax AS (SELECT tok FROM
       |  (SELECT tok, sum(x) AS g FROM dt GROUP BY tok) WHERE g = 1),
       |per_doc AS (SELECT doc_id, CAST(sum(x) AS BIGINT) AS n_toks
       |  FROM dt GROUP BY doc_id),
       |hap AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_hapax
       |  FROM dt WHERE tok IN (SELECT tok FROM hapax) GROUP BY doc_id)
       |SELECT p.doc_id, p.n_toks,
       |  CAST(coalesce(h.n_hapax, 0) AS BIGINT) AS n_hapax,
       |  floor(coalesce(h.n_hapax, 0) * 10000.0 / p.n_toks) / 10000.0
       |    AS hapax_ratio
       |FROM per_doc p LEFT JOIN hap h ON h.doc_id = p.doc_id
       |ORDER BY hapax_ratio DESC, p.doc_id LIMIT 15""".stripMargin

  private val q173 =
    s"""WITH ${toksCte("")}
       |SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_toks,
       |  floor(list_sum(list_transform(generate_series(1, len(toks) - 24),
       |      i -> len(list_distinct(array_slice(toks, i, i + 24)))))
       |    * 10000.0 / ((len(toks) - 24) * 25)) / 10000.0 AS mattr
       |FROM t WHERE len(toks) >= 25 ORDER BY doc_id""".stripMargin

  private val q178 =
    s"""WITH ${toksCte("")},
       |cnt AS (SELECT tok, CAST(count(*) AS BIGINT) AS c
       |  FROM (SELECT unnest(toks) AS tok FROM t) GROUP BY tok),
       |tot AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM cnt),
       |top AS (SELECT c, tok,
       |    row_number() OVER (ORDER BY c DESC, tok) AS k
       |  FROM cnt ORDER BY c DESC, tok LIMIT 50),
       |cum AS (SELECT k, sum(c) OVER (ORDER BY k) AS cum FROM top)
       |SELECT CAST(k AS BIGINT) AS k, CAST(cum AS BIGINT) AS cum_tokens,
       |  floor(cum * 10000.0 / n) / 10000.0 AS coverage
       |FROM cum CROSS JOIN tot
       |WHERE k IN (1, 5, 10, 20, 50) ORDER BY k""".stripMargin

  // q214 Count-Min heavy hitters: the 4×16 counter matrix from
  // first-nibble salted-md5 buckets, estimates = min over the 4
  // addressed counters, heavy bar = est·100 ≥ N. Exact integers
  // end-to-end — no float anywhere.
  private val q214 = {
    def bkt(salt: String, ref: String) =
      s"(instr('0123456789abcdef', substr(md5('$salt' || $ref), 1, 1)) - 1)"
    val js = (0 until 4)
      .map(j => s"SELECT $j AS j, 'cms$j:' AS salt")
      .mkString(" UNION ALL ")
    s"""WITH ${toksCte("")},
       |occ AS (SELECT unnest(toks) AS tok FROM t),
       |js AS ($js),
       |jb AS (SELECT j,
       |    (instr('0123456789abcdef', substr(md5(salt || tok), 1, 1)) - 1)
       |      AS b
       |  FROM occ CROSS JOIN js),
       |cnt AS (SELECT j, b, CAST(count(*) AS BIGINT) AS c
       |  FROM jb GROUP BY 1, 2),
       |ex AS (SELECT tok, CAST(count(*) AS BIGINT) AS n_exact
       |  FROM occ GROUP BY 1),
       |tot AS (SELECT CAST(sum(n_exact) AS BIGINT) AS n_total FROM ex),
       |tb AS (SELECT e.tok, e.n_exact, j.j,
       |    (instr('0123456789abcdef', substr(md5(j.salt || e.tok), 1, 1)) - 1)
       |      AS b
       |  FROM ex e CROSS JOIN js j),
       |es AS (SELECT tok, n_exact, min(c.c) AS est
       |  FROM tb JOIN cnt c USING (j, b) GROUP BY 1, 2)
       |SELECT tok AS token, est, n_exact, est - n_exact AS overcount
       |FROM es CROSS JOIN tot WHERE est * 100 >= n_total
       |ORDER BY est DESC, token""".stripMargin
  }

  /** 12-bit Bloom position of hash `i`: first three md5 nibbles of the
    * salted shingle — ONE definition string mirrored by
    * [[graft.operators.Sketches]]' `bloomPos`. */
  private def bfPos(i: Int, ref: String) = {
    def nib(k: Int) =
      s"(instr('0123456789abcdef', substr(md5('bf$i:' || $ref), $k, 1)) - 1)"
    s"(${nib(1)}*256 + ${nib(2)}*16 + ${nib(3)})"
  }

  // q215 Bloom decontamination screen: the face tests the packed
  // 64-long bit array; the oracle tests position-set membership —
  // semantically identical (same positions, set bits ≡ member
  // positions), so the hash gate proves the bit packing faithful.
  // A shingle is Bloom-positive iff all 3 its union branches join the
  // position set (duplicate positions within a shingle's 3 hashes
  // contribute multiply on both sides of the count).
  private val q215 =
    s"""WITH ${toksCte("")},
       |$shCte,
       |ev AS (SELECT DISTINCT s FROM sh WHERE doc_id < 20),
       |ps AS (SELECT DISTINCT p FROM (
       |    SELECT ${bfPos(0, "s")} AS p FROM ev
       |    UNION SELECT ${bfPos(1, "s")} FROM ev
       |    UNION SELECT ${bfPos(2, "s")} FROM ev) px),
       |tr AS (SELECT doc_id, s FROM sh WHERE doc_id >= 20),
       |trp AS (SELECT doc_id, s, ${bfPos(0, "s")} AS p FROM tr
       |  UNION ALL SELECT doc_id, s, ${bfPos(1, "s")} FROM tr
       |  UNION ALL SELECT doc_id, s, ${bfPos(2, "s")} FROM tr),
       |hit AS (SELECT doc_id, s FROM trp JOIN ps USING (p)
       |  GROUP BY doc_id, s HAVING count(*) = 3),
       |per AS (SELECT tr.doc_id, CAST(count(*) AS BIGINT) AS n_sh,
       |    CAST(sum(CASE WHEN h.s IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
       |      AS n_bloom,
       |    CAST(sum(CASE WHEN e.s IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
       |      AS n_exact
       |  FROM tr LEFT JOIN hit h ON h.doc_id = tr.doc_id AND h.s = tr.s
       |    LEFT JOIN ev e ON e.s = tr.s
       |  GROUP BY 1)
       |SELECT doc_id, n_sh, n_bloom, n_exact, n_bloom - n_exact AS n_fp
       |FROM per ORDER BY doc_id""".stripMargin

  // q216 TextRank: the fixed-point iteration unrolled to 5 chained
  // CTEs — exact BIGINT state (see Graphs.textRank's contract), so
  // every iteration is bit-equal on both engines regardless of
  // summation order. floor(x * 1.0 / y) over BIGINTs is the exact
  // integer division while the product stays < 2^53.
  private val q216 = {
    val term = "CAST(floor(ew.w * r.r * 1.0 / ew.wdeg) AS BIGINT)"
    def iter(i: Int) =
      s"""r$i AS (SELECT ew.dst AS tok,
         |    1500 + CAST(floor(CAST(sum($term) AS BIGINT) * 85 * 1.0 / 100)
         |      AS BIGINT) AS r
         |  FROM ew JOIN r${i - 1} r ON r.tok = ew.src GROUP BY 1)"""
        .stripMargin
    s"""WITH ${toksCte("")},
       |ax AS (SELECT toks, unnest(generate_series(1, len(toks) - 1)) AS i
       |  FROM t WHERE len(toks) >= 2),
       |pe AS (SELECT list_extract(toks, i) AS a,
       |    list_extract(toks, i + 1) AS b
       |  FROM ax WHERE list_extract(toks, i) <> list_extract(toks, i + 1)),
       |ed AS (SELECT src, dst, CAST(count(*) AS BIGINT) AS w FROM
       |  (SELECT a AS src, b AS dst FROM pe
       |   UNION ALL SELECT b, a FROM pe) u
       |  GROUP BY 1, 2),
       |dg AS (SELECT src, CAST(sum(w) AS BIGINT) AS wdeg
       |  FROM ed GROUP BY 1),
       |ew AS (SELECT ed.src, ed.dst, ed.w, dg.wdeg
       |  FROM ed JOIN dg USING (src)),
       |r0 AS (SELECT src AS tok, CAST(10000 AS BIGINT) AS r FROM dg),
       |${(1 to 5).map(iter).mkString(",\n")}
       |SELECT tok AS token, r AS r_fp,
       |  round(r / 10000.0, 4) + 0.0 AS rank
       |FROM r5 ORDER BY r_fp DESC, token LIMIT 30""".stripMargin
  }

  // q217 RRF hybrid retrieval: q153's BM25 (identical constants,
  // rank on the round-4 score) + q49's cosine (rank on the raw fixed-
  // fold value), both tiebroken by id; rrf = fixed-order 2-term sum of
  // exact divisions, re-ranked with id tiebreak, rounded AFTER
  // ranking (q204's rule).
  private val q217 =
    s"""WITH ${toksCte("")},
       |cd AS (SELECT doc_id, toks FROM t
       |  WHERE doc_id >= 5 AND doc_id <= 199),
       |dl AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl FROM cd),
       |st AS (SELECT CAST(count(*) AS BIGINT) AS n, avg(dl) AS avgdl
       |  FROM dl),
       |tf AS (SELECT doc_id, tok AS term, CAST(count(*) AS BIGINT) AS tf
       |  FROM (SELECT doc_id, unnest(toks) AS tok FROM cd) o
       |  GROUP BY 1, 2),
       |df AS (SELECT term, CAST(count(*) AS BIGINT) AS df
       |  FROM tf GROUP BY 1),
       |qt AS (SELECT DISTINCT probe, term FROM
       |  (SELECT doc_id AS probe, unnest(toks) AS term FROM t
       |   WHERE doc_id < 5) qx),
       |bsc AS (SELECT q.probe, tf.doc_id AS id,
       |    round(sum(ln(1.0 + (st.n - df.df + 0.5) / (df.df + 0.5))
       |      * tf.tf * 2.2
       |      / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / st.avgdl))), 4)
       |      AS bscore
       |  FROM qt q JOIN tf ON tf.term = q.term
       |    JOIN df ON df.term = q.term
       |    JOIN dl ON dl.doc_id = tf.doc_id CROSS JOIN st
       |  GROUP BY 1, 2),
       |ra AS (SELECT probe, id, CAST(rk AS BIGINT) AS bm25_rank FROM
       |  (SELECT probe, id, row_number() OVER
       |     (PARTITION BY probe ORDER BY bscore DESC, id) AS rk
       |   FROM bsc) rx WHERE rk <= 20),
       |e AS (SELECT vec_id,
       |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
       |  FROM embeddings),
       |pv AS (SELECT vec_id AS probe, v AS vp FROM e WHERE vec_id < 5),
       |cv AS (SELECT vec_id AS id, v AS vc FROM e
       |  WHERE vec_id >= 5 AND vec_id <= 199),
       |cs AS (SELECT probe, id, ${cos("vp", "vc")} AS cs
       |  FROM pv CROSS JOIN cv),
       |rb AS (SELECT probe, id, CAST(rk AS BIGINT) AS cos_rank FROM
       |  (SELECT probe, id, row_number() OVER
       |     (PARTITION BY probe ORDER BY cs DESC, id) AS rk
       |   FROM cs) ry WHERE rk <= 20),
       |fu AS (SELECT probe, id, bm25_rank, cos_rank,
       |    coalesce(1.0 / (60 + bm25_rank), 0.0)
       |      + coalesce(1.0 / (60 + cos_rank), 0.0) AS rrf
       |  FROM ra FULL JOIN rb USING (probe, id)),
       |rk AS (SELECT probe, id, bm25_rank, cos_rank, rrf,
       |    row_number() OVER (PARTITION BY probe ORDER BY rrf DESC, id)
       |      AS n_rank
       |  FROM fu)
       |SELECT probe, CAST(n_rank AS BIGINT) AS n_rank, id,
       |  round(rrf, 6) + 0.0 AS rrf, bm25_rank, cos_rank
       |FROM rk WHERE n_rank <= 10 ORDER BY probe, n_rank""".stripMargin

  // q219 portable HLL: register/ρ strings shared with the operator
  // (TextHashes.hllRegister/hllRho — one definition, the parity
  // contract); float ops only over exact integers/dyadics, fractional
  // literals CAST to DOUBLE on both engines (a bare 0.673 literal is
  // DECIMAL in both dialects and their decimal arithmetic disagrees).
  private val q219 = {
    import graft.operators.TextHashes.{hllRegister, hllRho}
    s"""WITH o AS (SELECT source,
       |    unnest(list_filter(string_split(trim(text), ' '),
       |      x -> x <> '')) AS tok
       |  FROM documents),
       |h AS (SELECT source, md5(tok) AS m FROM o),
       |r AS (SELECT source, ${hllRegister("m")} AS j,
       |    ${hllRho("m")} AS rho FROM h),
       |mx AS (SELECT source, j, max(rho) AS mj FROM r GROUP BY 1, 2),
       |sp AS (SELECT s.source, g.j
       |  FROM (SELECT DISTINCT source FROM documents) s
       |  CROSS JOIN (SELECT unnest(generate_series(0, 15)) AS j) g),
       |fr AS (SELECT sp.source, sp.j, coalesce(mx.mj, 0) AS mj
       |  FROM sp LEFT JOIN mx ON mx.source = sp.source AND mx.j = sp.j),
       |ag AS (SELECT source,
       |    sum(CAST(1 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << mj) AS DOUBLE))
       |      AS z,
       |    CAST(sum(CASE WHEN mj = 0 THEN 1 ELSE 0 END) AS BIGINT)
       |      AS v_empty
       |  FROM fr GROUP BY 1),
       |e AS (SELECT source, v_empty,
       |    CAST(0.673 AS DOUBLE) * 256 / z AS raw FROM ag),
       |f AS (SELECT source, v_empty, raw,
       |    CASE WHEN raw <= 40.0 AND v_empty > 0
       |      THEN 16 * ln(CAST(16 AS DOUBLE) / v_empty) ELSE raw END
       |      AS est
       |  FROM e),
       |x AS (SELECT source, CAST(count(DISTINCT tok) AS BIGINT) AS n_exact
       |  FROM o GROUP BY 1)
       |SELECT f.source, x.n_exact, f.v_empty,
       |  round(raw, 4) + 0.0 AS raw, round(est, 4) + 0.0 AS est
       |FROM f JOIN x ON x.source = f.source ORDER BY f.source""".stripMargin
  }

  // q220 curation funnel: per-doc flags in CTEs (gate via exact
  // cross-multiply, min-id dedup survivor among gate passers, lang,
  // ceil-half per-source quota as rank*2 <= count+1), one aggregate,
  // five stage rows via UNION ALL over the 1-row agg.
  private val q220 =
    s"""WITH b AS (SELECT doc_id, source, lang,
       |    md5(lower(trim(text))) AS h,
       |    CAST(len(list_filter(string_split(trim(text), ' '),
       |      x -> x <> '')) AS BIGINT) AS n_toks,
       |    CAST(len(list_distinct(list_filter(string_split(trim(text), ' '),
       |      x -> x <> ''))) AS BIGINT) AS n_types
       |  FROM documents),
       |f AS (SELECT *, (n_toks >= 20 AND n_toks <= 1000
       |    AND n_types * 10 >= n_toks * 3) AS q FROM b),
       |sv AS (SELECT h, min(doc_id) AS keep_id FROM f WHERE q GROUP BY h),
       |f2 AS (SELECT f.*, (f.q AND f.doc_id = sv.keep_id) AS dd,
       |    (f.q AND f.doc_id = sv.keep_id AND f.lang = 'en') AS ll
       |  FROM f LEFT JOIN sv ON sv.h = f.h),
       |lr AS (SELECT doc_id, source,
       |    row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rk
       |  FROM f2 WHERE ll),
       |cn AS (SELECT source, CAST(count(*) AS BIGINT) AS cnt
       |  FROM lr GROUP BY 1),
       |kp AS (SELECT lr.doc_id FROM lr JOIN cn ON cn.source = lr.source
       |  WHERE lr.rk * 2 <= cn.cnt + 1),
       |f3 AS (SELECT f2.*, (kp.doc_id IS NOT NULL) AS kk
       |  FROM f2 LEFT JOIN kp ON kp.doc_id = f2.doc_id),
       |ag AS (SELECT
       |    CAST(count(*) AS BIGINT) AS n0, CAST(sum(n_toks) AS BIGINT) AS t0,
       |    CAST(sum(CASE WHEN q THEN 1 ELSE 0 END) AS BIGINT) AS n1,
       |    CAST(sum(CASE WHEN q THEN n_toks ELSE 0 END) AS BIGINT) AS t1,
       |    CAST(sum(CASE WHEN dd THEN 1 ELSE 0 END) AS BIGINT) AS n2,
       |    CAST(sum(CASE WHEN dd THEN n_toks ELSE 0 END) AS BIGINT) AS t2,
       |    CAST(sum(CASE WHEN ll THEN 1 ELSE 0 END) AS BIGINT) AS n3,
       |    CAST(sum(CASE WHEN ll THEN n_toks ELSE 0 END) AS BIGINT) AS t3,
       |    CAST(sum(CASE WHEN kk THEN 1 ELSE 0 END) AS BIGINT) AS n4,
       |    CAST(sum(CASE WHEN kk THEN n_toks ELSE 0 END) AS BIGINT) AS t4
       |  FROM f3)
       |SELECT CAST(0 AS BIGINT) AS stage, 'raw' AS name,
       |  n0 AS n_docs, t0 AS n_tokens FROM ag
       |UNION ALL SELECT CAST(1 AS BIGINT), 'quality', n1, t1 FROM ag
       |UNION ALL SELECT CAST(2 AS BIGINT), 'dedup', n2, t2 FROM ag
       |UNION ALL SELECT CAST(3 AS BIGINT), 'lang', n3, t3 FROM ag
       |UNION ALL SELECT CAST(4 AS BIGINT), 'quota', n4, t4 FROM ag
       |ORDER BY stage""".stripMargin

  // q223 fixed-point power-iteration PCA: quantized integer
  // covariance via the exact identity n·Σee − ΣeΣe, six unrolled
  // iterations with exact floor renormalization; every fractional
  // literal CAST to DOUBLE (q219's decimal-literal rule).
  private val q223 = {
    def iter(i: Int) =
      s"""w$i AS (SELECT cm.j, CAST(sum(cm.c * v.v) AS BIGINT) AS w
         |  FROM cm JOIN v${i - 1} v ON v.k = cm.k GROUP BY 1),
         |m$i AS (SELECT max(abs(w)) AS wm FROM w$i),
         |v$i AS (SELECT j AS k,
         |    CAST(floor(w * CAST(10000 AS DOUBLE) / nullif(wm, 0))
         |      AS BIGINT) AS v
         |  FROM w$i CROSS JOIN m$i)""".stripMargin
    s"""WITH rws AS (SELECT vec_id, i AS j,
       |    CAST(floor(CAST(list_extract(embedding, i) AS DOUBLE)
       |      * 1000) AS BIGINT) AS e
       |  FROM (SELECT vec_id, embedding,
       |      unnest(generate_series(1, 64)) AS i FROM embeddings) u),
       |sm AS (SELECT j, CAST(sum(e) AS BIGINT) AS sj,
       |    CAST(count(*) AS BIGINT) AS cnt FROM rws GROUP BY 1),
       |pr AS (SELECT a.j, b.j AS k, CAST(sum(a.e * b.e) AS BIGINT) AS p
       |  FROM rws a JOIN rws b ON a.vec_id = b.vec_id GROUP BY 1, 2),
       |cm AS (SELECT pr.j, pr.k,
       |    CAST(floor((s1.cnt * pr.p - s1.sj * s2.sj)
       |      * CAST(1 AS DOUBLE) / CAST(10000000 AS DOUBLE))
       |      AS BIGINT) AS c
       |  FROM pr JOIN sm s1 ON s1.j = pr.j JOIN sm s2 ON s2.j = pr.k),
       |v0 AS (SELECT j AS k, CAST(10000 AS BIGINT) AS v FROM sm),
       |${(1 to 6).map(iter).mkString(",\n")}
       |SELECT k AS dim, v AS v_fp,
       |  round(v / 10000.0, 4) + 0.0 AS loading
       |FROM v6 ORDER BY dim""".stripMargin
  }

  // q224 fixed-point Lloyd k-means: centroids as (cid, dim, cv) row
  // tables (the face's array form computes identical values through
  // zip_with folds); argmin via row_number ORDER BY dist, cid ≡ the
  // face's min-struct; exact floor means; empty clusters coalesce to
  // the previous centroid. Seeds = the 8 ACTUALLY-smallest vec_ids
  // with cid = 0-based rank (the face's TakeOrdered seeding contract —
  // not a `vec_id < 8` predicate, which under-seeds sparse id spaces).
  private val q224 = {
    def round_(i: Int, prev: String) =
      s"""d$i AS (SELECT e.vec_id, c.cid,
         |    CAST(sum((e.ev - c.cv) * (e.ev - c.cv)) AS BIGINT) AS dist
         |  FROM e JOIN $prev c ON c.dim = e.dim GROUP BY 1, 2),
         |a$i AS (SELECT vec_id, cid FROM (SELECT vec_id, cid,
         |    row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid)
         |      AS rk FROM d$i) x WHERE rk = 1),
         |u$i AS (SELECT a.cid, e.dim,
         |    CAST(floor(sum(e.ev) * CAST(1 AS DOUBLE) / count(*))
         |      AS BIGINT) AS cv
         |  FROM a$i a JOIN e ON e.vec_id = a.vec_id GROUP BY 1, 2),
         |c$i AS (SELECT c.cid, c.dim, coalesce(u.cv, c.cv) AS cv
         |  FROM $prev c LEFT JOIN u$i u
         |    ON u.cid = c.cid AND u.dim = c.dim)""".stripMargin
    s"""WITH e AS (SELECT vec_id, CAST(i AS BIGINT) AS dim,
       |    CAST(floor(CAST(list_extract(embedding, i) AS DOUBLE)
       |      * 1000) AS BIGINT) AS ev
       |  FROM (SELECT vec_id, embedding,
       |      unnest(generate_series(1, 64)) AS i FROM embeddings) u),
       |sd AS (SELECT vec_id,
       |    CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS cid
       |  FROM (SELECT DISTINCT vec_id FROM e ORDER BY vec_id LIMIT 8) z),
       |c0 AS (SELECT sd.cid, e.dim, e.ev AS cv
       |  FROM e JOIN sd ON sd.vec_id = e.vec_id),
       |${round_(1, "c0")},
       |${round_(2, "c1")},
       |d3 AS (SELECT e.vec_id, c.cid,
       |    CAST(sum((e.ev - c.cv) * (e.ev - c.cv)) AS BIGINT) AS dist
       |  FROM e JOIN c2 c ON c.dim = e.dim GROUP BY 1, 2),
       |a3 AS (SELECT vec_id, cid FROM (SELECT vec_id, cid,
       |    row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid)
       |      AS rk FROM d3) x WHERE rk = 1),
       |nm AS (SELECT cid, CAST(count(*) AS BIGINT) AS n_members
       |  FROM a3 GROUP BY 1)
       |SELECT c2.cid, c2.dim, c2.cv AS c,
       |  coalesce(nm.n_members, 0) AS n_members
       |FROM c2 LEFT JOIN nm ON nm.cid = c2.cid
       |ORDER BY c2.cid, c2.dim""".stripMargin
  }

  // q225 Gopher rule battery: per-doc exact-integer counters + the
  // paper's rule verdicts; alpha test via the 'g'-flagged class strip
  // (SqlCompat maps the DuckDB flag to Spark's replace-all), symbol
  // counts via plain replace (all-occurrence on both engines, the
  // ellipsis delta always divisible by 3).
  private val q225 =
    s"""WITH t AS (SELECT doc_id, text,
       |    list_filter(string_split(trim(text), ' '), x -> x <> '')
       |      AS toks
       |  FROM documents),
       |c AS (SELECT doc_id,
       |    CAST(len(toks) AS BIGINT) AS n_words,
       |    CAST(list_sum(list_transform(toks, x -> length(x)))
       |      AS BIGINT) AS sum_len,
       |    CAST(len(list_filter(toks, x ->
       |      length(regexp_replace(x, '[A-Za-z]', '', 'g')) < length(x)))
       |      AS BIGINT) AS n_alpha,
       |    CAST(length(text) - length(replace(text, '#', ''))
       |      AS BIGINT) AS n_hash,
       |    CAST((length(text) - length(replace(text, '...', ''))) / 3
       |      AS BIGINT) AS n_ellipsis,
       |    CAST(len(list_intersect(list_distinct(toks),
       |      list_value('the', 'be', 'to', 'of', 'and', 'that',
       |        'have', 'with'))) AS BIGINT) AS n_stop
       |  FROM t)
       |SELECT doc_id, n_words,
       |  floor(sum_len * 10000.0 / nullif(n_words, 0)) / 10000.0 AS mwl,
       |  n_alpha, n_hash, n_ellipsis, n_stop,
       |  (n_words >= 50 AND n_words <= 100000) AS r_words,
       |  (sum_len >= n_words * 3 AND sum_len <= n_words * 10) AS r_mwl,
       |  (n_hash * 10 <= n_words AND n_ellipsis * 10 <= n_words) AS r_sym,
       |  (n_alpha * 10 >= n_words * 8) AS r_alpha,
       |  (n_stop >= 2) AS r_stop,
       |  (n_words >= 50 AND n_words <= 100000
       |    AND sum_len >= n_words * 3 AND sum_len <= n_words * 10
       |    AND n_hash * 10 <= n_words AND n_ellipsis * 10 <= n_words
       |    AND n_alpha * 10 >= n_words * 8
       |    AND n_stop >= 2) AS gopher_pass
       |FROM c ORDER BY doc_id""".stripMargin

  // q226 stupid-backoff trigram scoring: train tables from doc_id <
  // 250, 3→2→1 backoff CASE with α = 0.4 per level and a Laplace
  // unigram floor; backoff constants CAST to DOUBLE (the decimal-
  // literal rule); avg ln score round-4 (cancellable-sum rule).
  private val q226 =
    s"""WITH ${toksCte("")},
       |tr AS (SELECT doc_id, toks FROM t WHERE doc_id < 250),
       |uni AS (SELECT tok AS w, CAST(count(*) AS BIGINT) AS cu
       |  FROM (SELECT unnest(toks) AS tok FROM tr) o GROUP BY 1),
       |bi AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS cb FROM
       |  (SELECT list_extract(toks, i) AS w1,
       |      list_extract(toks, i + 1) AS w2
       |   FROM (SELECT toks, unnest(generate_series(1, len(toks) - 1))
       |       AS i FROM tr WHERE len(toks) >= 2) bx) b GROUP BY 1, 2),
       |tri AS (SELECT w1, w2, w3, CAST(count(*) AS BIGINT) AS ct FROM
       |  (SELECT list_extract(toks, i) AS w1,
       |      list_extract(toks, i + 1) AS w2,
       |      list_extract(toks, i + 2) AS w3
       |   FROM (SELECT toks, unnest(generate_series(1, len(toks) - 2))
       |       AS i FROM tr WHERE len(toks) >= 3) tx) g GROUP BY 1, 2, 3),
       |nv AS (SELECT CAST(sum(cu) AS BIGINT) AS nn,
       |    CAST(count(*) AS BIGINT) AS vv FROM uni),
       |st AS (SELECT doc_id, list_extract(toks, i) AS w1,
       |    list_extract(toks, i + 1) AS w2,
       |    list_extract(toks, i + 2) AS w3
       |  FROM (SELECT doc_id, toks,
       |      unnest(generate_series(1, len(toks) - 2)) AS i
       |    FROM t WHERE doc_id >= 250 AND len(toks) >= 3) sx),
       |sc AS (SELECT st.doc_id,
       |    CASE WHEN tri.ct IS NOT NULL THEN 3
       |         WHEN b2.cb IS NOT NULL THEN 2 ELSE 1 END AS lvl,
       |    CASE WHEN tri.ct IS NOT NULL THEN tri.ct / b1.cb
       |         WHEN b2.cb IS NOT NULL
       |           THEN CAST(0.4 AS DOUBLE) * b2.cb / u2.cu
       |         ELSE CAST(0.16 AS DOUBLE) * (coalesce(u3.cu, 0) + 1)
       |           / (nv.nn + nv.vv) END AS s
       |  FROM st
       |  LEFT JOIN tri ON tri.w1 = st.w1 AND tri.w2 = st.w2
       |    AND tri.w3 = st.w3
       |  LEFT JOIN bi b1 ON b1.w1 = st.w1 AND b1.w2 = st.w2
       |  LEFT JOIN bi b2 ON b2.w1 = st.w2 AND b2.w2 = st.w3
       |  LEFT JOIN uni u2 ON u2.w = st.w2
       |  LEFT JOIN uni u3 ON u3.w = st.w3
       |  CROSS JOIN nv)
       |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tri,
       |  CAST(sum(CASE WHEN lvl = 3 THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_tri_hit,
       |  CAST(sum(CASE WHEN lvl = 2 THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_bi_hit,
       |  CAST(sum(CASE WHEN lvl = 1 THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_uni,
       |  round(sum(ln(s)) / count(*), 4) + 0.0 AS avg_ll
       |FROM sc GROUP BY doc_id ORDER BY doc_id""".stripMargin

  // q230 cross-document repeated-substring removal: the brute-force
  // cover identity — a position is removed iff some duplicated 5-gram
  // covers it and this doc is not the gram's min-id keeper; census via
  // per-doc cover counts, maximal segments via lag islands, cleaned
  // sequence pinned by the commutative SUM of 32-bit md5-nibble hashes
  // of 'pos:token' over KEPT positions (q202's order-faithful idiom).
  private val q230 = {
    val v32 = (1 to 8).map(i =>
      s"(instr('0123456789abcdef', substr(md5(CAST(pos AS STRING) || ':' || tok), $i, 1)) - 1)" +
        s" * CAST(${1L << (4 * (8 - i))} AS BIGINT)")
      .mkString("(", " + ", ")")
    s"""WITH ${toksCte("")},
       |g0 AS (SELECT doc_id, toks,
       |    unnest(generate_series(1, len(toks) - 4)) AS pos
       |  FROM t WHERE len(toks) >= 5),
       |g AS (SELECT doc_id, CAST(pos AS BIGINT) AS pos,
       |    array_to_string(array_slice(toks, pos, pos + 4), ' ') AS gram
       |  FROM g0),
       |d AS (SELECT gram, CAST(count(DISTINCT doc_id) AS BIGINT) AS df,
       |    min(doc_id) AS keeper
       |  FROM g GROUP BY gram),
       |cv AS (SELECT DISTINCT doc_id, cpos FROM
       |  (SELECT g.doc_id, unnest(generate_series(g.pos, g.pos + 4)) AS cpos
       |   FROM g JOIN d ON d.gram = g.gram
       |   WHERE d.df >= 2 AND d.keeper <> g.doc_id) cx),
       |rm AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_removed
       |  FROM cv GROUP BY doc_id),
       |rn AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_runs FROM
       |  (SELECT doc_id, cpos,
       |     lag(cpos) OVER (PARTITION BY doc_id ORDER BY cpos) AS prev
       |   FROM cv) ix
       |  WHERE prev IS NULL OR prev <> cpos - 1 GROUP BY doc_id),
       |ap0 AS (SELECT doc_id, toks,
       |    unnest(generate_series(1, len(toks))) AS pos FROM t),
       |ap AS (SELECT doc_id, CAST(pos AS BIGINT) AS pos,
       |    list_extract(toks, pos) AS tok FROM ap0),
       |ks AS (SELECT ap.doc_id, CAST(sum($v32) AS BIGINT) AS sig
       |  FROM ap LEFT JOIN cv ON cv.doc_id = ap.doc_id AND cv.cpos = ap.pos
       |  WHERE cv.cpos IS NULL GROUP BY ap.doc_id)
       |SELECT t.doc_id, CAST(len(t.toks) AS BIGINT) AS n_toks,
       |  coalesce(rm.n_removed, 0) AS n_removed,
       |  coalesce(rn.n_runs, 0) AS n_runs,
       |  CAST(coalesce(ks.sig, 0) AS BIGINT) AS clean_sig
       |FROM t LEFT JOIN rm ON rm.doc_id = t.doc_id
       |LEFT JOIN rn ON rn.doc_id = t.doc_id
       |LEFT JOIN ks ON ks.doc_id = t.doc_id
       |ORDER BY t.doc_id""".stripMargin
  }

  // q231–q235 product quantization: q224's k-means CTE shape with
  // `sub` threaded through — all 8 subspace codebooks train in one
  // chain; encoding/LUT/ADC are argmin/lookup joins over exact
  // integers, so every face hash-gates. Subspace mapping via the
  // floor-double idiom (integer `/` diverges between engines); seeds =
  // the 16 smallest INDEXED vec_ids with cid = 0-based rank (q224's
  // r17 seeding contract).
  private val pqChain: String = {
    def round_(i: Int, prev: String) =
      s"""pd$i AS (SELECT ec.vec_id, ec.sub, c.cid,
         |    CAST(sum((ec.ev - c.cv) * (ec.ev - c.cv)) AS BIGINT) AS dist
         |  FROM ec JOIN $prev c ON c.sub = ec.sub AND c.dim = ec.dim
         |  GROUP BY 1, 2, 3),
         |pa$i AS (SELECT vec_id, sub, cid FROM (SELECT vec_id, sub, cid,
         |    row_number() OVER (PARTITION BY vec_id, sub ORDER BY dist, cid)
         |      AS rk FROM pd$i) x WHERE rk = 1),
         |pu$i AS (SELECT a.sub, a.cid, ec.dim,
         |    CAST(floor(sum(ec.ev) * CAST(1 AS DOUBLE) / count(*))
         |      AS BIGINT) AS cv
         |  FROM pa$i a JOIN ec ON ec.vec_id = a.vec_id AND ec.sub = a.sub
         |  GROUP BY 1, 2, 3),
         |pc$i AS (SELECT c.sub, c.cid, c.dim, coalesce(u.cv, c.cv) AS cv
         |  FROM $prev c LEFT JOIN pu$i u
         |    ON u.sub = c.sub AND u.cid = c.cid AND u.dim = c.dim)"""
        .stripMargin
    s"""e0 AS (SELECT vec_id, CAST(i AS BIGINT) AS i,
       |    CAST(floor(CAST(list_extract(embedding, i) AS DOUBLE)
       |      * 1000) AS BIGINT) AS ev
       |  FROM (SELECT vec_id, embedding,
       |      unnest(generate_series(1, 64)) AS i FROM embeddings) u0),
       |es AS (SELECT vec_id,
       |    CAST(floor((i - 1) / CAST(8 AS DOUBLE)) AS BIGINT) AS sub,
       |    CAST((i - 1) % 8 + 1 AS BIGINT) AS dim, ev FROM e0),
       |ec AS (SELECT * FROM es WHERE vec_id >= 10),
       |psd AS (SELECT vec_id,
       |    CAST(row_number() OVER (ORDER BY vec_id) - 1 AS BIGINT) AS cid
       |  FROM (SELECT DISTINCT vec_id FROM ec ORDER BY vec_id LIMIT 16) z),
       |pc0 AS (SELECT ec.sub, psd.cid, ec.dim, ec.ev AS cv
       |  FROM ec JOIN psd ON psd.vec_id = ec.vec_id),
       |${round_(1, "pc0")},
       |${round_(2, "pc1")}""".stripMargin
  }

  /** Final-codebook encoding of the indexed corpus (requires pqChain). */
  private val pqEnc =
    """enc AS (SELECT vec_id, sub, cid AS code FROM (SELECT vec_id, sub,
      |    cid, row_number() OVER (PARTITION BY vec_id, sub
      |      ORDER BY dist, cid) AS rk
      |  FROM (SELECT ec.vec_id, ec.sub, c.cid,
      |      CAST(sum((ec.ev - c.cv) * (ec.ev - c.cv)) AS BIGINT) AS dist
      |    FROM ec JOIN pc2 c ON c.sub = ec.sub AND c.dim = ec.dim
      |    GROUP BY 1, 2, 3) dd) x WHERE rk = 1)""".stripMargin

  /** Probe LUT + ADC top-3 (requires pqChain + pqEnc). */
  private val pqAdc =
    """ep AS (SELECT * FROM es WHERE vec_id BETWEEN 4 AND 9),
      |pl AS (SELECT ep.vec_id AS probe, c.sub, c.cid AS code,
      |    CAST(sum((ep.ev - c.cv) * (ep.ev - c.cv)) AS BIGINT) AS pd
      |  FROM ep JOIN pc2 c ON c.sub = ep.sub AND c.dim = ep.dim
      |  GROUP BY 1, 2, 3),
      |ad AS (SELECT pl.probe, enc.vec_id AS cand,
      |    CAST(sum(pl.pd) AS BIGINT) AS adc
      |  FROM enc JOIN pl ON pl.sub = enc.sub AND pl.code = enc.code
      |  GROUP BY 1, 2),
      |at3 AS (SELECT probe, CAST(rk AS BIGINT) AS rk, cand, adc FROM (
      |  SELECT probe, cand, adc,
      |    row_number() OVER (PARTITION BY probe ORDER BY adc, cand) AS rk
      |  FROM ad) x WHERE rk <= 3)""".stripMargin

  private val q231 =
    s"""WITH $pqChain
       |SELECT sub, cid, dim, cv AS c FROM pc2
       |ORDER BY sub, cid, dim""".stripMargin

  private val q232 =
    s"""WITH $pqChain,
       |$pqEnc
       |SELECT vec_id, sub, code FROM enc ORDER BY vec_id, sub""".stripMargin

  private val q233 =
    s"""WITH $pqChain,
       |$pqEnc,
       |$pqAdc
       |SELECT probe, rk, cand, adc FROM at3 ORDER BY probe, rk""".stripMargin

  private val q234 =
    s"""WITH $pqChain,
       |$pqEnc,
       |$pqAdc,
       |ex AS (SELECT probe, cand FROM (SELECT p.vec_id AS probe,
       |    c.vec_id AS cand,
       |    row_number() OVER (PARTITION BY p.vec_id ORDER BY
       |      sum((p.ev - c.ev) * (p.ev - c.ev)), c.vec_id) AS rk
       |  FROM es p JOIN es c ON c.sub = p.sub AND c.dim = p.dim
       |  WHERE p.vec_id BETWEEN 4 AND 9 AND c.vec_id >= 10
       |  GROUP BY p.vec_id, c.vec_id) x WHERE rk <= 3),
       |pr AS (SELECT DISTINCT vec_id AS probe FROM ep),
       |hits AS (SELECT a.probe, CAST(count(*) AS BIGINT) AS n_hit
       |  FROM at3 a JOIN ex ON ex.probe = a.probe AND ex.cand = a.cand
       |  GROUP BY 1)
       |SELECT pr.probe, coalesce(h.n_hit, 0) AS n_hit,
       |  round(coalesce(h.n_hit, 0) / 3.0, 4) AS recall
       |FROM pr LEFT JOIN hits h ON h.probe = pr.probe
       |ORDER BY pr.probe""".stripMargin

  // q236 sign-LSH banding audit: per (bands × bits) config the
  // band-bucket candidate pairs vs brute-force cosine ≥ 0.4 truth on
  // the bounded universe; configs and dim layout come from
  // Dedup.signLshAuditConfigs/signLshDim — ONE definition, zero drift.
  private val q236 = {
    val bandSelects = for {
      (bb, rr) <- graft.operators.Dedup.signLshAuditConfigs
      j <- 0 until bb
    } yield {
      val key = (0 until rr).map { i =>
        val dim = graft.operators.Dedup.signLshDim(bb, rr, j, i)
        s"(CASE WHEN CAST(list_extract(v, $dim) AS DOUBLE) >= 0 THEN '1' ELSE '0' END)"
      }.mkString(" || ")
      s"""SELECT vec_id, CAST($bb AS BIGINT) AS bands,
         |    CAST($rr AS BIGINT) AS bits, $j AS band, $key AS key
         |  FROM ve""".stripMargin
    }
    s"""WITH ve AS (SELECT vec_id,
       |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
       |  FROM embeddings WHERE vec_id < 300),
       |tr AS (SELECT x.vec_id AS a, y.vec_id AS b
       |  FROM ve x JOIN ve y ON x.vec_id < y.vec_id
       |  WHERE ${cos("x.v", "y.v")} >= 0.4),
       |tc AS (SELECT CAST(count(*) AS BIGINT) AS n_true FROM tr),
       |bk AS (${bandSelects.mkString("\n  UNION ALL\n")}),
       |cand AS (SELECT DISTINCT x.bands, x.bits, x.vec_id AS a,
       |    y.vec_id AS b
       |  FROM bk x JOIN bk y ON x.bands = y.bands AND x.bits = y.bits
       |    AND x.band = y.band AND x.key = y.key
       |    AND x.vec_id < y.vec_id),
       |nc AS (SELECT bands, bits, CAST(count(*) AS BIGINT) AS n_cand
       |  FROM cand GROUP BY 1, 2),
       |hit AS (SELECT c.bands, c.bits, CAST(count(*) AS BIGINT) AS n_hit
       |  FROM cand c JOIN tr ON tr.a = c.a AND tr.b = c.b
       |  GROUP BY 1, 2)
       |SELECT nc.bands, nc.bits, tc.n_true, nc.n_cand,
       |  coalesce(h.n_hit, 0) AS n_hit,
       |  floor(coalesce(h.n_hit, 0) * 10000.0 / nullif(nc.n_cand, 0))
       |    / 10000.0 AS precision,
       |  floor(coalesce(h.n_hit, 0) * 10000.0 / nullif(tc.n_true, 0))
       |    / 10000.0 AS recall
       |FROM nc LEFT JOIN hit h ON h.bands = nc.bands AND h.bits = nc.bits
       |CROSS JOIN tc
       |ORDER BY nc.bands, nc.bits""".stripMargin
  }

  // q237–q239 subword trainer: the hard-EM greedy-match loop replayed
  // CTE by CTE — seed substring counts, longest-match step tables
  // (three LEFT JOINs, maxPieceLen..2, single-char fallback), the
  // 12-round segmentation walk unrolled (q223's iteration-unroll
  // discipline), usage → prune → re-segment. Every state is a string
  // or BIGINT, so both rounds hash-gate.
  private def swStep(name: String, vocab: String): String =
    s"""${name}p AS (SELECT word, len,
       |    CAST(pos AS INT) AS pos FROM
       |  (SELECT word, len, unnest(generate_series(1, len)) AS pos
       |   FROM wd) px),
       |$name AS (SELECT p.word, p.pos,
       |    coalesce(v4.piece, v3.piece, v2x.piece,
       |      substr(p.word, p.pos, 1)) AS piece
       |  FROM ${name}p p
       |  LEFT JOIN $vocab v4 ON v4.piece = substr(p.word, p.pos, 4)
       |  LEFT JOIN $vocab v3 ON v3.piece = substr(p.word, p.pos, 3)
       |  LEFT JOIN $vocab v2x ON v2x.piece = substr(p.word, p.pos, 2))"""
      .stripMargin

  private def swRounds(tag: String, st: String): String = {
    val rounds = (1 to 12).map { r =>
      s"""w$tag$r AS (SELECT w.word, w.wc, w.len,
         |    CASE WHEN w.pos > w.len THEN w.pos
         |         ELSE w.pos + length(s.piece) END AS pos,
         |    CASE WHEN w.pos > w.len THEN w.np ELSE w.np + 1 END AS np,
         |    CASE WHEN w.pos > w.len THEN w.seg
         |         WHEN w.seg = '' THEN s.piece
         |         ELSE w.seg || ' ' || s.piece END AS seg
         |  FROM w$tag${r - 1} w LEFT JOIN $st s
         |    ON s.word = w.word AND s.pos = w.pos)""".stripMargin
    }
    s"""w${tag}0 AS (SELECT word, wc, len, 1 AS pos, 0 AS np, '' AS seg
       |  FROM wd),
       |${rounds.mkString(",\n")}""".stripMargin
  }

  private val swBase =
    s"""${toksCte("")},
       |wd AS (SELECT word, CAST(count(*) AS BIGINT) AS wc,
       |    length(word) AS len
       |  FROM (SELECT unnest(toks) AS word FROM t) wx
       |  WHERE length(word) <= 12 GROUP BY word),
       |sd0 AS (SELECT word, wc, len,
       |    CAST(pos AS INT) AS pos FROM
       |  (SELECT word, wc, len, unnest(generate_series(1, len)) AS pos
       |   FROM wd) sx),
       |sd1 AS (SELECT word, wc, len, pos, CAST(l AS INT) AS l FROM
       |  (SELECT word, wc, len, pos, unnest(generate_series(2, 4)) AS l
       |   FROM sd0) lx),
       |v1 AS (SELECT piece FROM
       |  (SELECT substr(word, pos, l) AS piece,
       |      CAST(sum(wc) AS BIGINT) AS cnt
       |   FROM sd1 WHERE pos + l - 1 <= len
       |   GROUP BY substr(word, pos, l)) sc
       |  WHERE cnt >= 5),
       |${swStep("st1", "v1")},
       |${swRounds("a", "st1")},
       |u1 AS (SELECT piece, CAST(sum(wc) AS BIGINT) AS usage FROM
       |  (SELECT wc, unnest(string_split(seg, ' ')) AS piece
       |   FROM wa12) ux GROUP BY piece),
       |v2 AS (SELECT piece FROM u1
       |  WHERE length(piece) >= 2 AND usage >= 5),
       |${swStep("st2", "v2")},
       |${swRounds("b", "st2")},
       |u2 AS (SELECT piece, CAST(sum(wc) AS BIGINT) AS usage FROM
       |  (SELECT wc, unnest(string_split(seg, ' ')) AS piece
       |   FROM wb12) uy GROUP BY piece)""".stripMargin

  private val q237 =
    s"""WITH $swBase
       |SELECT piece, usage FROM u2 ORDER BY piece""".stripMargin

  private val q238 =
    s"""WITH $swBase
       |SELECT word AS token, CAST(np AS BIGINT) AS n_pieces, seg
       |FROM wb12 ORDER BY token""".stripMargin

  private val q239 =
    s"""WITH $swBase,
       |tw AS (SELECT lang,
       |    unnest(list_filter(string_split(trim(text), ' '),
       |      x -> x <> '')) AS token
       |  FROM documents),
       |tl AS (SELECT lang, token, CAST(count(*) AS BIGINT) AS cnt
       |  FROM tw WHERE length(token) <= 12 GROUP BY 1, 2),
       |f AS (SELECT tl.lang,
       |    CAST(sum(tl.cnt) AS BIGINT) AS n_tokens,
       |    CAST(sum(tl.cnt * w.np) AS BIGINT) AS n_pieces
       |  FROM tl JOIN wb12 w ON w.word = tl.token GROUP BY 1)
       |SELECT lang, n_tokens, n_pieces,
       |  floor(n_pieces * 10000.0 / nullif(n_tokens, 0)) / 10000.0
       |    AS fertility
       |FROM f ORDER BY lang""".stripMargin

  // q240/q241 IVF-ADC: coarse assignment to the 8 pinned centroids,
  // PQ codebooks trained on exact-integer RESIDUALS (q231's CTE shape
  // over the residual frame), probed-list ADC with per-(probe, list)
  // residual LUTs — the whole composed index replayed bit-for-bit.
  // The chain (through the per-(probe, cand) `ad` frame) is shared
  // with q245, which re-ranks the ADC top-R by exact distance.
  private val ivfAdcChain = {
    def round_(i: Int, prev: String) =
      s"""rd$i AS (SELECT rc.vec_id, rc.sub, c.cid,
         |    CAST(sum((rc.ev - c.cv) * (rc.ev - c.cv)) AS BIGINT) AS dist
         |  FROM rc JOIN $prev c ON c.sub = rc.sub AND c.dim = rc.dim
         |  GROUP BY 1, 2, 3),
         |ra$i AS (SELECT vec_id, sub, cid FROM (SELECT vec_id, sub, cid,
         |    row_number() OVER (PARTITION BY vec_id, sub ORDER BY dist, cid)
         |      AS rk FROM rd$i) x WHERE rk = 1),
         |ru$i AS (SELECT a.sub, a.cid, rc.dim,
         |    CAST(floor(sum(rc.ev) * CAST(1 AS DOUBLE) / count(*))
         |      AS BIGINT) AS cv
         |  FROM ra$i a JOIN rc ON rc.vec_id = a.vec_id AND rc.sub = a.sub
         |  GROUP BY 1, 2, 3),
         |rc$i AS (SELECT c.sub, c.cid, c.dim, coalesce(u.cv, c.cv) AS cv
         |  FROM $prev c LEFT JOIN ru$i u
         |    ON u.sub = c.sub AND u.cid = c.cid AND u.dim = c.dim)"""
        .stripMargin
    s"""WITH e0 AS (SELECT vec_id, CAST(i AS BIGINT) AS i,
       |    CAST(floor(CAST(list_extract(embedding, i) AS DOUBLE)
       |      * 1000) AS BIGINT) AS ev
       |  FROM (SELECT vec_id, embedding,
       |      unnest(generate_series(1, 64)) AS i FROM embeddings) u0),
       |cc AS (SELECT CAST(vec_id AS INT) AS ccid, i, ev AS cv
       |  FROM e0 WHERE vec_id < 8),
       |cd AS (SELECT e.vec_id, c.ccid,
       |    CAST(sum((e.ev - c.cv) * (e.ev - c.cv)) AS BIGINT) AS cdist
       |  FROM e0 e JOIN cc c ON c.i = e.i WHERE e.vec_id >= 10
       |  GROUP BY 1, 2),
       |ca AS (SELECT vec_id, ccid FROM (SELECT vec_id, ccid,
       |    row_number() OVER (PARTITION BY vec_id ORDER BY cdist, ccid)
       |      AS rk FROM cd) x WHERE rk = 1),
       |rc AS (SELECT e.vec_id,
       |    CAST(floor((e.i - 1) / CAST(8 AS DOUBLE)) AS BIGINT) AS sub,
       |    CAST((e.i - 1) % 8 + 1 AS BIGINT) AS dim, e.ev - c.cv AS ev
       |  FROM e0 e JOIN ca ON ca.vec_id = e.vec_id
       |  JOIN cc c ON c.ccid = ca.ccid AND c.i = e.i),
       |rsd AS (SELECT vec_id,
       |    CAST(row_number() OVER (ORDER BY vec_id) - 1 AS BIGINT) AS cid
       |  FROM (SELECT DISTINCT vec_id FROM rc ORDER BY vec_id LIMIT 16) z),
       |rc0 AS (SELECT rc.sub, rsd.cid, rc.dim, rc.ev AS cv
       |  FROM rc JOIN rsd ON rsd.vec_id = rc.vec_id),
       |${round_(1, "rc0")},
       |${round_(2, "rc1")},
       |enc AS (SELECT vec_id, sub, cid AS code FROM (SELECT vec_id, sub,
       |    cid, row_number() OVER (PARTITION BY vec_id, sub
       |      ORDER BY dist, cid) AS rk
       |  FROM (SELECT rc.vec_id, rc.sub, c.cid,
       |      CAST(sum((rc.ev - c.cv) * (rc.ev - c.cv)) AS BIGINT) AS dist
       |    FROM rc JOIN rc2 c ON c.sub = rc.sub AND c.dim = rc.dim
       |    GROUP BY 1, 2, 3) dd) x WHERE rk = 1),
       |pcd AS (SELECT e.vec_id AS probe, c.ccid,
       |    CAST(sum((e.ev - c.cv) * (e.ev - c.cv)) AS BIGINT) AS cdist
       |  FROM e0 e JOIN cc c ON c.i = e.i
       |  WHERE e.vec_id BETWEEN 4 AND 9 GROUP BY 1, 2),
       |pp AS (SELECT probe, ccid FROM (SELECT probe, ccid,
       |    row_number() OVER (PARTITION BY probe ORDER BY cdist, ccid)
       |      AS rk FROM pcd) x WHERE rk <= 2),
       |pres AS (SELECT p.probe, p.ccid,
       |    CAST(floor((e.i - 1) / CAST(8 AS DOUBLE)) AS BIGINT) AS sub,
       |    CAST((e.i - 1) % 8 + 1 AS BIGINT) AS dim, e.ev - c.cv AS ev
       |  FROM pp p JOIN e0 e ON e.vec_id = p.probe
       |  JOIN cc c ON c.ccid = p.ccid AND c.i = e.i),
       |pl AS (SELECT pr.probe, pr.ccid, pr.sub, b.cid AS code,
       |    CAST(sum((pr.ev - b.cv) * (pr.ev - b.cv)) AS BIGINT) AS pd
       |  FROM pres pr JOIN rc2 b ON b.sub = pr.sub AND b.dim = pr.dim
       |  GROUP BY 1, 2, 3, 4),
       |ad AS (SELECT pl.probe, enc.vec_id AS cand,
       |    CAST(sum(pl.pd) AS BIGINT) AS adc
       |  FROM enc JOIN ca ON ca.vec_id = enc.vec_id
       |  JOIN pl ON pl.ccid = ca.ccid AND pl.sub = enc.sub
       |    AND pl.code = enc.code
       |  GROUP BY 1, 2)""".stripMargin
  }

  private val q240 =
    s"""$ivfAdcChain
       |SELECT probe, CAST(rk AS BIGINT) AS rk, cand, adc FROM (
       |  SELECT probe, cand, adc,
       |    row_number() OVER (PARTITION BY probe ORDER BY adc, cand) AS rk
       |  FROM ad) x WHERE rk <= 3 ORDER BY probe, rk""".stripMargin

  // q245 IVFADC+R (Jégou 2011 §V): ADC top-R = 10 shortlist per probe,
  // refined by the EXACT quantized full-vector distance over just
  // those candidates — both stages exact BIGINT, both replayed.
  private val q245 =
    s"""$ivfAdcChain,
       |sl AS (SELECT probe, cand FROM (SELECT probe, cand, adc,
       |    row_number() OVER (PARTITION BY probe ORDER BY adc, cand)
       |      AS rk FROM ad) x WHERE rk <= 10),
       |rr AS (SELECT sl.probe, sl.cand,
       |    CAST(sum((p.ev - c.ev) * (p.ev - c.ev)) AS BIGINT) AS dist
       |  FROM sl JOIN e0 p ON p.vec_id = sl.probe
       |  JOIN e0 c ON c.vec_id = sl.cand AND c.i = p.i
       |  GROUP BY 1, 2)
       |SELECT probe, CAST(rk AS BIGINT) AS rk, cand, dist FROM (
       |  SELECT probe, cand, dist,
       |    row_number() OVER (PARTITION BY probe ORDER BY dist, cand) AS rk
       |  FROM rr) x WHERE rk <= 3 ORDER BY probe, rk""".stripMargin

  // q247 IVFADC+R recall-vs-R sweep: q245's shortlist+refine computed
  // ONCE at maxShortlist = 20 with the shortlist rank carried, every
  // R row a filter + re-rank over that one refined frame, graded
  // against the exact quantized full-vector top-3 (q234's truth).
  private val q247 =
    s"""$ivfAdcChain,
       |sl AS (SELECT probe, cand,
       |    row_number() OVER (PARTITION BY probe ORDER BY adc, cand)
       |      AS srk FROM ad),
       |rf AS (SELECT sl.probe, sl.cand, sl.srk,
       |    CAST(sum((p.ev - c.ev) * (p.ev - c.ev)) AS BIGINT) AS dist
       |  FROM sl JOIN e0 p ON p.vec_id = sl.probe
       |  JOIN e0 c ON c.vec_id = sl.cand AND c.i = p.i
       |  WHERE sl.srk <= 20
       |  GROUP BY 1, 2, 3),
       |rv AS (SELECT unnest(list_value(3, 5, 10, 20)) AS r),
       |sw AS (SELECT rv.r, rf.probe, rf.cand, rf.dist
       |  FROM rf JOIN rv ON rf.srk <= rv.r),
       |t3 AS (SELECT r, probe, cand FROM (SELECT r, probe, cand,
       |    row_number() OVER (PARTITION BY r, probe ORDER BY dist, cand)
       |      AS rk FROM sw) x WHERE rk <= 3),
       |ex AS (SELECT probe, cand FROM (SELECT p.vec_id AS probe,
       |    c.vec_id AS cand,
       |    row_number() OVER (PARTITION BY p.vec_id ORDER BY
       |      sum((p.ev - c.ev) * (p.ev - c.ev)), c.vec_id) AS rk
       |  FROM e0 p JOIN e0 c ON c.i = p.i
       |  WHERE p.vec_id BETWEEN 4 AND 9 AND c.vec_id >= 10
       |  GROUP BY p.vec_id, c.vec_id) x WHERE rk <= 3),
       |tc AS (SELECT CAST(count(*) AS BIGINT) AS n_true FROM ex),
       |mass AS (SELECT r, CAST(count(*) AS BIGINT) AS n_refine
       |  FROM sw GROUP BY 1),
       |hits AS (SELECT t.r, CAST(count(*) AS BIGINT) AS n_hit
       |  FROM t3 t JOIN ex ON ex.probe = t.probe AND ex.cand = t.cand
       |  GROUP BY 1)
       |SELECT CAST(m.r AS BIGINT) AS r, m.n_refine,
       |  coalesce(h.n_hit, 0) AS n_hit,
       |  floor(coalesce(h.n_hit, 0) * 10000.0 / nullif(tc.n_true, 0))
       |    / 10000.0 AS recall
       |FROM mass m LEFT JOIN hits h ON h.r = m.r
       |CROSS JOIN tc ORDER BY r""".stripMargin

  // q242 IVF-ADC recall/nprobe sweep: q240's residual chain with the
  // coarse quantizer TRAINED (q224's k-means CTE shape, K = 8, over
  // the indexed corpus' full vectors), probe assignment RANKED to
  // lrk ≤ 8, and the sweep read off one (probe, cand, adc, lrk) frame
  // by nprobe filter — recall graded against the exact quantized
  // full-vector top-3 (q234's truth).
  private val q242 = {
    def kround(i: Int, prev: String) =
      s"""kd$i AS (SELECT e.vec_id, c.ccid,
         |    CAST(sum((e.ev - c.cv) * (e.ev - c.cv)) AS BIGINT) AS dist
         |  FROM ecf e JOIN $prev c ON c.i = e.i GROUP BY 1, 2),
         |ka$i AS (SELECT vec_id, ccid FROM (SELECT vec_id, ccid,
         |    row_number() OVER (PARTITION BY vec_id ORDER BY dist, ccid)
         |      AS rk FROM kd$i) x WHERE rk = 1),
         |ku$i AS (SELECT a.ccid, e.i,
         |    CAST(floor(sum(e.ev) * CAST(1 AS DOUBLE) / count(*))
         |      AS BIGINT) AS cv
         |  FROM ka$i a JOIN ecf e ON e.vec_id = a.vec_id GROUP BY 1, 2),
         |kc$i AS (SELECT c.ccid, c.i, coalesce(u.cv, c.cv) AS cv
         |  FROM $prev c LEFT JOIN ku$i u
         |    ON u.ccid = c.ccid AND u.i = c.i)""".stripMargin
    def rround(i: Int, prev: String) =
      s"""rd$i AS (SELECT rc.vec_id, rc.sub, c.cid,
         |    CAST(sum((rc.ev - c.cv) * (rc.ev - c.cv)) AS BIGINT) AS dist
         |  FROM rc JOIN $prev c ON c.sub = rc.sub AND c.dim = rc.dim
         |  GROUP BY 1, 2, 3),
         |ra$i AS (SELECT vec_id, sub, cid FROM (SELECT vec_id, sub, cid,
         |    row_number() OVER (PARTITION BY vec_id, sub ORDER BY dist, cid)
         |      AS rk FROM rd$i) x WHERE rk = 1),
         |ru$i AS (SELECT a.sub, a.cid, rc.dim,
         |    CAST(floor(sum(rc.ev) * CAST(1 AS DOUBLE) / count(*))
         |      AS BIGINT) AS cv
         |  FROM ra$i a JOIN rc ON rc.vec_id = a.vec_id AND rc.sub = a.sub
         |  GROUP BY 1, 2, 3),
         |rc$i AS (SELECT c.sub, c.cid, c.dim, coalesce(u.cv, c.cv) AS cv
         |  FROM $prev c LEFT JOIN ru$i u
         |    ON u.sub = c.sub AND u.cid = c.cid AND u.dim = c.dim)"""
        .stripMargin
    s"""WITH e0 AS (SELECT vec_id, CAST(i AS BIGINT) AS i,
       |    CAST(floor(CAST(list_extract(embedding, i) AS DOUBLE)
       |      * 1000) AS BIGINT) AS ev
       |  FROM (SELECT vec_id, embedding,
       |      unnest(generate_series(1, 64)) AS i FROM embeddings) u0),
       |ecf AS (SELECT * FROM e0 WHERE vec_id >= 10),
       |ksd AS (SELECT vec_id,
       |    CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS ccid
       |  FROM (SELECT DISTINCT vec_id FROM ecf ORDER BY vec_id LIMIT 8) z),
       |kc0 AS (SELECT ksd.ccid, e.i, e.ev AS cv
       |  FROM ecf e JOIN ksd ON ksd.vec_id = e.vec_id),
       |${kround(1, "kc0")},
       |${kround(2, "kc1")},
       |cc AS (SELECT ccid, i, cv FROM kc2),
       |cd AS (SELECT e.vec_id, c.ccid,
       |    CAST(sum((e.ev - c.cv) * (e.ev - c.cv)) AS BIGINT) AS cdist
       |  FROM ecf e JOIN cc c ON c.i = e.i GROUP BY 1, 2),
       |ca AS (SELECT vec_id, ccid FROM (SELECT vec_id, ccid,
       |    row_number() OVER (PARTITION BY vec_id ORDER BY cdist, ccid)
       |      AS rk FROM cd) x WHERE rk = 1),
       |rc AS (SELECT e.vec_id,
       |    CAST(floor((e.i - 1) / CAST(8 AS DOUBLE)) AS BIGINT) AS sub,
       |    CAST((e.i - 1) % 8 + 1 AS BIGINT) AS dim, e.ev - c.cv AS ev
       |  FROM ecf e JOIN ca ON ca.vec_id = e.vec_id
       |  JOIN cc c ON c.ccid = ca.ccid AND c.i = e.i),
       |rsd AS (SELECT vec_id,
       |    CAST(row_number() OVER (ORDER BY vec_id) - 1 AS BIGINT) AS cid
       |  FROM (SELECT DISTINCT vec_id FROM rc ORDER BY vec_id LIMIT 16) z),
       |rc0 AS (SELECT rc.sub, rsd.cid, rc.dim, rc.ev AS cv
       |  FROM rc JOIN rsd ON rsd.vec_id = rc.vec_id),
       |${rround(1, "rc0")},
       |${rround(2, "rc1")},
       |enc AS (SELECT vec_id, sub, cid AS code FROM (SELECT vec_id, sub,
       |    cid, row_number() OVER (PARTITION BY vec_id, sub
       |      ORDER BY dist, cid) AS rk
       |  FROM (SELECT rc.vec_id, rc.sub, c.cid,
       |      CAST(sum((rc.ev - c.cv) * (rc.ev - c.cv)) AS BIGINT) AS dist
       |    FROM rc JOIN rc2 c ON c.sub = rc.sub AND c.dim = rc.dim
       |    GROUP BY 1, 2, 3) dd) x WHERE rk = 1),
       |pcd AS (SELECT e.vec_id AS probe, c.ccid,
       |    CAST(sum((e.ev - c.cv) * (e.ev - c.cv)) AS BIGINT) AS cdist
       |  FROM e0 e JOIN cc c ON c.i = e.i
       |  WHERE e.vec_id BETWEEN 4 AND 9 GROUP BY 1, 2),
       |pp AS (SELECT probe, ccid, CAST(rk AS INT) AS lrk
       |  FROM (SELECT probe, ccid,
       |    row_number() OVER (PARTITION BY probe ORDER BY cdist, ccid)
       |      AS rk FROM pcd) x WHERE rk <= 8),
       |pres AS (SELECT p.probe, p.ccid, p.lrk,
       |    CAST(floor((e.i - 1) / CAST(8 AS DOUBLE)) AS BIGINT) AS sub,
       |    CAST((e.i - 1) % 8 + 1 AS BIGINT) AS dim, e.ev - c.cv AS ev
       |  FROM pp p JOIN e0 e ON e.vec_id = p.probe
       |  JOIN cc c ON c.ccid = p.ccid AND c.i = e.i),
       |pl AS (SELECT pr.probe, pr.ccid, pr.lrk, pr.sub, b.cid AS code,
       |    CAST(sum((pr.ev - b.cv) * (pr.ev - b.cv)) AS BIGINT) AS pd
       |  FROM pres pr JOIN rc2 b ON b.sub = pr.sub AND b.dim = pr.dim
       |  GROUP BY 1, 2, 3, 4, 5),
       |ad AS (SELECT pl.probe, enc.vec_id AS cand,
       |    CAST(sum(pl.pd) AS BIGINT) AS adc, min(pl.lrk) AS lrk
       |  FROM enc JOIN ca ON ca.vec_id = enc.vec_id
       |  JOIN pl ON pl.ccid = ca.ccid AND pl.sub = enc.sub
       |    AND pl.code = enc.code
       |  GROUP BY 1, 2),
       |np AS (SELECT unnest(list_value(1, 2, 4, 8)) AS nprobe),
       |sw AS (SELECT np.nprobe, ad.probe, ad.cand, ad.adc
       |  FROM ad JOIN np ON ad.lrk <= np.nprobe),
       |t3 AS (SELECT nprobe, probe, cand FROM (SELECT nprobe, probe,
       |    cand, row_number() OVER (PARTITION BY nprobe, probe
       |      ORDER BY adc, cand) AS rk FROM sw) x WHERE rk <= 3),
       |ex AS (SELECT probe, cand FROM (SELECT p.vec_id AS probe,
       |    c.vec_id AS cand,
       |    row_number() OVER (PARTITION BY p.vec_id ORDER BY
       |      sum((p.ev - c.ev) * (p.ev - c.ev)), c.vec_id) AS rk
       |  FROM e0 p JOIN e0 c ON c.i = p.i
       |  WHERE p.vec_id BETWEEN 4 AND 9 AND c.vec_id >= 10
       |  GROUP BY p.vec_id, c.vec_id) x WHERE rk <= 3),
       |tc AS (SELECT CAST(count(*) AS BIGINT) AS n_true FROM ex),
       |mass AS (SELECT nprobe, CAST(count(*) AS BIGINT) AS n_cand
       |  FROM sw GROUP BY 1),
       |hits AS (SELECT t.nprobe, CAST(count(*) AS BIGINT) AS n_hit
       |  FROM t3 t JOIN ex ON ex.probe = t.probe AND ex.cand = t.cand
       |  GROUP BY 1)
       |SELECT CAST(m.nprobe AS BIGINT) AS nprobe, m.n_cand,
       |  coalesce(h.n_hit, 0) AS n_hit,
       |  floor(coalesce(h.n_hit, 0) * 10000.0 / nullif(tc.n_true, 0))
       |    / 10000.0 AS recall
       |FROM mass m LEFT JOIN hits h ON h.nprobe = m.nprobe
       |CROSS JOIN tc ORDER BY nprobe""".stripMargin
  }

  val sql: Map[String, String] = Map(
    "q230_substr_removal" -> q230,
    // q244 shares q230's oracle VERBATIM (q198's rule): serving the
    // corpus against its own COMMITTED keeper gate must replay the
    // inline removal bit-for-bit
    "q244_substr_store"   -> q230,
    "q236_signlsh_audit"  -> q236,
    "q240_ivfadc"         -> q240,
    // q241 shares q240's oracle VERBATIM (q198's rule): partition-
    // pruned store-served IVF-ADC ≡ inline bit-for-bit
    "q241_ivfadc_store"   -> q240,
    "q242_ivfadc_sweep"   -> q242,
    "q245_ivfadc_rerank"  -> q245,
    // q246 shares q245's oracle VERBATIM (q198's rule): shortlist +
    // refine served entirely from the committed store (codes AND
    // vectors) must replay the inline rerank bit-for-bit
    "q246_ivfadcr_store"  -> q245,
    "q247_rerank_sweep"   -> q247,
    // q248 shares q230's oracle VERBATIM (q106's hash-gate stance):
    // the gram-bucketed gate layout must be invisible to semantics
    "q248_substr_bucketed" -> q230,
    "q237_subword_train"  -> q237,
    "q238_subword_encode" -> q238,
    // q243 shares q238's oracle VERBATIM (q198's rule): segmentation
    // served from the committed vocabulary+geometry must equal the
    // inline train→encode bit-for-bit
    "q243_subword_store"  -> q238,
    "q239_subword_fert"   -> q239,
    "q231_pq_train"       -> q231,
    "q232_pq_encode"      -> q232,
    "q233_pq_search"      -> q233,
    "q234_pq_recall"      -> q234,
    // q235 shares q233's oracle VERBATIM (q198's rule): ADC served from
    // the committed codebooks+codes must equal the inline
    // train-encode-search bit-for-bit
    "q235_pq_store"       -> q233,
    "q219_hll_audit"      -> q219,
    "q220_funnel"         -> q220,
    "q223_pca_power"      -> q223,
    "q224_kmeans"         -> q224,
    "q225_gopher_rules"   -> q225,
    "q226_lm_backoff"     -> q226,
    // q228 shares q226's oracle VERBATIM (q198's rule): scoring served
    // from the committed count tables must equal the inline
    // train-and-score bit-for-bit
    "q228_lm_store"       -> q226,
    // q229 embedding outlier census: nearest-of-8-seeds assignment
    // (row_number ≡ the face's min-struct), distances scaled by an
    // exact floor, the 3σ rule as the n²-scaled integer
    // cross-multiply — no float enters the predicate
    "q229_embed_outliers" ->
      s"""WITH e AS (SELECT vec_id, CAST(i AS BIGINT) AS dim,
         |    CAST(floor(CAST(list_extract(embedding, i) AS DOUBLE)
         |      * 1000) AS BIGINT) AS ev
         |  FROM (SELECT vec_id, embedding,
         |      unnest(generate_series(1, 64)) AS i FROM embeddings) u),
         |c0 AS (SELECT CAST(vec_id AS INT) AS cid, dim, ev AS cv
         |  FROM e WHERE vec_id < 8),
         |dd AS (SELECT e.vec_id, c.cid,
         |    CAST(sum((e.ev - c.cv) * (e.ev - c.cv)) AS BIGINT) AS dist
         |  FROM e JOIN c0 c ON c.dim = e.dim GROUP BY 1, 2),
         |aa AS (SELECT vec_id, cid,
         |    CAST(floor(dist / 1000.0) AS BIGINT) AS dp
         |  FROM (SELECT vec_id, cid, dist, row_number() OVER
         |      (PARTITION BY vec_id ORDER BY dist, cid) AS rk
         |    FROM dd) x WHERE rk = 1),
         |st AS (SELECT cid, CAST(count(*) AS BIGINT) AS n,
         |    CAST(sum(dp) AS BIGINT) AS sd,
         |    CAST(sum(dp * dp) AS BIGINT) AS sdd
         |  FROM aa GROUP BY 1)
         |SELECT aa.cid, st.n,
         |  floor(sum(aa.dp) * 10000.0 / count(*)) / 10000.0 AS mean_d,
         |  CAST(sum(CASE WHEN st.n * aa.dp - st.sd > 0
         |      AND (st.n * aa.dp - st.sd) * (st.n * aa.dp - st.sd)
         |      > 9 * (st.n * st.sdd - st.sd * st.sd)
         |    THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
         |FROM aa JOIN st ON st.cid = aa.cid
         |GROUP BY aa.cid, st.n ORDER BY aa.cid""".stripMargin,
    // q227 dedup threshold curve: q47's inverted-index pair machinery
    // swept over 5 thresholds with exact cross-multiply predicates —
    // no float enters a comparison
    "q227_dedup_curve"    ->
      s"""WITH ${toksCte("WHERE doc_id < 100")},
         |$shCte,
         |cnt AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n
         |  FROM sh GROUP BY doc_id),
         |p AS (SELECT x.doc_id AS a, y.doc_id AS b,
         |    CAST(count(*) AS BIGINT) AS inter
         |  FROM sh x JOIN sh y ON x.s = y.s AND x.doc_id < y.doc_id
         |  GROUP BY 1, 2),
         |pu AS (SELECT p.a, p.b, p.inter,
         |    ca.n + cb.n - p.inter AS uni
         |  FROM p JOIN cnt ca ON ca.doc_id = p.a
         |    JOIN cnt cb ON cb.doc_id = p.b),
         |th AS (SELECT unnest(list_value(1, 2, 3, 5, 10, 50, 80))
         |  AS t100),
         |kp AS (SELECT th.t100, pu.a, pu.b FROM pu CROSS JOIN th
         |  WHERE pu.inter * 100 >= th.t100 * pu.uni),
         |np AS (SELECT t100, CAST(count(*) AS BIGINT) AS n_pairs
         |  FROM kp GROUP BY 1),
         |nd AS (SELECT t100, CAST(count(*) AS BIGINT) AS n_docs FROM
         |  (SELECT DISTINCT t100, d FROM
         |    (SELECT t100, a AS d FROM kp
         |     UNION ALL SELECT t100, b FROM kp) dx) dd GROUP BY 1)
         |SELECT CAST(th.t100 AS DOUBLE) / 100 AS threshold,
         |  coalesce(np.n_pairs, 0) AS n_pairs,
         |  coalesce(nd.n_docs, 0) AS n_docs
         |FROM th LEFT JOIN np ON np.t100 = th.t100
         |  LEFT JOIN nd ON nd.t100 = th.t100
         |ORDER BY threshold""".stripMargin,
    // q221 shares q214's oracle VERBATIM (q198's rule): heavy hitters
    // served from the committed counter matrix must equal the inline
    // count bit-for-bit
    "q221_cms_store"      -> q214,
    // q222 shares q219's oracle VERBATIM: merge-on-read over committed
    // per-slice registers must equal the single-pass sketch (the
    // cell-wise-max merge property, spec'd)
    "q222_hll_store"      -> q219,
    "q214_cms_heavy"      -> q214,
    "q215_bloom_screen"   -> q215,
    "q216_textrank"       -> q216,
    "q217_rrf_fusion"     -> q217,
    // q218 shares q215's oracle VERBATIM (q198's rule): screening
    // served from the committed packed filter must equal the inline
    // build bit-for-bit
    "q218_bloom_store"    -> q215,
    "q167_js_divergence" -> q167,
    "q178_coverage_curve" -> q178,
    "q168_good_turing"   -> q168,
    "q171_burstiness"    -> q171,
    "q172_hapax_ratio"   -> q172,
    "q173_mattr"         -> q173,
    "q165_heaps_fit"     -> q165,
    "q162_bbit_minhash"  -> q162,
    "q159_lsh_audit"     -> q159,
    "q160_dataset_card"  -> q160,
    "q161_oov_rate"      -> q161,
    "q153_bm25"          -> q153,
    "q145_zipf_fit"      -> q145,
    "q146_split_shift"   -> q146,
    "q58_dedup_corpus"   -> q58,
    "q59_simhash_near"   -> q59,
    "q60_embed_dedup"    -> q60,
    "q183_semantic_dedup" -> q183,
    "q184_span_scrub"     -> q184,
    "q185_bpe_train"      -> q185,
    "q186_bpe_encode"     -> q186,
    "q187_dsir_weights"   -> q187,
    "q190_vocab_overlap"  -> q190,
    "q193_bpe_fertility"  -> q193,
    // q198 shares q186's oracle VERBATIM (q97's shared-oracle rule):
    // the Spark face reads the persisted store, the oracle retrains —
    // the hash gate proves the round-tripped artifact is bit-identical
    "q198_bpe_store"      -> q186,
    "q199_bpe_ids"        -> q199,
    "q200_dsir_select"    -> q200,
    "q201_dedup_agreement" -> q201,
    "q202_boilerplate"    -> q202,
    "q203_winnowing"      -> q203,
    "q204_hard_negatives" -> q204,
    "q207_charclass"      -> q207,
    // q208 shares q199's oracle VERBATIM (q198's rule): the Spark face
    // serves ids from the persisted (merges + vocab) store, the oracle
    // retrains inline — the hash gate proves store ≡ inline
    "q208_bpe_ids_store"  -> q199,
    "q209_winnow_pairs"   -> q209,
    "q210_dsir_audit"     -> q210,
    // q211 shares q202's oracle VERBATIM: cleaning served from the
    // committed span gate must equal the inline aggregate bit-for-bit
    "q211_boilerplate_store" -> q202,
    // q212 shares q209's oracle VERBATIM: matching served from the
    // committed fingerprint index must equal the inline self-join
    "q212_winnow_store"   -> q209,
    // q213 shares q187's oracle VERBATIM: scoring served from the
    // committed 256-row log-ratio table must equal the inline
    // estimate-and-score (round-4 on the cancellable ln sum)
    "q213_dsir_store"     -> q187,
    "q76_tfidf" ->
      s"""WITH ${toksCte("WHERE doc_id < 100")},
         |occ AS (SELECT doc_id, unnest(toks) AS token FROM t),
         |tf AS (SELECT doc_id, token, CAST(count(*) AS BIGINT) AS tf
         |  FROM occ GROUP BY 1, 2),
         |df AS (SELECT token, CAST(count(*) AS BIGINT) AS df
         |  FROM (SELECT DISTINCT doc_id, token FROM occ) GROUP BY token),
         |nd AS (SELECT count(DISTINCT doc_id) AS n_docs FROM occ)
         |SELECT doc_id, tf.token AS token, tf, df,
         |  round(tf * ln(n_docs / df), 6) AS tfidf
         |FROM tf JOIN df ON tf.token = df.token CROSS JOIN nd
         |ORDER BY tfidf DESC, doc_id, token LIMIT 50""".stripMargin,

    "q71_chunking"       -> q71,
    "q72_normalize"      -> q72,
    "q73_stopwords"      -> q73,
    "q74_vocab_df"       -> q74,
    "q75_split"          -> q75,
    "q46_minhash_lsh"    -> q46,
    "q47_jaccard_pairs"  -> q47,
    "q48_simhash"        -> q48,
    "q49_embed_neardup"  -> q49,
    "q50_lang_id"        -> q50,
    "q51_text_quality"   -> q51,
    "q52_token_count"    -> q52,
    "q53_fingerprint"    -> q53,
    "q54_ann_lsh"        -> q54,
    "q55_json_map"       ->
      """SELECT event_id,
        |  array_to_string(json_keys(props), ',') AS keys,
        |  CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val
        |FROM events ORDER BY event_id LIMIT 200""".stripMargin,
    "q125_entropy"       ->
      """WITH t AS (SELECT lang,
        |    unnest(list_filter(string_split(trim(text), ' '),
        |      x -> x <> '')) AS tok
        |  FROM documents),
        |c AS (SELECT lang, tok, count(*) AS n FROM t GROUP BY lang, tok),
        |g AS (SELECT lang, CAST(sum(n) AS BIGINT) AS n_tokens,
        |    CAST(count(*) AS BIGINT) AS n_types,
        |    sum(n * ln(n)) AS nlogn
        |  FROM c GROUP BY lang)
        |SELECT lang, n_tokens, n_types,
        |  round(ln(n_tokens) - nlogn / n_tokens, 4) AS entropy
        |FROM g ORDER BY lang""".stripMargin
  )
}
