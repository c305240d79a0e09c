package graft.queries

/** DuckDB oracle SQL for the round-5 curation queries q106–q112. Mirrors
  * [[CurationQueries]] exactly: identical tokenization/shingling
  * (`string_split` + filter, word 3-grams), identical double math
  * (list_dot_product, floor(x+0.5) quantization), rounded ordering keys
  * where the contract ranks rounded values (q110).
  *
  * q106's oracle is the PLAIN parquet join — the bucketed-layout rewrite
  * must be hash-indistinguishable from it (q89's discipline). q112's is
  * `quantile_cont`, pinning the scan-selection operator's interpolation
  * on a derived column.
  */
object CurationOracles {

  /** Shared CTE: non-empty whitespace tokens. */
  private def toksCte(pred: String) =
    s"""t AS (SELECT doc_id, list_filter(string_split(trim(text), ' '), x -> x <> '') AS toks
       |  FROM documents $pred)""".stripMargin

  /** Shared CTE: distinct word 3-gram shingles (requires t). Two-step
    * (unnest-in-SELECT positions + 1-based list_extract) so the text
    * parses on both engines — Spark has no lateral `unnest(...) AS u(i)`. */
  private val shCte =
    """shix AS (SELECT doc_id, toks, unnest(generate_series(1, len(toks) - 2)) AS i
      |  FROM t WHERE len(toks) >= 3),
      |sh AS (SELECT DISTINCT doc_id,
      |    list_extract(toks, i) || ' ' || list_extract(toks, i + 1) || ' ' || list_extract(toks, i + 2) AS s
      |  FROM shix)""".stripMargin

  /** Shared CTE fragment: per-doc token positions (requires t). */
  private val posCte =
    """pix AS (SELECT doc_id, toks, unnest(generate_series(1, len(toks))) AS i
      |  FROM t WHERE len(toks) >= 2),
      |p AS (SELECT doc_id, i AS pos, list_extract(toks, i) AS tok FROM pix)""".stripMargin

  private val q106 =
    """SELECT CAST(c_nationkey AS BIGINT) AS c_nationkey,
      |  CAST(count(*) AS BIGINT) AS n,
      |  round(sum(o_totalprice), 2) AS revenue
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |GROUP BY 1 ORDER BY c_nationkey""".stripMargin

  private val q107 =
    s"""WITH ${toksCte("")},
       |$posCte,
       |bg AS (SELECT a.tok || ' ' || b.tok AS bigram
       |  FROM p a JOIN p b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1)
       |SELECT bigram, CAST(count(*) AS BIGINT) AS n
       |FROM bg GROUP BY bigram
       |ORDER BY n DESC, bigram LIMIT 30""".stripMargin

  private val q108 =
    s"""WITH ${toksCte("")},
       |$shCte,
       |train AS (SELECT DISTINCT s FROM sh WHERE doc_id < 200),
       |ev AS (SELECT doc_id, s FROM sh WHERE doc_id BETWEEN 300 AND 349),
       |nsh AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_shingles
       |  FROM ev GROUP BY doc_id),
       |hits AS (SELECT ev.doc_id, CAST(count(*) AS BIGINT) AS n_hit
       |  FROM ev JOIN train ON ev.s = train.s GROUP BY ev.doc_id)
       |SELECT nsh.doc_id, nsh.n_shingles,
       |  CAST(coalesce(hits.n_hit, 0) AS BIGINT) AS n_overlap,
       |  round(coalesce(hits.n_hit, 0) / nsh.n_shingles, 4) AS contamination
       |FROM nsh LEFT JOIN hits ON nsh.doc_id = hits.doc_id
       |ORDER BY nsh.doc_id""".stripMargin

  private val q109 =
    s"""WITH ${toksCte("WHERE doc_id < 200")},
       |$posCte,
       |base AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tok,
       |    CAST(len(list_distinct(toks)) AS BIGINT) AS n_distinct
       |  FROM t WHERE len(toks) >= 2),
       |bgc AS (SELECT a.doc_id, a.tok || ' ' || b.tok AS bg, count(*) AS n
       |  FROM p a JOIN p b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
       |  GROUP BY 1, 2),
       |top AS (SELECT doc_id, max(n) AS top_bg, sum(n) AS n_bg
       |  FROM bgc GROUP BY doc_id)
       |SELECT base.doc_id, base.n_tok,
       |  round(base.n_distinct / base.n_tok, 4) AS ttr,
       |  round(top.top_bg / top.n_bg, 4) AS top_bg_frac
       |FROM base JOIN top ON base.doc_id = top.doc_id
       |ORDER BY base.doc_id""".stripMargin

  private val q110 =
    s"""WITH ${toksCte("WHERE doc_id < 100")},
       |$shCte,
       |keep AS (SELECT s FROM sh GROUP BY s HAVING count(*) <= 20),
       |shf AS (SELECT sh.doc_id, sh.s FROM sh JOIN keep USING (s)),
       |cnt AS (SELECT doc_id, count(*) AS n FROM shf GROUP BY doc_id),
       |inter AS (SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS inter
       |  FROM shf x JOIN shf y ON x.s = y.s AND x.doc_id < y.doc_id
       |  GROUP BY 1, 2)
       |SELECT a, b,
       |  round(inter / ca.n, 4) AS cont_a,
       |  round(inter / cb.n, 4) AS cont_b,
       |  greatest(round(inter / ca.n, 4), round(inter / cb.n, 4)) AS cont_max
       |FROM inter JOIN cnt ca ON ca.doc_id = a JOIN cnt cb ON cb.doc_id = b
       |ORDER BY cont_max DESC, a, b LIMIT 20""".stripMargin

  private val q111 =
    """WITH e AS (SELECT vec_id,
      |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      |  FROM embeddings WHERE vec_id < 100),
      |m AS (SELECT vec_id, v,
      |    list_max(list_transform(v, x -> abs(x))) AS amax FROM e),
      |q AS (SELECT vec_id, v,
      |    list_transform(v,
      |      x -> CAST(floor(x * 127.0 / nullif(amax, 0.0) + 0.5) AS DOUBLE)) AS qv
      |  FROM m),
      |j AS (SELECT a.vec_id, a.v AS va, b.v AS vb, a.qv AS qa, b.qv AS qb
      |  FROM q a JOIN q b ON b.vec_id = a.vec_id + 1),
      |c AS (SELECT vec_id,
      |    round(list_dot_product(va, vb) /
      |      (sqrt(list_dot_product(va, va)) * sqrt(list_dot_product(vb, vb))), 4) AS exact_cos,
      |    round(list_dot_product(qa, qb) /
      |      (sqrt(list_dot_product(qa, qa)) * sqrt(list_dot_product(qb, qb))), 4) AS quant_cos
      |  FROM j)
      |SELECT vec_id, exact_cos, quant_cos,
      |  round(abs(exact_cos - quant_cos), 4) AS cos_err
      |FROM c ORDER BY vec_id""".stripMargin

  private val q112 =
    """WITH t AS (SELECT lang,
      |    CAST(len(list_filter(string_split(trim(text), ' '), x -> x <> '')) AS DOUBLE) AS n_tok
      |  FROM documents)
      |SELECT lang,
      |  round(quantile_cont(n_tok, 0.25), 4) AS p25_tok,
      |  round(quantile_cont(n_tok, 0.5), 4) AS p50_tok,
      |  round(quantile_cont(n_tok, 0.75), 4) AS p75_tok
      |FROM t GROUP BY lang ORDER BY lang""".stripMargin

  // The shared near-dup cluster-label CTE chain (doc_id < 100 corpus:
  // minhash band candidates, exact Jaccard verify at 0.8, recursive
  // reachability, min-member labels) — q113 reads the labels, q189 adds
  // the two-phase quality argmax on top.
  private val ccCtes = {
    val mins = (0 until 8).map(j => s"min(md5('$j:' || s)) AS m$j").mkString(", ")
    val bandSelects = (0 until 4).map(b =>
      s"SELECT doc_id, $b AS band, m${2 * b} || m${2 * b + 1} AS key FROM m")
      .mkString("\n  UNION ALL ")
    s"""${toksCte("WHERE doc_id < 100")},
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
       |e AS (
       |  SELECT a, b FROM shared
       |  JOIN cnt ca ON ca.doc_id = a
       |  JOIN cnt cb ON cb.doc_id = b
       |  WHERE inter / (ca.n + cb.n - inter) >= 0.8),
       |sym AS (SELECT a AS u, b AS v FROM e UNION ALL SELECT b, a FROM e),
       |reach(u, v) AS (
       |  SELECT u, v FROM sym
       |  UNION
       |  SELECT r.u, s.v FROM reach r JOIN sym s ON r.v = s.u),
       |lbl AS (SELECT u, least(u, min(v)) AS cluster FROM reach GROUP BY u),
       |labeled AS (
       |  SELECT d.doc_id, d.n_chars,
       |    CAST(coalesce(l.cluster, d.doc_id) AS BIGINT) AS cluster
       |  FROM (SELECT doc_id, n_chars FROM documents WHERE doc_id < 100) d
       |  LEFT JOIN lbl l ON l.u = d.doc_id)""".stripMargin
  }

  private val q113 =
    s"""WITH RECURSIVE $ccCtes
       |SELECT doc_id, cluster FROM labeled
       |ORDER BY doc_id""".stripMargin

  // q189 = the cluster labels + the two-phase quality argmax (max
  // n_chars per cluster, then min doc_id among the maxima) — the same
  // two hash-aggregate passes the Spark face runs.
  private val q189 =
    s"""WITH RECURSIVE $ccCtes,
       |best AS (SELECT cluster, max(n_chars) AS best_chars
       |  FROM labeled GROUP BY cluster),
       |rep AS (SELECT labeled.cluster, min(doc_id) AS rep_id
       |  FROM labeled JOIN best ON labeled.cluster = best.cluster
       |    AND labeled.n_chars = best.best_chars
       |  GROUP BY labeled.cluster)
       |SELECT doc_id, labeled.cluster, rep_id, doc_id = rep_id AS keep
       |FROM labeled JOIN rep ON labeled.cluster = rep.cluster
       |ORDER BY doc_id""".stripMargin

  // q197 = the cluster labels + one family-size count; 1/m weight via
  // the floor idiom on the exact-integer ratio.
  private val q197 =
    s"""WITH RECURSIVE $ccCtes,
       |fam AS (SELECT cluster, CAST(count(*) AS BIGINT) AS fam_size
       |  FROM labeled GROUP BY cluster)
       |SELECT doc_id, labeled.cluster, fam_size,
       |  floor(10000.0 / fam_size) / 10000.0 AS weight
       |FROM labeled JOIN fam ON labeled.cluster = fam.cluster
       |ORDER BY doc_id""".stripMargin

  private val q114 =
    s"""WITH ${toksCte("")},
       |t2 AS (SELECT doc_id, toks FROM t WHERE len(toks) >= 2),
       |pix AS (SELECT doc_id, toks, unnest(generate_series(1, len(toks))) AS i
       |  FROM t2),
       |p AS (SELECT doc_id, i AS pos, list_extract(toks, i) AS tok FROM pix),
       |uni AS (SELECT tok, count(*) AS c1 FROM p GROUP BY tok),
       |bg AS (SELECT a.tok || ' ' || b.tok AS bigram, count(*) AS c2
       |  FROM p a JOIN p b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
       |  GROUP BY 1 HAVING count(*) >= 5),
       |tot AS (SELECT CAST(sum(c1) AS DOUBLE) AS n_tok FROM uni),
       |totb AS (SELECT CAST(sum(len(toks) - 1) AS DOUBLE) AS n_bg FROM t2)
       |SELECT bigram, CAST(c2 AS BIGINT) AS n,
       |  round(ln((CAST(c2 AS DOUBLE) / n_bg) /
       |    ((CAST(cx.c1 AS DOUBLE) / n_tok) * (CAST(cy.c1 AS DOUBLE) / n_tok))), 4) AS pmi
       |FROM bg
       |CROSS JOIN tot CROSS JOIN totb
       |JOIN uni cx ON cx.tok = split_part(bigram, ' ', 1)
       |JOIN uni cy ON cy.tok = split_part(bigram, ' ', 2)
       |ORDER BY pmi DESC, bigram LIMIT 30""".stripMargin

  private val cosSql =
    "list_dot_product(%A, %B) / (sqrt(list_dot_product(%A, %A)) * sqrt(list_dot_product(%B, %B)))"
  private def cos(a: String, b: String) =
    cosSql.replace("%A", a).replace("%B", b)

  private val q115 =
    s"""WITH c AS (SELECT vec_id AS cid, embedding AS vc FROM embeddings WHERE vec_id < 4),
       |cand AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id >= 10),
       |probe AS (SELECT vec_id AS pid, embedding AS vp FROM embeddings WHERE vec_id BETWEEN 4 AND 9),
       |assign AS (
       |  SELECT vec_id, embedding, cid,
       |    row_number() OVER (PARTITION BY vec_id
       |      ORDER BY ${cos("embedding", "vc")} DESC, cid) AS rn
       |  FROM cand CROSS JOIN c),
       |lists AS (SELECT vec_id, embedding, cid FROM assign WHERE rn = 1),
       |passign AS (
       |  SELECT pid, vp, cid,
       |    row_number() OVER (PARTITION BY pid
       |      ORDER BY ${cos("vp", "vc")} DESC, cid) AS rn
       |  FROM probe CROSS JOIN c),
       |plists AS (SELECT pid, vp, cid FROM passign WHERE rn <= 2),
       |scored AS (
       |  SELECT p.pid, l.vec_id AS cand,
       |    round(${cos("p.vp", "l.embedding")}, 4) AS sim
       |  FROM plists p JOIN lists l ON p.cid = l.cid),
       |top AS (SELECT pid, cand FROM (
       |    SELECT pid, cand,
       |      row_number() OVER (PARTITION BY pid ORDER BY sim DESC, cand) AS rank
       |    FROM scored) WHERE rank <= 3),
       |bscored AS (
       |  SELECT p.pid, c2.vec_id AS cand,
       |    round(${cos("p.vp", "c2.embedding")}, 4) AS sim
       |  FROM probe p CROSS JOIN cand c2),
       |btop AS (SELECT pid, cand FROM (
       |    SELECT pid, cand,
       |      row_number() OVER (PARTITION BY pid ORDER BY sim DESC, cand) AS rk
       |    FROM bscored) WHERE rk <= 3),
       |hits AS (SELECT t.pid, count(*) AS n
       |  FROM top t JOIN btop b ON t.pid = b.pid AND t.cand = b.cand
       |  GROUP BY t.pid)
       |SELECT p.pid AS probe, CAST(coalesce(h.n, 0) AS BIGINT) AS n_hit,
       |  round(CAST(coalesce(h.n, 0) AS DOUBLE) / 3.0, 4) AS recall
       |FROM (SELECT DISTINCT pid FROM probe) p
       |LEFT JOIN hits h ON h.pid = p.pid
       |ORDER BY probe""".stripMargin

  // the oracle is the PLAIN aggregate — the salted two-phase rewrite
  // must be hash-indistinguishable from it
  private val q116 =
    """SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
      |  round(sum(l_extendedprice), 2) AS sum_price
      |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin

  private val q117 =
    """WITH q AS (SELECT l_returnflag,
      |    quantile_cont(l_extendedprice, 0.05) AS lo,
      |    quantile_cont(l_extendedprice, 0.95) AS hi
      |  FROM lineitem GROUP BY 1)
      |SELECT l.l_returnflag,
      |  round(avg(greatest(q.lo, least(q.hi, l.l_extendedprice))), 2) AS wmean,
      |  CAST(count(*) AS BIGINT) AS n
      |FROM lineitem l JOIN q ON l.l_returnflag = q.l_returnflag
      |GROUP BY 1 ORDER BY 1""".stripMargin

  private val q118 = {
    val mins = (0 until 8).map(j => s"min(md5('$j:' || s)) AS m$j").mkString(", ")
    val bandSelects = (0 until 4).map(b =>
      s"SELECT doc_id, $b AS band, m${2 * b} || m${2 * b + 1} AS key FROM m")
      .mkString("\n  UNION ALL ")
    val agree = (0 until 8)
      .map(j => s"(CASE WHEN ma.m$j = mb.m$j THEN 1 ELSE 0 END)")
      .mkString(" + ")
    s"""WITH ${toksCte("WHERE doc_id < 100")},
       |$shCte,
       |m AS (SELECT doc_id, $mins FROM sh GROUP BY doc_id),
       |bk AS ($bandSelects),
       |cand AS (
       |  SELECT x.doc_id AS a, y.doc_id AS b FROM bk x JOIN bk y
       |  ON x.band = y.band AND x.key = y.key AND x.doc_id < y.doc_id
       |  GROUP BY 1, 2),
       |cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
       |ov AS (
       |  SELECT c.a, c.b, count(*) AS inter FROM cand c
       |  JOIN sh sa ON sa.doc_id = c.a
       |  JOIN sh sb ON sb.doc_id = c.b AND sb.s = sa.s
       |  GROUP BY 1, 2),
       |scored AS (
       |  SELECT c.a, c.b,
       |    round(($agree) / 8.0, 4) AS est_j,
       |    round(coalesce(o.inter, 0) /
       |      (ca.n + cb.n - coalesce(o.inter, 0)), 4) AS true_j
       |  FROM cand c
       |  JOIN m ma ON ma.doc_id = c.a
       |  JOIN m mb ON mb.doc_id = c.b
       |  JOIN cnt ca ON ca.doc_id = c.a
       |  JOIN cnt cb ON cb.doc_id = c.b
       |  LEFT JOIN ov o ON o.a = c.a AND o.b = c.b)
       |SELECT a, b, est_j, true_j, round(abs(est_j - true_j), 4) AS err
       |FROM scored ORDER BY true_j DESC, a, b LIMIT 20""".stripMargin
  }

  private val q119 =
    s"""WITH ${toksCte("")},
       |base AS (SELECT doc_id, len(toks) AS n_tok,
       |    len(list_distinct(toks)) AS nd,
       |    len(list_filter(toks, x -> list_contains(list_value('the','a','of','to','and','in','is'), x))) AS n_stop
       |  FROM t WHERE len(toks) >= 1),
       |$posCte,
       |bgc AS (SELECT a.doc_id, a.tok || ' ' || b.tok AS bg, count(*) AS n
       |  FROM p a JOIN p b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
       |  GROUP BY 1, 2),
       |top AS (SELECT doc_id, CAST(max(n) AS DOUBLE) / sum(n) AS topf
       |  FROM bgc GROUP BY doc_id),
       |g AS (SELECT b.doc_id, b.n_tok,
       |    (CASE WHEN b.n_tok < 30 THEN 1 ELSE 0 END) +
       |    (CASE WHEN CAST(b.nd AS DOUBLE) / b.n_tok < 0.4 THEN 2 ELSE 0 END) +
       |    (CASE WHEN coalesce(tp.topf, 0) > 0.08 THEN 4 ELSE 0 END) +
       |    (CASE WHEN CAST(b.n_stop AS DOUBLE) / b.n_tok < 0.03 THEN 8 ELSE 0 END)
       |      AS fail_mask
       |  FROM base b LEFT JOIN top tp ON tp.doc_id = b.doc_id)
       |SELECT doc_id, CAST(n_tok AS BIGINT) AS n_tok,
       |  CAST(fail_mask AS BIGINT) AS fail_mask,
       |  fail_mask = 0 AS keep
       |FROM g ORDER BY doc_id""".stripMargin

  // the oracle is the BRUTE-FORCE similarity join — the prefix-filter
  // rewrite must lose nothing (lossless candidate generation)
  private val q120 =
    """WITH t AS (SELECT doc_id,
      |    list_distinct(list_filter(string_split(trim(text), ' '), x -> x <> '')) AS toks
      |  FROM documents WHERE doc_id < 80),
      |s AS (SELECT doc_id, unnest(toks) AS tok FROM t WHERE len(toks) >= 1),
      |cnt AS (SELECT doc_id, count(*) AS n FROM s GROUP BY doc_id),
      |p AS (SELECT a.doc_id AS a, b.doc_id AS b, count(*) AS inter
      |  FROM s a JOIN s b ON a.tok = b.tok AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2)
      |SELECT a, b, round(inter / (ca.n + cb.n - inter), 4) AS j
      |FROM p JOIN cnt ca ON ca.doc_id = a JOIN cnt cb ON cb.doc_id = b
      |WHERE inter / (ca.n + cb.n - inter) >= 0.8
      |ORDER BY a, b""".stripMargin

  private val q136 =
    s"""WITH ${toksCte("")},
       |$shCte,
       |first AS (SELECT s, min(doc_id) AS first_doc FROM sh GROUP BY s)
       |SELECT sh.doc_id, CAST(count(*) AS BIGINT) AS n_shingles,
       |  CAST(count(*) FILTER (WHERE first_doc = sh.doc_id) AS BIGINT) AS n_first,
       |  floor(count(*) FILTER (WHERE first_doc = sh.doc_id) * 10000.0 /
       |    count(*)) / 10000.0 AS novelty
       |FROM sh JOIN first USING (s)
       |GROUP BY sh.doc_id ORDER BY sh.doc_id""".stripMargin

  private val q139 =
    s"""WITH e AS (SELECT vec_id,
       |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
       |  FROM embeddings),
       |m AS (SELECT vec_id, v,
       |    list_max(list_transform(v, x -> abs(x))) AS amax FROM e),
       |q AS (SELECT vec_id, v,
       |    list_transform(v,
       |      x -> CAST(floor(x * 127.0 / nullif(amax, 0.0) + 0.5) AS DOUBLE)) AS qv
       |  FROM m),
       |probe AS (SELECT vec_id AS probe, v AS vp, qv AS qp FROM q
       |  WHERE vec_id BETWEEN 4 AND 9),
       |cand AS (SELECT vec_id AS cand, v AS vc, qv AS qc FROM q
       |  WHERE vec_id >= 10),
       |es AS (SELECT probe, cand, round(${cos("vp", "vc")}, 4) AS sim
       |  FROM probe CROSS JOIN cand),
       |etop AS (SELECT probe, cand FROM (
       |    SELECT probe, cand,
       |      row_number() OVER (PARTITION BY probe ORDER BY sim DESC, cand) AS rk
       |    FROM es) WHERE rk <= 3),
       |qs AS (SELECT probe, cand, round(${cos("qp", "qc")}, 4) AS sim
       |  FROM probe CROSS JOIN cand),
       |qtop AS (SELECT probe, cand FROM (
       |    SELECT probe, cand,
       |      row_number() OVER (PARTITION BY probe ORDER BY sim DESC, cand) AS rk
       |    FROM qs) WHERE rk <= 3),
       |hits AS (SELECT qt.probe, count(*) AS n
       |  FROM qtop qt JOIN etop et ON qt.probe = et.probe AND qt.cand = et.cand
       |  GROUP BY qt.probe)
       |SELECT p.probe, CAST(coalesce(h.n, 0) AS BIGINT) AS n_hit,
       |  round(coalesce(h.n, 0) / 3.0, 4) AS recall
       |FROM (SELECT DISTINCT probe FROM probe) p
       |LEFT JOIN hits h ON p.probe = h.probe
       |ORDER BY p.probe""".stripMargin

  /** Shared bag-of-words fingerprint fragment (q137's construction). */
  private val fpExpr =
    """md5(array_to_string(list_sort(list_distinct(
      |      list_filter(string_split(trim(text), ' '), x -> x <> ''))), ' '))""".stripMargin

  private val q142 =
    """WITH e AS (SELECT list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      |  FROM embeddings),
      |ix AS (SELECT v, unnest(generate_series(1, len(v))) AS i FROM e),
      |d AS (SELECT CAST(i AS BIGINT) AS dim, list_extract(v, i) AS x FROM ix)
      |SELECT dim, CAST(count(*) AS BIGINT) AS n,
      |  round(avg(x), 4) AS mean_x,
      |  round(stddev_samp(x), 4) AS sd_x,
      |  round(min(x), 4) AS min_x,
      |  round(max(x), 4) AS max_x
      |FROM d GROUP BY dim ORDER BY dim""".stripMargin

  private val q143 =
    s"""WITH t AS (SELECT doc_id, lang,
       |    $fpExpr AS fp
       |  FROM documents),
       |g AS (SELECT fp, min(doc_id) AS rep, CAST(count(*) AS BIGINT) AS n_docs,
       |    CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
       |    min(lang) AS lang_a, max(lang) AS lang_b
       |  FROM t GROUP BY fp)
       |SELECT rep, n_docs, n_langs, lang_a, lang_b,
       |  n_langs > 1 AS mislabel_risk
       |FROM g WHERE n_docs > 1 ORDER BY rep""".stripMargin

  private val q144 =
    s"""WITH t AS (SELECT doc_id,
       |    $fpExpr AS fp
       |  FROM documents),
       |f AS (SELECT fp, min(doc_id) AS first_id FROM t GROUP BY fp),
       |mx AS (SELECT max(doc_id) AS max_id FROM t),
       |j AS (SELECT t.doc_id,
       |    CASE WHEN t.doc_id = f.first_id THEN 1 ELSE 0 END AS novel
       |  FROM t JOIN f ON t.fp = f.fp),
       |b AS (SELECT CAST(floor(10.0 * doc_id / (max_id + 1)) AS BIGINT) AS decile,
       |    novel
       |  FROM j, mx)
       |SELECT decile, CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(sum(novel) AS BIGINT) AS n_novel,
       |  floor(sum(novel) * 10000.0 / count(*)) / 10000.0 AS novelty_rate
       |FROM b GROUP BY decile ORDER BY decile""".stripMargin

  // q150 = q113's recursive-CTE clustering + q128's salted-md5 nibble
  // arithmetic on the CLUSTER id — fold membership engine-exact
  private val q150 = {
    val mins = (0 until 8).map(j => s"min(md5('$j:' || s)) AS m$j").mkString(", ")
    val bandSelects = (0 until 4).map(b =>
      s"SELECT doc_id, $b AS band, m${2 * b} || m${2 * b + 1} AS key FROM m")
      .mkString("\n  UNION ALL ")
    def nib(i: Int) =
      s"(instr('0123456789abcdef', substr(md5('fold:' || CAST(cluster AS STRING)), $i, 1)) - 1)"
    s"""WITH RECURSIVE ${toksCte("WHERE doc_id < 100")},
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
       |e AS (
       |  SELECT a, b FROM shared
       |  JOIN cnt ca ON ca.doc_id = a
       |  JOIN cnt cb ON cb.doc_id = b
       |  WHERE inter / (ca.n + cb.n - inter) >= 0.8),
       |sym AS (SELECT a AS u, b AS v FROM e UNION ALL SELECT b, a FROM e),
       |reach(u, v) AS (
       |  SELECT u, v FROM sym
       |  UNION
       |  SELECT r.u, s.v FROM reach r JOIN sym s ON r.v = s.u),
       |lbl AS (SELECT u, least(u, min(v)) AS cluster FROM reach GROUP BY u),
       |res AS (
       |  SELECT d.doc_id, CAST(coalesce(l.cluster, d.doc_id) AS BIGINT) AS cluster
       |  FROM (SELECT doc_id FROM documents WHERE doc_id < 100) d
       |  LEFT JOIN lbl l ON l.u = d.doc_id)
       |SELECT doc_id, cluster,
       |  CAST((${nib(1)} * 16 + ${nib(2)}) % 3 AS BIGINT) AS fold
       |FROM res ORDER BY doc_id""".stripMargin
  }

  // q151's oracle IS the all-pairs brute force: the Spark face's
  // rarest-shingle pruning must be hash-indistinguishable from it
  // (lossless, q120's discipline). Space-padded instr = token-boundary
  // containment on the normalized token text.
  private val q151 =
    s"""WITH ${toksCte("")},
       |n AS (SELECT doc_id, array_to_string(toks, ' ') AS norm,
       |    CAST(len(toks) AS BIGINT) AS n_toks FROM t)
       |SELECT a.doc_id AS contained, b.doc_id AS container,
       |  a.n_toks AS n_toks_contained, b.n_toks AS n_toks_container
       |FROM n a JOIN n b ON a.doc_id <> b.doc_id
       |WHERE a.n_toks >= 3
       |  AND instr(' ' || b.norm || ' ', ' ' || a.norm || ' ') > 0
       |ORDER BY 1, 2""".stripMargin

  // q205 cross-source syndication matrix: q151's brute-force
  // containment pairs attributed to sources, rolled up per unordered
  // (src_a <= src_b) cell with pair count + duplicated token mass.
  private val q205 =
    s"""WITH ${toksCte("")},
       |n AS (SELECT doc_id, array_to_string(toks, ' ') AS norm,
       |    CAST(len(toks) AS BIGINT) AS n_toks FROM t),
       |p AS (SELECT a.doc_id AS contained, b.doc_id AS container,
       |    a.n_toks AS ntc
       |  FROM n a JOIN n b ON a.doc_id <> b.doc_id
       |  WHERE a.n_toks >= 3
       |    AND instr(' ' || b.norm || ' ', ' ' || a.norm || ' ') > 0),
       |d AS (SELECT doc_id, source FROM documents)
       |SELECT least(da.source, db.source) AS src_a,
       |  greatest(da.source, db.source) AS src_b,
       |  CAST(count(*) AS BIGINT) AS n_pairs,
       |  CAST(sum(ntc) AS BIGINT) AS dup_tokens
       |FROM p JOIN d da ON p.contained = da.doc_id
       |  JOIN d db ON p.container = db.doc_id
       |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // q152: same positional-unnest bigram derivation as q114; ln is
  // natural log in BOTH dialects (DuckDB log() is log10 — avoided)
  private val q152 =
    s"""WITH ${toksCte("")},
       |t2 AS (SELECT doc_id, toks FROM t WHERE len(toks) >= 2),
       |pix AS (SELECT doc_id, toks,
       |    unnest(generate_series(1, len(toks) - 1)) AS i FROM t2),
       |bgr AS (SELECT doc_id,
       |    list_extract(toks, i) || ' ' || list_extract(toks, i + 1) AS bg,
       |    list_extract(toks, i) AS w1
       |  FROM pix),
       |c2 AS (SELECT bg, CAST(count(*) AS BIGINT) AS c2 FROM bgr GROUP BY 1),
       |c1 AS (SELECT w1, CAST(count(*) AS BIGINT) AS c1 FROM bgr GROUP BY 1),
       |tok AS (SELECT unnest(toks) AS w FROM t),
       |vv AS (SELECT CAST(count(DISTINCT w) AS BIGINT) AS v FROM tok),
       |sc AS (SELECT b.doc_id, ln((c2.c2 + 1.0) / (c1.c1 + vv.v)) AS ll
       |  FROM bgr b JOIN c2 ON c2.bg = b.bg
       |  JOIN c1 ON c1.w1 = b.w1 CROSS JOIN vv)
       |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
       |  round(sum(ll) / count(*), 4) AS avg_ll
       |FROM sc GROUP BY 1 ORDER BY 1""".stripMargin

  // q157: the oracle IS the brute-force |Δchars|≤20 inequality join —
  // the Spark face's 20-wide length bands must be hash-identical
  // (lossless banding); levenshtein is the classic unit-cost DP on
  // both engines
  private val q157 =
    """SELECT a.doc_id AS a, b.doc_id AS b,
      |  CAST(levenshtein(a.text, b.text) AS BIGINT) AS lev
      |FROM documents a JOIN documents b
      |  ON a.doc_id < b.doc_id AND abs(a.n_chars - b.n_chars) <= 20
      |WHERE a.doc_id < 200 AND b.doc_id < 200
      |  AND levenshtein(a.text, b.text) <= 45
      |ORDER BY a, b""".stripMargin

  // q158: same positional-unnest bigram derivation as q152, per lang;
  // context and total counts FOLD from the (lang,w1,w2) aggregate —
  // mirroring the single-pass Spark shape — and ln is natural log
  private val q158 =
    """WITH t AS (SELECT lang,
      |    list_filter(string_split(trim(text), ' '), x -> x <> '') AS toks
      |  FROM documents),
      |pix AS (SELECT lang, toks,
      |    unnest(generate_series(1, len(toks) - 1)) AS i
      |  FROM t WHERE len(toks) >= 2),
      |c2 AS (SELECT lang,
      |    list_extract(toks, i) AS w1,
      |    list_extract(toks, i) || ' ' || list_extract(toks, i + 1) AS bg,
      |    CAST(count(*) AS BIGINT) AS c2
      |  FROM pix GROUP BY 1, 2, 3),
      |c1 AS (SELECT lang, w1, CAST(sum(c2) AS BIGINT) AS c1
      |  FROM c2 GROUP BY 1, 2),
      |tt AS (SELECT lang, CAST(sum(c2) AS BIGINT) AS n FROM c2 GROUP BY 1)
      |SELECT c2.lang, tt.n AS n_bigrams,
      |  round(-sum(c2.c2 / tt.n * ln(c2.c2 / c1.c1)), 4) AS h_rate
      |FROM c2 JOIN c1 ON c1.lang = c2.lang AND c1.w1 = c2.w1
      |JOIN tt ON tt.lang = c2.lang
      |GROUP BY 1, 2 ORDER BY 1""".stripMargin

  val sql: Map[String, String] = Map(
    "q157_edit_distance"  -> q157,
    "q158_entropy_rate"   -> q158,
    "q150_cluster_fold"   -> q150,
    "q151_substring_dup"  -> q151,
    "q205_source_syndication" -> q205,
    "q152_lm_score"       -> q152,
    "q142_embed_dims"     -> q142,
    "q143_dup_lang_audit" -> q143,
    "q144_novelty_curve"  -> q144,
    "q136_novelty"        -> q136,
    "q139_quant_recall"   -> q139,
    "q120_prefix_join"    -> q120,
    "q119_quality_gate"   -> q119,
    "q116_salted_agg"     -> q116,
    "q117_winsorize"      -> q117,
    "q118_minhash_est"    -> q118,
    "q113_cc_clusters"    -> q113,
    "q189_keep_best"      -> q189,
    "q197_soft_dedup"     -> q197,
    "q114_bigram_pmi"     -> q114,
    "q115_ann_recall"     -> q115,
    "q106_bucket_join"    -> q106,
    "q107_bigram_lm"      -> q107,
    "q108_contamination"  -> q108,
    "q109_repetition"     -> q109,
    "q110_containment"    -> q110,
    "q111_quantize"       -> q111,
    "q112_len_quantiles"  -> q112)
}
