package graft.queries

/** DuckDB oracle SQL for the batch-assembly/audit queries q127–q133.
  * Mirrors [[BatchingQueries]] exactly: identical tokenizer
  * (`string_split` + filter), identical salted-md5 hash order
  * (lowercase hex on both engines), identical `instr` nibble
  * arithmetic for the fold bucket, identical epoch-micros range frame.
  */
object BatchingOracles {

  /** Token count twin of BatchingQueries.nToks. */
  private val nToks =
    "len(list_filter(string_split(trim(text), ' '), x -> x <> ''))"

  private def hkey(salt: String) =
    s"md5('$salt:' || CAST(doc_id AS STRING))"

  private def nib(salt: String, i: Int) =
    s"(instr('0123456789abcdef', substr(md5('$salt:' || CAST(doc_id AS STRING)),$i,1)) - 1)"

  private val q127 =
    s"""WITH t AS (SELECT doc_id, lang, $nToks AS nt, ${hkey("pack")} AS h
       |  FROM documents),
       |c AS (SELECT lang, nt,
       |  coalesce(sum(nt) OVER (PARTITION BY lang ORDER BY h, doc_id
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum
       |  FROM t)
       |SELECT lang, CAST(floor(cum / 2048) AS BIGINT) AS chunk,
       |  CAST(count(*) AS BIGINT) AS n_docs, CAST(sum(nt) AS BIGINT) AS tokens
       |FROM c GROUP BY 1, 2 ORDER BY lang, chunk""".stripMargin

  private val q128 =
    s"""SELECT CAST((${nib("fold", 1)}*4096 + ${nib("fold", 2)}*256 +
       |    ${nib("fold", 3)}*16 + ${nib("fold", 4)}) % 5 AS BIGINT) AS fold,
       |  lang, CAST(count(*) AS BIGINT) AS n,
       |  floor(sum(n_chars) * 100 / count(*)) / 100.0 AS avg_chars
       |FROM documents GROUP BY 1, 2 ORDER BY fold, lang""".stripMargin

  private val q129 =
    s"""WITH t AS (SELECT doc_id, source, $nToks AS nt, ${hkey("cap")} AS h
       |  FROM documents),
       |c AS (SELECT source, nt,
       |  sum(nt) OVER (PARTITION BY source ORDER BY h, doc_id
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
       |  FROM t),
       |kept AS (SELECT source, CAST(count(*) AS BIGINT) AS n_kept,
       |    CAST(sum(nt) AS BIGINT) AS tokens_kept
       |  FROM c WHERE cum <= 800 GROUP BY source),
       |total AS (SELECT source, CAST(count(*) AS BIGINT) AS n_total
       |  FROM t GROUP BY source)
       |SELECT kept.source, n_kept, tokens_kept, n_total
       |FROM kept JOIN total ON kept.source = total.source
       |ORDER BY kept.source""".stripMargin

  private val q130 =
    """WITH stats AS (SELECT l_returnflag,
      |    avg(l_extendedprice) AS mu, stddev_samp(l_extendedprice) AS sd
      |  FROM lineitem GROUP BY l_returnflag)
      |SELECT l.l_returnflag, CAST(count(*) AS BIGINT) AS n_out,
      |  round(min(l_extendedprice), 2) AS lo,
      |  round(max(l_extendedprice), 2) AS hi
      |FROM lineitem l JOIN stats s ON l.l_returnflag = s.l_returnflag
      |WHERE abs(l_extendedprice - mu) > 1.5 * sd
      |GROUP BY l.l_returnflag ORDER BY l.l_returnflag""".stripMargin

  private val q131 =
    """SELECT event_type, CAST(count(*) AS BIGINT) AS n,
      |  round(regr_slope(value, epoch_us(ts) / 86400000000.0), 5) + 0.0
      |    AS slope,
      |  round(regr_intercept(value, epoch_us(ts) / 86400000000.0), 2) + 0.0
      |    AS icept
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  private val q132 =
    """WITH cells AS (SELECT lang, source, CAST(count(*) AS DOUBLE) AS o
      |  FROM documents GROUP BY lang, source),
      |rl AS (SELECT lang, sum(o) AS rl FROM cells GROUP BY lang),
      |cs AS (SELECT source, sum(o) AS cs FROM cells GROUP BY source),
      |tot AS (SELECT sum(o) AS t, count(DISTINCT lang) AS nl,
      |    count(DISTINCT source) AS ns FROM cells)
      |SELECT round(sum(pow(o - rl * cs / t, 2) / (rl * cs / t)), 2) AS chi2,
      |  CAST((nl - 1) * (ns - 1) AS BIGINT) AS dof, CAST(t AS BIGINT) AS n
      |FROM cells JOIN rl USING (lang) JOIN cs USING (source), tot
      |GROUP BY t, nl, ns""".stripMargin

  private val q133 =
    """SELECT user_id, event_id,
      |  CAST(count(*) OVER w AS BIGINT) AS n_3d,
      |  floor(sum(value) OVER w / count(*) OVER w * 10000) / 10000.0 AS avg_3d
      |FROM events WHERE user_id < 40
      |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
      |  RANGE BETWEEN 259200000000 PRECEDING AND CURRENT ROW)
      |ORDER BY user_id, event_id""".stripMargin

  private val q134 =
    """SELECT o_orderkey,
      |  CAST(sum(CAST(floor(o_totalprice) AS BIGINT)) OVER (
      |    ORDER BY o_orderdate, o_orderkey
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |    AS run_total
      |FROM orders ORDER BY o_orderkey""".stripMargin

  private val q135 =
    s"""WITH t AS (SELECT doc_id, lang, $nToks AS nt, ${hkey("pack")} AS h
       |  FROM documents),
       |c AS (SELECT lang, nt,
       |  coalesce(sum(nt) OVER (PARTITION BY lang ORDER BY h, doc_id
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum
       |  FROM t),
       |g AS (SELECT lang, CAST(floor(cum / 2048) AS BIGINT) AS chunk, nt
       |  FROM c)
       |SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(count(DISTINCT chunk) AS BIGINT) AS n_chunks,
       |  CAST(sum(nt) AS BIGINT) AS tokens,
       |  floor(sum(nt) * 10000.0 / (count(DISTINCT chunk) * 2048)) /
       |    10000.0 AS fill_rate
       |FROM g GROUP BY lang ORDER BY lang""".stripMargin

  private val q137 =
    s"""WITH f AS (SELECT doc_id,
       |    CAST((${nib("fold", 1)}*4096 + ${nib("fold", 2)}*256 +
       |      ${nib("fold", 3)}*16 + ${nib("fold", 4)}) % 5 AS BIGINT) AS fold,
       |    md5(array_to_string(list_sort(list_distinct(
       |      list_filter(string_split(trim(text), ' '), x -> x <> ''))),
       |      ' ')) AS fp
       |  FROM documents)
       |SELECT min(doc_id) AS rep, CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(count(DISTINCT fold) AS BIGINT) AS n_folds
       |FROM f GROUP BY fp
       |HAVING count(*) > 1 AND count(DISTINCT fold) > 1
       |ORDER BY rep""".stripMargin

  private val q138 =
    s"""WITH c AS (SELECT source, count(*) AS n,
       |    CAST(floor(sqrt(count(*)) * 1000000.0) AS BIGINT) AS sq
       |  FROM documents GROUP BY source),
       |t AS (SELECT sum(sq) AS sqt FROM c),
       |tg AS (SELECT source, n,
       |    CAST(floor(CAST(sq AS DOUBLE) * 200 / sqt) AS BIGINT) AS target
       |  FROM c, t),
       |r AS (SELECT source, row_number() OVER (PARTITION BY source
       |    ORDER BY md5('mix:' || CAST(doc_id AS STRING)), doc_id) AS rn
       |  FROM documents),
       |k AS (SELECT r.source, CAST(count(*) AS BIGINT) AS n_kept
       |  FROM r JOIN tg ON r.source = tg.source WHERE rn <= target
       |  GROUP BY r.source)
       |SELECT tg.source, CAST(tg.n AS BIGINT) AS n_total,
       |  coalesce(k.n_kept, 0) AS n_kept
       |FROM tg LEFT JOIN k ON tg.source = k.source
       |ORDER BY tg.source""".stripMargin

  // q154: TTR rounds at 4 BEFORE the ordering (both faces rank the
  // identical key); the window is ORDER BY ttr DESC, doc_id — the
  // Spark face orders by (−ttr, doc_id) ascending, the same total
  // order (IEEE negation is exact); 1 PRECEDING = tokens BEFORE the
  // doc, so a doc belongs to the phase it starts in
  private val q154 =
    s"""WITH t AS (SELECT doc_id,
       |    list_filter(string_split(trim(text), ' '), x -> x <> '') AS toks
       |  FROM documents),
       |s AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_toks,
       |    round(len(list_distinct(toks)) * 1.0 / len(toks), 4) AS ttr
       |  FROM t WHERE len(toks) > 0),
       |c AS (SELECT doc_id, n_toks, ttr,
       |    coalesce(sum(n_toks) OVER (ORDER BY ttr DESC, doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
       |  FROM s)
       |SELECT CAST(floor(cum_before / 5000) AS BIGINT) AS phase,
       |  CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(sum(n_toks) AS BIGINT) AS n_tokens,
       |  min(ttr) AS min_ttr, max(ttr) AS max_ttr
       |FROM c GROUP BY 1 ORDER BY phase""".stripMargin

  // q155: the A-ES weighted-sample key −ln(u)/w with u from the SAME
  // salted-md5 nibble arithmetic (value + 0.5 over 2^32); ln is
  // natural log in both dialects; ORDER on the rounded ppm key
  private val q155 = {
    def wnib(i: Int) =
      s"(instr('0123456789abcdef', substr(md5('ws:' || CAST(doc_id AS STRING)),$i,1)) - 1)"
    // CAST keeps the products in BIGINT — an INT32×INT32 overflows
    // DuckDB's checked arithmetic at nibble 1 (15·16⁷ > 2³¹)
    val v32 = (1 to 8)
      .map(i => s"${wnib(i)} * CAST(${1L << (4 * (8 - i))} AS BIGINT)")
      .mkString(" + ")
    s"""WITH k AS (SELECT source, doc_id,
       |    -ln((($v32) + 0.5) / 4294967296.0) / n_chars AS key
       |  FROM documents),
       |r AS (SELECT source, doc_id, key,
       |    row_number() OVER (PARTITION BY source ORDER BY key, doc_id) AS rk
       |  FROM k)
       |SELECT source, doc_id, round(key * 1000000, 4) AS key_ppm
       |FROM r WHERE rk <= 3 ORDER BY source, key_ppm, doc_id""".stripMargin
  }

  // q164: the water-filling closed form over sorted strata — identical
  // cut validity (n_i ≤ L_i < n_{i+1}), identical zero-cut fallback,
  // identical floor-of-double division; budget = floor(0.6·total)
  private val q164 =
    s"""WITH t AS (SELECT source, $nToks AS nt FROM documents
       |  WHERE source IS NOT NULL),
       |n AS (SELECT source, CAST(sum(nt) AS BIGINT) AS n FROM t GROUP BY 1),
       |st AS (SELECT CAST(count(*) AS BIGINT) AS s,
       |    CAST(sum(n) AS BIGINT) AS tot FROM n),
       |b AS (SELECT s, tot, CAST(floor(tot * 0.6) AS BIGINT) AS b FROM st),
       |r AS (SELECT source, n,
       |    CAST(row_number() OVER (ORDER BY n, source) AS BIGINT) AS i,
       |    CAST(sum(n) OVER (ORDER BY n, source
       |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS p,
       |    lead(n) OVER (ORDER BY n, source) AS nx
       |  FROM n),
       |cand AS (SELECT CAST(floor((b.b - r.p) / (b.s - r.i)) AS BIGINT)
       |    AS lvl, r.n AS cn, r.nx
       |  FROM r CROSS JOIN b WHERE r.i < b.s),
       |valid AS (SELECT lvl FROM cand WHERE cn <= lvl AND lvl < nx),
       |lvl0 AS (SELECT CAST(floor(b.b / b.s) AS BIGINT) AS lvl
       |  FROM b CROSS JOIN (SELECT count(*) AS anyv FROM valid) av
       |  WHERE b.b < b.tot AND av.anyv = 0),
       |level AS (SELECT lvl FROM valid UNION ALL SELECT lvl FROM lvl0)
       |SELECT n.source, n.n,
       |  CAST(CASE WHEN b.b >= b.tot THEN n.n
       |       ELSE least(n.n, coalesce(level.lvl, 0)) END AS BIGINT)
       |    AS alloc,
       |  (CASE WHEN b.b >= b.tot THEN n.n
       |        ELSE least(n.n, coalesce(level.lvl, 0)) END) < n.n AS capped
       |FROM n CROSS JOIN b LEFT JOIN level ON true
       |ORDER BY source""".stripMargin

  private val q169 =
    """WITH bt AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_c
      |  FROM events GROUP BY event_type),
      |tot AS (SELECT CAST(sum(n_c) AS BIGINT) AS n,
      |    CAST(count(*) AS BIGINT) AS k FROM bt)
      |SELECT event_type, n_c,
      |  floor(n * 10000.0 / (k * n_c)) / 10000.0 AS w_inv,
      |  round(0.001 / (1 - exp(n_c * ln(0.999))), 4) AS w_cb
      |FROM bt CROSS JOIN tot ORDER BY event_type""".stripMargin

  private val q170 =
    """WITH bt AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_c
      |  FROM events GROUP BY event_type),
      |tot AS (SELECT CAST(sum(n_c) AS BIGINT) AS n FROM bt),
      |based AS (SELECT event_type, n_c,
      |    CAST(floor(1000 * n_c * 1.0 / n) AS BIGINT) AS base,
      |    1000 * n_c - CAST(floor(1000 * n_c * 1.0 / n) AS BIGINT) * n
      |      AS rem
      |  FROM bt CROSS JOIN tot),
      |ranked AS (SELECT *,
      |    row_number() OVER (ORDER BY rem DESC, event_type) AS pos,
      |    1000 - sum(base) OVER () AS leftover FROM based)
      |SELECT event_type, n_c,
      |  CAST(base + CASE WHEN pos <= leftover THEN 1 ELSE 0 END AS BIGINT)
      |    AS quota
      |FROM ranked ORDER BY event_type""".stripMargin

  private val q181 =
    """WITH cells AS (SELECT lang, source,
      |    CAST(count(*) AS DOUBLE) AS o
      |  FROM documents GROUP BY lang, source),
      |rl AS (SELECT lang, sum(o) AS rl FROM cells GROUP BY lang),
      |cs AS (SELECT source, sum(o) AS cs FROM cells GROUP BY source),
      |tot AS (SELECT sum(o) AS t FROM cells),
      |mi AS (SELECT round(sum((o / t) * ln(o * t / (rl * cs))), 4) + 0.0
      |    AS mi
      |  FROM cells JOIN rl ON rl.lang = cells.lang
      |    JOIN cs ON cs.source = cells.source CROSS JOIN tot),
      |hl AS (SELECT round(-sum((rl / t) * ln(rl / t)), 4) + 0.0 AS h_lang
      |  FROM rl CROSS JOIN tot),
      |hs AS (SELECT round(-sum((cs / t) * ln(cs / t)), 4) + 0.0 AS h_source
      |  FROM cs CROSS JOIN tot)
      |SELECT CAST(t AS BIGINT) AS n_docs, mi, h_lang, h_source
      |FROM tot CROSS JOIN mi CROSS JOIN hl CROSS JOIN hs""".stripMargin

  // q194 token-weighted length quantiles: per-(lang, n_tok) token mass,
  // per-lang cumulative, lower-quantile pick via CROSS-MULTIPLIED
  // integer comparisons — no double anywhere in the contract.
  private val q194 =
    """WITH f AS (SELECT lang,
      |    CAST(len(list_filter(string_split(trim(text), ' '),
      |      x -> x <> '')) AS BIGINT) AS n_tok
      |  FROM documents),
      |f2 AS (SELECT lang, n_tok FROM f WHERE n_tok > 0),
      |cnt AS (SELECT lang, n_tok, CAST(sum(n_tok) AS BIGINT) AS w
      |  FROM f2 GROUP BY lang, n_tok),
      |cum AS (SELECT lang, n_tok,
      |    CAST(sum(w) OVER (PARTITION BY lang ORDER BY n_tok) AS BIGINT) AS cw,
      |    CAST(sum(w) OVER (PARTITION BY lang) AS BIGINT) AS wtot
      |  FROM cnt)
      |SELECT lang, max(wtot) AS token_mass,
      |  min(CASE WHEN cw * 4 >= wtot THEN n_tok END) AS p25_len,
      |  min(CASE WHEN cw * 2 >= wtot THEN n_tok END) AS p50_len,
      |  min(CASE WHEN cw * 4 >= wtot * 3 THEN n_tok END) AS p75_len
      |FROM cum GROUP BY lang ORDER BY lang""".stripMargin

  val sql: Map[String, String] = Map(
    "q194_wlen_quantiles"   -> q194,
    "q169_class_weights"    -> q169,
    "q170_stratified_quota" -> q170,
    "q181_mutual_info"      -> q181,
    "q164_water_fill"  -> q164,
    "q154_curriculum"  -> q154,
    "q155_weighted_sample" -> q155,
    "q127_pack_chunks" -> q127,
    "q128_kfold"       -> q128,
    "q129_token_cap"   -> q129,
    "q130_zscore"      -> q130,
    "q131_regr_trend"  -> q131,
    "q132_chi2"        -> q132,
    "q133_rolling_3d"  -> q133,
    "q134_running_total" -> q134,
    "q135_pack_efficiency" -> q135,
    "q137_fold_leakage" -> q137,
    "q138_temp_mix"    -> q138)
}
