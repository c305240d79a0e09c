package graft.queries

/** DuckDB oracle SQL for the round-3 extension queries q79–q90. Mirrors
  * [[ExtendedQueries]] exactly: cosine via `list_dot_product` in double
  * (as [[PipelineOracles]]), integer day arithmetic, ranking on ROUNDED
  * similarities where the contract ranks rounded values (q79). */
object ExtendedOracles {

  private val cosSql =
    "list_dot_product(%A, %B) / (sqrt(list_dot_product(%A, %A)) * sqrt(list_dot_product(%B, %B)))"
  private def cos(a: String, b: String) =
    cosSql.replace("%A", a).replace("%B", b)

  private val q79 =
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
       |top AS (SELECT pid, cand, sim,
       |    row_number() OVER (PARTITION BY pid ORDER BY sim DESC, cand) AS rank
       |  FROM scored)
       |SELECT pid AS probe, cand, sim, CAST(rank AS BIGINT) AS rank
       |FROM top WHERE rank <= 3 ORDER BY probe, rank""".stripMargin

  private val q80 =
    """WITH e AS (SELECT user_id, CAST(ts AS DATE) AS day FROM events),
      |f AS (SELECT user_id, min(day) AS cohort_day FROM e GROUP BY user_id),
      |act AS (SELECT DISTINCT e.user_id, f.cohort_day,
      |    CAST((epoch_us(CAST(e.day AS TIMESTAMP))
      |      - epoch_us(CAST(f.cohort_day AS TIMESTAMP))) / 86400000000 AS BIGINT) AS day_offset
      |  FROM e JOIN f ON e.user_id = f.user_id)
      |SELECT CAST(cohort_day AS TIMESTAMP) AS cohort_day, day_offset,
      |  CAST(count(*) AS BIGINT) AS n_users
      |FROM act GROUP BY 1, 2
      |ORDER BY cohort_day, day_offset LIMIT 100""".stripMargin

  private val q81 =
    """SELECT o_custkey, o_orderkey,
      |  round(sum(o_totalprice) OVER (PARTITION BY o_custkey
      |    ORDER BY CAST(epoch_us(CAST(o_orderdate AS TIMESTAMP)) / 86400000000 AS BIGINT)
      |    RANGE BETWEEN 6 PRECEDING AND CURRENT ROW), 2) AS rev_7d
      |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin

  private val q82 =
    """SELECT c_custkey, c_mktsegment,
      |  round(cume_dist() OVER w, 4) AS cd,
      |  round(percent_rank() OVER w, 4) AS prk
      |FROM customer
      |WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
      |ORDER BY c_custkey""".stripMargin

  private val q83 =
    """SELECT o_custkey,
      |  min_by(o_orderstatus, o_orderkey) AS first_status,
      |  max_by(o_orderstatus, o_orderkey) AS last_status,
      |  max(o_orderkey) AS last_key
      |FROM orders GROUP BY o_custkey ORDER BY o_custkey""".stripMargin

  private val q84 =
    """SELECT event_id,
      |  CAST(regexp_extract(props, '"k":\s*(\d+)', 1) AS BIGINT) AS k_num,
      |  array_to_string(regexp_extract_all(props, '\d+', 0), ',') AS all_nums
      |FROM events ORDER BY event_id LIMIT 200""".stripMargin

  private val q85 =
    """WITH t AS (SELECT doc_id,
      |    list_filter(string_split(trim(text), ' '), x -> x <> '') AS toks
      |  FROM documents WHERE doc_id < 50)
      |SELECT doc_id,
      |  CAST(len(list_filter(toks, x -> length(x) > 5)) AS BIGINT) AS n_long,
      |  CAST(list_sum(list_transform(toks, x -> length(x))) AS BIGINT) AS total_len,
      |  list_extract(list_sort(list_transform(toks, x -> upper(x))), 1) AS first_upper,
      |  list_contains(toks, 'the') AS has_the
      |FROM t ORDER BY doc_id""".stripMargin

  private val q86 =
    """WITH t AS (SELECT doc_id,
      |    list_filter(string_split(trim(text), ' '), x -> x <> '') AS toks
      |  FROM documents WHERE doc_id < 20),
      |ix AS (SELECT doc_id, toks, unnest(generate_series(1, len(toks))) AS i
      |  FROM t WHERE len(toks) >= 1)
      |SELECT doc_id, CAST(i - 1 AS BIGINT) AS pos, list_extract(toks, i) AS tok
      |FROM ix ORDER BY doc_id, pos""".stripMargin

  private val q87 =
    """WITH e AS (SELECT CAST(ts AS DATE) AS day, event_type FROM events),
      |b AS (SELECT min(day) AS d0, max(day) AS d1 FROM e),
      |sp AS (SELECT unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS d FROM b),
      |spine AS (SELECT CAST(d AS DATE) AS day FROM sp),
      |types AS (SELECT DISTINCT event_type FROM e),
      |actual AS (SELECT day, event_type, count(*) AS n FROM e GROUP BY 1, 2)
      |SELECT CAST(s.day AS TIMESTAMP) AS day, t.event_type,
      |  CAST(coalesce(a.n, 0) AS BIGINT) AS n
      |FROM spine s CROSS JOIN types t
      |LEFT JOIN actual a ON a.day = s.day AND a.event_type = t.event_type
      |ORDER BY s.day, t.event_type""".stripMargin

  private val q88 =
    """SELECT o_orderstatus, o_orderpriority,
      |  CAST(GROUPING(o_orderstatus) AS BIGINT) AS g_status,
      |  CAST(GROUPING(o_orderpriority) AS BIGINT) AS g_prio,
      |  CAST(count(*) AS BIGINT) AS n
      |FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
      |ORDER BY g_status, g_prio, o_orderstatus NULLS FIRST,
      |  o_orderpriority NULLS FIRST""".stripMargin

  // the oracle is the PLAIN join — the salted rewrite must be
  // hash-indistinguishable from it
  private val q89 =
    """SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n,
      |  round(sum(o_totalprice), 2) AS revenue
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin

  private val q90 =
    """WITH p AS (SELECT user_id, ts, max(event_id) AS purchase_id
      |  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2),
      |c AS (SELECT event_id AS click_id, user_id, ts
      |  FROM events WHERE event_type = 'click')
      |SELECT c.click_id, c.user_id, c.ts AS click_ts,
      |       p.ts AS purchase_ts, p.purchase_id
      |FROM c ASOF JOIN p ON c.user_id = p.user_id AND p.ts >= c.ts
      |ORDER BY click_id""".stripMargin

  private val q91 =
    """SELECT l_returnflag,
      |  bool_and(l_quantity > 0) AS all_pos,
      |  bool_or(l_discount > 0.09) AS any_disc,
      |  CAST(bit_and(l_linenumber) AS BIGINT) AS band,
      |  CAST(bit_or(l_linenumber) AS BIGINT) AS bor,
      |  CAST(bit_xor(l_linenumber) AS BIGINT) AS bxor
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  private val q92 =
    """WITH b AS (SELECT CAST(least(floor(o_totalprice / 50000), 9) AS BIGINT) AS bucket
      |  FROM orders)
      |SELECT bucket, CAST(count(*) AS BIGINT) AS n
      |FROM b GROUP BY bucket ORDER BY bucket""".stripMargin

  private val q93 =
    """SELECT p_partkey,
      |  split_part(p_type, ' ', 1) AS type_head,
      |  CAST(levenshtein(p_brand, split_part(p_type, ' ', 1)) AS BIGINT) AS lev,
      |  reverse(p_brand) AS brand_rev,
      |  lpad(CAST(p_size AS STRING), 4, '0') AS size_pad,
      |  repeat('*', p_size % 5) AS stars,
      |  translate(p_brand, '#', '-') AS brand_tr
      |FROM part WHERE p_partkey < 100 ORDER BY p_partkey""".stripMargin

  private val q94 =
    """WITH m AS (
      |  SELECT 'o_totalprice' AS col_name,
      |    CAST(count(*) AS BIGINT) AS n,
      |    CAST(count(o_totalprice) AS BIGINT) AS n_nonnull,
      |    CAST(count(DISTINCT o_totalprice) AS BIGINT) AS n_distinct,
      |    round(min(o_totalprice), 4) AS min_v,
      |    round(max(o_totalprice), 4) AS max_v,
      |    round(avg(o_totalprice), 4) AS avg_v
      |  FROM orders
      |  UNION ALL
      |  SELECT 'o_custkey',
      |    CAST(count(*) AS BIGINT), CAST(count(o_custkey) AS BIGINT),
      |    CAST(count(DISTINCT o_custkey) AS BIGINT),
      |    round(min(o_custkey), 4), round(max(o_custkey), 4),
      |    round(avg(o_custkey), 4)
      |  FROM orders)
      |SELECT * FROM m ORDER BY col_name""".stripMargin

  // the oracle is the single-task lead() form the distributed operator
  // must be indistinguishable from
  private val q95 =
    """WITH s AS (SELECT o_orderkey AS k,
      |    lead(o_orderkey) OVER (ORDER BY o_orderkey) AS nxt
      |  FROM orders WHERE o_orderstatus = 'F')
      |SELECT k + 1 AS gap_start, nxt - 1 AS gap_end,
      |  CAST(nxt - k - 1 AS BIGINT) AS gap_len
      |FROM s WHERE nxt - k > 1
      |ORDER BY gap_start LIMIT 100""".stripMargin

  // ids16 = the first 16 position-ordered ids, assembled engine-portably:
  // one max(CASE) per position (unique per (doc,pos)) packed into a list,
  // trailing NULLs filtered — no ORDER BY-inside-aggregate dialect needed
  private val idsAt16 = (1 to 16)
    .map(p => s"max(CASE WHEN pos = $p THEN id END)").mkString(", ")

  private val q96 =
    s"""WITH t AS (SELECT doc_id,
       |    list_filter(string_split(trim(text), ' '), x -> x <> '') AS toks
       |  FROM documents WHERE doc_id < 50),
       |tix AS (SELECT doc_id, toks, unnest(generate_series(1, len(toks))) AS i
       |  FROM t WHERE len(toks) >= 1),
       |tok AS (SELECT doc_id, i AS pos, list_extract(toks, i) AS token FROM tix),
       |vocab AS (SELECT token,
       |    CAST(row_number() OVER (ORDER BY count(*) DESC, token) AS BIGINT) AS tok_id
       |  FROM (SELECT DISTINCT doc_id, token FROM
       |    (SELECT doc_id, unnest(toks) AS token FROM t))
       |  GROUP BY token),
       |joined AS (SELECT tok.doc_id, tok.pos, coalesce(v.tok_id, 0) AS id
       |  FROM tok LEFT JOIN vocab v ON tok.token = v.token),
       |enc AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
       |  array_to_string(list_filter(list_value($idsAt16),
       |    x -> x IS NOT NULL), ',') AS ids16
       |  FROM joined GROUP BY doc_id)
       |-- row-complete: token-less docs keep a (0, '') row, mirroring the
       |-- operator's empty-ids re-attachment
       |SELECT t.doc_id,
       |  CAST(coalesce(e.n_tokens, 0) AS BIGINT) AS n_tokens,
       |  coalesce(e.ids16, '') AS ids16
       |FROM t LEFT JOIN enc e ON t.doc_id = e.doc_id
       |ORDER BY t.doc_id""".stripMargin

  // q64's oracle verbatim — q97 is the distributed rewrite of the same
  // exact contract, and must hash-match it
  private val q97 =
    """SELECT l_returnflag,
      |  round(quantile_cont(l_quantity, 0.5), 4) AS med_qty,
      |  round(quantile_cont(l_extendedprice, 0.25), 4) AS p25_price,
      |  round(quantile_cont(l_extendedprice, 0.75), 4) AS p75_price
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  private val q98 =
    """WITH t AS (SELECT doc_id,
      |    list_sort(list_distinct(list_filter(string_split(trim(text), ' '), x -> x <> ''))) AS s
      |  FROM documents WHERE doc_id < 30)
      |SELECT a.doc_id,
      |  CAST(len(list_intersect(a.s, b.s)) AS BIGINT) AS n_common,
      |  CAST(len(list_filter(a.s, x -> NOT list_contains(b.s, x))) AS BIGINT) AS n_only_a,
      |  CAST(len(list_distinct(list_concat(a.s, b.s))) AS BIGINT) AS n_union
      |FROM t a JOIN t b ON b.doc_id = a.doc_id + 1
      |ORDER BY a.doc_id""".stripMargin

  private val q99 =
    """SELECT c_custkey,
      |  nullif(c_mktsegment, 'BUILDING') AS seg_nb,
      |  coalesce(nullif(c_mktsegment, 'BUILDING'), 'OTHER') AS seg_f,
      |  CASE WHEN c_acctbal IS NOT NULL THEN 'has' ELSE 'none' END AS nvl2_like,
      |  greatest(c_acctbal, 0.0) AS bal_pos,
      |  least(c_acctbal, 1000.0) AS bal_cap
      |FROM customer ORDER BY c_custkey LIMIT 200""".stripMargin

  private val q100 =
    """SELECT l_returnflag,
      |  round(sum(l_extendedprice * l_quantity) / sum(l_quantity), 4) AS wavg_price,
      |  round(sum(l_extendedprice * (1 - l_discount)) / sum(l_extendedprice), 6) AS disc_ratio
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  private val q101 =
    s"""WITH tr AS (SELECT doc_id,
       |    list_filter(string_split(trim(text), ' '), x -> x <> '') AS toks
       |  FROM documents WHERE doc_id < 50),
       |vocab AS (SELECT token,
       |    CAST(row_number() OVER (ORDER BY count(*) DESC, token) AS BIGINT) AS tok_id
       |  FROM (SELECT DISTINCT doc_id, token FROM
       |    (SELECT doc_id, unnest(toks) AS token FROM tr))
       |  GROUP BY token),
       |te AS (SELECT doc_id,
       |    list_filter(string_split(trim(text), ' '), x -> x <> '') AS toks
       |  FROM documents WHERE doc_id BETWEEN 50 AND 99),
       |tix AS (SELECT doc_id, toks, unnest(generate_series(1, len(toks))) AS i
       |  FROM te WHERE len(toks) >= 1),
       |tok AS (SELECT doc_id, i AS pos, list_extract(toks, i) AS token FROM tix),
       |joined AS (SELECT tok.doc_id, tok.pos, coalesce(v.tok_id, 0) AS id
       |  FROM tok LEFT JOIN vocab v ON tok.token = v.token),
       |enc AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
       |  CAST(count(CASE WHEN id = 0 THEN 1 END) AS BIGINT) AS n_unk,
       |  array_to_string(list_filter(list_value($idsAt16),
       |    x -> x IS NOT NULL), ',') AS ids16
       |  FROM joined GROUP BY doc_id)
       |SELECT te.doc_id,
       |  CAST(coalesce(e.n_tokens, 0) AS BIGINT) AS n_tokens,
       |  CAST(coalesce(e.n_unk, 0) AS BIGINT) AS n_unk,
       |  coalesce(e.ids16, '') AS ids16
       |FROM te LEFT JOIN enc e ON te.doc_id = e.doc_id
       |ORDER BY te.doc_id""".stripMargin

  private val q102 =
    """SELECT event_type,
      |  round(quantile_cont(value, 0.1), 4) AS p10_value,
      |  round(quantile_cont(value, 0.5), 4) AS p50_value,
      |  round(quantile_cont(value, 0.9), 4) AS p90_value
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  private val q103 = {
    val mins = (0 until 8).map(j => s"min(md5('$j:' || s)) AS m$j").mkString(", ")
    val agree = (0 until 8).map(j =>
      s"CASE WHEN x.m$j = y.m$j THEN 1 ELSE 0 END").mkString(" + ")
    val bandsU = Seq((0, "m0 || m1"), (1, "m2 || m3"), (2, "m4 || m5"),
      (3, "m6 || m7")).map { case (b, k) =>
        s"SELECT side, doc_id, $b AS band, $k AS key FROM m"
      }.mkString("\n  UNION ALL ")
    s"""WITH corp AS (
       |  SELECT doc_id, text, 'e' AS side FROM documents WHERE doc_id < 60
       |  UNION ALL
       |  SELECT doc_id, text, 'i' FROM documents WHERE doc_id BETWEEN 60 AND 99
       |  UNION ALL
       |  SELECT doc_id + 10000, text, 'i' FROM documents WHERE doc_id < 3),
       |t AS (SELECT side, doc_id,
       |    list_filter(string_split(trim(text), ' '), x -> x <> '') AS toks
       |  FROM corp),
       |shix AS (SELECT side, doc_id, toks, unnest(generate_series(1, len(toks) - 2)) AS i
       |  FROM t WHERE len(toks) >= 3),
       |sh AS (SELECT DISTINCT side, doc_id,
       |    list_extract(toks, i) || ' ' || list_extract(toks, i + 1) || ' ' || list_extract(toks, i + 2) AS s
       |  FROM shix),
       |m AS (SELECT side, doc_id, $mins FROM sh GROUP BY 1, 2),
       |bk AS ($bandsU),
       |vsx AS (SELECT DISTINCT bi.doc_id
       |  FROM bk bi JOIN bk be ON bi.band = be.band AND bi.key = be.key
       |    AND bi.side = 'i' AND be.side = 'e'
       |  JOIN m x ON x.side = 'i' AND x.doc_id = bi.doc_id
       |  JOIN m y ON y.side = 'e' AND y.doc_id = be.doc_id
       |  WHERE ($agree) / 8.0 >= 0.8),
       |cnt AS (SELECT doc_id, count(*) AS n FROM sh WHERE side = 'i' GROUP BY 1),
       |wcand AS (SELECT ba.doc_id AS a, bb.doc_id AS b
       |  FROM bk ba JOIN bk bb ON ba.band = bb.band AND ba.key = bb.key
       |    AND ba.side = 'i' AND bb.side = 'i' AND ba.doc_id < bb.doc_id
       |  GROUP BY 1, 2),
       |wshared AS (SELECT c.a, c.b, count(*) AS inter FROM wcand c
       |  JOIN sh sa ON sa.side = 'i' AND sa.doc_id = c.a
       |  JOIN sh sb ON sb.side = 'i' AND sb.doc_id = c.b AND sb.s = sa.s
       |  GROUP BY 1, 2),
       |win AS (SELECT DISTINCT b AS doc_id FROM wshared
       |  JOIN cnt ca ON ca.doc_id = a
       |  JOIN cnt cb ON cb.doc_id = b
       |  WHERE inter / (ca.n + cb.n - inter) >= 0.8)
       |SELECT doc_id FROM corp WHERE side = 'i'
       |  AND doc_id NOT IN (SELECT doc_id FROM vsx)
       |  AND doc_id NOT IN (SELECT doc_id FROM win)
       |ORDER BY doc_id""".stripMargin
  }

  private val q104 =
    """WITH r AS (SELECT doc_id, lang,
      |    row_number() OVER (PARTITION BY lang
      |      ORDER BY md5(CAST(doc_id AS STRING)), doc_id) AS rk
      |  FROM documents WHERE lang IN ('en', 'de', 'fr'))
      |SELECT doc_id, lang FROM r
      |WHERE rk <= CASE lang WHEN 'en' THEN 50 WHEN 'de' THEN 20 ELSE 10 END
      |ORDER BY doc_id""".stripMargin

  private val q105 = {
    def nib(i: Int) =
      s"(instr('0123456789abcdef', substr(md5('mix:' || CAST(doc_id AS STRING)),$i,1)) - 1)"
    s"""SELECT doc_id, source FROM documents
       |WHERE source IN ('src0', 'src1', 'src2')
       |  AND (${nib(1)}*4096 + ${nib(2)}*256 + ${nib(3)}*16 + ${nib(4)}) / 65536.0
       |    < CASE source WHEN 'src0' THEN 1.0 WHEN 'src1' THEN 0.5 ELSE 0.25 END
       |ORDER BY doc_id""".stripMargin
  }

  private val q123 =
    """WITH a AS (SELECT
      |  round(corr(l_quantity, l_extendedprice), 4) + 0.0 AS r0,
      |  round(corr(l_quantity, l_discount), 4) + 0.0 AS r1,
      |  round(corr(l_quantity, l_tax), 4) + 0.0 AS r2,
      |  round(corr(l_extendedprice, l_discount), 4) + 0.0 AS r3,
      |  round(corr(l_extendedprice, l_tax), 4) + 0.0 AS r4,
      |  round(corr(l_discount, l_tax), 4) + 0.0 AS r5
      |FROM lineitem)
      |SELECT x, y, r FROM (
      |  SELECT 'l_quantity' AS x, 'l_extendedprice' AS y, r0 AS r FROM a
      |  UNION ALL SELECT 'l_quantity', 'l_discount', r1 FROM a
      |  UNION ALL SELECT 'l_quantity', 'l_tax', r2 FROM a
      |  UNION ALL SELECT 'l_extendedprice', 'l_discount', r3 FROM a
      |  UNION ALL SELECT 'l_extendedprice', 'l_tax', r4 FROM a
      |  UNION ALL SELECT 'l_discount', 'l_tax', r5 FROM a)
      |ORDER BY x, y""".stripMargin

  // MAD census, no rounding shim: quantile_cont pins the interpolation
  // the Spark scan implements (q64's gate), and |x−med| / 3·mad / the
  // strict > are single ieee ops on identical inputs
  private val q149 =
    """WITH m AS (SELECT event_type, quantile_cont(value, 0.5) AS med
      |  FROM events GROUP BY 1),
      |d AS (SELECT e.event_type, m.med, abs(e.value - m.med) AS dev
      |  FROM events e JOIN m ON e.event_type = m.event_type),
      |a AS (SELECT event_type, quantile_cont(dev, 0.5) AS mad
      |  FROM d GROUP BY 1)
      |SELECT d.event_type, d.med, a.mad,
      |  CAST(count(*) AS BIGINT) AS n,
      |  CAST(sum(CASE WHEN d.dev > a.mad * 3 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_out
      |FROM d JOIN a ON d.event_type = a.event_type
      |GROUP BY 1, 2, 3
      |ORDER BY 1""".stripMargin

  private val q175 =
    """WITH n AS (SELECT vec_id,
      |    sqrt(list_sum(list_transform(embedding,
      |      x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
      |  FROM embeddings)
      |SELECT CAST(count(*) AS BIGINT) AS n_vecs,
      |  round(avg(nrm), 4) AS avg_norm,
      |  round(min(nrm), 4) AS min_norm,
      |  round(max(nrm), 4) AS max_norm,
      |  round(quantile_cont(nrm, 0.25), 4) AS p25,
      |  round(quantile_cont(nrm, 0.5), 4) AS p50,
      |  round(quantile_cont(nrm, 0.75), 4) AS p75
      |FROM n""".stripMargin

  private val q182 =
    """WITH ex AS (SELECT label, vec_id, i AS dim,
      |    CAST(list_extract(embedding, i) AS DOUBLE) AS x
      |  FROM (SELECT label, vec_id, embedding,
      |      unnest(generate_series(1, len(embedding))) AS i
      |    FROM embeddings)),
      |cent AS (SELECT label, dim, avg(x) AS c
      |  FROM ex GROUP BY label, dim),
      |dist AS (SELECT ex.label, vec_id,
      |    sqrt(sum((x - c) * (x - c))) AS dist
      |  FROM ex JOIN cent ON cent.label = ex.label AND cent.dim = ex.dim
      |  GROUP BY ex.label, vec_id)
      |SELECT label, CAST(count(*) AS BIGINT) AS n_vecs,
      |  round(avg(dist), 4) AS mean_dist,
      |  round(max(dist), 4) AS max_dist
      |FROM dist GROUP BY label ORDER BY label""".stripMargin

  val sql: Map[String, String] = Map(
    "q175_embed_norms" -> q175,
    "q182_label_cohesion" -> q182,
    "q149_mad_outliers"   -> q149,
    "q123_corr_matrix"    -> q123,
    "q101_encode_vocab"   -> q101,
    "q102_quantiles_scan" -> q102,
    "q103_dedup_incr"     -> q103,
    "q104_mix_exact"      -> q104,
    "q105_mix_rate"       -> q105,
    "q79_ivf_ann"      -> q79,
    "q80_cohort"       -> q80,
    "q81_range_frame"  -> q81,
    "q82_cume_dist"    -> q82,
    "q83_arg_minmax"   -> q83,
    "q84_regexp"       -> q84,
    "q85_array_hof"    -> q85,
    "q86_posexplode"   -> q86,
    "q87_date_spine"   -> q87,
    "q88_grouping_id"  -> q88,
    "q89_salted_join"  -> q89,
    "q90_asof_forward" -> q90,
    "q91_bool_bit_agg" -> q91,
    "q92_histogram"    -> q92,
    "q93_str_funcs2"   -> q93,
    "q94_profile"      -> q94,
    "q95_seq_gaps"     -> q95,
    "q96_encode"       -> q96,
    "q97_quantiles_dist" -> q97,
    "q98_array_setops" -> q98,
    "q99_null_battery" -> q99,
    "q100_weighted_agg" -> q100)
}
