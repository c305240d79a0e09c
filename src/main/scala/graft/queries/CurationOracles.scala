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

  /** Shared CTE: distinct word 3-gram shingles (requires t). */
  private val shCte =
    """sh AS (SELECT DISTINCT doc_id, toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS s
      |  FROM t, unnest(range(1, len(toks)-1)) AS u(i) WHERE len(toks) >= 3)""".stripMargin

  /** Shared CTE fragment: per-doc token positions (requires t). */
  private val posCte =
    """p AS (SELECT doc_id, u.i AS pos, toks[i] AS tok
      |  FROM t, unnest(range(1, len(toks)+1)) AS u(i) WHERE len(toks) >= 2)""".stripMargin

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
       |cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
       |inter AS (SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS inter
       |  FROM sh x JOIN sh y ON x.s = y.s AND x.doc_id < y.doc_id
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

  val sql: Map[String, String] = Map(
    "q106_bucket_join"    -> q106,
    "q107_bigram_lm"      -> q107,
    "q108_contamination"  -> q108,
    "q109_repetition"     -> q109,
    "q110_containment"    -> q110,
    "q111_quantize"       -> q111,
    "q112_len_quantiles"  -> q112)
}
