package graft.queries

/** DuckDB oracle SQL for the temporal queries q61–q64. Interval math is
  * integer microseconds (`epoch_us`) to mirror Spark's `unix_micros` —
  * no float epoch arithmetic on either side. q61 uses DuckDB's native
  * ASOF JOIN, which implements exactly the greatest-ts-at-or-before
  * semantics of [[graft.operators.Temporal.asofJoin]]. */
object TemporalOracles {

  private val q61 =
    """WITH v AS (SELECT user_id, ts, max(event_id) AS view_id
      |  FROM events WHERE event_type = 'view' GROUP BY 1, 2),
      |c AS (SELECT event_id AS click_id, user_id, ts
      |  FROM events WHERE event_type = 'click')
      |SELECT c.click_id, c.user_id, c.ts AS click_ts,
      |       v.ts AS view_ts, v.view_id
      |FROM c ASOF JOIN v ON c.user_id = v.user_id AND v.ts <= c.ts
      |ORDER BY click_id""".stripMargin

  // the oracle is the PURE semantic theta join — the Spark side's bucket
  // binning is an implementation detail it must be indistinguishable from
  private val q62 =
    """WITH p AS (SELECT a.user_id, a.event_id AS a_id, x.event_id AS b_id
      |  FROM events a JOIN events x
      |  ON a.user_id = x.user_id AND a.event_id < x.event_id
      |    AND abs(epoch_us(x.ts) - epoch_us(a.ts)) <= 21600000000)
      |SELECT user_id, CAST(count(*) AS BIGINT) AS n_pairs
      |FROM p GROUP BY user_id ORDER BY user_id""".stripMargin

  private val q63 =
    """WITH x AS (SELECT user_id, ts,
      |    lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev
      |  FROM events),
      |y AS (SELECT user_id, ts, CASE WHEN prev IS NULL
      |    OR epoch_us(ts) - epoch_us(prev) > 21600000000
      |    THEN 1 ELSE 0 END AS nw FROM x),
      |z AS (SELECT user_id, ts, sum(nw) OVER (PARTITION BY user_id
      |    ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sid FROM y)
      |SELECT user_id, min(ts) AS session_start, max(ts) AS session_end,
      |       CAST(count(*) AS BIGINT) AS n_events
      |FROM z GROUP BY user_id, sid
      |ORDER BY user_id, session_start""".stripMargin

  private val q64 =
    """SELECT l_returnflag,
      |  round(quantile_cont(l_quantity, 0.5), 4) AS med_qty,
      |  round(quantile_cont(l_extendedprice, 0.25), 4) AS p25_price,
      |  round(quantile_cont(l_extendedprice, 0.75), 4) AS p75_price
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  private val q121 =
    """WITH e AS (SELECT user_id, event_id, value, epoch_us(ts) AS us FROM events),
      |l AS (SELECT user_id, value,
      |    lead(us) OVER (PARTITION BY user_id ORDER BY us, event_id) - us AS w
      |  FROM e),
      |g AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n_intervals,
      |    sum(w) AS tw, sum(value * w) AS vw
      |  FROM l WHERE w IS NOT NULL GROUP BY user_id)
      |SELECT user_id, n_intervals, round(vw / tw, 4) AS twap
      |FROM g WHERE tw > 0 ORDER BY user_id""".stripMargin

  private val q122 =
    """WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
      |s AS (SELECT user_id, min(us) AS s_us FROM e
      |  WHERE event_type = 'signup' GROUP BY user_id),
      |c AS (SELECT DISTINCT s.user_id FROM s
      |  JOIN e p ON p.user_id = s.user_id AND p.event_type = 'purchase'
      |    AND p.us >= s.s_us AND p.us <= s.s_us + 604800000000),
      |g AS (SELECT s.user_id, CAST(make_timestamp(s.s_us) AS DATE) AS cohort_day,
      |    CASE WHEN c.user_id IS NULL THEN 0 ELSE 1 END AS conv
      |  FROM s LEFT JOIN c ON c.user_id = s.user_id)
      |SELECT CAST(cohort_day AS TIMESTAMP) AS cohort_day,
      |  CAST(count(*) AS BIGINT) AS n_signups,
      |  CAST(sum(conv) AS BIGINT) AS n_converted,
      |  round(sum(conv) / count(*), 4) AS rate
      |FROM g GROUP BY cohort_day ORDER BY cohort_day""".stripMargin

  private val q124 =
    """WITH e AS (SELECT user_id, event_id, event_type AS src,
      |    epoch_us(ts) AS us FROM events),
      |l AS (SELECT src, lead(src) OVER (PARTITION BY user_id
      |    ORDER BY us, event_id) AS dst FROM e),
      |c AS (SELECT src, dst, CAST(count(*) AS BIGINT) AS n
      |  FROM l WHERE dst IS NOT NULL GROUP BY src, dst)
      |SELECT src, dst, n,
      |  round(n / sum(n) OVER (PARTITION BY src), 4) AS p
      |FROM c ORDER BY src, dst""".stripMargin

  private val q126 =
    """WITH e AS (SELECT user_id, value, epoch_us(ts) AS us FROM events),
      |m AS (SELECT user_id, value, us,
      |    max(us) OVER (PARTITION BY user_id) AS last_us FROM e)
      |SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
      |  round(sum(value * pow(0.5, (last_us - us) / 86400000000.0)), 4)
      |    AS decayed
      |FROM m GROUP BY user_id ORDER BY user_id""".stripMargin

  // q61 with DuckDB's LEFT variant: unmatched clicks keep, null view
  // columns — the same text runs on Spark through the GraftSqlParser
  // ASOF bridge's outer form
  private val q147 =
    """WITH v AS (SELECT user_id, ts, max(event_id) AS view_id
      |  FROM events WHERE event_type = 'view' GROUP BY 1, 2),
      |c AS (SELECT event_id AS click_id, user_id, ts
      |  FROM events WHERE event_type = 'click')
      |SELECT c.click_id, c.user_id, c.ts AS click_ts,
      |       v.ts AS view_ts, v.view_id
      |FROM c ASOF LEFT JOIN v ON c.user_id = v.user_id AND v.ts <= c.ts
      |ORDER BY click_id""".stripMargin

  // LOCF via the dialect-portable count-partition trick: count(v) OVER
  // (.. ORDER BY day) is constant within each carry group (it bumps only
  // on non-null days), and max(v) over (user, grp) extracts the group's
  // single non-null value — `IGNORE NULLS` has no spelling both parsers
  // accept. unnest() must sit bare in its SELECT (Spark generators are
  // top-level-only), so the DATE re-cast lives in the next CTE.
  private val q148 =
    """WITH e AS (SELECT user_id, CAST(ts AS DATE) AS day,
      |    CAST(floor(value * 1000000) AS BIGINT) AS vm FROM events),
      |d AS (SELECT user_id, day, CAST(sum(vm) AS BIGINT) AS v
      |  FROM e GROUP BY 1, 2),
      |b AS (SELECT user_id, min(day) AS d0, max(day) AS d1
      |  FROM e GROUP BY 1),
      |sp0 AS (SELECT user_id,
      |    unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS day FROM b),
      |sp AS (SELECT user_id, CAST(day AS DATE) AS day FROM sp0),
      |j AS (SELECT sp.user_id, sp.day, d.v FROM sp
      |  LEFT JOIN d ON d.user_id = sp.user_id AND d.day = sp.day),
      |g AS (SELECT user_id, day, v,
      |    count(v) OVER (PARTITION BY user_id ORDER BY day) AS grp
      |  FROM j)
      |SELECT user_id, CAST(day AS TIMESTAMP) AS day,
      |  max(v) OVER (PARTITION BY user_id, grp) AS v_filled,
      |  CAST(CASE WHEN v IS NULL THEN 1 ELSE 0 END AS BIGINT) AS is_gap
      |FROM g ORDER BY user_id, day""".stripMargin

  // q156: identical split point ((max_id+1)/2.0), identical bin
  // arithmetic ((v−lo)/((hi−lo)/10.0), floor, capped at 9), identical
  // add-half smoothing — IEEE-exact on both engines; ln natural log
  private val q156 =
    """WITH st AS (SELECT max(event_id) AS mx, min(value) AS lo,
      |    max(value) AS hi FROM events),
      |b AS (SELECT event_type,
      |    CASE WHEN event_id < (st.mx + 1) / 2.0 THEN 0 ELSE 1 END AS h,
      |    CAST(least(floor((value - st.lo) / ((st.hi - st.lo) / 10.0)),
      |      9) AS BIGINT) AS bin
      |  FROM events CROSS JOIN st),
      |c AS (SELECT event_type, bin,
      |    CAST(count(*) FILTER (WHERE h = 0) AS BIGINT) AS c0,
      |    CAST(count(*) FILTER (WHERE h = 1) AS BIGINT) AS c1
      |  FROM b GROUP BY 1, 2),
      |n AS (SELECT event_type, CAST(sum(c0) AS BIGINT) AS n0,
      |    CAST(sum(c1) AS BIGINT) AS n1
      |  FROM c GROUP BY 1)
      |SELECT c.event_type,
      |  round(sum(((c0 + 0.5) / (n0 + 5.0) - (c1 + 0.5) / (n1 + 5.0))
      |    * ln(((c0 + 0.5) / (n0 + 5.0)) / ((c1 + 0.5) / (n1 + 5.0)))), 4)
      |    AS psi
      |FROM c JOIN n ON n.event_type = c.event_type
      |GROUP BY 1 ORDER BY 1""".stripMargin

  // q163: identical fraction-of-max split points ((mx+1)·0.6/0.7 in
  // double — exact IEEE both engines), leak census on DISTINCT
  // (type, user) pairs
  private val q163 =
    """WITH mx AS (SELECT max(event_id) AS mx FROM events),
      |seg AS (SELECT event_type, user_id,
      |    CASE WHEN event_id < (mx.mx + 1) * 0.6 THEN 'train'
      |         WHEN event_id < (mx.mx + 1) * 0.7 THEN 'gap'
      |         ELSE 'test' END AS seg
      |  FROM events CROSS JOIN mx),
      |counts AS (SELECT event_type,
      |    CAST(sum(CASE WHEN seg = 'train' THEN 1 ELSE 0 END) AS BIGINT)
      |      AS n_train,
      |    CAST(sum(CASE WHEN seg = 'gap' THEN 1 ELSE 0 END) AS BIGINT)
      |      AS n_gap,
      |    CAST(sum(CASE WHEN seg = 'test' THEN 1 ELSE 0 END) AS BIGINT)
      |      AS n_test
      |  FROM seg GROUP BY 1),
      |u AS (SELECT DISTINCT event_type, user_id, seg FROM seg
      |  WHERE seg <> 'gap'),
      |leaked AS (SELECT t.event_type,
      |    CAST(count(*) AS BIGINT) AS n_leaked_users
      |  FROM (SELECT event_type, user_id FROM u WHERE seg = 'train') t
      |  JOIN (SELECT event_type, user_id FROM u WHERE seg = 'test') s
      |    ON s.event_type = t.event_type AND s.user_id = t.user_id
      |  GROUP BY 1)
      |SELECT counts.event_type, n_train, n_gap, n_test,
      |  coalesce(n_leaked_users, 0) AS n_leaked_users
      |FROM counts LEFT JOIN leaked ON leaked.event_type = counts.event_type
      |ORDER BY 1""".stripMargin

  // q166: identical percent_rank semantics ((rank−1)/(n−1), both
  // engines), identical quantile_cont bracket interpolation; the
  // oracle's global row_number window is the single-task shape the
  // Spark face's distributed exact ranking replaces
  private val q166 =
    """WITH g AS (SELECT value AS gv,
      |    CAST(row_number() OVER (ORDER BY value) - 1 AS BIGINT) AS i
      |  FROM events),
      |n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM events),
      |r AS (SELECT event_id, event_type, value,
      |    percent_rank() OVER (PARTITION BY event_type ORDER BY value)
      |      AS pr
      |  FROM events),
      |p AS (SELECT event_id, event_type, value, pr * (n.n - 1) AS pos
      |  FROM r CROSS JOIN n),
      |j AS (SELECT event_id, event_type, value, pos,
      |    CAST(floor(pos) AS BIGINT) AS lo,
      |    CAST(ceil(pos) AS BIGINT) AS hi
      |  FROM p)
      |SELECT j.event_id, j.event_type, j.value,
      |  floor((glo.gv + (j.pos - j.lo) * (ghi.gv - glo.gv)) * 10000)
      |    / 10000 AS value_norm
      |FROM j JOIN g glo ON glo.i = j.lo JOIN g ghi ON ghi.i = j.hi
      |ORDER BY event_id""".stripMargin

  private val q174 =
    """WITH ua AS (SELECT event_type, user_id, CAST(count(*) AS BIGINT) AS x
      |  FROM events GROUP BY event_type, user_id),
      |rk AS (SELECT *, CAST(row_number() OVER
      |    (PARTITION BY event_type ORDER BY x, user_id) AS BIGINT) AS i
      |  FROM ua),
      |agg AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_users,
      |    CAST(sum(x) AS BIGINT) AS n_events,
      |    CAST(sum(x * i) AS BIGINT) AS sxi
      |  FROM rk GROUP BY event_type)
      |SELECT event_type, n_users, n_events,
      |  floor((2 * sxi - (n_users + 1) * n_events) * 10000.0
      |    / (n_users * n_events)) / 10000.0 AS gini
      |FROM agg ORDER BY event_type""".stripMargin

  private val q176 =
    """WITH hc AS (SELECT event_type, CAST(hour(ts) AS BIGINT) AS hh,
      |    CAST(count(*) AS BIGINT) AS n
      |  FROM events GROUP BY event_type, hour(ts)),
      |tot AS (SELECT event_type, CAST(sum(n) AS BIGINT) AS tot
      |  FROM hc GROUP BY event_type)
      |SELECT hc.event_type, hh, n,
      |  floor(n * 10000.0 / tot) / 10000.0 AS share
      |FROM hc JOIN tot ON tot.event_type = hc.event_type
      |ORDER BY hc.event_type, hh""".stripMargin

  private val q177 =
    """WITH e AS (SELECT user_id, event_id, event_type AS src,
      |    epoch_us(ts) AS us FROM events),
      |l AS (SELECT src, lead(src) OVER (PARTITION BY user_id
      |    ORDER BY us, event_id) AS dst FROM e),
      |c AS (SELECT src, dst, CAST(count(*) AS BIGINT) AS n
      |  FROM l WHERE dst IS NOT NULL GROUP BY src, dst),
      |cp AS (SELECT src, n, sum(n) OVER (PARTITION BY src) AS tot
      |  FROM c),
      |bysrc AS (SELECT src, CAST(max(tot) AS BIGINT) AS n_out,
      |    -sum((n / tot) * ln(n / tot)) AS h
      |  FROM cp GROUP BY src),
      |rate AS (SELECT sum(h * n_out / nn) AS rate FROM bysrc
      |  CROSS JOIN (SELECT sum(n_out) AS nn FROM bysrc))
      |SELECT src, n_out, round(h, 4) AS entropy,
      |  round(rate, 4) AS entropy_rate
      |FROM bysrc CROSS JOIN rate ORDER BY src""".stripMargin

  private val q179 =
    """WITH e AS (SELECT user_id, event_id, event_type, value,
      |    epoch_us(ts) AS us FROM events),
      |l AS (SELECT event_type, value, lag(value) OVER
      |    (PARTITION BY user_id ORDER BY us, event_id) AS prev FROM e),
      |m AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_pairs,
      |    sum(value) AS sx, sum(prev) AS sy, sum(value * prev) AS sxy,
      |    sum(value * value) AS sxx, sum(prev * prev) AS syy
      |  FROM l WHERE prev IS NOT NULL GROUP BY event_type)
      |SELECT event_type, n_pairs,
      |  round((n_pairs * sxy - sx * sy) /
      |    sqrt((n_pairs * sxx - sx * sx) * (n_pairs * syy - sy * sy)), 4)
      |    + 0.0 AS lag1_corr
      |FROM m ORDER BY event_type""".stripMargin

  private val q180 =
    """WITH cnt AS (SELECT value,
      |    CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
      |      AS BIGINT) AS c1,
      |    CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
      |      AS BIGINT) AS c2
      |  FROM events WHERE event_type IN ('click', 'view')
      |  GROUP BY value),
      |r AS (SELECT value,
      |    CAST(sum(c1) OVER (ORDER BY value) AS BIGINT) AS cum1,
      |    CAST(sum(c2) OVER (ORDER BY value) AS BIGINT) AS cum2
      |  FROM cnt),
      |tot AS (SELECT CAST(sum(c1) AS BIGINT) AS n1,
      |    CAST(sum(c2) AS BIGINT) AS n2 FROM cnt)
      |SELECT n1, n2,
      |  floor(max(abs(cum1 / n1 - cum2 / n2)) * 10000.0)
      |    / 10000.0 AS ks_d
      |FROM r CROSS JOIN tot GROUP BY n1, n2""".stripMargin

  // q188 Mann-Whitney AUC, click vs view: q180's distinct-value frame,
  // AUC = Σ_v (c1/n1)·((cum2−c2)/n2 + c2/(2·n2)) — exact-long
  // numerators, one IEEE division per side (the overflow-free shape),
  // round-4 + 0.0 on the summed statistic (§2.9).
  private val q188 =
    """WITH cnt AS (SELECT value,
      |    CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
      |      AS BIGINT) AS c1,
      |    CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
      |      AS BIGINT) AS c2
      |  FROM events WHERE event_type IN ('click', 'view')
      |  GROUP BY value),
      |r AS (SELECT value, c1, c2,
      |    CAST(sum(c1) OVER (ORDER BY value) AS BIGINT) AS cum1,
      |    CAST(sum(c2) OVER (ORDER BY value) AS BIGINT) AS cum2
      |  FROM cnt),
      |tot AS (SELECT CAST(sum(c1) AS BIGINT) AS n1,
      |    CAST(sum(c2) AS BIGINT) AS n2 FROM cnt)
      |SELECT n1, n2,
      |  round(sum((c1 / n1) * ((cum2 - c2) / n2 + c2 / (2.0 * n2))), 4)
      |    + 0.0 AS auc
      |FROM r CROSS JOIN tot GROUP BY n1, n2""".stripMargin

  // q192 tie-corrected Spearman (value vs hour-of-day per type):
  // average ranks via per-type cumulative distinct-value counts —
  // `cum − c + (c+1)/2.0` mirrors the Spark rebase arithmetic — then
  // the Pearson closed form over the ranks in ONE deterministic IEEE
  // evaluation (all six sums are exact quarter-integers); round-4
  // + 0.0 on the cancellable ratio.
  private val q192 =
    """WITH ev AS (SELECT event_type, value,
      |    CAST(hour(ts) AS BIGINT) AS hh FROM events),
      |cv AS (SELECT event_type, value, CAST(count(*) AS BIGINT) AS cv
      |  FROM ev GROUP BY event_type, value),
      |rv AS (SELECT event_type, value,
      |    CAST(sum(cv) OVER (PARTITION BY event_type ORDER BY value)
      |      AS BIGINT) - cv + (cv + 1) / 2.0 AS rx
      |  FROM cv),
      |ch AS (SELECT event_type, hh, CAST(count(*) AS BIGINT) AS ch
      |  FROM ev GROUP BY event_type, hh),
      |rh AS (SELECT event_type, hh,
      |    CAST(sum(ch) OVER (PARTITION BY event_type ORDER BY hh)
      |      AS BIGINT) - ch + (ch + 1) / 2.0 AS ry
      |  FROM ch),
      |st AS (SELECT ev.event_type,
      |    CAST(count(*) AS BIGINT) AS n_events,
      |    sum(rx) AS sx, sum(ry) AS sy,
      |    sum(rx * rx) AS sxx, sum(ry * ry) AS syy,
      |    sum(rx * ry) AS sxy
      |  FROM ev
      |  JOIN rv ON rv.event_type = ev.event_type AND rv.value = ev.value
      |  JOIN rh ON rh.event_type = ev.event_type AND rh.hh = ev.hh
      |  GROUP BY ev.event_type)
      |SELECT event_type, n_events,
      |  round((n_events * sxy - sx * sy) /
      |    sqrt((n_events * sxx - sx * sx) *
      |      (n_events * syy - sy * sy)), 4) + 0.0 AS rho
      |FROM st ORDER BY event_type""".stripMargin

  // q195 Kendall τ-b: the same cell-grid dominance construction as the
  // Spark face — 24 conditional count columns, 24 exclusive prefix
  // windows, per-cell (n/ntot)·((LT−GT)/(ntot−1)) terms, ties ratios
  // one-division-per-factor; round-4 + 0.0 on the cancellable sum.
  private val q195 = {
    val ccols = (0 until 24).map(h =>
      s"CAST(sum(CASE WHEN hh = $h THEN n ELSE 0 END) AS BIGINT) AS c$h")
      .mkString(",\n    ")
    val rcols = (0 until 24).map(h =>
      s"CAST(coalesce(sum(c$h) OVER (ORDER BY value ROWS BETWEEN " +
        s"UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS r$h")
      .mkString(",\n    ")
    val ltExpr = (0 until 24)
      .map(h => s"CASE WHEN hh > $h THEN r$h ELSE 0 END").mkString(" + ")
    val gtExpr = (0 until 24)
      .map(h => s"CASE WHEN hh < $h THEN r$h ELSE 0 END").mkString(" + ")
    s"""WITH ev AS (SELECT value, CAST(hour(ts) AS INT) AS hh FROM events),
       |cells AS (SELECT value, hh, CAST(count(*) AS BIGINT) AS n
       |  FROM ev GROUP BY value, hh),
       |wide AS (SELECT value,
       |    $ccols
       |  FROM cells GROUP BY value),
       |pref AS (SELECT value,
       |    $rcols
       |  FROM wide),
       |tot AS (SELECT CAST(count(*) AS BIGINT) AS ntot FROM ev),
       |num AS (SELECT sum((n / ntot) *
       |    ((($ltExpr) - ($gtExpr)) / (ntot - 1))) AS num
       |  FROM cells JOIN pref USING (value) CROSS JOIN tot),
       |t1 AS (SELECT sum((nk / ntot) * ((nk - 1) / (ntot - 1))) AS n1r
       |  FROM (SELECT CAST(count(*) AS BIGINT) AS nk FROM ev
       |    GROUP BY value) q CROSS JOIN tot),
       |t2 AS (SELECT sum((nk / ntot) * ((nk - 1) / (ntot - 1))) AS n2r
       |  FROM (SELECT CAST(count(*) AS BIGINT) AS nk FROM ev
       |    GROUP BY hh) q CROSS JOIN tot)
       |SELECT ntot AS n_events,
       |  round(2.0 * num / sqrt((1.0 - n1r) * (1.0 - n2r)), 4) + 0.0
       |    AS tau_b
       |FROM tot CROSS JOIN num CROSS JOIN t1 CROSS JOIN t2""".stripMargin
  }

  // q196 one-way ANOVA: per-type moments, closed-form SSB/SSW from
  // Σ Sᵢ²/nᵢ — identical parenthesization to the Spark face; round-4
  // + 0.0 on the cancellable ratios.
  private val q196 =
    """WITH m AS (SELECT event_type, CAST(count(*) AS BIGINT) AS nk,
      |    sum(value) AS sk, sum(value * value) AS qk
      |  FROM events GROUP BY event_type),
      |g AS (SELECT CAST(sum(nk) AS BIGINT) AS n, sum(sk) AS s,
      |    sum(qk) AS q, CAST(count(*) AS BIGINT) AS k,
      |    sum(sk * sk / nk) AS a
      |  FROM m),
      |d AS (SELECT n AS n_events, k AS n_groups,
      |    a - s * s / n AS ssb, q - a AS ssw, q - s * s / n AS sst,
      |    k - 1 AS df1, n - k AS df2 FROM g)
      |SELECT n_events, CAST(df1 AS BIGINT) AS df1,
      |  CAST(df2 AS BIGINT) AS df2,
      |  round((ssb / df1) / (ssw / df2), 4) + 0.0 AS f_stat,
      |  round(ssb / sst, 4) + 0.0 AS eta_sq
      |FROM d""".stripMargin

  // q206 higher moments: raw power sums, closed-form central moments
  // with IDENTICAL parenthesization to the Spark face; round-4 + 0.0.
  private val q206 =
    """WITH m AS (SELECT event_type, CAST(count(*) AS BIGINT) AS nk,
      |    sum(value) AS s1, sum(value * value) AS s2,
      |    sum(value * value * value) AS s3,
      |    sum(value * value * value * value) AS s4
      |  FROM events GROUP BY event_type),
      |mm AS (SELECT event_type, nk, s1 / nk AS mu, s2, s3, s4 FROM m),
      |c AS (SELECT event_type, nk, mu,
      |    s2 / nk - mu * mu AS m2,
      |    s3 / nk - 3 * mu * (s2 / nk) + 2 * mu * mu * mu AS m3,
      |    s4 / nk - 4 * mu * (s3 / nk) + 6 * mu * mu * (s2 / nk)
      |      - 3 * mu * mu * mu * mu AS m4
      |  FROM mm)
      |SELECT event_type, nk AS n_events,
      |  round(mu, 4) + 0.0 AS mean,
      |  round(sqrt(m2), 4) + 0.0 AS sd,
      |  round(m3 / pow(m2, 1.5), 4) + 0.0 AS skew,
      |  round(m4 / (m2 * m2) - 3, 4) + 0.0 AS kurt_excess
      |FROM c ORDER BY event_type""".stripMargin

  val sql: Map[String, String] = Map(
    "q174_activity_gini" -> q174,
    "q180_ks_test"       -> q180,
    "q188_auc_mw"        -> q188,
    "q192_spearman"      -> q192,
    "q195_kendall"       -> q195,
    "q196_anova"         -> q196,
    "q206_moments"       -> q206,
    "q176_hour_profile"  -> q176,
    "q177_markov_entropy" -> q177,
    "q179_lag_corr"      -> q179,
    "q166_quantile_norm" -> q166,
    "q163_purged_split" -> q163,
    "q156_psi_drift"  -> q156,
    "q148_gapfill"    -> q148,
    "q61_asof_join"   -> q61,
    "q147_asof_left"  -> q147,
    "q62_pairs_range" -> q62,
    "q63_sessionize"  -> q63,
    "q64_percentiles" -> q64,
    "q121_twap"       -> q121,
    "q122_funnel"     -> q122,
    "q124_transitions" -> q124,
    "q126_decay"      -> q126)
}
