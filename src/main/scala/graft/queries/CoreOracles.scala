package graft.queries

/** DuckDB oracle SQL for q01–q45 (SURVEY.md §2.9). One entry per query in
  * [[CoreQueries]]; column names/aliases match the Spark output exactly
  * (the driver sorts columns by name before hashing).
  *
  * Parity conventions (SURVEY §7.5-3):
  *  - every query has a total-order ORDER BY;
  *  - NULLS FIRST is explicit wherever a sort key is nullable (DuckDB
  *    defaults to NULLS LAST for ASC, Spark to NULLS FIRST);
  *  - integer-producing scalars are CAST to BIGINT (year/length/row_number
  *    return BIGINT in DuckDB, INT in Spark — Spark side casts to long);
  *  - double aggregates are rounded (2 for money, 4 for ratios);
  *  - double→string goes through DECIMAL(18,2) so both engines render
  *    identically.
  */
object CoreOracles {

  val sql: Map[String, String] = Map(
    "q01_scan_project" ->
      "SELECT r_regionkey, r_name FROM region ORDER BY r_regionkey",

    "q02_filter_pred" ->
      """SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
        |WHERE l_quantity > 30 AND l_discount < 0.05
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q03_filter_in_like" ->
      """SELECT p_partkey, p_name, p_type, p_size FROM part
        |WHERE p_type LIKE '%a%' AND p_size IN (1, 5, 10, 15)
        |ORDER BY p_partkey""".stripMargin,

    "q04_topk" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin,

    "q05_sort_multi" ->
      """SELECT c_custkey, c_name, c_mktsegment, c_acctbal FROM customer
        |ORDER BY c_mktsegment ASC, c_acctbal DESC, c_custkey LIMIT 50""".stripMargin,

    "q06_distinct" ->
      "SELECT DISTINCT c_mktsegment FROM customer ORDER BY c_mktsegment",

    "q07_union_all" ->
      """SELECT name FROM (
        |  SELECT n_name AS name FROM nation
        |  UNION ALL
        |  SELECT r_name AS name FROM region)
        |ORDER BY name""".stripMargin,

    "q08_union_distinct" ->
      """SELECT name FROM (
        |  SELECT n_name AS name FROM nation
        |  UNION
        |  SELECT r_name AS name FROM region)
        |ORDER BY name""".stripMargin,

    "q09_intersect" ->
      """SELECT nationkey FROM (
        |  SELECT s_nationkey AS nationkey FROM supplier
        |  INTERSECT
        |  SELECT c_nationkey AS nationkey FROM customer)
        |ORDER BY nationkey""".stripMargin,

    "q10_except" ->
      """SELECT nationkey FROM (
        |  SELECT n_nationkey AS nationkey FROM nation
        |  EXCEPT
        |  SELECT s_nationkey AS nationkey FROM supplier)
        |ORDER BY nationkey""".stripMargin,

    "q11_join_inner" ->
      """SELECT c_custkey, c_name, o_orderkey, round(o_totalprice, 2) AS totalprice
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |ORDER BY o_orderkey""".stripMargin,

    "q12_join_broadcast" ->
      """SELECT n_nationkey, n_name, r_name
        |FROM nation JOIN region ON n_regionkey = r_regionkey
        |ORDER BY n_nationkey""".stripMargin,

    "q13_join_left" ->
      """SELECT c_custkey, o_orderkey
        |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |ORDER BY c_custkey, o_orderkey NULLS FIRST""".stripMargin,

    "q14_join_full" ->
      """SELECT s_suppkey, c_custkey
        |FROM supplier FULL JOIN customer ON s_nationkey = c_nationkey
        |ORDER BY s_suppkey NULLS FIRST, c_custkey NULLS FIRST""".stripMargin,

    "q15_join_semi" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin,

    "q16_join_anti" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin,

    "q17_join_theta" ->
      """SELECT s_suppkey, n_nationkey, s_name, n_name
        |FROM supplier, nation
        |WHERE s_nationkey < n_nationkey AND n_nationkey <= 3
        |ORDER BY s_suppkey, n_nationkey""".stripMargin,

    "q18_join_cross" ->
      """SELECT r_name, CAST(count(*) AS BIGINT) AS n
        |FROM region CROSS JOIN supplier
        |GROUP BY r_name ORDER BY r_name""".stripMargin,

    "q19_agg_global" ->
      """SELECT CAST(count(*) AS BIGINT) AS n,
        |  round(sum(l_extendedprice), 2) AS sum_price,
        |  round(avg(l_discount), 4) AS avg_disc,
        |  min(l_quantity) AS min_qty,
        |  max(l_quantity) AS max_qty
        |FROM lineitem""".stripMargin,

    "q20_agg_group" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(count(*) AS BIGINT) AS n,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue
        |FROM lineitem
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q21_agg_having" ->
      """SELECT o_custkey, CAST(count(*) AS BIGINT) AS n
        |FROM orders GROUP BY o_custkey HAVING count(*) >= 2
        |ORDER BY o_custkey""".stripMargin,

    "q22_count_distinct" ->
      """SELECT l_returnflag, CAST(count(DISTINCT l_partkey) AS BIGINT) AS nd
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q23_rollup" ->
      """SELECT o_orderstatus, o_orderpriority, CAST(count(*) AS BIGINT) AS n
        |FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
        |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin,

    "q24_cube" ->
      """SELECT o_orderstatus, o_orderpriority, CAST(count(*) AS BIGINT) AS n
        |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
        |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin,

    "q25_grouping_sets" ->
      """SELECT o_orderstatus, o_orderpriority, CAST(count(*) AS BIGINT) AS n
        |FROM orders GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
        |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin,

    "q26_window_rank" ->
      """SELECT c_custkey, c_mktsegment, c_acctbal,
        |  CAST(row_number() OVER w AS BIGINT) AS rn,
        |  CAST(rank() OVER w AS BIGINT) AS rnk,
        |  CAST(dense_rank() OVER w AS BIGINT) AS drnk
        |FROM customer
        |WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey)
        |ORDER BY c_custkey""".stripMargin,

    "q27_window_running" ->
      """SELECT o_custkey, o_orderkey,
        |  round(sum(o_totalprice) OVER (PARTITION BY o_custkey
        |    ORDER BY o_orderdate, o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running
        |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin,

    "q28_window_lag" ->
      """SELECT o_custkey, o_orderkey,
        |  lag(o_orderkey, 1) OVER w AS prev_key,
        |  lead(o_orderkey, 1) OVER w AS next_key
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,

    "q29_window_ntile" ->
      """SELECT c_custkey, c_acctbal,
        |  CAST(ntile(4) OVER w AS BIGINT) AS quartile,
        |  round(percent_rank() OVER w, 4) AS pr
        |FROM customer
        |WINDOW w AS (ORDER BY c_acctbal, c_custkey)
        |ORDER BY c_custkey""".stripMargin,

    "q78_rank_dist" ->
      """SELECT c_custkey, c_acctbal,
        |  CAST(ntile(4) OVER w AS BIGINT) AS quartile,
        |  round(percent_rank() OVER w, 4) AS pr
        |FROM customer
        |WINDOW w AS (ORDER BY c_acctbal, c_custkey)
        |ORDER BY c_custkey""".stripMargin,

    "q30_str_funcs" ->
      """SELECT p_partkey,
        |  upper(p_brand) AS brand_u,
        |  lower(p_name) AS name_l,
        |  substring(p_type, 1, 5) AS type_pre,
        |  CAST(length(p_name) AS BIGINT) AS name_len,
        |  p_brand || '_' || p_type AS brand_type,
        |  replace(p_type, ' ', '_') AS type_us,
        |  trim('  ' || p_name || '  ') AS name_trim
        |FROM part ORDER BY p_partkey LIMIT 50""".stripMargin,

    "q31_date_funcs" ->
      """SELECT o_orderkey,
        |  CAST(year(o_orderdate) AS BIGINT) AS y,
        |  CAST(month(o_orderdate) AS BIGINT) AS m,
        |  CAST(day(o_orderdate) AS BIGINT) AS dom,
        |  date_trunc('month', o_orderdate) AS month_start,
        |  CAST(CAST(o_orderdate AS DATE) AS STRING) AS od_str
        |FROM orders ORDER BY o_orderkey LIMIT 100""".stripMargin,

    "q32_math_funcs" ->
      """SELECT l_orderkey, l_linenumber,
        |  round(l_extendedprice, 1) AS price_r1,
        |  abs(l_discount - 0.05) AS disc_dist,
        |  CAST(ceil(l_quantity) AS DOUBLE) AS qty_ceil,
        |  CAST(floor(l_quantity) AS DOUBLE) AS qty_floor,
        |  l_linenumber % 3 AS ln_mod3,
        |  round(sqrt(l_quantity), 4) AS qty_sqrt
        |FROM lineitem ORDER BY l_orderkey, l_linenumber LIMIT 100""".stripMargin,

    "q33_case_coalesce" ->
      """SELECT c_custkey,
        |  CASE WHEN c_acctbal < 0 THEN 'neg'
        |       WHEN c_acctbal < 1000 THEN 'low'
        |       ELSE 'high' END AS bal_band,
        |  coalesce(c_name, 'Unknown') AS name_or_default,
        |  nullif(c_mktsegment, 'BUILDING') AS seg_nullif
        |FROM customer ORDER BY c_custkey""".stripMargin,

    "q34_cast" ->
      """SELECT l_orderkey, l_linenumber,
        |  CAST(floor(l_quantity) AS BIGINT) AS qty_int,
        |  CAST(CAST(floor(l_quantity) AS BIGINT) AS STRING) AS qty_str,
        |  CAST(CAST(round(l_extendedprice, 2) AS DECIMAL(18,2)) AS STRING) AS price_str,
        |  l_returnflag = 'R' AS is_return
        |FROM lineitem ORDER BY l_orderkey, l_linenumber LIMIT 100""".stripMargin,

    "q35_array_ops" ->
      """SELECT vec_id,
        |  CAST(len(embedding) AS BIGINT) AS dim,
        |  round(CAST(list_extract(embedding, 1) AS DOUBLE), 4) AS e1,
        |  label
        |FROM embeddings ORDER BY vec_id LIMIT 100""".stripMargin,

    "q36_explode" ->
      """SELECT doc_id, word FROM (
        |  SELECT doc_id, unnest(string_split(trim(text), ' ')) AS word
        |  FROM documents WHERE doc_id < 20)
        |WHERE word <> '' ORDER BY doc_id, word""".stripMargin,

    "q37_json" ->
      """SELECT event_id,
        |  CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
        |FROM events ORDER BY event_id LIMIT 100""".stripMargin,

    "q38_upsert_latest" ->
      """SELECT o_custkey, o_orderkey, o_totalprice FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_custkey
        |      ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
        |  FROM orders)
        |WHERE rn = 1 ORDER BY o_custkey""".stripMargin,

    "q39_topk_group" ->
      """SELECT o_orderpriority, CAST(rnk AS BIGINT) AS rnk, o_orderkey, o_totalprice
        |FROM (
        |  SELECT o_orderpriority, o_orderkey, o_totalprice,
        |    rank() OVER (PARTITION BY o_orderpriority
        |      ORDER BY o_totalprice DESC, o_orderkey) AS rnk
        |  FROM orders)
        |WHERE rnk <= 3 ORDER BY o_orderpriority, rnk, o_orderkey""".stripMargin,

    "q40_time_bucket" ->
      """SELECT date_trunc('hour', ts) AS bucket,
        |  CAST(count(*) AS BIGINT) AS n,
        |  round(sum(value), 2) AS sum_value
        |FROM events GROUP BY bucket ORDER BY bucket""".stripMargin,

    "q41_dedup_exact" ->
      """SELECT min(doc_id) AS doc_id, md5(lower(trim(text))) AS h
        |FROM documents GROUP BY h ORDER BY doc_id""".stripMargin,

    "q42_text_topwords" ->
      """SELECT word, CAST(count(*) AS BIGINT) AS n FROM (
        |  SELECT unnest(string_split(trim(text), ' ')) AS word FROM documents)
        |WHERE word <> '' GROUP BY word
        |ORDER BY n DESC, word LIMIT 20""".stripMargin,

    "q43_similarity" ->
      """WITH e AS (
        |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
        |pairs AS (
        |  SELECT p.vec_id AS probe, c.vec_id AS cand,
        |    round(list_dot_product(p.v, c.v) /
        |      (sqrt(list_dot_product(p.v, p.v)) * sqrt(list_dot_product(c.v, c.v))), 4) AS sim
        |  FROM e p, e c
        |  WHERE p.vec_id < 5 AND c.vec_id >= 5 AND c.vec_id < 100),
        |ranked AS (
        |  SELECT probe, cand, sim,
        |    CAST(row_number() OVER (PARTITION BY probe
        |      ORDER BY sim DESC, cand) AS BIGINT) AS rank
        |  FROM pairs)
        |SELECT probe, cand, sim, rank FROM ranked
        |WHERE rank <= 5 ORDER BY probe, rank""".stripMargin,

    "q44_multi_join_agg" ->
      """SELECT r_name, round(sum(o_totalprice), 2) AS revenue
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name ORDER BY r_name""".stripMargin,

    "q45_subquery_agg" ->
      """SELECT c_custkey, c_name, c_acctbal FROM customer
        |WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer)
        |ORDER BY c_custkey""".stripMargin,

    "q56_join_right" ->
      """SELECT c_custkey, o_orderkey
        |FROM orders RIGHT JOIN customer ON o_custkey = c_custkey
        |ORDER BY c_custkey, o_orderkey NULLS FIRST""".stripMargin,

    "q57_between_isnull" ->
      """SELECT c_custkey, c_acctbal
        |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |WHERE o_orderkey IS NULL AND c_acctbal BETWEEN 0 AND 5000
        |ORDER BY c_custkey""".stripMargin,

    "q65_pivot" ->
      """SELECT user_id,
        |  CAST(count(CASE WHEN event_type = 'click' THEN 1 END) AS BIGINT) AS n_click,
        |  CAST(count(CASE WHEN event_type = 'error' THEN 1 END) AS BIGINT) AS n_error,
        |  CAST(count(CASE WHEN event_type = 'purchase' THEN 1 END) AS BIGINT) AS n_purchase,
        |  CAST(count(CASE WHEN event_type = 'signup' THEN 1 END) AS BIGINT) AS n_signup,
        |  CAST(count(CASE WHEN event_type = 'view' THEN 1 END) AS BIGINT) AS n_view
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,

    "q66_string_agg" ->
      """SELECT r_name, array_to_string(list_sort(list(n_name)), ',') AS nations
        |FROM nation JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name ORDER BY r_name""".stripMargin,

    "q67_filter_agg" ->
      """SELECT o_orderpriority,
        |  CAST(count(*) AS BIGINT) AS n,
        |  CAST(count(*) FILTER (WHERE o_orderstatus = 'F') AS BIGINT) AS n_f,
        |  CAST(count(*) FILTER (WHERE o_totalprice > 200000) AS BIGINT) AS n_big,
        |  round(avg(o_totalprice) FILTER (WHERE o_orderstatus = 'O'), 2) AS avg_open
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q68_window_nav" ->
      """SELECT o_custkey, o_orderkey,
        |  first_value(o_orderkey) OVER w AS first_key,
        |  last_value(o_orderkey) OVER w AS last_key,
        |  nth_value(o_orderkey, 2) OVER w AS second_key
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,

    "q69_exists_subq" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |              WHERE o_custkey = c_custkey AND o_totalprice > 300000)
        |  AND NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey AND o_totalprice < 50000)
        |ORDER BY c_custkey""".stripMargin,

    "q77_stats" ->
      """SELECT l_returnflag,
        |  round(stddev_samp(l_quantity), 4) AS sd_qty,
        |  round(var_samp(l_quantity), 4) AS var_qty,
        |  round(corr(l_quantity, l_extendedprice), 6) + 0.0 AS corr_qp,
        |  round(covar_samp(l_quantity, l_extendedprice), 2) + 0.0 AS cov_qp
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    // portable long-form of UNPIVOT (UNION ALL) — semantically what
    // Spark's Expand emits
    "q70_unpivot" ->
      """SELECT p_partkey, attr, val FROM (
        |  SELECT p_partkey, 'p_size' AS attr, CAST(p_size AS DOUBLE) AS val FROM part
        |  UNION ALL
        |  SELECT p_partkey, 'p_retailprice', p_retailprice FROM part)
        |ORDER BY p_partkey, attr""".stripMargin
  )
}
