package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables._

/** The declared relational inventory (SURVEY.md §2.9, q01–q45).
  *
  * Capability surface derives from the reference's declared warehouse/ad-hoc
  * SQL layer (reference `README.md:21` — Athena/Redshift over the S3 lake,
  * `README.md:13` — upsert idempotency) re-expressed Spark-first: every query
  * is a declarative DataFrame program so Catalyst owns pushdown, join
  * strategy, partial aggregation and AQE re-planning.
  *
  * Determinism contract (required for the DuckDB differential oracle, and a
  * good idea at 100 TB where partition order is arbitrary): every query ends
  * in a total-order `ORDER BY` over a unique key set; double aggregates are
  * rounded; integer-producing scalars are cast to LONG to match DuckDB's
  * BIGINT defaults.
  *
  * Scale notes (local[32] tests, 1000-executor design):
  *  - dimension tables (region/nation/supplier ≤ O(100) rows/sf) are joined
  *    with an explicit `broadcast()` hint — no shuffle of the fact side;
  *  - fact-fact joins shuffle on the join key only after filters are pushed
  *    below the exchange (Catalyst does this; queries keep filters early);
  *  - aggregations rely on partial (map-side) aggregation, automatic for
  *    all hash aggregates here;
  *  - top-k is expressed as orderBy+limit which Catalyst plans as
  *    TakeOrderedAndProject — per-partition heap + driver merge of k rows,
  *    never a global sort (reference A2: server-side top-k,
  *    `etls/reddit_etl.py:49`).
  */
object CoreQueries {

  /** q01 scan+projection (reference A3 projection, `etls/reddit_etl.py:55`) */
  def q01(s: SparkSession, d: String): DataFrame =
    region(s, d).select(col("r_regionkey"), col("r_name"))
      .orderBy("r_regionkey")

  /** q02 conjunctive filter — pushed to the parquet scan. */
  def q02(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .filter(col("l_quantity") > 30 && col("l_discount") < 0.05)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
      .orderBy("l_orderkey", "l_linenumber")

  /** q03 filter IN / LIKE. */
  def q03(s: SparkSession, d: String): DataFrame =
    part(s, d)
      .filter(col("p_type").like("%a%") && col("p_size").isin(1, 5, 10, 15))
      .select(col("p_partkey"), col("p_name"), col("p_type"), col("p_size"))
      .orderBy("p_partkey")

  /** q04 top-k (reference A2 server-side top-k, `etls/reddit_etl.py:49`):
    * planned as TakeOrderedAndProject, never a full sort. */
  def q04(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .limit(10)

  /** q05 multi-key sort. */
  def q05(s: SparkSession, d: String): DataFrame =
    customer(s, d)
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"), col("c_acctbal"))
      .orderBy(col("c_mktsegment").asc, col("c_acctbal").desc, col("c_custkey").asc)
      .limit(50)

  /** q06 distinct. */
  def q06(s: SparkSession, d: String): DataFrame =
    customer(s, d).select(col("c_mktsegment")).distinct()
      .orderBy("c_mktsegment")

  /** q07 UNION ALL. */
  def q07(s: SparkSession, d: String): DataFrame =
    nation(s, d).select(col("n_name").as("name"))
      .unionAll(region(s, d).select(col("r_name").as("name")))
      .orderBy("name")

  /** q08 UNION DISTINCT. */
  def q08(s: SparkSession, d: String): DataFrame =
    nation(s, d).select(col("n_name").as("name"))
      .union(region(s, d).select(col("r_name").as("name")))
      .distinct()
      .orderBy("name")

  /** q09 INTERSECT. */
  def q09(s: SparkSession, d: String): DataFrame =
    supplier(s, d).select(col("s_nationkey").as("nationkey"))
      .intersect(customer(s, d).select(col("c_nationkey").as("nationkey")))
      .orderBy("nationkey")

  /** q10 EXCEPT. */
  def q10(s: SparkSession, d: String): DataFrame =
    nation(s, d).select(col("n_nationkey").as("nationkey"))
      .except(supplier(s, d).select(col("s_nationkey").as("nationkey")))
      .orderBy("nationkey")

  /** q11 inner equi-join; customer side auto-broadcast below threshold,
    * shuffle-hash/sort-merge on o_custkey beyond it (AQE decides). */
  def q11(s: SparkSession, d: String): DataFrame =
    orders(s, d).join(customer(s, d), col("o_custkey") === col("c_custkey"))
      .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
        round(col("o_totalprice"), 2).as("totalprice"))
      .orderBy("o_orderkey")

  /** q12 broadcast dimension join — region is ≤5 rows at every sf; the
    * explicit hint keeps the plan shuffle-free at any scale. */
  def q12(s: SparkSession, d: String): DataFrame =
    nation(s, d).join(broadcast(region(s, d)),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey"), col("n_name"), col("r_name"))
      .orderBy("n_nationkey")

  /** q13 left outer join. */
  def q13(s: SparkSession, d: String): DataFrame =
    customer(s, d).join(orders(s, d), col("c_custkey") === col("o_custkey"), "left")
      .select(col("c_custkey"), col("o_orderkey"))
      .orderBy(col("c_custkey").asc, col("o_orderkey").asc_nulls_first)

  /** q14 full outer join. */
  def q14(s: SparkSession, d: String): DataFrame =
    supplier(s, d).join(customer(s, d),
        col("s_nationkey") === col("c_nationkey"), "full")
      .select(col("s_suppkey"), col("c_custkey"))
      .orderBy(col("s_suppkey").asc_nulls_first, col("c_custkey").asc_nulls_first)

  /** q15 left semi (EXISTS). */
  def q15(s: SparkSession, d: String): DataFrame =
    customer(s, d).join(orders(s, d),
        col("c_custkey") === col("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name"))
      .orderBy("c_custkey")

  /** q16 left anti (NOT EXISTS). */
  def q16(s: SparkSession, d: String): DataFrame =
    customer(s, d).join(orders(s, d),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"))
      .orderBy("c_custkey")

  /** q17 theta (non-equi) join — broadcast-nested-loop on a tiny side. */
  def q17(s: SparkSession, d: String): DataFrame =
    supplier(s, d).join(broadcast(nation(s, d).filter(col("n_nationkey") <= 3)),
        col("s_nationkey") < col("n_nationkey"))
      .select(col("s_suppkey"), col("n_nationkey"), col("s_name"), col("n_name"))
      .orderBy("s_suppkey", "n_nationkey")

  /** q18 cross join + count. */
  def q18(s: SparkSession, d: String): DataFrame =
    region(s, d).crossJoin(supplier(s, d))
      .groupBy(col("r_name")).agg(count(lit(1)).as("n"))
      .orderBy("r_name")

  /** q19 global aggregate (partial+final agg; single exchange of one row
    * per partition). */
  def q19(s: SparkSession, d: String): DataFrame =
    lineitem(s, d).agg(
      count(lit(1)).as("n"),
      round(sum(col("l_extendedprice")), 2).as("sum_price"),
      round(avg(col("l_discount")), 4).as("avg_disc"),
      min(col("l_quantity")).as("min_qty"),
      max(col("l_quantity")).as("max_qty"))

  /** q20 TPC-H Q1-style hash aggregate — map-side partial agg shrinks the
    * shuffle to |groups|×partitions rows regardless of input size. */
  def q20(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        count(lit(1)).as("n"),
        round(sum(col("l_quantity")), 2).as("sum_qty"),
        round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
          .as("revenue"))
      .orderBy("l_returnflag", "l_linestatus")

  /** q21 aggregate + HAVING. */
  def q21(s: SparkSession, d: String): DataFrame =
    orders(s, d).groupBy(col("o_custkey")).agg(count(lit(1)).as("n"))
      .filter(col("n") >= 2)
      .orderBy("o_custkey")

  /** q22 count(distinct) per group — Catalyst expands to a two-phase
    * partial-distinct aggregate, no row explosion on the shuffle. */
  def q22(s: SparkSession, d: String): DataFrame =
    lineitem(s, d).groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_partkey")).as("nd"))
      .orderBy("l_returnflag")

  /** q23 ROLLUP. */
  def q23(s: SparkSession, d: String): DataFrame =
    orders(s, d).rollup(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("o_orderstatus").asc_nulls_first,
        col("o_orderpriority").asc_nulls_first)

  /** q24 CUBE. */
  def q24(s: SparkSession, d: String): DataFrame =
    orders(s, d).cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("o_orderstatus").asc_nulls_first,
        col("o_orderpriority").asc_nulls_first)

  /** q25 GROUPING SETS ((status),(priority)). */
  def q25(s: SparkSession, d: String): DataFrame = {
    orders(s, d).createOrReplaceTempView("graft_q25_orders")
    s.sql(
      """SELECT o_orderstatus, o_orderpriority, count(1) AS n
        |FROM graft_q25_orders
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
        |ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST
        |""".stripMargin)
  }

  /** q26 ranking window battery. */
  def q26(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("c_mktsegment"))
      .orderBy(col("c_acctbal").desc, col("c_custkey").asc)
    customer(s, d).select(
        col("c_custkey"), col("c_mktsegment"), col("c_acctbal"),
        row_number().over(w).cast("long").as("rn"),
        rank().over(w).cast("long").as("rnk"),
        dense_rank().over(w).cast("long").as("drnk"))
      .orderBy("c_custkey")
  }

  /** q27 running-sum frame aggregate. */
  def q27(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    orders(s, d).select(
        col("o_custkey"), col("o_orderkey"),
        round(sum(col("o_totalprice")).over(w), 2).as("running"))
      .orderBy("o_custkey", "o_orderkey")
  }

  /** q28 lag/lead. */
  def q28(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
    orders(s, d).select(
        col("o_custkey"), col("o_orderkey"),
        lag(col("o_orderkey"), 1).over(w).as("prev_key"),
        lead(col("o_orderkey"), 1).over(w).as("next_key"))
      .orderBy("o_custkey", "o_orderkey")
  }

  /** q29 ntile / percent_rank (custkey tiebreak keeps tile assignment
    * deterministic under acctbal ties), computed DISTRIBUTED —
    * [[graft.operators.Ranking.exactNtilePercentRank]] range-partitions
    * on the order key, sorts partitions in parallel, and rebases local
    * row numbers by driver prefix-summed partition counts (metadata-only
    * collect), yielding both distribution columns from ONE exchange.
    * The un-partitioned `ntile(4).over(Window.orderBy(...))` form pins
    * the same contract but funnels every row through one task — it was
    * retired to RankingSpec's cross-check ("match the single-task window
    * exactly"), and the oracle hash gate proved the two bit-identical
    * before the swap. [[graft.operators.Ranking.approxNtile]] is the
    * sketch-based alternative when approximate tiles suffice. */
  def q29(s: SparkSession, d: String): DataFrame = {
    val cust = customer(s, d).select(col("c_custkey"), col("c_acctbal"))
    graft.operators.Ranking.exactNtilePercentRank(cust,
        Seq("c_acctbal", "c_custkey"), 4,
        tileCol = "quartile", prCol = "__pr")
      .select(col("c_custkey"), col("c_acctbal"), col("quartile"),
        round(col("__pr"), 4).as("pr"))
      .orderBy("c_custkey")
  }

  /** q30 string scalar battery (reference A12/A13 defaults+trim,
    * `etls/reddit_etl.py:76-77`). */
  def q30(s: SparkSession, d: String): DataFrame =
    part(s, d).select(
        col("p_partkey"),
        upper(col("p_brand")).as("brand_u"),
        lower(col("p_name")).as("name_l"),
        substring(col("p_type"), 1, 5).as("type_pre"),
        length(col("p_name")).cast("long").as("name_len"),
        concat(col("p_brand"), lit("_"), col("p_type")).as("brand_type"),
        regexp_replace(col("p_type"), " ", "_").as("type_us"),
        trim(concat(lit("  "), col("p_name"), lit("  "))).as("name_trim"))
      .orderBy("p_partkey")
      .limit(50)

  /** q31 date/time scalar battery (reference A10 epoch→ISO,
    * `etls/reddit_etl.py:65-70`). */
  def q31(s: SparkSession, d: String): DataFrame =
    orders(s, d).select(
        col("o_orderkey"),
        year(col("o_orderdate")).cast("long").as("y"),
        month(col("o_orderdate")).cast("long").as("m"),
        dayofmonth(col("o_orderdate")).cast("long").as("dom"),
        date_trunc("month", col("o_orderdate")).cast("timestamp_ntz").as("month_start"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("od_str"))
      .orderBy("o_orderkey")
      .limit(100)

  /** q32 math scalar battery. */
  def q32(s: SparkSession, d: String): DataFrame =
    lineitem(s, d).select(
        col("l_orderkey"), col("l_linenumber"),
        round(col("l_extendedprice"), 1).as("price_r1"),
        abs(col("l_discount") - 0.05).as("disc_dist"),
        ceil(col("l_quantity")).cast("double").as("qty_ceil"),
        floor(col("l_quantity")).cast("double").as("qty_floor"),
        (col("l_linenumber") % 3).as("ln_mod3"),
        round(sqrt(col("l_quantity")), 4).as("qty_sqrt"))
      .orderBy("l_orderkey", "l_linenumber")
      .limit(100)

  /** q33 CASE / coalesce battery (reference A11–A14 default semantics,
    * `etls/reddit_etl.py:74-80`). */
  def q33(s: SparkSession, d: String): DataFrame =
    customer(s, d).select(
        col("c_custkey"),
        when(col("c_acctbal") < 0, lit("neg"))
          .when(col("c_acctbal") < 1000, lit("low"))
          .otherwise(lit("high")).as("bal_band"),
        coalesce(col("c_name"), lit("Unknown")).as("name_or_default"),
        nullif(col("c_mktsegment"), lit("BUILDING")).as("seg_nullif"))
      .orderBy("c_custkey")

  /** q34 cast battery (reference A11 int-cast semantics,
    * `etls/reddit_etl.py:74-75`). Decimal round-trip keeps double→string
    * rendering identical across engines. */
  def q34(s: SparkSession, d: String): DataFrame =
    lineitem(s, d).select(
        col("l_orderkey"), col("l_linenumber"),
        floor(col("l_quantity")).as("qty_int"),
        floor(col("l_quantity")).cast("string").as("qty_str"),
        round(col("l_extendedprice"), 2).cast("decimal(18,2)").cast("string")
          .as("price_str"),
        (col("l_returnflag") === "R").as("is_return"))
      .orderBy("l_orderkey", "l_linenumber")
      .limit(100)

  /** q35 array ops over 64-dim embeddings (C4). */
  def q35(s: SparkSession, d: String): DataFrame =
    embeddings(s, d).select(
        col("vec_id"),
        size(col("embedding")).cast("long").as("dim"),
        round(element_at(col("embedding"), 1).cast("double"), 4).as("e1"),
        col("label"))
      .orderBy("vec_id")
      .limit(100)

  /** q36 explode/unnest (C3). */
  def q36(s: SparkSession, d: String): DataFrame =
    documents(s, d).filter(col("doc_id") < 20)
      .select(col("doc_id"),
        explode(split(trim(col("text")), " ")).as("word"))
      .filter(col("word") =!= "")
      .orderBy("doc_id", "word")

  /** q37 JSON extraction (C4) on `events.props`. */
  def q37(s: SparkSession, d: String): DataFrame =
    events(s, d).select(
        col("event_id"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      .orderBy("event_id")
      .limit(100)

  /** q38 upsert / latest-wins dedup by key — the engine-side equivalent of
    * the reference's Redshift upsert (`README.md:13`, SURVEY §1.4). At scale
    * this is one shuffle on the key + per-partition window scan. */
  def q38(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
    orders(s, d)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
      .orderBy("o_custkey")
  }

  /** q39 top-k per group (rank + filter). */
  def q39(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    orders(s, d)
      .withColumn("rnk", rank().over(w))
      .filter(col("rnk") <= 3)
      .select(col("o_orderpriority"), col("rnk").cast("long").as("rnk"),
        col("o_orderkey"), col("o_totalprice"))
      .orderBy("o_orderpriority", "rnk", "o_orderkey")
  }

  /** q40 batch time-bucket aggregation (§2.4 batch face of the streaming
    * window). */
  def q40(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .groupBy(date_trunc("hour", col("ts")).cast("timestamp_ntz").as("bucket"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))
      .orderBy("bucket")

  /** q41 exact dedup by normalized content hash (C1). */
  def q41(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .groupBy(md5(lower(trim(col("text")))).as("h"))
      .agg(min(col("doc_id")).as("doc_id"))
      .select(col("doc_id"), col("h"))
      .orderBy("doc_id")

  /** q42 top-20 words by frequency (C3): explode → hash agg → top-k. */
  def q42(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .select(explode(split(trim(col("text")), " ")).as("word"))
      .filter(col("word") =!= "")
      .groupBy(col("word")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("word").asc)
      .limit(20)

  /** q43 brute-force cosine top-k similarity search (C2): higher-order
    * functions (`zip_with`+`aggregate`) keep the dot product inside
    * whole-stage codegen — no UDF. Probes are broadcast against the
    * candidate set, so at scale this is a map-only pass over candidates. */
  def q43(s: SparkSession, d: String): DataFrame = {
    val e = embeddings(s, d)
      .select(col("vec_id"),
        expr("transform(embedding, x -> cast(x as double))").as("v"))
    val probes = e.filter(col("vec_id") < 5)
      .select(col("vec_id").as("probe"), col("v").as("vp"))
    val cands = e.filter(col("vec_id") >= 5 && col("vec_id") < 100)
      .select(col("vec_id").as("cand"), col("v").as("vc"))
    val sim = graft.functions.Vectors.cosine(col("vp"), col("vc"))
    val w = Window.partitionBy(col("probe"))
      .orderBy(col("sim").desc, col("cand").asc)
    probes.join(broadcast(cands))
      .select(col("probe"), col("cand"), round(sim, 4).as("sim"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 5)
      .orderBy("probe", "rank")
  }

  /** q44 composite multi-join revenue rollup (TPC-H Q5-ish). Dimension side
    * (region⋈nation) is broadcast; the orders⋈customer join shuffles on the
    * customer key; aggregation is partial+final. */
  def q44(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .join(customer(s, d), col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(region(s, d)), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"))
      .agg(round(sum(col("o_totalprice")), 2).as("revenue"))
      .orderBy("r_name")

  /** q56 right outer join (the mirror of q13 — declared explicitly so the
    * full join matrix is demonstrated). */
  def q56(s: SparkSession, d: String): DataFrame =
    orders(s, d).join(customer(s, d), col("o_custkey") === col("c_custkey"), "right")
      .select(col("c_custkey"), col("o_orderkey"))
      .orderBy(col("c_custkey").asc, col("o_orderkey").asc_nulls_first)

  /** q57 BETWEEN + IS NULL over join-produced nulls (the classic
    * left-join anti pattern — Catalyst keeps the filter above the join,
    * null-producing side pruned by the predicate). */
  def q57(s: SparkSession, d: String): DataFrame =
    customer(s, d).join(orders(s, d), col("c_custkey") === col("o_custkey"), "left")
      .filter(col("o_orderkey").isNull &&
        col("c_acctbal").between(0, 5000))
      .select(col("c_custkey"), col("c_acctbal"))
      .orderBy("c_custkey")

  /** q65 PIVOT: per-user event counts spread into one column per event
    * type. Explicit pivot values keep the plan single-pass (no values-
    * discovery pre-query); pivot compiles to one partial+final aggregate
    * with conditional counters — the exchange carries |users| rows.
    * Absent combinations coalesce to 0 (DuckDB's count(CASE…) yields 0,
    * Spark's pivot-count yields null — normalized here). */
  def q65(s: SparkSession, d: String): DataFrame = {
    val types = Seq("click", "error", "purchase", "signup", "view")
    events(s, d)
      .groupBy(col("user_id"))
      .pivot("event_type", types)
      .agg(count(lit(1)))
      .select(col("user_id") +:
        types.map(t => coalesce(col(t), lit(0L)).as(s"n_$t")): _*)
      .orderBy("user_id")
  }

  /** q66 sorted string aggregation: nations per region as one
    * comma-joined alphabetical string (listagg/string_agg). Spark:
    * collect_list → array_sort → array_join — deterministic despite
    * collect_list's arbitrary arrival order because the sort happens
    * after collection. */
  def q66(s: SparkSession, d: String): DataFrame =
    nation(s, d).join(broadcast(region(s, d)),
        col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"))
      .agg(array_join(array_sort(collect_list(col("n_name"))), ",")
        .as("nations"))
      .orderBy("r_name")

  /** q67 FILTER-clause aggregation (SQL:2003 conditional aggregates):
    * several differently-filtered counters in ONE pass over orders —
    * the idiom that replaces N self-joins with one partial+final
    * aggregate. */
  def q67(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .groupBy(col("o_orderpriority"))
      .agg(
        count(lit(1)).as("n"),
        expr("count(*) FILTER (WHERE o_orderstatus = 'F')").as("n_f"),
        expr("count(*) FILTER (WHERE o_totalprice > 200000)").as("n_big"),
        expr("round(avg(o_totalprice) FILTER (WHERE o_orderstatus = 'O'), 2)")
          .as("avg_open"))
      .orderBy("o_orderpriority")

  /** q68 window navigation (first_value/last_value/nth_value) with an
    * explicit ROWS frame and a full-order tiebreak — the deterministic
    * form of the value-navigation family. One exchange on the partition
    * key, streaming frame evaluation. */
  def q68(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    orders(s, d).select(
        col("o_custkey"), col("o_orderkey"),
        first(col("o_orderkey")).over(w).as("first_key"),
        last(col("o_orderkey")).over(w).as("last_key"),
        nth_value(col("o_orderkey"), 2).over(w).as("second_key"))
      .orderBy("o_custkey", "o_orderkey")
  }

  /** q69 correlated EXISTS / NOT EXISTS: customers with an order over
    * 300k and none under 50k. Catalyst rewrites both correlations into
    * semi/anti joins on c_custkey — two hash joins, no per-row
    * subquery execution. */
  def q69(s: SparkSession, d: String): DataFrame = {
    // temp views exist only for the eager analysis inside sql(); dropped
    // before returning so the builder leaves no session-catalog residue
    customer(s, d).createOrReplaceTempView("__q69_customer")
    orders(s, d).createOrReplaceTempView("__q69_orders")
    try s.sql(
      """SELECT c_custkey, c_name FROM __q69_customer
        |WHERE EXISTS (SELECT 1 FROM __q69_orders
        |              WHERE o_custkey = c_custkey AND o_totalprice > 300000)
        |  AND NOT EXISTS (SELECT 1 FROM __q69_orders
        |                  WHERE o_custkey = c_custkey AND o_totalprice < 50000)
        |ORDER BY c_custkey""".stripMargin)
    finally {
      s.catalog.dropTempView("__q69_customer")
      s.catalog.dropTempView("__q69_orders")
    }
  }

  /** q70 UNPIVOT (melt): wide part attributes to long (attr, val) rows —
    * the inverse of q65's pivot, via the native `unpivot` API (compiles
    * to Expand: each input row emits one row per value column in a
    * single narrow pass; no join, no shuffle before the contract sort). */
  def q70(s: SparkSession, d: String): DataFrame =
    part(s, d)
      .select(col("p_partkey"), col("p_size").cast("double").as("p_size"),
        col("p_retailprice"))
      .unpivot(Array(col("p_partkey")),
        Array(col("p_size"), col("p_retailprice")), "attr", "val")
      .orderBy("p_partkey", "attr")

  /** q77 statistical aggregates: sample stddev/variance, correlation,
    * covariance per group — single partial+final pass (Welford-style
    * mergeable moments, so the exchange carries one moment tuple per
    * (group, partition), not values). Rounding boundaries chosen where
    * Spark's and DuckDB's merge orders agree empirically (verified at
    * sf0.01 and sf0.001). */
  def q77(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(
        round(stddev_samp(col("l_quantity")), 4).as("sd_qty"),
        round(var_samp(col("l_quantity")), 4).as("var_qty"),
        (round(corr(col("l_quantity"), col("l_extendedprice")), 6)
          + lit(0.0)).as("corr_qp"),
        (round(covar_samp(col("l_quantity"), col("l_extendedprice")), 2)
          + lit(0.0)).as("cov_qp"))
      .orderBy("l_returnflag")

  /** q45 scalar-subquery filter: the scalar aggregate is computed once and
    * broadcast, so the main scan stays a single filtered pass. */
  def q45(s: SparkSession, d: String): DataFrame = {
    val c = customer(s, d)
    val avgBal = c.agg(avg(col("c_acctbal")).as("avg_bal"))
    c.crossJoin(broadcast(avgBal))
      .filter(col("c_acctbal") > col("avg_bal"))
      .select(col("c_custkey"), col("c_name"), col("c_acctbal"))
      .orderBy("c_custkey")
  }

  /** q78 distributed exact global ranking. Landed in round 3 as q29's
    * distributed twin (same oracle SQL, so the hash gate proved the
    * range-partitioned rewrite bit-identical to the single-task window);
    * round 4 promoted that body INTO q29, so the twin now delegates —
    * both inventory faces carry the scale-safe form, and the retired
    * window form survives as RankingSpec's cross-check. */
  def q78(s: SparkSession, d: String): DataFrame = q29(s, d)
}
