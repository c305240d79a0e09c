package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.{CoreOracles, CoreQueries, CurationOracles, CurationQueries, ExtendedOracles, ExtendedQueries, PipelineOracles, PipelineQueries, TemporalOracles, TemporalQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the complete declared operator inventory (SURVEY.md §2.9);
  * `oracleSql` carries the DuckDB-equivalent SQL the driver hash-compares
  * against at sf0.01.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * q44: region⋈nation⋈customer⋈orders revenue rollup — exercises scan,
    * broadcast + shuffle joins, partial agg, and sort in one plan. */
  def entry(spark: SparkSession): DataFrame =
    CoreQueries.q44(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_scan_project"   -> CoreQueries.q01 _,
    "q02_filter_pred"    -> CoreQueries.q02 _,
    "q03_filter_in_like" -> CoreQueries.q03 _,
    "q04_topk"           -> CoreQueries.q04 _,
    "q05_sort_multi"     -> CoreQueries.q05 _,
    "q06_distinct"       -> CoreQueries.q06 _,
    "q07_union_all"      -> CoreQueries.q07 _,
    "q08_union_distinct" -> CoreQueries.q08 _,
    "q09_intersect"      -> CoreQueries.q09 _,
    "q10_except"         -> CoreQueries.q10 _,
    "q11_join_inner"     -> CoreQueries.q11 _,
    "q12_join_broadcast" -> CoreQueries.q12 _,
    "q13_join_left"      -> CoreQueries.q13 _,
    "q14_join_full"      -> CoreQueries.q14 _,
    "q15_join_semi"      -> CoreQueries.q15 _,
    "q16_join_anti"      -> CoreQueries.q16 _,
    "q17_join_theta"     -> CoreQueries.q17 _,
    "q18_join_cross"     -> CoreQueries.q18 _,
    "q19_agg_global"     -> CoreQueries.q19 _,
    "q20_agg_group"      -> CoreQueries.q20 _,
    "q21_agg_having"     -> CoreQueries.q21 _,
    "q22_count_distinct" -> CoreQueries.q22 _,
    "q23_rollup"         -> CoreQueries.q23 _,
    "q24_cube"           -> CoreQueries.q24 _,
    "q25_grouping_sets"  -> CoreQueries.q25 _,
    "q26_window_rank"    -> CoreQueries.q26 _,
    "q27_window_running" -> CoreQueries.q27 _,
    "q28_window_lag"     -> CoreQueries.q28 _,
    "q29_window_ntile"   -> CoreQueries.q29 _,
    "q30_str_funcs"      -> CoreQueries.q30 _,
    "q31_date_funcs"     -> CoreQueries.q31 _,
    "q32_math_funcs"     -> CoreQueries.q32 _,
    "q33_case_coalesce"  -> CoreQueries.q33 _,
    "q34_cast"           -> CoreQueries.q34 _,
    "q35_array_ops"      -> CoreQueries.q35 _,
    "q36_explode"        -> CoreQueries.q36 _,
    "q37_json"           -> CoreQueries.q37 _,
    "q38_upsert_latest"  -> CoreQueries.q38 _,
    "q39_topk_group"     -> CoreQueries.q39 _,
    "q40_time_bucket"    -> CoreQueries.q40 _,
    "q41_dedup_exact"    -> CoreQueries.q41 _,
    "q42_text_topwords"  -> CoreQueries.q42 _,
    "q43_similarity"     -> CoreQueries.q43 _,
    "q44_multi_join_agg" -> CoreQueries.q44 _,
    "q45_subquery_agg"   -> CoreQueries.q45 _,
    "q56_join_right"     -> CoreQueries.q56 _,
    "q57_between_isnull" -> CoreQueries.q57 _,
    "q46_minhash_lsh"    -> PipelineQueries.q46 _,
    "q47_jaccard_pairs"  -> PipelineQueries.q47 _,
    "q48_simhash"        -> PipelineQueries.q48 _,
    "q49_embed_neardup"  -> PipelineQueries.q49 _,
    "q50_lang_id"        -> PipelineQueries.q50 _,
    "q51_text_quality"   -> PipelineQueries.q51 _,
    "q52_token_count"    -> PipelineQueries.q52 _,
    "q53_fingerprint"    -> PipelineQueries.q53 _,
    "q54_ann_lsh"        -> PipelineQueries.q54 _,
    "q55_json_map"       -> PipelineQueries.q55 _,
    "q58_dedup_corpus"   -> PipelineQueries.q58 _,
    "q59_simhash_near"   -> PipelineQueries.q59 _,
    "q60_embed_dedup"    -> PipelineQueries.q60 _,
    "q65_pivot"          -> CoreQueries.q65 _,
    "q68_window_nav"     -> CoreQueries.q68 _,
    "q69_exists_subq"    -> CoreQueries.q69 _,
    "q70_unpivot"        -> CoreQueries.q70 _,
    "q77_stats"          -> CoreQueries.q77 _,
    "q66_string_agg"     -> CoreQueries.q66 _,
    "q67_filter_agg"     -> CoreQueries.q67 _,
    "q71_chunking"       -> PipelineQueries.q71 _,
    "q72_normalize"      -> PipelineQueries.q72 _,
    "q73_stopwords"      -> PipelineQueries.q73 _,
    "q74_vocab_df"       -> PipelineQueries.q74 _,
    "q75_split"          -> PipelineQueries.q75 _,
    "q76_tfidf"          -> PipelineQueries.q76 _,
    "q61_asof_join"      -> TemporalQueries.q61 _,
    "q62_pairs_range"    -> TemporalQueries.q62 _,
    "q63_sessionize"     -> TemporalQueries.q63 _,
    "q64_percentiles"    -> TemporalQueries.q64 _,
    "q78_rank_dist"      -> CoreQueries.q78 _,
    "q79_ivf_ann"        -> ExtendedQueries.q79 _,
    "q80_cohort"         -> ExtendedQueries.q80 _,
    "q81_range_frame"    -> ExtendedQueries.q81 _,
    "q82_cume_dist"      -> ExtendedQueries.q82 _,
    "q83_arg_minmax"     -> ExtendedQueries.q83 _,
    "q84_regexp"         -> ExtendedQueries.q84 _,
    "q85_array_hof"      -> ExtendedQueries.q85 _,
    "q86_posexplode"     -> ExtendedQueries.q86 _,
    "q87_date_spine"     -> ExtendedQueries.q87 _,
    "q88_grouping_id"    -> ExtendedQueries.q88 _,
    "q89_salted_join"    -> ExtendedQueries.q89 _,
    "q90_asof_forward"   -> ExtendedQueries.q90 _,
    "q91_bool_bit_agg"   -> ExtendedQueries.q91 _,
    "q92_histogram"      -> ExtendedQueries.q92 _,
    "q93_str_funcs2"     -> ExtendedQueries.q93 _,
    "q94_profile"        -> ExtendedQueries.q94 _,
    "q95_seq_gaps"       -> ExtendedQueries.q95 _,
    "q96_encode"         -> ExtendedQueries.q96 _,
    "q97_quantiles_dist" -> ExtendedQueries.q97 _,
    "q98_array_setops"   -> ExtendedQueries.q98 _,
    "q99_null_battery"   -> ExtendedQueries.q99 _,
    "q100_weighted_agg"  -> ExtendedQueries.q100 _,
    "q101_encode_vocab"  -> ExtendedQueries.q101 _,
    "q102_quantiles_scan" -> ExtendedQueries.q102 _,
    "q103_dedup_incr"    -> ExtendedQueries.q103 _,
    "q104_mix_exact"     -> ExtendedQueries.q104 _,
    "q105_mix_rate"      -> ExtendedQueries.q105 _,
    "q106_bucket_join"   -> CurationQueries.q106 _,
    "q107_bigram_lm"     -> CurationQueries.q107 _,
    "q108_contamination" -> CurationQueries.q108 _,
    "q109_repetition"    -> CurationQueries.q109 _,
    "q110_containment"   -> CurationQueries.q110 _,
    "q111_quantize"      -> CurationQueries.q111 _,
    "q112_len_quantiles" -> CurationQueries.q112 _,
    "q113_cc_clusters"   -> CurationQueries.q113 _,
    "q114_bigram_pmi"    -> CurationQueries.q114 _,
    "q115_ann_recall"    -> CurationQueries.q115 _,
    "q116_salted_agg"    -> CurationQueries.q116 _,
    "q117_winsorize"     -> CurationQueries.q117 _,
    "q118_minhash_est"   -> CurationQueries.q118 _,
    "q119_quality_gate"  -> CurationQueries.q119 _,
    "q120_prefix_join"   -> CurationQueries.q120 _
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    CoreOracles.sql ++ PipelineOracles.sql ++ TemporalOracles.sql ++
      ExtendedOracles.sql ++ CurationOracles.sql
}
