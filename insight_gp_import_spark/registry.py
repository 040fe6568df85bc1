"""Operator registry — single source of truth for the driver contract.

Every operator from SURVEY.md §2 is registered here by its ``op id``.
``__spark_entry__.queries()`` / ``oracle_sql()`` are thin views over this
registry, so an operator is implemented, tested, and declared in exactly
one place.

An op with ``oracle=None`` is declared rows-only (non-SQL-expressible:
tolerant scans, sinks, approx sketches — __spark_entry__.py:36-37).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Op:
    name: str
    fn: QueryFn
    oracle: str | None
    category: str


REGISTRY: dict[str, Op] = {}


def op(name: str, oracle: str | None = None, category: str = "") -> Callable[[QueryFn], QueryFn]:
    """Register an operator. ``oracle`` is the DuckDB twin SQL (or None)."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate op id {name!r}")
        REGISTRY[name] = Op(name=name, fn=fn, oracle=oracle, category=category)
        return fn

    return deco


# Explicit declaration order for the driver contract. The driver evaluates
# queries() in dict-insertion order with a bounded per-round budget of 50
# entries per round (CORRECTNESS_r01/r02.json each cover exactly the first
# 50 registry entries), so ops that still lack driver-side correctness
# evidence are listed first.
#
# Evidence ledger by round:
#   round 1 hashed old-order entries 1-50 (aggregation, joins, llm,
#     multimodal, projection[:5]) — all green except agg_funnel_conversion
#     (fixed since; needs a driver re-run).
#   round 2 hashed the 50 oracled ops promoted that round — all green.
#   round 3 (this order) promotes the 35 oracled ops the driver has never
#     hashed (sink_jdbc_gp .. embed_quantize_int8: the corpus_ops /
#     quality_ops / timeseries blocks and round-2 additions) PLUS
#     agg_funnel_conversion (slot 1: its only driver row is r1's FAIL and a
#     green re-hash is the round's top obligation) = 36 hash slots, then
#     fills the remaining 14 slots with rows-only ops so the driver at
#     least records them executing. stream_checkpoint_restart spills to
#     slot 51 (the op's invariant is runtime-tested in pytest and it is the
#     slowest rows-only op — least marginal value from a driver "ran" row).
# ROUND-4 TODO: rotate again — promote stream_checkpoint_restart plus any
# op whose round-3 row is missing/red, then ALL round-3 additions
# (schema_evolution_catalog, merge_scd2_incremental, ts_interpolate_linear,
# win_cumulative_distinct, sink_csv_gz_roundtrip, fn_regexp_extract_all,
# dq_freshness, join_interval_bucketed, mm_audio_chunks, win_gaps_islands,
# dq_anomaly_zscore, agg_median_exact, dedup_cluster_bigstar,
# agg_hll_partial_merge, embed_kmeans_lloyd, scan_binary_files,
# sql_multi_cte, fn_variant, agg_bitmap_distinct, scan_python_datasource,
# text_containment, stream_transform_state, text_unigram_logprob,
# embed_pca_power, scan_xml_roundtrip, sql_parameterized,
# join_null_aware_anti, agg_grouping_id, join_lateral_topk, fn_array_hof,
# dq_uniqueness, sql_pipe_syntax, fn_collation, stream_static_join,
# win_rolling_corr, mm_video_scene_cuts, text_sentence_split,
# corpus_rag_chunk, pipeline_monitoring_health, sql_recursive_cte, fn_try_arithmetic,
# plus the third-session additions (84 new ops, all registry tail;
# the list below names the first wave — everything after
# embed_sim_histogram in REGISTRY insertion order is likewise a
# third-session addition awaiting a driver slot): setop_intersect_all,
# agg_multi_distinct, sql_exists_subquery, agg_regression,
# agg_markov_transitions, ts_ewma_7, ts_seasonality_profile,
# text_collocation_pmi, text_readability, sim_search_range,
# embed_truncate_renorm, graph_pagerank_unrolled, fn_url_parse,
# corpus_interleave_sources, agg_heavy_hitters, dq_checksum_columns,
# mm_image_phash, ts_yoy_growth, agg_pareto_cut,
# pipeline_ann_index_build, agg_argmax, sql_group_by_all,
# join_spatial_grid, win_rolling_median, ts_cusum_change,
# agg_skew_kurtosis, fn_luhn_check, scan_text_roundtrip,
# corpus_curriculum_order, fn_mask, dq_psi_drift, embed_sim_histogram —
# all currently appended after this list, i.e. registry
# tail), AND the fourth-session additions (join_bilateral_trade,
# agg_fulfillment_lag, agg_hhi_concentration, ts_sma_crossover,
# dq_ks_drift, graph_bfs_distances, scan_partitioned_pruned,
# join_drill_across_facts, sql_limit_offset, agg_xyz_variability,
# win_last_touch_attribution, dq_rule_checks, corpus_span_corruption,
# pipeline_dq_quarantine, agg_contribution_waterfall,
# embed_binary_sign_pack, agg_window_funnel_strict,
# sql_values_inline_dim, scan_csv_corrupt_rescue,
# join_calendar_dim_rollup, sink_jsonl_roundtrip, ts_largest_silences,
# win_rank_change, dq_join_key_skew, ts_wow_aligned,
# agg_semi_additive_eom, setop_except_all, dq_header_detail_reconcile,
# mm_patch_grid, udf_pandas_iter, agg_receivables_aging,
# text_bpe_first_merges, embed_centroid_drift, fn_explode_outer,
# win_event_context_window, agg_price_volume_mix, agg_runs_test,
# win_twap, sql_distribute_sort_by, agg_ab_test_lift,
# win_skyline_frontier, agg_lorenz_deciles, corpus_epoch_reshuffle,
# dq_corr_matrix, agg_target_encoding, scan_recursive_lookup,
# pipeline_feature_store_snapshot, ts_seasonal_index_monthly,
# fn_listagg, agg_concentration_ratio, scan_glob_filtered,
# agg_mad_robust, ts_deseasonalized_outliers, corpus_dataset_card,
# dedup_survivor_quality, ts_acf_lags — likewise registry tail),
# AND the fifth-session additions (ts_bollinger_breaks, ts_rsi_zones,
# agg_spearman_corr, agg_mann_whitney_u, dq_sequence_gaps,
# agg_eb_shrunk_rates, corpus_source_overlap, text_lexical_diversity,
# graph_common_neighbors, ts_theil_sen_trend, agg_like_for_like_growth,
# fn_aes_roundtrip, agg_mrr_bridge, graph_degree_assortativity,
# sql_lateral_view, dq_schema_contract, win_time_decay_attribution,
# agg_price_endings, pipeline_experiment_readout,
# scan_parquet_footer_stats, agg_runrate_backtest,
# embed_matryoshka_eval, scan_modified_after, sql_identifier_dynamic,
# ts_downsample_minmax, text_tokenizer_fertility,
# dq_duplicate_payments, embed_hard_negatives, sql_star_except,
# fn_timestamp_parse_multi, join_fx_normalize, graph_kcore_unrolled,
# agg_new_product_adoption, agg_sessions_to_convert,
# join_record_linkage_score, sink_parquet_zstd,
# agg_user_lifecycle_daily, text_kwic_concordance,
# ts_periodogram_quantized, agg_anova_dow,
# corpus_alpha_sampling_weights, text_vocab_coverage_bands,
# ts_naive_interval_bands, agg_atp_allocation, pipeline_release_gate,
# ts_month_end_hockey_stick, embed_dedup_threshold_sweep,
# ts_underwater_duration, udtf_arrow_bigrams,
# agg_holiday_proximity_lift, agg_hill_tail_index, stream_rate_source,
# text_token_dispersion, join_order_split_shipments,
# fn_natural_sort_key, agg_markov_entropy_rate, ts_xmr_control_chart,
# graph_rich_club, scan_csv_null_tokens, agg_welch_t_test,
# ts_event_study_panel, sql_union_by_name, agg_did_estimate,
# scan_ignore_corrupt_files, fn_text_sparkline, ts_anomaly_consensus,
# dq_decimal_fit_audit, ts_ljung_box_residuals,
# sql_relational_division, join_coverage_gaps,
# join_repeat_basket_similarity, agg_unit_price_dispersion,
# text_yule_k, ts_overdispersion_index, corpus_mix_kl_divergence,
# ts_local_peaks_prominence, agg_wilson_interval,
# sql_order_group_by_all, ts_negbin_fit_mom, dq_fk_inclusion_profile,
# text_heaps_law_beta, ts_spike_type_attribution,
# embed_label_centroid_separation, dq_hash_uniformity,
# dq_fingerprint_collisions, agg_simpsons_paradox_check,
# text_langid_kappa, join_asof_policy_sensitivity,
# fn_base64_roundtrip, graph_modularity_brand_partition,
# ts_interrupted_series, ts_forecast_combination,
# scan_wholetext_files, agg_storage_tiering_policy,
# embed_anisotropy_score, agg_rounding_drift_audit,
# dq_rare_categories, agg_new_vs_returning_aov, agg_boxplot_fences,
# join_bridge_allocation, ts_mann_kendall, agg_monetary_unit_sampling,
# dedup_sorted_neighborhood, ts_historical_var,
# corpus_sampler_bias_check, dq_future_leakage_audit,
# dq_capture_recapture, ts_record_days_rate,
# corpus_normalization_payoff, dq_hll_error_bound,
# dq_quantile_sketch_bound, ts_max_gain_window,
# agg_trimmed_mean_exact, text_source_js_divergence,
# ts_ar1_persistence, dq_rollup_consistency,
# fn_split_regex_vs_literal, ts_revenue_pacing_curve — likewise
# registry tail), then cycle the oldest-evidence blocks (round-1 set)
# ahead of the round-2 set.
DRIVER_ORDER: list[str] = [
    # -- round-3 hash slots: oracled, no green driver row yet --
    "agg_funnel_conversion",
    "sink_jdbc_gp", "pipeline_file_lifecycle", "dedup_cluster",
    "sample_stratified", "text_ngram_counts", "embed_outlier_centroid",
    "stream_stream_join", "pipeline_training_corpus", "win_ntile",
    "corpus_split_hash", "corpus_shard_shuffle", "corpus_pack_sequences",
    "corpus_decontaminate", "corpus_mix_weights", "text_pii_mask",
    "corpus_apply_mix", "win_quantile_bin_global",
    "dq_profile", "dq_referential", "merge_cdc_apply",
    "snapshot_diff", "agg_incremental_merge", "join_point_in_time",
    "text_repetition", "text_score_batch", "pipeline_corpus_assembly",
    "observe_metrics", "join_asof_tolerance", "scan_orc_roundtrip",
    "sessionize_gap", "ts_gap_fill", "ts_resample_ohlc",
    "text_dedup_span", "text_bm25_rank", "embed_quantize_int8",
    # -- round-3 run slots: rows-only, never executed by the driver --
    "scan_csv_tolerant", "scan_jsonl", "sink_parquet_partitioned",
    "sink_parquet_bucketed", "maintenance_compact", "stream_source_dir",
    "stream_watermark_late", "dedup_simhash", "ann_ivf_topk", "ann_lsh_topk",
    "dedup_embed_lsh", "sink_parquet_range_sorted",
    "sink_partition_overwrite_dynamic", "sink_parquet_zorder",
    # -- slot 51+: rows-only spillover (see ROUND-4 TODO above) --
    "stream_checkpoint_restart",
    # -- round-2 driver-verified, all green (CORRECTNESS_r02.json) --
    "sample_deterministic",
    "scan_parquet", "scan_events_ns", "ingest_manifest_dedup",
    "schema_evolution_union", "full_snapshot_latest", "full_snapshot_scd2",
    "pipeline_batch_load",
    "sort_multi_nulls", "limit_topk", "setop_union_all",
    "setop_union_distinct", "setop_intersect", "setop_except",
    "fn_string", "fn_datetime", "fn_math", "fn_conditional", "fn_cast_try",
    "fn_array", "fn_struct_map", "fn_json", "fn_hash", "fn_bitwise",
    "stream_tumbling", "stream_sliding", "stream_session", "stream_dedup",
    "stream_stateful_totals", "stream_upsert_sink",
    "dedup_embed_cosine", "dedup_ngram_jaccard", "dedup_fuzzy_levenshtein",
    "text_langid", "text_quality", "text_token_count", "text_fingerprint",
    "udf_scalar", "udf_pandas", "udaf_grouped_pandas", "udtf_explode",
    "udtf_python_tokenize",
    "win_ranking", "win_topn_per_group", "win_lag_lead", "win_running",
    "win_moving", "win_range_interval", "win_first_last", "win_distribution",
    # -- round-1 driver-verified (CORRECTNESS_r01.json) --
    "agg_global", "agg_hash_groupby", "agg_count_distinct",
    "agg_approx_distinct", "agg_grouping_sets", "agg_rollup", "agg_cube",
    "agg_having", "agg_collect_sorted", "agg_stats", "agg_pivot",
    "agg_unpivot", "agg_salted_skew", "agg_approx_quantile",
    "agg_histogram", "agg_retention_cohort",
    "agg_mode_per_group",
    "join_inner_equi", "join_left_outer", "join_right_outer",
    "join_full_outer", "join_left_semi", "join_left_anti", "join_broadcast",
    "join_cross", "join_range_theta", "join_asof", "join_star_multiway",
    "join_skew_salted", "subquery_scalar_correlated", "join_bloom_prune",
    "join_copurchase_pairs",
    "text_normalize", "dedup_exact", "dedup_near_jaccard",
    "dedup_near_minhash", "sim_search_topk", "sim_knn_join",
    "embed_normalize", "multimodal_join", "text_stats", "text_tfidf",
    "mm_decode_features", "mm_frame_sample",
    "project_compute", "filter_compound", "filter_in_between_like",
    "filter_null_semantics", "distinct_project",
]


def load_all_ops() -> dict[str, Op]:
    """Import every operator module, then order per ``DRIVER_ORDER``."""
    import insight_gp_import_spark.operators  # noqa: F401  (side-effect imports)

    ordered = {n: REGISTRY[n] for n in DRIVER_ORDER if n in REGISTRY}
    ordered.update({n: o for n, o in REGISTRY.items() if n not in ordered})
    return ordered
