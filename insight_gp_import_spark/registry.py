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

# DataFrames persisted by an op BODY outlive the op call (the returned plan
# is lazy; the caller materializes later), so an op can't unpersist its own
# caches. Instead ops register them via tracked_persist() and the NEXT op
# invocation flushes them — bounding block-manager growth to one op's
# caches during a ~500-op driver sweep instead of accumulating all of them.
#
# CALLER CONTRACT (round-5 advice): materialize each op's returned plan
# BEFORE invoking the next op. Building several ops' plans first and
# collecting later stays CORRECT (unpersist only drops caching; Spark
# recomputes the subtree) but silently loses the caching benefit, since
# op B's invocation unpersists op A's still-unmaterialized caches. The
# driver, parity sweep, and pytest all follow call-then-materialize.
# The lock below makes flush/registration safe if a harness ever runs
# ops concurrently in one process (e.g. a threaded sweep).
import threading as _threading

_TRACKED_PERSISTS: list[DataFrame] = []
_OP_DEPTH = 0
_PERSIST_LOCK = _threading.Lock()


def tracked_persist(df: DataFrame) -> DataFrame:
    """persist() a DataFrame and register it for flush at the next op call."""
    df = df.persist()
    with _PERSIST_LOCK:
        _TRACKED_PERSISTS.append(df)
    return df


def flush_tracked_persists() -> None:
    while True:
        with _PERSIST_LOCK:
            if not _TRACKED_PERSISTS:
                return
            df = _TRACKED_PERSISTS.pop()
        try:
            df.unpersist()
        except Exception:  # session already stopped — nothing to free
            pass


def op(name: str, oracle: str | None = None, category: str = "") -> Callable[[QueryFn], QueryFn]:
    """Register an operator. ``oracle`` is the DuckDB twin SQL (or None)."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate op id {name!r}")

        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            # Flush only at TOP-LEVEL invocations: composed ops (an op
            # building on another op's fn) must not drop the outer op's
            # tracked caches mid-plan-build.
            global _OP_DEPTH
            if _OP_DEPTH == 0:
                flush_tracked_persists()
            _OP_DEPTH += 1
            try:
                return fn(spark, sf_dir)
            finally:
                _OP_DEPTH -= 1

        wrapped.__name__ = fn.__name__
        wrapped.__doc__ = fn.__doc__
        wrapped.__module__ = fn.__module__
        wrapped.__wrapped__ = fn
        REGISTRY[name] = Op(name=name, fn=wrapped, oracle=oracle, category=category)
        return fn

    return deco


# Explicit declaration order for the driver contract. The driver evaluates
# queries() in dict-insertion order with a bounded per-round budget of 50
# entries, so ops that still lack driver-side correctness evidence are
# listed first. GENERATED — do not hand-edit: run
#   python tools/rotate_driver_order.py
# which recomputes the rotation queue from the registry plus the
# CORRECTNESS_r*.json artifacts (never-hashed oracled ops round-robin by
# category, then never-executed rows-only ops, then already-confirmed ops
# oldest-evidence-first). tests/ asserts this file is in sync with the
# generator (--check).
DRIVER_ORDER: list[str] = [
    "stream_checkpoint_restart",
    "agg_cohort_ltv",
    "fn_explode_outer",
    "graph_hits_bipartite",
    "join_time_anti_abandonment",
    "embed_prototype_selection",
    "pipeline_dq_quarantine",
    "sink_csv_gz_roundtrip",
    "setop_except_all",
    "ts_wow_aligned",
    "corpus_lsh_tuning_table",
    "dedup_survivor_quality",
    "text_boilerplate_sentences",
    "win_group_standardize",
    "agg_gini_activity",
    "fn_listagg",
    "join_bilateral_trade",
    "embed_dims_variance_ranking",
    "dq_join_key_skew",
    "scan_binary_files",
    "sql_distribute_sort_by",
    "ts_seasonal_index_monthly",
    "corpus_source_overlap",
    "embed_dedup_threshold_sweep",
    "text_char_entropy",
    "win_reorder_gap",
    "agg_boolean_aggregates",
    "fn_uuid5_surrogate",
    "join_drill_across_facts",
    "dq_header_detail_reconcile",
    "scan_python_datasource",
    "sql_lateral_view",
    "ts_deseasonalized_outliers",
    "corpus_alpha_sampling_weights",
    "dedup_sorted_neighborhood",
    "text_prefix_dup_groups",
    "win_ratio_to_report",
    "agg_rfm_segments",
    "fn_slugify",
    "join_calendar_dim_rollup",
    "dq_corr_matrix",
    "scan_xml_roundtrip",
    "sql_identifier_dynamic",
    "ts_acf_lags",
    "corpus_mix_kl_divergence",
    "text_langid_eval",
    "win_top_movers",
    "agg_decimal_money",
    "fn_aes_roundtrip",
    "pipeline_feature_store_snapshot",
    "dq_sequence_gaps",
    "scan_text_roundtrip",
    "sql_star_except",
    "ts_bollinger_breaks",
    "dq_hash_uniformity",
    "text_bpe_first_merges",
    "win_last_touch_attribution",
    "agg_new_returning_users",
    "fn_timestamp_parse_multi",
    "join_bitemporal_asof",
    "dq_schema_contract",
    "scan_csv_multiline_quoted",
    "sql_union_by_name",
    "ts_rsi_zones",
    "corpus_normalization_payoff",
    "text_oov_rate",
    "win_rank_change",
    "agg_conversion_latency",
    "fn_natural_sort_key",
    "join_fx_normalize",
    "pipeline_experiment_readout",
    "scan_partitioned_pruned",
    "sql_relational_division",
    "ts_theil_sen_trend",
    "corpus_quality_filter_funnel",
    "text_lexical_diversity",
    "win_event_context_window",
    "agg_weighted_median",
    "fn_text_sparkline",
    "join_record_linkage_score",
    "dq_duplicate_payments",
    "scan_csv_corrupt_rescue",
    "sql_order_group_by_all",
    "ts_downsample_minmax",
    "corpus_sampler_bias_check",
    "text_tokenizer_fertility",
    "win_twap",
    "agg_basket_lift",
    "fn_base64_roundtrip",
    "join_order_split_shipments",
    "pipeline_release_gate",
    "sink_jsonl_roundtrip",
    "sql_function_declared",
    "ts_periodogram_quantized",
    "text_kwic_concordance",
    "win_skyline_frontier",
    "agg_weekend_lift",
    "fn_split_regex_vs_literal",
    "join_coverage_gaps",
    "dq_decimal_fit_audit",
    "scan_recursive_lookup",
    "sql_session_variable",
    "ts_naive_interval_bands",
    "text_vocab_coverage_bands",
    "win_indexed_performance",
    "agg_interarrival_percentiles",
    "fn_haversine",
    "join_repeat_basket_similarity",
    "dq_fk_inclusion_profile",
    "scan_glob_filtered",
    "ts_month_end_hockey_stick",
    "text_token_dispersion",
    "win_z_chart",
    "agg_peak_concurrency",
    "fn_timezone_convert",
    "join_asof_policy_sensitivity",
    "dq_fingerprint_collisions",
    "scan_parquet_footer_stats",
    "ts_underwater_duration",
    "text_yule_k",
    "win_time_decay_attribution",
    "agg_survival_km",
    "join_bridge_allocation",
    "dq_rare_categories",
    "scan_modified_after",
    "ts_xmr_control_chart",
    "text_heaps_law_beta",
    "win_time_to_nth_purchase",
    "agg_chi_square",
    "join_allen_interval_relations",
    "dq_future_leakage_audit",
    "sink_parquet_zstd",
    "ts_event_study_panel",
    "text_langid_kappa",
    "agg_geometric_mean",
    "join_dynamic_partition_pruning",
    "dq_capture_recapture",
    "scan_csv_null_tokens",
    "ts_anomaly_consensus",
    "text_source_js_divergence",
    "agg_top_paths",
    "dq_hll_error_bound",
    "scan_ignore_corrupt_files",
    "ts_ljung_box_residuals",
    "text_bigram_logprob",
    "agg_abc_classes",
    "dq_quantile_sketch_bound",
    "scan_wholetext_files",
    "ts_overdispersion_index",
    "agg_price_index",
    "dq_rollup_consistency",
    "scan_parquet_merge_schema",
    "ts_local_peaks_prominence",
    "agg_fulfillment_lag",
    "scan_csv_multichar_delimiter",
    "ts_negbin_fit_mom",
    "agg_hhi_concentration",
    "ts_spike_type_attribution",
    "agg_xyz_variability",
    "ts_interrupted_series",
    "agg_contribution_waterfall",
    "ts_forecast_combination",
    "agg_window_funnel_strict",
    "ts_mann_kendall",
    "agg_semi_additive_eom",
    "ts_historical_var",
    "agg_receivables_aging",
    "ts_record_days_rate",
    "agg_price_volume_mix",
    "ts_max_gain_window",
    "agg_runs_test",
    "ts_ar1_persistence",
    "agg_ab_test_lift",
    "ts_revenue_pacing_curve",
    "agg_lorenz_deciles",
    "ts_spectral_entropy",
    "agg_target_encoding",
    "agg_concentration_ratio",
    "agg_mad_robust",
    "agg_engagement_histogram",
    "agg_customer_migration_matrix",
    "agg_ab_sample_size",
    "agg_return_rate_brand",
    "agg_spearman_corr",
    "agg_mann_whitney_u",
    "agg_eb_shrunk_rates",
    "agg_like_for_like_growth",
    "agg_mrr_bridge",
    "agg_price_endings",
    "agg_runrate_backtest",
    "agg_new_product_adoption",
    "agg_sessions_to_convert",
    "agg_user_lifecycle_daily",
    "agg_anova_dow",
    "agg_atp_allocation",
    "agg_holiday_proximity_lift",
    "agg_hill_tail_index",
    "agg_markov_entropy_rate",
    "agg_welch_t_test",
    "agg_did_estimate",
    "agg_unit_price_dispersion",
    "agg_wilson_interval",
    "agg_simpsons_paradox_check",
    "agg_storage_tiering_policy",
    "agg_rounding_drift_audit",
    "agg_new_vs_returning_aov",
    "agg_boxplot_fences",
    "agg_monetary_unit_sampling",
    "agg_trimmed_mean_exact",
    "agg_theil_index",
    "agg_cramers_v",
    "agg_session_bounce_rate",
    "agg_hll_partial_merge",
    "stream_rate_source",
    "agg_approx_distinct",
    "agg_approx_quantile",
    "stream_watermark_late",
    "agg_collect_sorted",
    "agg_count_distinct",
    "agg_cube",
    "agg_funnel_conversion",
    "agg_global",
    "agg_grouping_sets",
    "agg_hash_groupby",
    "agg_having",
    "agg_histogram",
    "agg_mode_per_group",
    "agg_pivot",
    "agg_retention_cohort",
    "agg_rollup",
    "agg_salted_skew",
    "agg_stats",
    "agg_unpivot",
    "dedup_exact",
    "dedup_near_jaccard",
    "dedup_near_minhash",
    "distinct_project",
    "embed_normalize",
    "filter_compound",
    "filter_in_between_like",
    "filter_null_semantics",
    "join_asof",
    "join_bloom_prune",
    "join_broadcast",
    "join_copurchase_pairs",
    "join_cross",
    "join_full_outer",
    "join_inner_equi",
    "join_left_anti",
    "join_left_outer",
    "join_left_semi",
    "join_range_theta",
    "join_right_outer",
    "join_skew_salted",
    "join_star_multiway",
    "mm_decode_features",
    "mm_frame_sample",
    "multimodal_join",
    "project_compute",
    "sim_knn_join",
    "sim_search_topk",
    "subquery_scalar_correlated",
    "text_normalize",
    "text_stats",
    "text_tfidf",
    "dedup_embed_cosine",
    "dedup_fuzzy_levenshtein",
    "dedup_ngram_jaccard",
    "fn_array",
    "fn_bitwise",
    "fn_cast_try",
    "fn_conditional",
    "fn_datetime",
    "fn_hash",
    "fn_json",
    "fn_math",
    "fn_string",
    "fn_struct_map",
    "full_snapshot_latest",
    "full_snapshot_scd2",
    "ingest_manifest_dedup",
    "limit_topk",
    "pipeline_batch_load",
    "sample_deterministic",
    "scan_events_ns",
    "scan_parquet",
    "schema_evolution_union",
    "setop_except",
    "setop_intersect",
    "setop_union_all",
    "setop_union_distinct",
    "sort_multi_nulls",
    "stream_dedup",
    "stream_session",
    "stream_sliding",
    "stream_stateful_totals",
    "stream_tumbling",
    "stream_upsert_sink",
    "text_fingerprint",
    "text_langid",
    "text_quality",
    "text_token_count",
    "udaf_grouped_pandas",
    "udf_pandas",
    "udf_scalar",
    "udtf_explode",
    "udtf_python_tokenize",
    "win_distribution",
    "win_first_last",
    "win_lag_lead",
    "win_moving",
    "win_range_interval",
    "win_ranking",
    "win_running",
    "win_topn_per_group",
    "agg_incremental_merge",
    "ann_ivf_topk",
    "ann_lsh_topk",
    "corpus_apply_mix",
    "corpus_decontaminate",
    "corpus_mix_weights",
    "corpus_pack_sequences",
    "corpus_shard_shuffle",
    "corpus_split_hash",
    "dedup_cluster",
    "dedup_embed_lsh",
    "dedup_simhash",
    "dq_profile",
    "dq_referential",
    "embed_outlier_centroid",
    "embed_quantize_int8",
    "join_asof_tolerance",
    "join_point_in_time",
    "maintenance_compact",
    "merge_cdc_apply",
    "observe_metrics",
    "pipeline_corpus_assembly",
    "pipeline_file_lifecycle",
    "pipeline_training_corpus",
    "sample_stratified",
    "scan_csv_tolerant",
    "scan_jsonl",
    "scan_orc_roundtrip",
    "sessionize_gap",
    "sink_jdbc_gp",
    "sink_parquet_bucketed",
    "sink_parquet_partitioned",
    "sink_parquet_range_sorted",
    "sink_parquet_zorder",
    "sink_partition_overwrite_dynamic",
    "snapshot_diff",
    "stream_source_dir",
    "stream_stream_join",
    "text_bm25_rank",
    "text_dedup_span",
    "text_ngram_counts",
    "text_pii_mask",
    "text_repetition",
    "text_score_batch",
    "ts_gap_fill",
    "ts_resample_ohlc",
    "win_ntile",
    "win_quantile_bin_global",
    "agg_bitmap_distinct",
    "agg_grouping_id",
    "agg_median_exact",
    "corpus_curriculum_order",
    "corpus_interleave_sources",
    "corpus_rag_chunk",
    "dq_anomaly_zscore",
    "dq_freshness",
    "dq_uniqueness",
    "embed_truncate_renorm",
    "fn_array_hof",
    "fn_regexp_extract_all",
    "fn_variant",
    "graph_degree_stats",
    "graph_pagerank_unrolled",
    "graph_triangle_count",
    "join_interval_bucketed",
    "join_lateral_topk",
    "join_null_aware_anti",
    "mm_audio_chunks",
    "mm_image_phash",
    "mm_video_scene_cuts",
    "sample_systematic",
    "sample_weighted_reservoir",
    "sim_search_range",
    "sql_multi_cte",
    "sql_parameterized",
    "sql_pipe_syntax",
    "stream_static_join",
    "stream_transform_state",
    "text_containment",
    "text_sentence_split",
    "text_unigram_logprob",
    "ts_ewma_7",
    "ts_interpolate_linear",
    "ts_seasonality_profile",
    "udf_pandas_iter",
    "udf_pandas_window_agg",
    "udtf_arrow_bigrams",
    "win_cumulative_distinct",
    "win_gaps_islands",
    "agg_heavy_hitters",
    "agg_markov_transitions",
    "agg_multi_distinct",
    "agg_regression",
    "corpus_dedup_report",
    "corpus_length_histogram",
    "corpus_mix_entropy",
    "dedup_cluster_bigstar",
    "dedup_phash_hamming",
    "dq_checksum_columns",
    "dq_psi_drift",
    "embed_binary_sign_pack",
    "embed_norm_health",
    "embed_sim_histogram",
    "fn_collation",
    "fn_luhn_check",
    "fn_try_arithmetic",
    "fn_url_parse",
    "graph_bfs_distances",
    "graph_common_neighbors",
    "graph_degree_assortativity",
    "graph_kcore_unrolled",
    "join_or_decomposed",
    "join_overlap_accounting",
    "join_spatial_grid",
    "mm_modality_balance",
    "mm_patch_grid",
    "pipeline_ann_index_build",
    "pipeline_monitoring_health",
    "setop_intersect_all",
    "sql_exists_subquery",
    "sql_group_by_all",
    "sql_named_window",
    "sql_recursive_cte",
    "stream_complete_mode",
    "stream_dedup_within_watermark",
    "text_collocation_pmi",
    "text_novelty_score",
    "text_readability",
    "ts_cusum_change",
    "ts_forward_fill",
    "ts_yoy_growth",
    "udf_map_in_arrow",
    "win_rolling_corr",
    "win_rolling_median",
    "agg_argmax",
    "agg_bitmask_profile",
    "agg_pareto_cut",
    "agg_skew_kurtosis",
    "corpus_budget_apportion",
    "corpus_dataset_card",
    "corpus_epoch_reshuffle",
    "corpus_span_corruption",
    "dq_benford_check",
    "dq_ks_drift",
    "dq_rule_checks",
    "embed_anisotropy_score",
    "embed_centroid_drift",
    "embed_hard_negatives",
    "embed_kmeans_lloyd",
    "embed_label_centroid_separation",
    "embed_matryoshka_eval",
    "embed_pca_power",
    "fn_array_sort_comparator",
    "fn_date_format",
    "fn_mask",
    "fn_width_bucket",
    "graph_adamic_adar",
    "graph_local_clustering",
    "graph_modularity_brand_partition",
    "graph_rich_club",
    "join_asof_nearest",
    "join_null_safe_eq",
    "join_unknown_member",
    "merge_scd2_incremental",
    "pipeline_growth_dashboard",
    "schema_evolution_catalog",
    "sql_join_hints",
    "sql_limit_offset",
    "sql_pivot_keyword",
    "sql_unpivot_keyword",
    "sql_values_inline_dim",
    "text_confusable_normalize",
    "text_langid_ngram",
    "text_zipf_slope",
    "ts_business_day_lag",
    "ts_largest_silences",
    "ts_seasonal_naive_forecast",
    "ts_sma_crossover",
    "win_max_drawdown",
    "win_rolling_wau",
    "win_running_vwap",
]


def load_all_ops() -> dict[str, Op]:
    """Import every operator module, then order per ``DRIVER_ORDER``."""
    import insight_gp_import_spark.operators  # noqa: F401  (side-effect imports)

    ordered = {n: REGISTRY[n] for n in DRIVER_ORDER if n in REGISTRY}
    ordered.update({n: o for n, o in REGISTRY.items() if n not in ordered})
    return ordered
