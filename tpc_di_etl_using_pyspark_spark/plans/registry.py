"""Merged op registry — the single source for __spark_entry__.py.

Each plans/ module contributes (QUERIES, ORACLES); keys are SURVEY §2
op IDs. Ops present in QUERIES but absent from ORACLES are rows-only
checks (approx/nondeterministic/not SQL-expressible).
"""

from __future__ import annotations

from collections.abc import Callable
from importlib import import_module

from pyspark.sql import DataFrame, SparkSession

_MODULES = [
    "core_scans",
    "core_relational",
    "core_agg",
    "core_window",
    "scalars",
    "streaming_ops",
    "udfs",
    "llm",
    "tpcdi_ops",
]

# Certification window rotation: the external driver checks the first
# ~50 registry entries per round. Round 3 leads with ops whose code or
# oracle changed this round, then the never-certified backlog ordered
# per VERDICT r2 item 1 (TPC-DI remainder, late-round-2 surfaces, the
# twice-queued scalar family, canonical aggregates). 98 ops certified
# in r1+r2 sit after every never-certified op.
_PRIORITY = [
    # --- round-3 certification window (first ~50) ---
    # new or code-changed this round — need a (re)certification row
    "text_bm25_topk",
    "dedup_ngram_containment",
    "win_ema_smooth",
    "sketch_count_min",
    "win_rolling_corr",
    "vec_pca_power_iteration",
    "sketch_bloom_filter",
    "agg_mad_anomaly",
    "vec_pca_project",
    "events_path_trigrams",
    "dedup_eval_simhash_recall",
    "sink_compact_small_files",
    "text_ngram_topk",
    "dedup_chunk_level",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "stream_quality_gate",
    "stream_incremental_dedup",
    "events_attribution_last_touch",
    "audit_data_quality",
    "pipeline_ccnet_e2e",
    "sample_epoch_shuffle",
    "events_markov_transitions",
    "pipeline_rag_e2e",
    "dedup_url_canonical",
    "text_chunk_overlap",
    "text_perplexity_bucket",
    "vec_covariance_matrix",
    "dedup_substring_windows",
    "text_keyword_topk",
    "text_snapshot_novelty",
    "multimodal_phash_neardup",
    "dedup_cross_source_matrix",
    "text_quality_gopher",
    "tpcdi_batch_e2e",
    "dedup_simhash",
    "dedup_simhash_hamming",
    "sim_rp_lsh_cosine",
    "vec_kmeans_refine",
    "sample_negative_pairs",
    "join_bloom_runtime_filter",
    "pipeline_incremental_dedup",
    "pipeline_pretrain_e2e",
    "sim_ann_recall_eval",
    "sim_ivf_multiprobe_topk",
    "multimodal_dedup_sha",
    "graph_label_propagation",
    "pipeline_multimodal_e2e",
    "win_time_weighted_avg",
    # TPC-DI remainder, never driver-checked
    "tpcdi_cdc_apply",
    "tpcdi_marketing_nameplate",
    "tpcdi_prospect_match",
    "tpcdi_dim_date",
    "tpcdi_dim_time",
    "tpcdi_dim_trade",
    "tpcdi_dimessages",
    # late-round-2 surfaces, never driver-checked
    "json_variant_extract",
    "json_variant_explode",
    "sql_pipe_syntax",
    "udf_sql_declarative",
    "udtf_sql_table_fn",
    "udtf_python_lateral",
    "scan_python_datasource",
    "sink_python_datasource",
    "stream_transform_with_state",
    "multimodal_image_resize",
    "join_dpp_partitioned",
    "vec_quantize_pq",
    # §2.H scalar family (queued since round 1)
    "str_concat_phone",
    "str_substr_trim",
    "str_case_match",
    "str_pad_format",
    "str_regexp",
    "str_split_explode",
    "date_parse",
    "date_arith",
    "date_extract",
    "date_trunc_bucket",
    "math_round_money",
    "math_ratio_guard",
    "cond_case_when",
    "null_coalesce",
    "cast_types",
    "json_extract",
    "array_ops",
    "array_fold_dot",
    "hash_checksum",
    "math_try_overflow",
    # §2.D canonical aggregate rows still local-green only
    "agg_first_last",
    "agg_rollup",
    "agg_cube",
    "agg_grouping_sets",
    "agg_stats",
    # --- beyond the window: every remaining op without a driver
    # CORRECTNESS row, queued for rounds 4+ (rotate to the front then);
    # already-certified ops follow in module order via _collect() ---
    "str_collate_ci",
    "xml_roundtrip_builtin",
    "agg_transpose_matrix",
    "sort_limit_offset",
    "tpcdi_scd2_hybrid_type1",
    "scan_csv_multichar_delim",
    "text_bigram_logprob",
    "sql_groupby_all",
    "str_regexp_extract_all",
    "sql_scalar_subquery_corr",
    "sink_csv_quoted",
    "win_slope_rolling",
    "agg_moments_exact",
    "win_median_rolling",
    "agg_filter_clause",
    "scan_recursive_glob",
    "events_active_users_rolling",
    "tpcdi_holdings_pnl",
    "agg_bitmap_distinct",
    "agg_count_distinct_multi",
    "win_percent_of_parent",
    "text_js_divergence_sources",
    "scan_schema_evolution",
    "sink_sorted_clustered",
    "scan_binaryfile",
    "scan_partition_pruned",
    "sql_lateral_topk",
    "join_asof_tolerance",
    "sql_recursive_hierarchy",
    "join_null_safe",
    "join_interval_overlap",
    "agg_percentile",
    "agg_unpivot",
    "agg_collect_sorted",
    "agg_string_concat_group",
    "agg_weighted_avg",
    "agg_pivot_dynamic",
    "agg_median_mode",
    "agg_regression_exact",
    "sketch_hll_partition_merge",
    "sketch_approx_topk",
    "agg_histogram_fixed",
    "win_zscore_anomaly",
    "win_sessionize_gap",
    "win_range_time_interval",
    "win_interpolate_linear",
    "str_levenshtein_link",
    "date_boundaries",
    "array_posexplode",
    "math_functions",
    "str_encode_b64_hex",
    "str_url_parse",
    "bit_ops",
    "math_trig",
    "date_spine_gapfill",
    "array_exists_forall",
    "json_nested_roundtrip",
    "stream_tumbling_count",
    "stream_sliding_sum",
    "stream_session_window",
    "stream_watermark_late",
    "stream_dedup_state",
    "stream_foreachbatch_upsert",
    "stream_stateful_totals",
    "udf_python_scalar",
    "udf_pandas_scalar",
    "udaf_pandas_grouped",
    "udtf_apply_in_pandas",
    "udtf_map_in_pandas",
    "udf_arrow_scalar",
    "text_tokenize_counts",
    "text_stats",
    "text_lang_id",
    "text_quality_score",
    "text_token_count",
    "text_fingerprint",
    "dedup_keep_best",
    "sim_knn_join",
    "sim_embedding_neardup",
    "dedup_semantic_cluster",
    "multimodal_join",
    "multimodal_binary_features",
    "multimodal_frame_sample",
    "sample_split_assign",
    "text_pii_redact",
    "text_normalize_unicode",
    "vec_quantize_int8",
    "sim_quantized_topk",
    "text_length_histogram",
    "text_contamination_ngram",
    "text_repetition_score",
    "vec_l2_normalize",
    "text_quality_linear",
    "graph_triangle_count",
    "sample_temperature_mixture",
    "vec_centroid_per_label",
    "text_bpe_pair_count",
    "events_funnel",
    "events_retention",
    "tpcdi_reference_dims",
]


def _collect() -> tuple[dict, dict]:
    queries: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    oracles: dict[str, str] = {}
    for mod_name in _MODULES:
        try:
            mod = import_module(f"{__package__}.{mod_name}")
        except ModuleNotFoundError:
            continue  # module not built yet (incremental rounds)
        for k, v in mod.QUERIES.items():
            if k in queries:
                raise ValueError(f"duplicate op id {k!r} in {mod_name}")
            queries[k] = v
        oracles.update(mod.ORACLES)
    missing = [k for k in _PRIORITY if k not in queries]
    if missing:
        raise ValueError(f"_PRIORITY names unknown ops: {missing}")
    ordered = {k: queries[k] for k in _PRIORITY}
    ordered.update({k: v for k, v in queries.items() if k not in ordered})
    return ordered, oracles


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _collect()[0]


def all_oracles() -> dict[str, str]:
    return _collect()[1]
