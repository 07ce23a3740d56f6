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

# Certification window rotation: the external driver certifies the
# FIRST ~50 registry entries per round (CORRECTNESS_r0N.json). The op
# surface is FROZEN as of round 4 (VERDICT r3 item 1): no new ops until
# every op has a driver row. The remaining never-certified backlog
# (143 ops after r3) is partitioned into three mechanical windows:
#
#   round 4 (this round, 50): all 36 uncertified §2.H scalars, the 8
#     uncertified §2.I streaming ops, the first 6 §2.J UDF ops.
#   round 5 (next 49): §2.J tail (udf_sql_declarative,
#     udtf_sql_table_fn, udtf_python_lateral), late-round-2 Spark-4
#     surfaces (sql_pipe_syntax, scan/sink_python_datasource,
#     multimodal_image_resize, join_dpp_partitioned, vec_quantize_pq),
#     §2.L remainder (tpcdi_* dims/pnl/reference, events_*), §2.D
#     aggregate tail, sorts/SQL surfaces, csv scan/sink tail. Plus,
#     AT THE FRONT, the ops whose code or oracle changed in round 4
#     (positions 51-57 below: dedup_eval_simhash_recall's sampled
#     truth mode, win_ema_smooth's sign-aware rounding,
#     text_snapshot_novelty + dedup_ngram_containment's short-doc
#     guard, sink_compact_small_files' precondition asserts, the PCA
#     pair's model-relation repartition(1) — queued right after the
#     window so a >50 driver window certifies them immediately; all
#     seven re-verified green at sf0.01 AND sf0.1 this round).
#   round 6 (last 44): remaining scan/sink probes, join variants,
#     window tail, §2.K local-green text/sim/multimodal tail.
#
# After the three windows every already-certified op follows in module
# order via _collect(); nothing is ever dropped from the registry.
_PRIORITY = [
    # --- round-4 certification window (exactly 50, ZERO previously
    # certified ops; VERDICT r3 item 1) ---
    # §2.H scalar family (36) — queued since round 1
    "str_concat_phone",
    "str_substr_trim",
    "str_case_match",
    "str_pad_format",
    "str_regexp",
    "str_split_explode",
    "str_regexp_extract_all",
    "str_levenshtein_link",
    "str_encode_b64_hex",
    "str_url_parse",
    "str_collate_ci",
    "date_parse",
    "date_arith",
    "date_extract",
    "date_trunc_bucket",
    "date_boundaries",
    "date_spine_gapfill",
    "math_round_money",
    "math_ratio_guard",
    "math_functions",
    "math_trig",
    "math_try_overflow",
    "cond_case_when",
    "null_coalesce",
    "cast_types",
    "hash_checksum",
    "bit_ops",
    "json_extract",
    "json_nested_roundtrip",
    "json_variant_extract",
    "json_variant_explode",
    "array_ops",
    "array_fold_dot",
    "array_posexplode",
    "array_exists_forall",
    "xml_roundtrip_builtin",
    # §2.I streaming basics (8)
    "stream_tumbling_count",
    "stream_sliding_sum",
    "stream_session_window",
    "stream_watermark_late",
    "stream_dedup_state",
    "stream_foreachbatch_upsert",
    "stream_stateful_totals",
    "stream_transform_with_state",
    # §2.J UDF/UDAF/UDTF head (6)
    "udf_python_scalar",
    "udf_pandas_scalar",
    "udaf_pandas_grouped",
    "udtf_apply_in_pandas",
    "udtf_map_in_pandas",
    "udf_arrow_scalar",
    # --- positions 51-65: round-4 code-change re-cert candidates.
    # 58-65 are the certified gram-family heads transitively touched
    # by the round-4 shingles() short-doc convention change (docs
    # under k words now emit ZERO shingles, matching every oracle's
    # NULL-gram convention; zero behavioral delta on the ≥3-word
    # fixture — all re-verified MATCH at sf0.01 AND sf0.1 the day of
    # the change, plus on the adversarial fixture). ---
    "dedup_eval_simhash_recall",
    "win_ema_smooth",
    "text_snapshot_novelty",
    "dedup_ngram_containment",
    "sink_compact_small_files",
    "vec_pca_power_iteration",
    "vec_pca_project",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_ngram_jaccard",
    "dedup_chunk_level",
    "dedup_cross_source_matrix",
    "stream_incremental_dedup",
    "pipeline_incremental_dedup",
    "pipeline_pretrain_e2e",
    # certified ops hardened by the round-4 adversarial probe (zero-
    # norm NULLIF guards, lossless CSV/XML round-trip options, ±0.0
    # canonicalization, per-user corr recentering, DECIMAL(38,6)
    # widenings, data-derived SCD2 batch shift) — every one re-verified
    # MATCH on the driver fixture at sf0.01 (full-registry sweep) the
    # day it changed
    "scan_csv_delim",
    "scan_csv_header",
    "scan_xml_flatten",
    "win_nth_value",
    "win_time_weighted_avg",
    "win_rolling_corr",
    "sim_cosine_topk",
    "sim_rp_lsh_cosine",
    "sim_ann_recall_eval",
    "pipeline_rag_e2e",
    "tpcdi_scd2_incremental",
    "tpcdi_dim_broker",
    "tpcdi_batch_e2e",
    # --- round-5 window (49) ---
    "udf_sql_declarative",
    "udtf_sql_table_fn",
    "udtf_python_lateral",
    "sql_pipe_syntax",
    "scan_python_datasource",
    "sink_python_datasource",
    "multimodal_image_resize",
    "join_dpp_partitioned",
    "vec_quantize_pq",
    "tpcdi_marketing_nameplate",
    "tpcdi_prospect_match",
    "tpcdi_dim_date",
    "tpcdi_dim_time",
    "tpcdi_dim_trade",
    "tpcdi_dimessages",
    "tpcdi_scd2_hybrid_type1",
    "tpcdi_holdings_pnl",
    "tpcdi_reference_dims",
    "events_funnel",
    "events_retention",
    "events_active_users_rolling",
    "agg_first_last",
    "agg_rollup",
    "agg_cube",
    "agg_grouping_sets",
    "agg_stats",
    "agg_transpose_matrix",
    "agg_moments_exact",
    "agg_filter_clause",
    "agg_bitmap_distinct",
    "agg_count_distinct_multi",
    "agg_percentile",
    "agg_unpivot",
    "agg_collect_sorted",
    "agg_string_concat_group",
    "agg_weighted_avg",
    "agg_pivot_dynamic",
    "agg_median_mode",
    "agg_regression_exact",
    "agg_histogram_fixed",
    "sketch_hll_partition_merge",
    "sketch_approx_topk",
    "sort_limit_offset",
    "sql_groupby_all",
    "sql_scalar_subquery_corr",
    "sql_lateral_topk",
    "sql_recursive_hierarchy",
    "scan_csv_multichar_delim",
    "sink_csv_quoted",
    # --- round-6 window (44) ---
    "scan_recursive_glob",
    "scan_schema_evolution",
    "sink_sorted_clustered",
    "scan_binaryfile",
    "scan_partition_pruned",
    "join_asof_tolerance",
    "join_null_safe",
    "join_interval_overlap",
    "win_slope_rolling",
    "win_median_rolling",
    "win_percent_of_parent",
    "win_zscore_anomaly",
    "win_sessionize_gap",
    "win_range_time_interval",
    "win_interpolate_linear",
    "text_bigram_logprob",
    "text_js_divergence_sources",
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
