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
# surface is FROZEN as of round 4 (VERDICT r3 item 1): no new ops
# until every op has a driver row. Cumulative r1-r4: 196 distinct ops
# driver-certified green, zero regressions. Remaining backlog: 93
# never-certified ops + 7 ops whose code/oracle changed in round 4
# after their last driver row = 100 = exactly two 50-op windows.
#
#   round 5 (THIS round, positions 1-50): the 7 round-4-changed ops
#     FIRST (VERDICT r4 item 1 ordering: dedup_eval_simhash_recall's
#     sampled truth mode, win_ema_smooth's sign-aware rounding,
#     text_snapshot_novelty + dedup_ngram_containment's short-doc
#     guard, sink_compact_small_files' precondition asserts, the PCA
#     pair's model-relation repartition(1)), then the first 43 of the
#     never-certified r5 window (SS2.J tail, Spark-4 surfaces, SS2.L
#     remainder, SS2.D aggregate tail). A >50 driver window (VERDICT
#     r4 item 6) immediately certifies the overflow below.
#   round 6 (positions 51+): FIRST the 9 ops whose code or oracle
#     changed during round 5 (ADVICE hardening + adversarial \N-pool
#     and astral-wave findings — see the in-list comments; all
#     re-verified MATCH at sf0.01 + sf0.1 + adversarial the day of
#     the change), then the
#     last 6 of the r5 window (sql_groupby_all .. sink_csv_quoted),
#     then the 44-op r6 window (remaining scan/sink probes, join
#     variants, window tail, SS2.K local-green text/sim/multimodal
#     tail). A 50-op r6 window certifies through position 99; any
#     remainder rolls to r7 unless the driver window widens.
#
# Behind the windows: the already-driver-certified ops re-verified
# after round-4 hardening (gram-family heads, adversarial-probe
# fixes) retain elevated positions for a fast re-cert if a window
# ever widens; then every other certified op follows in module order
# via _collect(). Nothing is ever dropped from the registry.
_PRIORITY = [
    # --- round-5 certification window (50 = 7 changed + 43 new) ---
    # round-4 code/oracle-changed ops needing fresh driver rows (7)
    "dedup_eval_simhash_recall",
    "win_ema_smooth",
    "text_snapshot_novelty",
    "dedup_ngram_containment",
    "sink_compact_small_files",
    "vec_pca_power_iteration",
    "vec_pca_project",
    # never-driver-certified r5 window head (43)
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
    # --- round-5 changed ops: code or oracle edited AFTER their last
    # driver row (ADVICE hardening + adversarial findings: ASCII-gated
    # collation fixture, dim_broker \N-safe CSV hop, \A..\z URL gate +
    # empty-query NULL, variant NULL->VOID mapping, _bs_escape CSV
    # round trips, _batch_date_shift guard). All re-verified MATCH at
    # sf0.01 + sf0.1 + adversarial the day of the change; queued here
    # so the NEXT window (or a >50 window now) re-certifies them. ---
    "str_collate_ci",
    "tpcdi_dim_broker",
    "str_url_parse",
    "json_variant_extract",
    "scan_csv_delim",
    "scan_csv_header",
    "tpcdi_scd2_incremental",
    "tpcdi_batch_e2e",
    # astral-wave fix: ASCII-gated linkage (DuckDB levenshtein counts
    # bytes, Spark codepoints) — re-verified sf0.01 + sf0.1 + hostile
    "str_levenshtein_link",
    # --- round-6 certification window (50 = 6 overflow + 44) ---
    "sql_groupby_all",
    "sql_scalar_subquery_corr",
    "sql_lateral_topk",
    "sql_recursive_hierarchy",
    "scan_csv_multichar_delim",
    "sink_csv_quoted",
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
    # --- certified ops re-verified after round-4 hardening (21) ---
    # gram-family heads transitively touched by the r4 shingles()
    # short-doc convention change (re-verified MATCH sf0.01 + sf0.1)
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_ngram_jaccard",
    "dedup_chunk_level",
    "dedup_cross_source_matrix",
    "stream_incremental_dedup",
    "pipeline_incremental_dedup",
    "pipeline_pretrain_e2e",
    # adversarial-probe hardening re-verifications (r4, all MATCH)
    "scan_xml_flatten",
    "win_nth_value",
    "win_time_weighted_avg",
    "win_rolling_corr",
    "sim_cosine_topk",
    "sim_rp_lsh_cosine",
    "sim_ann_recall_eval",
    "pipeline_rag_e2e",
    # --- round-4 window, certified r4 (50) ---
    "str_concat_phone",
    "str_substr_trim",
    "str_case_match",
    "str_pad_format",
    "str_regexp",
    "str_split_explode",
    "str_regexp_extract_all",
    "str_encode_b64_hex",
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
    "json_variant_explode",
    "array_ops",
    "array_fold_dot",
    "array_posexplode",
    "array_exists_forall",
    "xml_roundtrip_builtin",
    "stream_tumbling_count",
    "stream_sliding_sum",
    "stream_session_window",
    "stream_watermark_late",
    "stream_dedup_state",
    "stream_foreachbatch_upsert",
    "stream_stateful_totals",
    "stream_transform_with_state",
    "udf_python_scalar",
    "udf_pandas_scalar",
    "udaf_pandas_grouped",
    "udtf_apply_in_pandas",
    "udtf_map_in_pandas",
    "udf_arrow_scalar",
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
