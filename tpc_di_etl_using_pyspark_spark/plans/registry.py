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
# ~50 registry entries per round, so the ops most in need of fresh
# correctness evidence are listed first — everything else follows in
# module order. Round 2: the round-1 type-bug fixes, the restructured
# formerly-rows-only ops, the new FINWIRE warehouse tables, all window
# functions, the TPC-DI family, and the headline LLM-pipeline ops.
# (Rotate this list next round: scalars → streaming → udfs → core.)
_PRIORITY = [
    # round-1 red/unchecked aggregates, now type-fixed / self-verifying
    "agg_conditional",
    "agg_pivot",
    "agg_bool",
    "agg_approx_count_distinct",
    "agg_approx_percentile",
    # formerly rows-only, now exactly SQL-oracled
    "map_ops",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "sim_ivf_topk",
    "sim_ivf_index_partitioned",
    # new FINWIRE / warehouse tables (round 2)
    "tpcdi_dim_company",
    "tpcdi_dim_security",
    "tpcdi_financial",
    "tpcdi_dim_broker",
    "tpcdi_fact_watches",
    "tpcdi_scd2_dimaccount",
    "tpcdi_audit_reconciliation",
    # window family (never driver-checked in round 1)
    "win_row_number",
    "win_rank_dense",
    "win_lead_scd2",
    "win_lag_change",
    "win_running_sum",
    "win_moving_avg",
    "win_range_52wk",
    "win_first_last_value",
    "win_ntile_pct",
    "win_cume_dist",
    "win_forward_fill",
    "win_ratio_total",
    "win_nth_value",
    "win_streaks",
    # headline LLM-pipeline ops
    "text_tfidf",
    "sim_cosine_topk",
    "dedup_cluster_cc",
    "pipeline_corpus_curation",
    "text_label_quality",
    "dedup_exact_hash",
    # round-2 new surfaces
    "stream_stream_join",
    "udtf_map_in_arrow",
    "graph_pagerank",
    "text_unigram_logprob",
    "pack_sequences_greedy",
    "sample_stratified_exact",
    "win_running_distinct",
    "win_pattern_vshape",
    # TPC-DI family, heaviest first (rest follow in module order and
    # rotate into the round-3 window)
    "tpcdi_scd2_dimcustomer",
    "tpcdi_scd2_incremental",
    "tpcdi_fact_cash_balances",
    "tpcdi_fact_market_history",
    "tpcdi_fact_holdings",
    "tpcdi_cdc_apply",
    "tpcdi_marketing_nameplate",
    "tpcdi_prospect_match",
    "tpcdi_dim_date",
    "tpcdi_dim_time",
    "tpcdi_dim_trade",
    "tpcdi_dimessages",
    # late-round-2 additions (outside this round's 50-op window;
    # first in line when the round-3 rotation rewrites this list)
    "sim_rp_lsh_cosine",
    "json_variant_extract",
    "math_try_overflow",
    "str_collate_ci",
    "xml_roundtrip_builtin",
    "sql_pipe_syntax",
    "udf_sql_declarative",
    "udtf_sql_table_fn",
    "pipeline_incremental_dedup",
    "vec_kmeans_refine",
    "scan_python_datasource",
    "stream_transform_with_state",
    "agg_transpose_matrix",
    "udtf_python_lateral",
    "sort_limit_offset",
    "json_variant_explode",
    "join_bloom_runtime_filter",
    "join_dpp_partitioned",
    "tpcdi_scd2_hybrid_type1",
    "scan_csv_multichar_delim",
    "multimodal_image_resize",
    "text_bigram_logprob",
    "sql_groupby_all",
    "str_regexp_extract_all",
    "vec_quantize_pq",
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
    "sample_negative_pairs",
    "win_percent_of_parent",
    "text_js_divergence_sources",
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
