#!/usr/bin/env python
"""Scaling probe: runs headline queries at sf0.1 and at a 5×-replicated
copy (keys shifted per replica so join/group cardinalities scale too,
document text perturbed per replica so dup structure stays linear),
then reports wall-clock ratios. A ratio ≲ replica factor means the op
scales linearly or better (partial aggregation / broadcast holding);
a super-linear ratio flags a quadratic join or a collapsing partition.

Writes SCALING.md. Usage: python tools/scale_probe.py
  --only OP [OP ...]  probe just the named ops and PRINT the rows
                      (no SCALING.md rewrite — for re-measuring a
                      single op after a plan rewrite); reuses the 5×
                      copy if present, pass --rebuild to force
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from tpc_di_etl_using_pyspark_spark.plans.registry import all_queries  # noqa: E402
from tpc_di_etl_using_pyspark_spark.plans._util import TABLES, t  # noqa: E402
from tpc_di_etl_using_pyspark_spark.session import get_spark  # noqa: E402

BASE = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SCALED = "/tmp/spark_graft_scaled/sf0.5x"
REPLICAS = 5

# Logical key domains: every column in a domain shifts by the SAME
# offset (the domain-wide max + 1), so foreign keys stay aligned across
# replicas even when one side's max is smaller (customers without
# orders etc.). nation/region are fixed reference domains, copied as-is.
KEY_DOMAINS = {
    "cust": [("customer", "c_custkey"), ("orders", "o_custkey")],
    "order": [("orders", "o_orderkey"), ("lineitem", "l_orderkey")],
    "supp": [("supplier", "s_suppkey"), ("lineitem", "l_suppkey")],
    "part": [("part", "p_partkey"), ("lineitem", "l_partkey")],
    "doc": [("documents", "doc_id"), ("embeddings", "vec_id")],
    "user": [("events", "user_id")],
    "event": [("events", "event_id")],
}

PROBE = [
    # r9 third-session elevation (regex-anchor class): the one edited
    # op not already probed — nation-blocked quadratic candidate join,
    # worth watching at 5× (str_collate_ci / dedup_url_canonical are
    # probed below).
    "str_levenshtein_link",
    "agg_groupby_basic",
    "join_broadcast",
    "join_range_between",
    "join_skew_salted",
    "win_range_52wk",
    "dedup_latest_by_key",
    "text_tfidf",
    "dedup_minhash_lsh",
    "dedup_cluster_cc",
    "tpcdi_fact_cash_balances",
    "tpcdi_fact_holdings",
    "pipeline_corpus_curation",
    "sim_cosine_topk",
    "tpcdi_dim_security",
    "tpcdi_fact_watches",
    "tpcdi_scd2_dimaccount",
    "dedup_chunk_level",
    "text_ngram_topk",
    "win_sessionize_gap",
    "graph_triangle_count",
    "vec_l2_normalize",
    "vec_quantize_int8",
    "vec_centroid_per_label",
    "sketch_hll_partition_merge",
    "sim_rp_lsh_cosine",
    "pipeline_incremental_dedup",
    "vec_kmeans_refine",
    "vec_quantize_pq",
    "events_active_users_rolling",
    "tpcdi_holdings_pnl",
    "dedup_simhash",
    "dedup_simhash_hamming",
    "win_time_weighted_avg",
    "sim_ann_recall_eval",
    "pipeline_pretrain_e2e",
    "tpcdi_batch_e2e",
    "graph_pagerank",
    "graph_label_propagation",
    "multimodal_dedup_sha",
    "pipeline_multimodal_e2e",
    "sim_ivf_multiprobe_topk",
    "dedup_substring_windows",
    "text_keyword_topk",
    "text_snapshot_novelty",
    "multimodal_phash_neardup",
    "dedup_cross_source_matrix",
    "text_quality_gopher",
    "text_chunk_overlap",
    "text_perplexity_bucket",
    "vec_covariance_matrix",
    "pipeline_rag_e2e",
    "dedup_url_canonical",
    "pipeline_ccnet_e2e",
    "events_attribution_last_touch",
    "audit_data_quality",
    "sample_epoch_shuffle",
    "events_markov_transitions",
    "stream_incremental_dedup",
    "stream_quality_gate",
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
    "dedup_ngram_jaccard",
    # round-9 boundary-fix elevations not already probed above (the
    # other 9 edited ops were in the list from earlier rounds)
    "stream_session_window",
    "join_asof_latest",
    "join_asof_tolerance",
    "win_interpolate_linear",
    "stream_watermark_late",
    "stream_foreachbatch_upsert",
    "win_pattern_vshape",
    # round-5 window ops (full certification-window scale coverage)
    "sink_compact_small_files",
    "udf_sql_declarative",
    "udtf_sql_table_fn",
    "udtf_python_lateral",
    "sql_pipe_syntax",
    "scan_python_datasource",
    "sink_python_datasource",
    "multimodal_image_resize",
    "join_dpp_partitioned",
    "tpcdi_marketing_nameplate",
    "tpcdi_prospect_match",
    "tpcdi_dim_date",
    "tpcdi_dim_time",
    "tpcdi_dim_trade",
    "tpcdi_dimessages",
    "tpcdi_scd2_hybrid_type1",
    "tpcdi_reference_dims",
    "events_funnel",
    "events_retention",
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
    "sketch_approx_topk",
    "sort_limit_offset",
    "str_collate_ci",
    "tpcdi_dim_broker",
    "str_url_parse",
    "json_variant_extract",
    "scan_csv_delim",
    "scan_csv_header",
    "tpcdi_scd2_incremental",
    # round-6 additions
    "sink_merge_upsert",
    "vec_pca_domain_check",
    # round-7 window: the remaining first-certification queue ops
    # (graph_triangle_count and the two additions are already above)
    "text_pii_redact",
    "text_normalize_unicode",
    "sim_quantized_topk",
    "text_length_histogram",
    "text_contamination_ngram",
    "text_repetition_score",
    "text_quality_linear",
    "sample_temperature_mixture",
    "text_bpe_pair_count",
    # round-8 window: the 40 r1/r2-certified ops not yet in the probe
    # (full certification-window scale coverage, r5 precedent — these
    # ops' scale behavior was otherwise last measured 6-7 rounds ago)
    "sort_multi",
    "limit_n",
    "topk_per_group",
    "set_except",
    "dedup_exact",
    "sql_api_revenue_ranking",
    "set_symmetric_diff",
    "sql_exists_decorrelated",
    "agg_conditional",
    "agg_pivot",
    "agg_bool",
    "agg_approx_count_distinct",
    "agg_approx_percentile",
    "map_ops",
    "sim_ivf_topk",
    "sim_ivf_index_partitioned",
    "tpcdi_dim_company",
    "tpcdi_financial",
    "tpcdi_audit_reconciliation",
    "win_row_number",
    "win_rank_dense",
    "win_lead_scd2",
    "win_lag_change",
    "win_running_sum",
    "win_moving_avg",
    "win_first_last_value",
    "win_ntile_pct",
    "win_cume_dist",
    "win_forward_fill",
    "win_ratio_total",
    "win_nth_value",
    "win_streaks",
    "text_label_quality",
    "dedup_exact_hash",
    "stream_stream_join",
    "udtf_map_in_arrow",
    "text_unigram_logprob",
    "pack_sequences_greedy",
    "sample_stratified_exact",
    "win_running_distinct",
]


def _base_fingerprint() -> str:
    """Identity of the BASE fixture the 5× copy was replicated from:
    path + per-table (size, mtime_ns). A regenerated fixture changes
    this even when file names don't."""
    parts = [BASE]
    for name in sorted(TABLES):
        p = f"{BASE}/{name}.parquet"
        try:
            st = os.stat(p)
            parts.append(f"{name}:{st.st_size}:{st.st_mtime_ns}")
        except OSError:
            parts.append(f"{name}:absent")
    return "|".join(parts)


def _scaled_is_current() -> bool:
    """True iff the existing 5× copy was built from the CURRENT base
    fixture. Without this, --only silently reused a /tmp copy built
    from a since-regenerated fixture and the printed ratio compared
    mismatched data (ADVICE r10) — the ratios feed SCALING.md rows."""
    marker = f"{SCALED}/.base_fingerprint"
    try:
        stored = open(marker).read()
    except OSError:
        print(f"[scale_probe] no fingerprint marker at {marker}; rebuilding")
        return False
    if stored != _base_fingerprint():
        print(
            "[scale_probe] 5x copy is STALE (base fixture changed since "
            "the copy was built); rebuilding"
        )
        return False
    return True


def build_scaled(spark) -> None:
    shutil.rmtree(SCALED, ignore_errors=True)
    os.makedirs(SCALED, exist_ok=True)
    # one offset per domain, from the domain-wide max
    offsets: dict[tuple[str, str], int] = {}
    for members in KEY_DOMAINS.values():
        dom_max = max(
            t(spark, BASE, tbl).agg(F.max(col)).first()[0] for tbl, col in members
        )
        for tbl, col in members:
            offsets[(tbl, col)] = dom_max + 1
    for name in TABLES:
        out = f"{SCALED}/{name}.parquet"
        df = t(spark, BASE, name)
        shifts = [(col, off) for (tbl, col), off in offsets.items() if tbl == name]
        if not shifts:
            df.write.mode("overwrite").parquet(out)
            continue
        parts = []
        for r in range(REPLICAS):
            p = df
            for col, off in shifts:
                p = p.withColumn(col, (F.col(col) + F.lit(r * off)).cast("long"))
            if name == "documents" and r > 0:
                # keep near-dup structure linear: replica text is distinct
                p = p.withColumn("text", F.concat("text", F.lit(f" replica{r}")))
            parts.append(p)
        scaled = parts[0]
        for p in parts[1:]:
            scaled = scaled.unionByName(p)
        scaled.write.mode("overwrite").parquet(out)
    with open(f"{SCALED}/.base_fingerprint", "w") as f:
        f.write(_base_fingerprint())


def _time_one(spark, qs, name: str, sf_dir: str) -> float:
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        qs[name](spark, sf_dir).write.mode("overwrite").format("noop").save()
        best = min(best, time.perf_counter() - t0)
    return best


def time_interleaved(spark) -> tuple[dict[str, float], dict[str, float]]:
    """Per query: best-of-3 at base, then best-of-3 at 5×, back to back.
    Interleaving means any machine-level drift (page cache, competing
    load) hits both sides of each ratio equally instead of biasing one
    whole pass — two sequential passes produced <1× 'ratios' when the
    base pass contended with another JVM."""
    qs = all_queries()
    base: dict[str, float] = {}
    big: dict[str, float] = {}
    for name in PROBE:
        qs[name](spark, BASE).write.mode("overwrite").format("noop").save()  # warm-up
        base[name] = _time_one(spark, qs, name, BASE)
        big[name] = _time_one(spark, qs, name, SCALED)
    return base, big


def main() -> None:
    only = []
    if "--only" in sys.argv:
        only = [a for a in sys.argv[sys.argv.index("--only") + 1:]
                if not a.startswith("--")]
        unknown = [o for o in only if o not in all_queries()]
        if unknown:
            print(f"unknown op name(s): {unknown}", file=sys.stderr)
            sys.exit(2)
    spark = get_spark("scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    if only:
        if (
            "--rebuild" in sys.argv
            or not os.path.isdir(SCALED)
            or not _scaled_is_current()
        ):
            build_scaled(spark)
        else:
            print(f"[scale_probe] reusing current 5x copy at {SCALED}")
        spark.stop()
        spark = get_spark("scale-probe-measure")
        spark.sparkContext.setLogLevel("ERROR")
        qs = all_queries()
        print("| Query | sf0.1 (s) | 5× (s) | ratio |")
        print("| --- | --- | --- | --- |")
        for name in only:
            qs[name](spark, BASE).write.mode("overwrite").format("noop").save()
            b = _time_one(spark, qs, name, BASE)
            g = _time_one(spark, qs, name, SCALED)
            print(f"| `{name}` | {b:.2f} | {g:.2f} | {g / b:.1f}× |", flush=True)
        return
    build_scaled(spark)
    # Measure in a FRESH session: the 5x build leaves the JVM heap full
    # of write/shuffle state whose GC churn contaminated earlier probe
    # runs (observed 16x-vs-1.0x run-to-run swings on the same op).
    spark.stop()
    spark = get_spark("scale-probe-measure")
    spark.sparkContext.setLogLevel("ERROR")
    base, big = time_interleaved(spark)
    lines = [
        "# SCALING — 5× volume probe (auto-generated by tools/scale_probe.py)",
        "",
        f"Interleaved best-of-3 wall-clock at `{BASE}` vs a {REPLICAS}× replicated copy",
        "(keys shifted per replica → cardinalities scale; document text",
        "perturbed → dup structure stays linear). Ratio ≲ 5 ⇒ the op's cost",
        "grows at most linearly with volume at this scale.",
        "",
        "| Query | sf0.1 (s) | 5× (s) | ratio |",
        "| --- | --- | --- | --- |",
    ]
    for name in PROBE:
        r = big[name] / base[name] if base[name] > 0 else float("nan")
        lines.append(f"| `{name}` | {base[name]:.2f} | {big[name]:.2f} | {r:.1f}× |")
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "SCALING.md"
    )
    # preserve everything from the first preserved-section marker on
    # (adjudication notes, the 25× dedup probe section) — only the 5×
    # table above it is regenerated
    preserved = ""
    if os.path.exists(path):
        old = open(path).read()
        if "<!-- preserved -->" in old:
            preserved = "\n\n" + old[old.index("<!-- preserved -->"):].rstrip() + "\n"
    with open(path, "w") as f:
        f.write("\n".join(lines) + ("\n" if not preserved else preserved))
    print("\n".join(lines))


if __name__ == "__main__":
    main()
