#!/usr/bin/env python
"""Benchmark harness (driver contract): runs the headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line.

Protocol (BASELINE.md): per-query wall-clock, median of 3 runs (first
run doubles as warm-up), full materialization via the noop sink (no
driver collect cost), AQE on.

The JSON line carries `loadavg_start` (1-min loadavg sampled BEFORE
the session starts) so every recorded bench self-documents its
machine-load conditions: runs at loadavg < 0.1 are idle-protocol
numbers; anything higher sits in the ±25–35% drift band BASELINE.md
quantified, and round-over-round adjudication can tell the two apart
without re-litigating the band (VERDICT r7 item 5).
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

from tpc_di_etl_using_pyspark_spark.plans.registry import all_queries  # noqa: E402
from tpc_di_etl_using_pyspark_spark.session import get_spark  # noqa: E402

# Headline set: one representative per major cost shape (scan+agg,
# broadcast star join, temporal range join, window range frame, keyed
# dedup, top-k, tf-idf fan-out, LSH dedup, sessionization, running
# balance, vector top-k, trade-stream holdings, iterative connected
# components, end-to-end corpus curation, FINWIRE SCD2 warehouse build,
# hyperplane-LSH ANN, incremental cross-batch dedup, k-means refine,
# end-to-end multi-batch warehouse program, end-to-end pretraining
# corpus build, exact-substring window dedup, map-side covariance,
# RAG retrieval path, CCNet curation, multi-table quality audit).
HEADLINE = [
    "agg_groupby_basic",
    "join_broadcast",
    "join_range_between",
    "win_range_52wk",
    "dedup_latest_by_key",
    "topk_per_group",
    "text_tfidf",
    "dedup_minhash_lsh",
    "stream_session_window",
    "tpcdi_fact_cash_balances",
    "sim_cosine_topk",
    "tpcdi_fact_holdings",
    "dedup_cluster_cc",
    "pipeline_corpus_curation",
    "tpcdi_dim_security",
    "sim_rp_lsh_cosine",
    "pipeline_incremental_dedup",
    "vec_kmeans_refine",
    "tpcdi_batch_e2e",
    "pipeline_pretrain_e2e",
    "dedup_substring_windows",
    "vec_covariance_matrix",
    "pipeline_rag_e2e",
    "pipeline_ccnet_e2e",
    "audit_data_quality",
    "text_bm25_topk",
    "vec_pca_power_iteration",
]

RUNS = 3
LOADAVG_START = -1.0  # set by main() before the JVM starts


def calibration_sec(spark) -> float:
    """Fixed host-speed probe (VERDICT r8 item 5): a constant
    never-rotated in-memory range+agg with NO file IO, so every
    recorded bench carries a machine-speed divisor. The r8 idle
    plateau moved +17% with byte-identical code; this makes
    cross-session totals comparable instead of adjudicated. Partition
    count is pinned (64) so session confs can't change the work."""
    q = (
        spark.range(0, 1 << 28, 1, 64)
        .selectExpr("id", "id * 2654435761 % 1000003 AS h")
        .groupBy((F.col("h") % 64).alias("b"))
        .agg(F.sum("id").alias("s"), F.count(F.lit(1)).alias("n"))
    )
    runs = []
    for i in range(RUNS + 1):  # first run is the JIT warm-up
        t0 = time.perf_counter()
        q.write.mode("overwrite").format("noop").save()
        if i > 0:
            runs.append(time.perf_counter() - t0)
    return round(statistics.median(runs), 3)


def main() -> None:
    global LOADAVG_START
    # sample BEFORE the JVM starts — the bench's own executors would
    # otherwise dominate the 1-min average and hide pre-existing load
    LOADAVG_START = round(os.getloadavg()[0], 2)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = os.path.basename(os.path.normpath(sf_dir)).replace("sf", "")
    spark = get_spark("tpcdi-engine-bench")
    spark.sparkContext.setLogLevel("ERROR")
    # calibration runs FIRST, always at the same session position, so
    # its number is comparable across rounds regardless of what the
    # headline set does afterwards — and AGAIN after the headline set
    # (VERDICT r9 item 5): a start-sampled divisor alone cannot
    # witness within-run host drift, so the bracket [start, end] is
    # recorded and BASELINE.md adjudication uses both ends
    calib = calibration_sec(spark)
    queries = all_queries()

    # Global JIT warm-up pass (round 3 protocol addition): one untimed
    # run of every headline query before any timing. Without it the
    # first queries in the list pay whole-session JIT compilation that
    # later queries get for free — measured as a spurious +27% on
    # join_broadcast at position 2 in round 2 (BASELINE.md round-3
    # row); per-query warm-ups alone don't remove the position effect.
    for name in HEADLINE:
        spark.sparkContext.setJobDescription(f"warmup:{name}")  # guide §1.5
        queries[name](spark, sf_dir).write.mode("overwrite").format("noop").save()
        spark.catalog.clearCache()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = queries[name]
        runs = []
        for i in range(RUNS + 1):  # first run is the warm-up (BASELINE.md protocol)
            spark.sparkContext.setJobDescription(f"bench:{name} run{i}")
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
            if i > 0:
                runs.append(time.perf_counter() - t0)
        spark.sparkContext.setJobDescription(None)
        timings[name] = round(statistics.median(runs), 3)
        # ops that cache intermediates (minhash, incremental dedup,
        # kmeans) would otherwise leak cached RDDs into the long-lived
        # session and skew the queries that follow
        spark.catalog.clearCache()

    total = round(sum(timings.values()), 3)
    calib_end = calibration_sec(spark)
    print(
        json.dumps(
            {
                "metric": "headline_total_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                "spark": spark.version,
                "runs_per_query": RUNS,
                "loadavg_start": LOADAVG_START,
                "calibration_sec": calib,
                "calibration_end_sec": calib_end,
            }
        )
    )


if __name__ == "__main__":
    main()
