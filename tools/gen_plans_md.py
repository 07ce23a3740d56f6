#!/usr/bin/env python
"""Regenerate PLANS.md — physical-plan evidence for the headline
queries (the ones bench.py times): operator tree plus the scan lines
that prove pushdown/pruning. The claims tests/test_plans.py asserts,
in reviewable form."""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import HEADLINE  # noqa: E402
from tpc_di_etl_using_pyspark_spark.plans.registry import all_queries  # noqa: E402
from tpc_di_etl_using_pyspark_spark.session import get_spark  # noqa: E402

KEEP_DETAIL = ("PushedFilters", "ReadSchema", "PartitionFilters", "Bucketed")


def _ref(op: str) -> str:
    """Live file:line for a registered op (inspect, never hand-pinned —
    the hand-pinned refs in this table drifted two rounds running)."""
    import inspect

    fn = all_queries()[op]
    path = os.path.relpath(
        inspect.getsourcefile(fn),
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     "tpc_di_etl_using_pyspark_spark"),
    )
    return f"{path}:{inspect.getsourcelines(fn)[1]}"


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("plan-audit")
    spark.sparkContext.setLogLevel("ERROR")
    queries = all_queries()
    out = [
        "# PLANS — physical-plan evidence for the headline queries (auto-generated)",
        "",
        f"`explain(formatted)` operator trees at `{sf_dir}`, trimmed to the",
        "operator list plus scan details (pushdown / pruning / bucketing).",
        "Regenerate with `python tools/gen_plans_md.py`. Plan-shape",
        "invariants are asserted in `tests/test_plans.py`.",
        "",
        "## Persisted artifacts at production scale",
        "",
        "The driver contract makes every registry op self-contained (one",
        "callable, base tables in, result out), so ops that APPLY a learned",
        "model recompute it in-plan. In production the model relations below",
        "are computed once, persisted, and loaded by the apply step — the",
        "apply-side plan is unchanged, only the upstream subtree is replaced",
        "by a scan. Which ops recompute, what production persists, and where",
        "the index-at-rest variant already exists in this repo:",
        "",
        "| Recomputing op | Model relation production persists | Index-at-rest variant |",
        "| --- | --- | --- |",
        f"| `vec_pca_project` ({_ref('vec_pca_project')}) | 64-row PCA direction from"
        f" `vec_pca_power_iteration` ({_ref('vec_pca_power_iteration')}) | the direction IS the"
        " artifact — tiny table or broadcast file |",
        f"| `sim_ivf_topk` / `sim_ivf_multiprobe_topk` ({_ref('sim_ivf_topk')} /"
        f" {_ref('sim_ivf_multiprobe_topk')}) |"
        " centroids + cell assignments | `sim_ivf_index_partitioned`"
        f" ({_ref('sim_ivf_index_partitioned')}) writes the cell-partitioned index and asserts"
        " partition pruning on probe |",
        f"| `stream_incremental_dedup` ({_ref('stream_incremental_dedup')}) | capped"
        " band-bucket index + shingle sets (streaming/ops.py"
        " `build_corpus_index`) | `pipeline_incremental_dedup`"
        f" ({_ref('pipeline_incremental_dedup')}) exercises the standing-index probe; production"
        " writes the index partitioned by band |",
        f"| `vec_kmeans_refine` ({_ref('vec_kmeans_refine')}) | k×dim centroid relation"
        " per iteration | centroids are the artifact; each refine step reads"
        " the previous iteration's table |",
        f"| `vec_quantize_pq` ({_ref('vec_quantize_pq')}) | 32-row PQ codebook |"
        " codebook broadcasts from a persisted tiny table |",
        f"| `dedup_eval_simhash_recall` ({_ref('dedup_eval_simhash_recall')}) | the"
        " dedup_simhash prediction pair set (it IS the dedup output, already"
        " persisted by any production dedup run) — the truth side samples per"
        " run by md5(doc_id) and persists nothing | n/a (measurement, not a"
        " model; the in-plan preds recompute is the self-containment tax) |",
        "",
    ]
    for name in HEADLINE:
        df = queries[name](spark, sf_dir)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        )
        ops = [l.strip() for l in plan.splitlines() if re.match(r"^\(\d+\)", l)]
        details = [
            l.strip()
            for l in plan.splitlines()
            if any(k in l for k in KEEP_DETAIL)
        ]
        out += [f"## `{name}`", "", "```text"]
        out += ops
        if details:
            out += ["--"] + details
        out += ["```", ""]
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "PLANS.md"
    )
    with open(path, "w") as f:
        f.write("\n".join(out))
    print(f"wrote {path}: {len(HEADLINE)} plans")


if __name__ == "__main__":
    main()
