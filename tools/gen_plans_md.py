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
