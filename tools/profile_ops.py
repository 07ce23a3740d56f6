#!/usr/bin/env python
"""Isolated per-op profiler for the optimization rounds (guide §1).

For each requested op: one warm-up + N timed runs to the noop sink
(median reported), labelled via setJobDescription, and the
explain("formatted") dumped to plans/<tag>/<op>_<suffix>.txt so the
plan evidence matches the recorded timing. Caches cleared between ops
(same discipline as bench.py / the driver).

Usage:
  python tools/profile_ops.py [--runs N] [--tag r13] [--suffix before]
                              [--no-plans] op1 op2 ...
Prints one JSON line: {"op": sec, ...} plus loadavg bracket.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tpc_di_etl_using_pyspark_spark.plans.registry import all_queries  # noqa: E402
from tpc_di_etl_using_pyspark_spark.session import get_spark  # noqa: E402


def _formatted_plan(df) -> str:
    return df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("ops", nargs="+")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--tag", default="r13")
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--no-plans", action="store_true")
    ap.add_argument(
        "--bench-protocol",
        action="store_true",
        help="clear caches between OPS only (bench.py/driver discipline: "
        "an op's warm-up run materializes its internal cache()s and the "
        "timed runs reuse them via the CacheManager's canonicalized-plan "
        "match); default clears per RUN (cold-cache isolation)",
    )
    args = ap.parse_args()

    load0 = round(os.getloadavg()[0], 2)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("op-profile")
    spark.sparkContext.setLogLevel("ERROR")
    queries = all_queries()
    plan_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        args.tag,
    )
    os.makedirs(plan_dir, exist_ok=True)

    out: dict[str, float] = {}
    for op in args.ops:
        fn = queries[op]
        spark.catalog.clearCache()
        if not args.no_plans:
            with open(
                os.path.join(plan_dir, f"{op}_{args.suffix}.txt"), "w"
            ) as fh:
                fh.write(_formatted_plan(fn(spark, sf_dir)))
        runs = []
        for i in range(args.runs + 1):  # first run is the warm-up
            if not args.bench_protocol:
                spark.catalog.clearCache()
            spark.sparkContext.setJobDescription(f"{op} run{i}")
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
            if i > 0:
                runs.append(time.perf_counter() - t0)
        spark.sparkContext.setJobDescription(None)
        out[op] = round(statistics.median(runs), 3)
        print(f"#   {op}: {out[op]}  {[round(r, 3) for r in runs]}", file=sys.stderr)

    print(
        json.dumps(
            {
                "timings": out,
                "loadavg_start": load0,
                "loadavg_end": round(os.getloadavg()[0], 2),
                "sf_dir": sf_dir,
                "runs": args.runs,
            }
        )
    )


if __name__ == "__main__":
    main()
