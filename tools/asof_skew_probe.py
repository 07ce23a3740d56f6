#!/usr/bin/env python
"""Hot-key skew probe for the as-of join family (SURVEY §7.5
round-7 proposal 1 — measure-first, build-only-if-the-knee-breaks).

`join_asof_latest` / `join_asof_tolerance` use the union+window merge:
one shuffle on the key, then a per-key ordered window. At 100 TB the
failure mode is not the join — it is ONE key whose history is so deep
that its single-task window sort dominates the stage (a hot instrument
with 1e8 ticks). This probe replicates one user's `events` rows K×
(distinct event_ids, same user_id) on top of the sf0.1 base and times
the op as the hot key grows from ~0.1% to ~90% of the table, printing
seconds per K plus the hot-key share. A roughly-linear curve in
hot-row count means the sort is the only cost and a range-bucketed
rewrite is NOT yet justified; a super-linear knee (spill / single-task
straggler wall) is the evidence that would sanction the two-stage
(key, epoch-bucket) shape sketched in SURVEY §7.5.

Usage: python tools/asof_skew_probe.py [K ...]   (default 1 64 256 1024)
Writes nothing to the repo; paste the table into SCALING.md's
preserved section when adjudicating.
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from tpc_di_etl_using_pyspark_spark.plans._util import t  # noqa: E402
from tpc_di_etl_using_pyspark_spark.plans.registry import all_queries  # noqa: E402
from tpc_di_etl_using_pyspark_spark.session import get_spark  # noqa: E402

BASE = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT = "/tmp/spark_graft_asof_skew"


def build(spark, k: int) -> str:
    d = f"{OUT}/k{k}"
    shutil.rmtree(d, ignore_errors=True)
    os.makedirs(d, exist_ok=True)
    ev = t(spark, BASE, "events")
    if k == 1:
        ev.write.mode("overwrite").parquet(f"{d}/events.parquet")
        return d
    hot = (
        ev.groupBy("user_id").count().orderBy(F.desc("count"), "user_id").limit(1)
    ).first()
    max_id = ev.agg(F.max("event_id")).first()[0]
    hot_rows = ev.filter(F.col("user_id") == hot["user_id"])
    # K-1 extra copies of the hot user's history via one explode (a
    # union-per-replica loop builds an O(K) logical plan and chokes
    # the optimizer past K≈1000); event_ids shifted per replica so
    # ordering ties stay impossible, timestamps jittered by the
    # replica index (seconds) so the as-of ordering is genuinely
    # deeper, not K duplicates of the same instant
    reps = (
        hot_rows.withColumn(
            "r", F.explode(F.sequence(F.lit(1), F.lit(k - 1)))
        )
        .withColumn(
            "event_id",
            F.col("event_id")
            + F.col("r").cast("long") * F.lit(int(max_id) + 1).cast("long"),
        )
        .withColumn("ts", F.col("ts") + F.make_interval(secs=F.col("r")))
        .drop("r")
    )
    ev.unionByName(reps).write.mode("overwrite").parquet(f"{d}/events.parquet")
    return d


def main() -> None:
    ks = [int(a) for a in sys.argv[1:]] or [1, 64, 256, 1024]
    spark = get_spark("asof-skew-probe")
    spark.sparkContext.setLogLevel("ERROR")
    qs = all_queries()
    dirs = {k: build(spark, k) for k in ks}
    # measure in a fresh session (same rationale as scale_probe: the
    # build leaves the heap full of write state)
    spark.stop()
    spark = get_spark("asof-skew-measure")
    spark.sparkContext.setLogLevel("ERROR")
    print("| K | rows | hot-key share | join_asof_latest (s) | join_asof_tolerance (s) |")
    print("| --- | --- | --- | --- | --- |")
    for k in ks:
        d = dirs[k]
        ev = spark.read.parquet(f"{d}/events.parquet")
        n = ev.count()
        hot_n = (
            ev.groupBy("user_id").count().agg(F.max("count")).first()[0]
        )
        times = {}
        for op in ("join_asof_latest", "join_asof_tolerance"):
            qs[op](spark, d).write.mode("overwrite").format("noop").save()  # warm
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                qs[op](spark, d).write.mode("overwrite").format("noop").save()
                best = min(best, time.perf_counter() - t0)
            times[op] = best
        print(
            f"| {k} | {n} | {hot_n / n:.1%} | {times['join_asof_latest']:.2f} "
            f"| {times['join_asof_tolerance']:.2f} |",
            flush=True,
        )


if __name__ == "__main__":
    main()
