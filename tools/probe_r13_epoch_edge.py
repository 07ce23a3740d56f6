#!/usr/bin/env python
"""Round-13 engineered-input probe: the two epoch-edge axes the pools
cannot produce, as post-transforms of the adversarial fixture (same
machinery as tools/probe_r12_extremes.py — every domain contract the
base fixture encodes is preserved; only events.ts moves).

MODE preepoch (default out /tmp/spark_graft_probe_preepoch):
  events.ts day-shifted by one constant so the span STRADDLES
  1970-01-01 — half the corpus at negative epoch seconds. Gap
  structure and µs fractions are untouched. This drives every
  window-alignment, sessionization, floor-division and epoch-product
  path through the sign flip that truncate-toward-zero arithmetic
  gets wrong (the class the floor-mod forms in the oracles exist
  for). Expected on a healthy tree: 291/291 MATCH.

MODE fraction (default out /tmp/spark_graft_probe_fraction):
  events.ts day-shifted into 2287 (10-digit epochs, like r12) AND
  every µs fraction forced through a hostile cycle
  {999999, 999998, 1, 0, 500000}. At this era epoch_us exceeds 2^53,
  so DuckDB's EPOCH() double path quantizes and a .999999 fraction
  can round the seconds floor UP (+1 s) — the exact class the r13
  FLOOR(EPOCH) oracle migration closed. The tool prints how many
  events actually sit on a divergent instant (double-floor != exact
  floor, measured IN DuckDB) so the sweep's adjudication is grounded.
  Expected: the 11 r13-migrated oracles MATCH; the six unmigrated
  same-class sites pinned for r14 in tests/test_r14_prep.py
  (dedup_latest_by_key, stream_session_window, stream_watermark_late,
  stream_foreachbatch_upsert, tpcdi_dim_trade, events_funnel) may
  HASH-diverge — each such row empirically CONFIRMS the r14 worklist,
  not a new find.

Usage:
  python tools/probe_r13_epoch_edge.py preepoch|fraction [out_dir]
then
  python tools/parity_sweep.py <out_dir>
"""

from __future__ import annotations

import datetime
import os
import subprocess
import sys

import pyarrow as pa
import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

EPOCH = datetime.datetime(1970, 1, 1)
FRACTION_CYCLE = [999999, 999998, 1, 0, 500000]


def transform_events(out: str, mode: str) -> None:
    path = os.path.join(out, "events.parquet")
    t = pq.read_table(path)
    ts = t["ts"].to_pylist()
    real = [x for x in ts if x is not None]
    lo, hi = min(real), max(real)

    if mode == "preepoch":
        # constant day shift placing the span's midpoint at the epoch
        mid = lo + (hi - lo) / 2
        shift = -round((mid - EPOCH).days)
        new_ts = [
            None if x is None else x + datetime.timedelta(days=shift)
            for x in ts
        ]
    else:  # fraction
        target_min = datetime.datetime(2287, 1, 1)
        shift = (target_min - lo).days + 1
        new_ts = []
        for i, x in enumerate(ts):
            if x is None:
                new_ts.append(None)
                continue
            x = x + datetime.timedelta(days=shift)
            new_ts.append(x.replace(microsecond=FRACTION_CYCLE[i % 5]))

    cols = {}
    for name in t.column_names:
        if name == "ts":
            cols[name] = pa.array(new_ts, type=t.schema.field("ts").type)
        else:
            cols[name] = t[name]
    pq.write_table(pa.table(cols), path)

    n_neg = sum(1 for x in new_ts if x is not None and x < EPOCH)
    print(
        f"events.ts: span {min(x for x in new_ts if x)} .. "
        f"{max(x for x in new_ts if x)}, {n_neg} pre-epoch rows"
    )
    if mode == "fraction":
        import duckdb

        n_div = duckdb.sql(
            f"""SELECT COUNT(*) FROM read_parquet('{path}')
                WHERE ts IS NOT NULL
                  AND CAST(FLOOR(EPOCH(ts)) AS BIGINT)
                      != (epoch_us(ts) - ((epoch_us(ts) % 1000000
                           + 1000000) % 1000000)) // 1000000"""
        ).fetchone()[0]
        print(
            f"fraction axis: {n_div} events sit on a DuckDB "
            f"double-floor-divergent instant (must be > 0 for the "
            f"axis to bite)"
        )
        if n_div == 0:
            raise SystemExit("fraction axis generated zero divergent instants")


def main() -> None:
    mode = sys.argv[1] if len(sys.argv) > 1 else "preepoch"
    assert mode in ("preepoch", "fraction"), mode
    out = (
        sys.argv[2]
        if len(sys.argv) > 2
        else f"/tmp/spark_graft_probe_{mode}"
    )
    subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "adversarial_fixture.py"), out],
        check=True,
    )
    transform_events(out, mode)
    print(f"epoch-edge probe fixture ({mode}) at {out}")


if __name__ == "__main__":
    main()
