#!/usr/bin/env python
"""Round-12 engineered-input probe (VERDICT r11 item 7): the four
extreme-input axes the modular pools cannot produce, applied as a
POST-TRANSFORM of the adversarial fixture so every domain contract
that fixture already encodes (status/priority domains, monotone
per-custkey order dates, single-spaced documents) is preserved:

1. MAX-INT64 KEYS — every id column is remapped through the injective
   f(k) = k (k even) | 2^63 - k (k odd), applied consistently to both
   sides of every join key (customer/orders custkey, orders/lineitem
   orderkey, part/supplier keys, events ids, documents/embeddings
   ids). Half the key space sits within 64 of the int64 maximum,
   INCLUDING the exact maximum 9223372036854775807 (k=1): any op that
   adds, multiplies, or Knuth-hashes an id without overflow care
   stage-kills under ANSI. The r11 _split_bucket find generalized
   registry-wide.
2. YEAR-9999 DATES — every orders/lineitem timestamp is day-shifted
   by one constant so the global maximum lands mid-9999 (headroom for
   sub-year date arithmetic; the 360-year span of the base fixture is
   preserved, so spine/calendar op cost is unchanged). Reaches
   datediff/add_months/last_day/ISO-week paths at the DATE type's
   ceiling in both engines.
3. 10-DIGIT UNIX EPOCHS — events.ts is day-shifted into ~2287 (epoch
   seconds >= 1e10, epoch µs ~1e16) with gap structure and span
   IDENTICAL to the base fixture (constant shift), so session/window
   semantics are unchanged but any un-recentered epoch product
   (slope/corr/moment on raw epoch seconds: 1e10² = 1e20 > int64/
   exact-double) surfaces.
4. DEEPLY-NESTED / HOSTILE JSON in events.props — depth-64 object
   chains and depth-32 array nesting around the existing '$.k'
   contract paths, 19-digit integers (exceed double's 2^53 exactness
   — engines must agree on extraction representation), duplicate
   keys, unicode + escaped-quote keys, JSON null vs absent, huge
   arrays, and a 10k-char string leaf.

Usage:
  python tools/probe_r12_extremes.py [out_dir]   # default below
then
  python tools/parity_sweep.py /tmp/spark_graft_probe_r12 [ops...]

A mismatch or stage-kill here is either a real divergence (fix the
op+oracle pair, elevate) or an out-of-contract input (document the
loud contract). Zero finds is a valid, recorded outcome.
"""

from __future__ import annotations

import datetime
import os
import subprocess
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/spark_graft_probe_r12"

I64_MAX = (1 << 63) - 1

ID_COLS = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
DATE_COLS = {"orders": ["o_orderdate"], "lineitem": ["l_shipdate"]}
# global max of the base fixture's order/ship timestamps lands here
# after the shift: mid-9999, leaving ~6 months of add_months headroom
DATE_TARGET_MAX = datetime.datetime(9999, 6, 15)
# events: constant shift into 10-digit-epoch territory (~2287)
EVENTS_TARGET_MIN = datetime.datetime(2287, 1, 1)


def f_id(k: int) -> int:
    # injective: evens stay small (<= pool size), odds land within 64
    # of int64 max — k=1 maps to the EXACT maximum
    return k if k % 2 == 0 else (1 << 63) - k


def hostile_props(i: int) -> str:
    deep_obj = '{"k": 1}'
    for d in range(64):
        deep_obj = '{"d%d": %s}' % (d % 10, deep_obj)
    deep_arr = "1"
    for _ in range(32):
        deep_arr = "[%s]" % deep_arr
    pool = [
        # contract path '$.k' present with extreme scalars
        '{"k": 9223372036854775807}',          # int64 max literal
        '{"k": -9223372036854775808}',
        '{"k": 12345678901234567890}',         # > int64: parse as double?
        '{"k": 0.30000000000000004}',          # dyadic-noise double
        '{"k": 1e308}',
        '{"k": null}',                         # JSON null vs absent
        "{}",                                  # absent
        '{"k": "строка \\"quoted\\" 日本語"}',   # unicode + escaped quotes
        '{"k": [1, 2, 3], "k2": {"a": 1}}',     # container at the path
        deep_obj,                              # depth-64 object chain
        '{"k": %s}' % deep_arr,                # depth-32 array at $.k
        '{"k": 7, "k": 8}',                    # DUPLICATE key
        '{"ключ": 1, "k": 42}',                # unicode key
        '{"k": "%s"}' % ("x" * 10000),         # 10k-char leaf
        '{"k": [%s]}' % ",".join(str(x) for x in range(500)),  # long array
        '{"k": 2147483648}',                   # int32 max + 1
    ]
    return pool[i % len(pool)]


def main(out: str | None = None) -> str:
    out = out or OUT
    # 1. regenerate the base adversarial fixture into out
    subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "adversarial_fixture.py"), out],
        check=True,
    )

    # 2. compute the global order/ship date max for the constant shift
    hi = None
    for tbl, cols in DATE_COLS.items():
        t = pq.read_table(f"{out}/{tbl}.parquet")
        for c in cols:
            m = pc.max(t[c]).as_py()
            hi = m if hi is None or m > hi else hi
    date_shift = (DATE_TARGET_MAX - hi).days

    for tbl in ID_COLS:
        t = pq.read_table(f"{out}/{tbl}.parquet")
        cols = {}
        for name in t.column_names:
            col = t[name]
            if name in ID_COLS.get(tbl, []):
                col = pa.array(
                    [None if v is None else f_id(v) for v in col.to_pylist()],
                    type=pa.int64(),
                )
            elif name in DATE_COLS.get(tbl, []):
                col = pa.array(
                    [
                        None if v is None else v + datetime.timedelta(days=date_shift)
                        for v in col.to_pylist()
                    ],
                    type=col.type,
                )
            elif tbl == "events" and name == "ts":
                lo = pc.min(col).as_py()
                shift = (EVENTS_TARGET_MIN - lo).days
                col = pa.array(
                    [
                        None if v is None else v + datetime.timedelta(days=shift)
                        for v in col.to_pylist()
                    ],
                    type=col.type,
                )
            elif tbl == "events" and name == "props":
                col = pa.array(
                    [hostile_props(i) for i in range(len(col))], type=pa.string()
                )
            cols[name] = col
        pq.write_table(pa.table(cols), f"{out}/{tbl}.parquet")

    print(
        f"probe fixture at {out}: ids within 64 of int64 max (incl. the exact"
        f" max), order/ship dates shifted +{date_shift}d to end {DATE_TARGET_MAX:%Y-%m-%d},"
        f" events in 10-digit-epoch 2287, {len(set(hostile_props(i) for i in range(16)))}"
        f" hostile JSON prop shapes"
    )
    return out


if __name__ == "__main__":
    main()
