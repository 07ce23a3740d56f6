#!/usr/bin/env python
"""Generate an ADVERSARIAL fixture: the same 10-table schema as the
driver's parquet (FIXTURES.md), but populated with hostile values the
synthetic fixture never produces — exact decimal midpoints, negative
and huge money, regex metacharacters / unicode / empty / padded
strings, epoch and far-future timestamps, leap days, duplicate sort
keys, zero and near-zero vectors, short and whitespace-heavy docs.

Purpose: run `python tools/parity_sweep.py /tmp/spark_graft_adversarial
<ops>` over it. The driver certifies on the friendly fixture; this
probes whether an op's cross-engine (Spark vs DuckDB) agreement is a
property of the EXPRESSIONS or an accident of the data. A mismatch
here is either a real engine-semantics divergence (fix the op+oracle
pair) or an input outside the op's documented contract (document it).

Known out-of-contract inputs deliberately EXCLUDED (first pass):
NaN/Inf doubles (engines disagree on NaN grouping by design; the
fixture contract is finite doubles) and NULLs in historically
non-nullable columns. documents.text stays single-space-delimited
(the corpus tokenization convention documented at _NOVELTY_SQL) but
includes short (<3 word) docs, empty-ish strings, and unicode.

Usage: python tools/adversarial_fixture.py [out_dir]
"""

from __future__ import annotations

import datetime
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/spark_graft_adversarial"

# value pools ------------------------------------------------------------
# |money| stays ≤ ~1e5 (realistic money magnitudes): first-power sums
# then sit inside the dsum DECIMAL->DOUBLE exactness bound
# (plans/_util.dsum; 2^53 micro-units), and squared/cubed moment terms
# stay within the widened DECIMAL(38,6) accumulators. 1e7-1e15-class
# values were tried and correctly exposed those documented bounds
# (ANSI overflow / 1-ulp conversion divergence): out of contract by
# design, not a target. Midpoint/dyadic hostility is scale-free and
# fully retained.
MONEY = [
    0.0, -0.0, 0.01, -0.01, 2.675, 4567.125, -8765.435,
    0.005, 123.455, 99999.99, -99999.99, 1e-9, 3.141592653589793,
    16384.03125, -16384.03125, 0.1, 0.3, 7.105427357601002,
]
# 25.0 sits EXACTLY on math_ratio_guard's NULLIF(qty - 25, 0) branch
# (r10): the guard's NULL path now fires on the hostile fixture for
# every qty consumer, not only in the dedicated edge test.
QTY = [0.0, 1.0, -5.0, 2.0, 50.0, 1024.0, 0.5, 17.0, 1e4, 3.0, 25.0]
RATE = [0.0, 1.0, 0.05, 0.5, 0.125, 0.999999, 0.000001, 0.1]
STR = [
    "", " ", "  double  spaced  ", "a|b.c(d)e*f+g?h[i]j",
    "O'Brien \"quoted\" <tag>&amp;", "ÜNÏCØDE tëxt ßharp", "日本語テキスト",
    "x" * 500, "MiXeD CaSe WoRdS", "12345", "%_\\percent",
    "trailing space ", " leading", "comma,sep;semi", "line\ttab",
    "null", "NULL", "None",
    # the CSV NULL sentinel as DATA — collides with nullValue='\N'
    # unless the writer backslash-escapes (core_scans._bs_escape,
    # round-5 ADVICE hardening)
    "\\N",
    # astral-plane (4-byte UTF-8) codepoints — exercise codepoint-vs-
    # byte unit divergences (DuckDB levenshtein counts bytes; length/
    # substring/reverse count codepoints in both engines). COMPOSED
    # forms only: combining sequences / ZWJ clusters are out of the
    # reverse-parity contract (DuckDB reverses graphemes) — round-5
    # adversarial wave.
    "émoji 🎵🚀 mix𝄞",
    "𝕬𝖘𝖙𝖗𝖆𝖑 math 𝔸𝔹ℂ",
    # strings ENDING in a Java-only line terminator (U+0085 NEL,
    # U+2028 LS): Java's non-multiline '$' matches before a final
    # terminator while RE2's matches end-of-text only, so a ^..$
    # ASCII gate classified these one-sided (r9 probe — forced the
    # \A..\z gate migration in scalars.py). Kept in-pool so every
    # anchored-regex consumer stays probed registry-wide.
    "ends nel\u0085",
    "ends ls\u2028",
    # embedded NUL byte (U+0000): probed aligned in both engines for
    # length/upper/regex-class/substr AND through the Spark CSV + text
    # sink round-trips (uniVocity's internal '\0' sentinel does not
    # leak) — pooled so every string consumer keeps proving it
    # (r9 wave 4; the [\x00-\x7F] gates classify it ASCII, correctly,
    # in both engines).
    "nul\x00byte",
    # a string that is ONLY a Java line terminator (r10): length-1
    # boundary for every \A..\z ASCII gate (non-ASCII, excluded in
    # both engines), rtrim/pad path, and empty-after-strip consumers.
    "\u0085",
    # U+FFFE/U+FFFF noncharacters (r10 ADVICE): valid UTF-8, storable
    # in parquet/pandas/Spark/DuckDB strings, but excluded by XML
    # 1.0's Char production — ET.fromstring throws on them even as
    # raw characters, so both XML writers map them (with the C0
    # controls) to U+FFFD. Pooled so every string consumer keeps
    # proving alignment on the class registry-wide.
    "noncharacter ￾ and ￿ tail",
]
TS = [
    datetime.datetime(1970, 1, 1, 0, 0, 0),
    datetime.datetime(1900, 1, 1, 12, 0, 0),
    datetime.datetime(2038, 1, 19, 3, 14, 7),
    datetime.datetime(2262, 1, 1, 0, 0, 0),
    datetime.datetime(2024, 2, 29, 23, 59, 59),
    datetime.datetime(2000, 2, 29, 0, 0, 1),
    datetime.datetime(1999, 12, 31, 23, 59, 59),
    datetime.datetime(2024, 1, 1, 0, 0, 0),
    datetime.datetime(2024, 1, 1, 0, 0, 0),  # exact duplicate
    datetime.datetime(1969, 12, 31, 23, 59, 59),  # pre-epoch
]
# events keep a BOUNDED time horizon straddling the epoch: event-time
# analytics (rolling correlation, TWAP, sliding windows) document a
# bounded-span contract (per-user spans to ~±17 years for the integer
# moment exactness) — the hostile part is NEGATIVE epochs, ties, and
# boundary seconds, not a 360-year corpus. Calendar extremes
# (1900/2262/leap days) live in orders.o_orderdate and
# lineitem.l_shipdate where the ops are date arithmetic, not moment
# products.
TS_EVENTS = [
    datetime.datetime(1969, 11, 15, 12, 0, 0),
    datetime.datetime(1969, 12, 31, 23, 59, 59),
    datetime.datetime(1970, 1, 1, 0, 0, 0),
    datetime.datetime(1970, 1, 1, 0, 0, 1),
    datetime.datetime(1970, 1, 31, 6, 30, 0),
    datetime.datetime(1970, 2, 20, 23, 59, 59),
    datetime.datetime(1970, 1, 15, 0, 0, 0),
    datetime.datetime(1970, 1, 15, 0, 0, 0),  # exact duplicate
    datetime.datetime(1969, 12, 1, 0, 0, 0),
    datetime.datetime(1970, 1, 7, 3, 14, 7),
    # PRE-EPOCH SUB-SECOND instants (r9 wave): F.unix_timestamp
    # truncates these toward zero while FLOOR(EPOCH()) — and Spark's
    # own window alignment — floor them; the class that forced the
    # _util.epoch_s floor rewrite. Kept in-pool so every events.ts
    # consumer stays probed registry-wide.
    datetime.datetime(1969, 12, 31, 23, 59, 59, 999999),  # epoch −1 µs
    datetime.datetime(1969, 12, 31, 23, 59, 59, 1),
    datetime.datetime(1969, 12, 31, 23, 45, 0, 500000),
    # positive sub-second controls (truncate == floor here; a fix that
    # broke the positive side would show immediately)
    datetime.datetime(1970, 1, 15, 0, 0, 0, 500000),
    datetime.datetime(1970, 1, 7, 3, 14, 7, 999999),
    # a wall clock inside the 1970 US spring-forward DST gap
    # (1970-04-26 02:30 does not exist in America/New_York local time):
    # under a DST-zone hostile sweep, any epoch-seconds path that hops
    # through LTZ shifts this row by the gap width (r9 probe — see
    # _util.epoch_s)
    datetime.datetime(1970, 4, 26, 2, 30, 0),
]
N = 64


def pick(pool, i):
    return pool[i % len(pool)]


def main() -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq

    shutil.rmtree(OUT, ignore_errors=True)
    os.makedirs(OUT, exist_ok=True)

    _PA = {
        "int": pa.int32(), "long": pa.int64(), "string": pa.string(),
        "double": pa.float64(), "timestamp": pa.timestamp("us"),
        "array<float>": pa.list_(pa.float32()),
    }

    def write(name, rows, schema):
        # schema: "col type, col type" mirroring the Spark DDL strings —
        # written as ONE parquet file (the driver-fixture layout DuckDB
        # reads directly)
        fields = []
        for part in schema.split(","):
            col, typ = part.strip().rsplit(" ", 1)
            fields.append(pa.field(col.strip(), _PA[typ]))
        cols = list(zip(*rows)) if rows else [[] for _ in fields]
        table = pa.table(
            {f.name: pa.array(list(c), type=f.type) for f, c in zip(fields, cols)}
        )
        pq.write_table(table, f"{OUT}/{name}.parquet")

    write(
        "region",
        [(i, pick(STR, i)) for i in range(5)],
        "r_regionkey int, r_name string",
    )
    # nation names stay NON-EMPTY and not '|'-terminated: the unquoted
    # multichar-delim export (scan_csv_multichar_delim) documents that
    # format contract — empty fields make '||'-delimited lines
    # inherently ambiguous. All other string hostility stays.
    nat_pool = [x for x in STR if x and not x.endswith("|")]
    write(
        "nation",
        [(i, pick(nat_pool, i + 3), i % 5) for i in range(25)],
        "n_nationkey int, n_name string, n_regionkey int",
    )
    write(
        "customer",
        [
            (i, pick(STR, i), i % 25, pick(MONEY, i), pick(STR, i + 7))
            for i in range(N)
        ],
        "c_custkey long, c_name string, c_nationkey int, c_acctbal double,"
        " c_mktsegment string",
    )
    write(
        "supplier",
        [(i, pick(STR, i + 5), i % 25, pick(MONEY, i + 2)) for i in range(10)],
        "s_suppkey long, s_name string, s_nationkey int, s_acctbal double",
    )
    write(
        "part",
        [
            (
                i,
                pick(STR, i),
                pick(STR, i + 1)[:10] or "B",
                pick(STR, i + 2)[:20] or "T",
                (i * 7) % 51 - 1,
                pick(MONEY, i + 4),
            )
            for i in range(N)
        ],
        "p_partkey long, p_name string, p_brand string, p_type string,"
        " p_size int, p_retailprice double",
    )
    # orders respect three DOCUMENTED domain contracts while keeping
    # hostile values elsewhere: o_orderstatus in {O,F,P} and
    # o_orderpriority in the five TPC-H literals (the pivot ops pin
    # these domains by contract), and o_orderdate strictly increasing
    # per custkey (the SCD2 incremental-apply contract — its loud
    # guard correctly rejects late-arriving history). Dates still
    # sweep 1900→2260 including leap days.
    prio = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
    base_date = datetime.datetime(1900, 1, 1)
    write(
        "orders",
        [
            (
                i,
                i % N,
                "OFP"[i % 3],
                pick(MONEY, i),
                base_date + datetime.timedelta(days=i * 1037),
                prio[i % 5],
            )
            for i in range(N * 2)
        ],
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    )
    # DEGENERATE-GROUP rows (r11 denominator sweep; VERDICT r10 item 6
    # sibling enumeration): two whole groups the modular pools can
    # never produce (every flag cycles through the full QTY pool, so
    # no pooled group is constant). Group 'Z': constant quantity —
    # zero x-variance fires agg_regression_exact's NULLIF slope,
    # agg_stats' guarded corr, and agg_moments-class pow(0,1.5)
    # paths registry-wide. Group 'W': signed quantities cancelling to
    # EXACTLY zero — fires agg_weighted_avg's NULLIF weight sum.
    # PRICES here are positive and tightly clustered BY DESIGN:
    # agg_approx_percentile's 2%-relative self-check is calibrated for
    # groups whose percentile targets sit away from sign-crossing /
    # wide-gap interpolation (tiny groups with ±near-zero prices made
    # the element-returning sketch honestly report False — the first
    # regen of these rows measured it). The ±pair → −0.0 percentile
    # find that regen ALSO surfaced is fixed engine-side (_util.pz)
    # and pinned in tests/test_r11_window_edges.py on its own group.
    degenerate = [
        (N * 2 + j, N + j, 10 + j, 1, 5.0,
         [100.25, 101.5, 102.675, 103.125][j], 0.25, 0.125,
         "Z", "O", pick(TS, j))
        for j in range(4)
    ] + [
        (N * 2 + 4 + j, N + 4 + j, 14 + j, 1, [7.5, -7.5, 42.0, -42.0][j],
         [205.005, 206.5, 207.25, 208.675][j], 0.5, 0.0,
         "W", "F", pick(TS, j + 2))
        for j in range(4)
    ]
    write(
        "lineitem",
        [
            (
                i % (N * 2),
                i % N,
                i % 10,
                i % 7,
                pick(QTY, i),
                pick(MONEY, i),
                pick(RATE, i),
                pick(RATE, i + 3),
                "RNA!"[i % 4],
                "OF?"[i % 3],
                pick(TS, i),
            )
            for i in range(N * 4)
        ]
        + degenerate,
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int,"
        " l_quantity double, l_extendedprice double, l_discount double,"
        " l_tax double, l_returnflag string, l_linestatus string,"
        " l_shipdate timestamp",
    )
    props = ['{"k": 0}', '{"k": -1}', '{"k": 2147483647}', "{}",
             '{"k": 7, "extra": "x"}', '{"j": 1}', '{"k": 99}']
    write(
        "events",
        [
            (
                i,
                pick(TS_EVENTS, i),
                i % 5,
                ["click", "error", "purchase", "signup", "view", "", "weird"][i % 7],
                # negative values exercise the sign-aware EMA rounding
                pick(MONEY, i) if i % 3 else -pick(MONEY, i),
                pick(props, i),
            )
            for i in range(N * 2)
        ],
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    texts = [
        "one", "two words", "exactly three words", "a b c d e f g",
        "dup dup dup dup dup", "ünïcode wörds hërë tøø",
        "the quick brown fox jumps over the lazy dog again and again",
        "x", "yy zz", "word " * 50,
    ]
    write(
        "documents",
        [
            (
                i,
                texts[i % len(texts)].strip(),
                ["en", "de", "zh", "xx", ""][i % 5],
                f"src{i % 21}",
                len(texts[i % len(texts)].strip()),
            )
            for i in range(N)
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    # embeddings stay unit-scale (|x| <= 1): the integer-exact PCA /
    # covariance / kmeans pipelines document normalized embeddings as
    # their domain (plans/llm.py vec_pca_power_iteration) — 1e6-scale
    # components were tried and correctly hit the loud ANSI overflow
    # guard rather than silent drift. Hostility here = zero vectors,
    # denormals, constant vectors, sign ramps.
    vecs = [
        [0.0] * 64,
        [1e-9] * 64,
        [1.0] * 64,
        [-1.0] * 64,
        [(j - 32) / 32.0 for j in range(64)],
        [(-1.0) ** j for j in range(64)],
        [0.1] * 63 + [1.0],
    ]
    write(
        "embeddings",
        [(i, [float(x) for x in vecs[i % len(vecs)]], i % 10) for i in range(N)],
        "vec_id long, embedding array<float>, label int",
    )
    print(f"wrote adversarial fixture: {OUT}")


if __name__ == "__main__":
    main()
