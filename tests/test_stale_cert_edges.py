"""Round-8 regression defense for the nine ops whose only driver cert
was round 1 (VERDICT r7 item 1: the stalest certs in the repo —
`sort_multi limit_n topk_per_group set_except dedup_exact
dedup_latest_by_key sql_api_revenue_ranking set_symmetric_diff
sql_exists_decorrelated`).

These ops certify green on the friendly fixture, but their *contract*
is determinism under hostile inputs the friendly fixture rarely
produces. Each test here drives the REAL registered op+oracle pair
(both engines) over a hand-built fixture engineered so that any
loosening of the op's determinism guarantees flips the result:

- LIMIT boundary ties (12 rows sharing the max price → the unique-key
  tiebreak decides WHICH 10 survive, on both engines);
- per-group top-k tie-breaks, groups smaller than k, NULL group keys,
  and NULL sort values under DESC (nulls-last on both engines);
- EXCEPT ALL bag multiplicity (3 copies − 1 copy = 2 copies) and
  NULL-key equality inside set ops;
- DISTINCT over NULL-bearing key pairs;
- latest-record-wins where timestamps tie at seconds granularity
  (µs-apart events truncate to the same second → the event_id
  tiebreak, not raw ts, must pick the winner — pinning the documented
  `unix_timestamp` / `FLOOR(EPOCH(ts))` truncation semantics) and a
  pre-1970 whole-second timestamp (negative epoch);
- revenue-ranking rev ties at the LIMIT 20 boundary with exact-decimal
  sums over midpoint-hostile discounts;
- EXISTS / NOT EXISTS with NULL correlation keys (a NULL o_custkey 'P'
  order must NOT anti-match anyone; a null-safe-equality bug would).

The fixture is in-contract on shape (same column names/types as
FIXTURES.md) but hostile on values; NULLs appear only in columns these
nine ops treat as data (o_totalprice, o_custkey, user_id, event_type,
o_orderstatus), never in unique ids.
"""

from __future__ import annotations

import datetime

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from tpc_di_etl_using_pyspark_spark.plans.registry import all_oracles, all_queries

from .conftest import assert_parity

_QUERIES = all_queries()
_ORACLES = all_oracles()


def _ts(y, mo, d, h=0, mi=0, s=0, us=0):
    # naive UTC instants, matching the driver fixture's parquet
    return datetime.datetime(y, mo, d, h, mi, s, us)


def _orders_rows():
    rows = []

    def add(k, ck, st, price, day, prio="1-URGENT"):
        rows.append((k, ck, st, price, _ts(2024, 1, day % 28 + 1), prio))

    # A. LIMIT-boundary ties: keys 1-12 all share the global max price
    #    (above the 300001.0 EXISTS-target orders in E, so the LIMIT 10
    #    boundary falls INSIDE this tie block). limit_n (price DESC,
    #    key ASC, LIMIT 10) must pick keys 1-10 on both engines; any
    #    tiebreak loss makes the surviving set random.
    for k in range(1, 13):
        add(k, 100 + (k % 3), "O", 999999.0, k)
    # B. topk_per_group hazards, one custkey per case:
    #    - custkey 300: 5 rows all tied on price → rk 1-3 by key asc
    for k in range(20, 25):
        add(k, 300, "F", 500.0, k)
    #    - custkey 301: group smaller than k (1 row)
    add(30, 301, "F", 400.0, 3)
    #    - custkey 302: 2 non-null + 2 NULL prices → DESC nulls-last on
    #      both engines; rk3 = the smaller-keyed NULL row
    add(31, 302, "F", 300.0, 4)
    add(32, 302, "F", 200.0, 5)
    add(33, 302, "F", None, 6)
    add(34, 302, "F", None, 7)
    #    - NULL custkey group: both engines put all NULLs in ONE window
    #      partition; 4 tied rows → rk 1-3 by key asc
    for k in range(40, 44):
        add(k, None, "O", 250.0, k)
    # C. set_except / set_symmetric_diff multiplicity + NULL keys:
    #    - custkey 500: 3 rows total, 1 with status F → EXCEPT ALL
    #      keeps exactly 2 copies
    add(50, 500, "F", 10.0, 8)
    add(51, 500, "O", 10.0, 9)
    add(52, 500, "O", 10.0, 10)
    #    - NULL custkey split across F/O: set ops treat NULLs as equal
    add(53, None, "F", 10.0, 11)
    #      (rows 40-43 above are the NULL/'O' side)
    #    - custkey 501 only-F, 502 only-O, 503 both
    add(54, 501, "F", 10.0, 12)
    add(55, 502, "O", 10.0, 13)
    add(56, 503, "F", 10.0, 14)
    add(57, 503, "O", 10.0, 15)
    # D. sort_multi hazards (order-insensitive compare, so these only
    #    pin row CONTENT, but NULL status + NULL price rows must not
    #    crash or drop): one row each
    add(60, 504, None, 1.0, 16)
    add(61, 505, None, None, 17)
    # E. sql_exists_decorrelated targets (customers 200-206 below):
    #    200: big order, no P → kept
    add(70, 200, "O", 300001.0, 18)
    #    201: big order AND a P order → excluded by NOT EXISTS
    add(71, 201, "O", 300001.0, 19)
    add(72, 201, "P", 5.0, 20)
    #    202: P order only → excluded
    add(73, 202, "P", 5.0, 21)
    #    203: small orders only → excluded
    add(74, 203, "O", 5.0, 22)
    #    204: kept — its big order exists; the NULL-custkey 'P' order
    #    below must not anti-match it (NULL never equals 204)
    add(75, 204, "O", 300001.0, 23)
    add(76, None, "P", 5.0, 24)
    #    205: big order with NULL totalprice does NOT count (> is NULL)
    add(77, 205, "O", None, 25)
    # F. revenue-ranking orders (keys 1000+i): low totalprice so they
    #    stay out of A's top-10; status 'O'; custkeys 1001-1025
    for i in range(1, 26):
        rows.append(
            (1000 + i, 1000 + i, "O", 20.0, _ts(2024, 2, (i % 28) + 1), "2-HIGH")
        )
    return rows


def _events_rows():
    rows = []

    def add(eid, ts, uid, et, val=1.0, props="{}"):
        rows.append((eid, ts, uid, et, val, props))

    # latest-by-key: user 1 / 'click' — three events inside the SAME
    # wall-clock second, µs-apart, with event_id ordered OPPOSITE to
    # the sub-second time. Both engines truncate ts to whole seconds
    # (unix_timestamp / FLOOR(EPOCH)) → all three tie → winner must be
    # the max event_id (30), NOT the max raw-µs row (id 10).
    add(10, _ts(2024, 3, 1, 12, 0, 5, 900000), 1, "click")
    add(20, _ts(2024, 3, 1, 12, 0, 5, 500000), 1, "click")
    add(30, _ts(2024, 3, 1, 12, 0, 5, 100000), 1, "click")
    # user 1 / 'view': later second beats larger id in an earlier one
    add(99, _ts(2024, 3, 1, 12, 0, 1), 1, "view")
    add(40, _ts(2024, 3, 1, 12, 0, 2), 1, "view")
    # pre-1970 whole-second ts (negative epoch, no fractional part →
    # floor is exact on both engines) — loses to any 2024 event in the
    # same key, and is the sole (and winning) row of user 2 / 'view'
    add(50, _ts(1969, 12, 31, 23, 59, 59), 2, "view")
    # NULL-keyed groups: both engines make one partition per distinct
    # (user_id, event_type) WITH NULLs grouped as equal
    add(60, _ts(2024, 3, 2, 1, 0, 0), None, "click")
    add(61, _ts(2024, 3, 2, 2, 0, 0), None, "click")
    add(62, _ts(2024, 3, 2, 3, 0, 0), 3, None)
    add(63, _ts(2024, 3, 2, 4, 0, 0), 3, None)
    add(64, _ts(2024, 3, 2, 5, 0, 0), None, None)
    add(65, _ts(2024, 3, 2, 6, 0, 0), None, None)
    # dedup_exact duplicates across the NULL-bearing key pairs
    add(70, _ts(2024, 3, 3), 4, "purchase")
    add(71, _ts(2024, 3, 4), 4, "purchase")
    add(72, _ts(2024, 3, 5), 4, "purchase")
    return rows


def _lineitem_rows():
    rows = []
    # 25 BUILDING orders, each with TWO lineitems engineered to the
    # SAME exact revenue: 100.0*(1-0.125) + 100.0*(1-0.875) = 100.0
    # exactly in DECIMAL(25,6) on both engines → all 25 orders tie on
    # rev → the LIMIT 20 boundary is decided purely by l_orderkey asc.
    # Discounts are dyadic (exact doubles) so the decimal cast is
    # bit-identical cross-engine.
    for i in range(1, 26):
        k = 1000 + i
        rows.append((k, 1, 1, 1, 1.0, 100.0, 0.125, 0.0, "N", "O", _ts(2024, 2, 2)))
        rows.append((k, 2, 1, 2, 1.0, 100.0, 0.875, 0.0, "N", "O", _ts(2024, 2, 3)))
    return rows


def _customer_rows():
    rows = []
    # EXISTS targets (segment irrelevant, but not BUILDING so they stay
    # out of the revenue ranking)
    for ck in range(200, 206):
        rows.append((ck, f"cust{ck}", 1, 0.0, "MACHINERY"))
    # a customer with no orders at all → excluded by EXISTS
    rows.append((206, "cust206", 1, 0.0, "MACHINERY"))
    # revenue-ranking customers
    for i in range(1, 26):
        rows.append((1000 + i, f"b{i}", 1, 0.0, "BUILDING"))
    return rows


_SCHEMAS = {
    "orders": pa.schema(
        [
            ("o_orderkey", pa.int64()),
            ("o_custkey", pa.int64()),
            ("o_orderstatus", pa.string()),
            ("o_totalprice", pa.float64()),
            ("o_orderdate", pa.timestamp("us")),
            ("o_orderpriority", pa.string()),
        ]
    ),
    "events": pa.schema(
        [
            ("event_id", pa.int64()),
            ("ts", pa.timestamp("us")),
            ("user_id", pa.int64()),
            ("event_type", pa.string()),
            ("value", pa.float64()),
            ("props", pa.string()),
        ]
    ),
    "lineitem": pa.schema(
        [
            ("l_orderkey", pa.int64()),
            ("l_partkey", pa.int64()),
            ("l_suppkey", pa.int64()),
            ("l_linenumber", pa.int32()),
            ("l_quantity", pa.float64()),
            ("l_extendedprice", pa.float64()),
            ("l_discount", pa.float64()),
            ("l_tax", pa.float64()),
            ("l_returnflag", pa.string()),
            ("l_linestatus", pa.string()),
            ("l_shipdate", pa.timestamp("us")),
        ]
    ),
    "customer": pa.schema(
        [
            ("c_custkey", pa.int64()),
            ("c_name", pa.string()),
            ("c_nationkey", pa.int32()),
            ("c_acctbal", pa.float64()),
            ("c_mktsegment", pa.string()),
        ]
    ),
}

_ROWS = {
    "orders": _orders_rows,
    "events": _events_rows,
    "lineitem": _lineitem_rows,
    "customer": _customer_rows,
}


@pytest.fixture(scope="module")
def edge_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("stale_cert_edges")
    for name, schema in _SCHEMAS.items():
        rows = _ROWS[name]()
        cols = list(zip(*rows))
        table = pa.Table.from_arrays(
            [pa.array(list(c), type=f.type) for c, f in zip(cols, schema)],
            schema=schema,
        )
        pq.write_table(table, str(d / f"{name}.parquet"))
    return str(d)


@pytest.fixture(scope="module")
def edge_duck(edge_dir):
    con = duckdb.connect()
    for name in _SCHEMAS:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM "
            f"read_parquet('{edge_dir}/{name}.parquet')"
        )
    yield con
    con.close()


# (op, minimum rows the hostile fixture must produce — a floor, not an
# exact count, so the test can never pass vacuously on empty output)
_CASES = [
    ("sort_multi", 60),  # every orders row survives a pure sort
    ("limit_n", 10),  # exactly the boundary-tied top 10
    ("topk_per_group", 10),  # ≥3+1+3+3 across the engineered groups
    ("set_except", 3),  # ≥ the 2 multiplicity copies + NULL copy
    ("dedup_exact", 7),  # the 7 distinct NULL-bearing key pairs
    ("dedup_latest_by_key", 6),  # one winner per engineered group
    ("sql_api_revenue_ranking", 20),  # full LIMIT 20 of tied-rev rows
    ("set_symmetric_diff", 3),  # only_f + only_o sides both present
    ("sql_exists_decorrelated", 2),  # customers 200 and 204 kept
]


@pytest.mark.parametrize("op,min_rows", _CASES, ids=[c[0] for c in _CASES])
def test_stale_cert_op_on_hostile_fixture(op, min_rows, spark, edge_dir, edge_duck):
    df = _QUERIES[op](spark, edge_dir)
    n = df.count()
    assert n >= min_rows, (
        f"{op}: hostile fixture produced {n} rows (< {min_rows}) — the "
        f"edge being pinned is not actually exercised"
    )
    assert_parity(df, edge_duck, _ORACLES[op], op)


def test_limit_boundary_tiebreak_is_keyed(spark, edge_dir):
    """The 12-way price tie at the LIMIT 10 boundary must resolve by
    o_orderkey: keys 1-10 survive, 11-12 do not (absolute check on the
    Spark side; cross-engine agreement is the parity test above)."""
    keys = sorted(
        r.o_orderkey for r in _QUERIES["limit_n"](spark, edge_dir).collect()
    )
    assert keys == list(range(1, 11)), keys


def test_latest_by_key_seconds_truncation_winner(spark, edge_dir):
    """user 1/'click': three µs-apart events in one wall-clock second →
    the winner is max event_id (30), not the max raw-µs row (10)."""
    rows = {
        (r.user_id, r.event_type): r.event_id
        for r in _QUERIES["dedup_latest_by_key"](spark, edge_dir).collect()
    }
    assert rows[(1, "click")] == 30, rows
    assert rows[(1, "view")] == 40, rows  # later second beats larger id
    assert rows[(2, "view")] == 50, rows  # pre-1970 sole row wins


# ---------------------------------------------------------------------------
# Property-based randomized parity (hypothesis): beyond the hand-built
# fixture above, re-prove cross-engine agreement on ARBITRARY
# tie/NULL-heavy inputs. Value domains are deliberately tiny so ties,
# NULL keys, and same-second timestamp collisions occur in almost
# every example — the shapes where a determinism contract would break.
# (sql_api_revenue_ranking is covered by the hand-built fixture only:
# its hazard lives in lineitem rev ties, already pinned above.)
# ---------------------------------------------------------------------------

from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

import os  # noqa: E402

# 12 examples per suite run; the space was mined once at 100 examples
# per test at round-8 close and again at 200 examples per test at
# round-9 open (all green both times) so the small CI sample is a
# canary, not the only exploration. Override for a deep re-mine:
#   STALE_EDGE_EXAMPLES=200 pytest tests/test_stale_cert_edges.py
_HSETTINGS = settings(
    max_examples=int(os.environ.get("STALE_EDGE_EXAMPLES", "12")),
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_ORDERS_PROP_OPS = [
    "sort_multi",
    "limit_n",
    "topk_per_group",
    "set_except",
    "set_symmetric_diff",
    "sql_exists_decorrelated",
]

_rand_orders = st.lists(
    st.tuples(
        st.sampled_from([None, 1, 2, 3]),  # o_custkey: tiny domain + NULL
        st.sampled_from([None, "F", "O", "P"]),  # o_orderstatus
        # o_totalprice: heavy ties, NULL, and one value above the
        # sql_exists 300000 threshold
        st.sampled_from([None, 1.0, 2.5, 99.0, 300001.0]),
    ),
    min_size=1,
    max_size=25,
)


def _write_orders_fixture(d, rows):
    schema = _SCHEMAS["orders"]
    full = [
        (i + 1, ck, status, price, _ts(2024, 1, (i % 28) + 1), "1-URGENT")
        for i, (ck, status, price) in enumerate(rows)
    ]
    cols = list(zip(*full))
    pq.write_table(
        pa.Table.from_arrays(
            [pa.array(list(c), type=f.type) for c, f in zip(cols, schema)],
            schema=schema,
        ),
        f"{d}/orders.parquet",
    )
    cust_schema = _SCHEMAS["customer"]
    cust = [(ck, f"c{ck}", 1, 0.0, "MACHINERY") for ck in (1, 2, 3)]
    ccols = list(zip(*cust))
    pq.write_table(
        pa.Table.from_arrays(
            [pa.array(list(c), type=f.type) for c, f in zip(ccols, cust_schema)],
            schema=cust_schema,
        ),
        f"{d}/customer.parquet",
    )


@_HSETTINGS
@given(_rand_orders)
def test_orders_ops_randomized_parity(spark, tmp_path_factory, rows):
    d = str(tmp_path_factory.mktemp("prop_orders"))
    _write_orders_fixture(d, rows)
    con = duckdb.connect()
    try:
        for name in ("orders", "customer"):
            con.execute(
                f"CREATE VIEW {name} AS SELECT * FROM "
                f"read_parquet('{d}/{name}.parquet')"
            )
        for op in _ORDERS_PROP_OPS:
            assert_parity(_QUERIES[op](spark, d), con, _ORACLES[op], op)
    finally:
        con.close()


_rand_events = st.lists(
    st.tuples(
        st.sampled_from([None, 1, 2]),  # user_id
        st.sampled_from([None, "a", "b"]),  # event_type
        st.sampled_from([0, 1]),  # base second (collisions frequent)
        st.sampled_from([0, 100000, 900000]),  # microseconds within it
        # value: tiny domain so V-shape troughs + plateaus both occur
        st.sampled_from([0.5, 1.0, 2.0]),
    ),
    min_size=1,
    max_size=25,
)


@_HSETTINGS
@given(_rand_events)
def test_events_ops_randomized_parity(spark, tmp_path_factory, rows):
    """dedup_exact / dedup_latest_by_key on random NULL-keyed events
    whose timestamps collide at seconds granularity: the winner must
    come from the seconds-truncation + event_id tiebreak on BOTH
    engines, for every generated collision pattern. win_pattern_vshape
    (r9-window front) rides the same generator: V-shape detection via
    lag/lead over (ts, event_id) with identical-full-timestamp
    collisions forcing the event_id tiebreak to decide neighbors."""
    d = str(tmp_path_factory.mktemp("prop_events"))
    schema = _SCHEMAS["events"]
    full = [
        (i + 1, _ts(2024, 3, 1, 12, 0, sec, us), uid, et, val, "{}")
        for i, (uid, et, sec, us, val) in enumerate(rows)
    ]
    cols = list(zip(*full))
    pq.write_table(
        pa.Table.from_arrays(
            [pa.array(list(c), type=f.type) for c, f in zip(cols, schema)],
            schema=schema,
        ),
        f"{d}/events.parquet",
    )
    con = duckdb.connect()
    try:
        con.execute(
            f"CREATE VIEW events AS SELECT * FROM "
            f"read_parquet('{d}/events.parquet')"
        )
        for op in ("dedup_exact", "dedup_latest_by_key", "win_pattern_vshape"):
            assert_parity(_QUERIES[op](spark, d), con, _ORACLES[op], op)
    finally:
        con.close()


# ---------------------------------------------------------------------------
# r9-window-front ops (§7.5 proposal 4, executed one round early): the
# 5 r2-certified ops rotating into the r9 driver window get the same
# randomized dual-engine treatment before their re-cert round.
# win_pattern_vshape rides the events generator above; the four below
# ride orders/lineitem generators tuned to THEIR hazards — same-day
# SCD2 versions (o_orderkey tiebreak), composite-key running
# positions, and struct-extreme ties in the 52-week high/low dates.
# Keys and prices stay non-NULL: NULL natural keys / NULL money are
# out of these ops' documented contract (FIXTURES.md columns are
# non-null there); the hazard is TIES, not NULLs.
# ---------------------------------------------------------------------------

_rand_scd2_orders = st.lists(
    st.tuples(
        st.sampled_from([1, 2]),  # o_custkey: 2 keys → deep histories
        st.sampled_from(["F", "O"]),  # status (attr + incremental split)
        st.sampled_from([1.0, 2.5, 99.0]),  # price ties
        st.sampled_from([1, 2, 3]),  # day: tiny → same-eff-date versions
    ),
    min_size=1,
    max_size=25,
)


@_HSETTINGS
@given(_rand_scd2_orders)
def test_scd2_fact_orders_ops_randomized_parity(spark, tmp_path_factory, rows):
    d = str(tmp_path_factory.mktemp("prop_scd2"))
    schema = _SCHEMAS["orders"]
    full = [
        (i + 1, ck, status, price, _ts(2024, 1, day), "1-URGENT")
        for i, (ck, status, price, day) in enumerate(rows)
    ]
    cols = list(zip(*full))
    pq.write_table(
        pa.Table.from_arrays(
            [pa.array(list(c), type=f.type) for c, f in zip(cols, schema)],
            schema=schema,
        ),
        f"{d}/orders.parquet",
    )
    con = duckdb.connect()
    try:
        con.execute(
            f"CREATE VIEW orders AS SELECT * FROM "
            f"read_parquet('{d}/orders.parquet')"
        )
        for op in (
            "tpcdi_scd2_dimcustomer",
            "tpcdi_scd2_incremental",
            "tpcdi_fact_cash_balances",
        ):
            assert_parity(_QUERIES[op](spark, d), con, _ORACLES[op], op)
    finally:
        con.close()


_rand_lineitem = st.lists(
    st.tuples(
        st.sampled_from([1, 2]),  # l_partkey (security)
        st.sampled_from([1, 2]),  # l_suppkey (account)
        st.sampled_from([1.0, 2.0]),  # quantity
        st.sampled_from([10.0, 20.0]),  # price: ties → struct extremes
        st.sampled_from(["N", "R"]),  # returnflag: signed positions
        st.sampled_from([1, 2, 200]),  # ship day (200 exits 52wk range)
    ),
    min_size=1,
    max_size=25,
)


@_HSETTINGS
@given(_rand_lineitem)
def test_fact_lineitem_ops_randomized_parity(spark, tmp_path_factory, rows):
    d = str(tmp_path_factory.mktemp("prop_li"))
    schema = _SCHEMAS["lineitem"]
    full = [
        (
            i + 1, pk, sk, 1, qty, price, 0.0, 0.0, rf, "O",
            _ts(2024, 1, 1) + datetime.timedelta(days=day),
        )
        for i, (pk, sk, qty, price, rf, day) in enumerate(rows)
    ]
    cols = list(zip(*full))
    pq.write_table(
        pa.Table.from_arrays(
            [pa.array(list(c), type=f.type) for c, f in zip(cols, schema)],
            schema=schema,
        ),
        f"{d}/lineitem.parquet",
    )
    con = duckdb.connect()
    try:
        con.execute(
            f"CREATE VIEW lineitem AS SELECT * FROM "
            f"read_parquet('{d}/lineitem.parquet')"
        )
        for op in ("tpcdi_fact_market_history", "tpcdi_fact_holdings"):
            assert_parity(_QUERIES[op](spark, d), con, _ORACLES[op], op)
    finally:
        con.close()
