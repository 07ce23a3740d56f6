"""Round-10 pre-certification edge tests for the incoming window's
r4 scalar block (VERDICT r9 item 4; the §7.5-r8-item-4 enumeration,
executed a third time): the 18 window ops with no dedicated test
anywhere in tests/ — the str_/math_/json_/cond_/null_/hash_/array_
scalar family — each driven as the REAL registered op+oracle pair on
a hand-built hostile fixture, plus absolute-value pins on the
sharpest boundaries so a both-engines-drift regression cannot pass as
parity.

Boundaries pinned:
- phone assembly at every NULL-branch combination incl. custkey 0
  (all three optional parts exercised) — concat branches, not just
  the happy path;
- rtrim strips SPACES ONLY (a data-final U+0085 survives — the r9
  rstrip class from the reader side, now pinned on the expression
  side); substring counts codepoints (astral names);
- rpad TRUNCATES a 25-char name to 20; printf %03d handles negative
  and width-overflowing keys C-style in both engines;
- exact .xx5 midpoints through the DECIMAL(25,6) HALF_UP route
  (0.50 × 0.01 → 0.01; whole-price 2.5 → 3, catching a banker's-
  rounding drift);
- the l_quantity = 25 divide-by-zero guard NULLs exactly at 25;
- JSON $.k: missing key and JSON null both surface SQL NULL; INT
  min fits; to_json round-trip on quote/backslash/newline/control
  payloads (probed byte-identical across engines this round);
- split on multi-space keeps EMPTY tokens ('a  b' → 3);
- base64/hex of the first 24 CODEPOINTS with multibyte text, and
  strlen = BYTES ≠ chars;
- upper()-path values stay inside the documented simple-case-mapping
  contract (Java upper('ß')='SS' vs utf8proc 'ẞ' re-verified this
  round — the class stays out of c_name by adjudication).
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

NEL = "\u0085"
TS = datetime.datetime(2024, 1, 15, 12, 0, 0)

OPS = [
    "str_concat_phone", "str_substr_trim", "str_case_match",
    "str_pad_format", "str_regexp", "str_split_explode",
    "str_regexp_extract_all", "str_encode_b64_hex", "math_round_money",
    "math_ratio_guard", "math_functions", "math_trig", "cond_case_when",
    "null_coalesce", "hash_checksum", "json_extract",
    "json_nested_roundtrip", "array_ops",
]


def _customer():
    # keys hit every phone NULL-branch combo: %3=0 kills cc, %4=0
    # kills ac, %5=0 adds ext; 0 and 60 hit all three at once
    segs = ["BUILDING", "building", "BUILDING ", f"BUILDING{NEL}",
            "AUTOMOBILE", ""]
    names = ["émile zola", "MiXeD case", "nul\x00name", "", "trailing  ",
             "plain name"]
    keys = [0, 1, 3, 4, 5, 12, 15, 20, 60, 7]
    bals = [-0.0, 0.0, -5.5, 2.675, 0.005, 99999.99]
    return [
        (k, names[i % len(names)], i % 25, bals[i % len(bals)],
         segs[i % len(segs)])
        for i, k in enumerate(keys)
    ]


def _part():
    names = [
        "", "  double  spaced  ", "sixchar words here longerwords",
        "(paren start", "9digit start", f"ends nel{NEL}",
        "émoji 🎵 mix𝄞 tail", "x" * 30, "UPPER lower_under 123abc",
        "exact!", "trail space ",
    ]
    types = ["a  b", "", " lead", "trail ", "one", "two words",
             "PROMO BURNISHED NICKEL"]
    return [
        (i, names[i % len(names)], "B1", types[i % len(types)], i % 50, 1.5)
        for i in range(len(names))
    ]


def _nation():
    # 20-char exact / >20 truncation / '|' collision / width-breaking
    # printf keys (negative, 4-digit)
    rows = [
        (0, "exactly twenty chars", 0),
        (5, "a much longer nation name here", 1),
        (999, "pipe|inside", 2),
        (1000, "ünïcode nation", 3),
        (-5, "x", 4),
        (24, "", 0),
    ]
    return rows


def _lineitem():
    # (qty, price, disc) triplets on the guard/midpoint/log edges
    trip = [
        (25.0, 0.50, 0.01),      # qty guard NULL; 0.005 → 0.01 HALF_UP
        (24.999999, 2.5, 0.0),   # near-guard passes; whole 2.5 → 3
        (26.0, 3.5, 0.5),        # 3.5 → 4; 1.75 disc_amt
        (0.0, 1.0, 0.125),       # ln(1)=0; qty-25 = -25
        (1024.0, 16384.03125, 0.25),  # dyadic price
        (50.0, 100.0, 0.0),      # log10 = 2 exactly; exp(0) = 1
        (17.0, 0.03, 0.5),       # 0.015 → 0.02 HALF_UP
    ]
    return [
        (i, i % 3, i % 2, i, q, p, d, 0.02, "N", "O", TS)
        for i, (q, p, d) in enumerate(trip)
    ]


def _orders():
    prios = ["1-URGENT", "1-urgent", "2-HIGH", "3-MEDIUM", "5-LOW", ""]
    return [
        (i, i % 5, "OFP"[i % 3], 100.0 + i, TS, prios[i % len(prios)])
        for i in range(9)
    ]


def _events():
    props = ['{"k": 3}', "{}", '{"k": null}', '{"j": 1}',
             '{"k": -2147483648}', '{"k": 0}']
    etypes = ['say "hi"', "back\\slash", "line\nbreak", "ünïcode", "",
              "tab\there"]
    return [
        (i, TS, i % 4, etypes[i % len(etypes)], 1.5, props[i % len(props)])
        for i in range(12)
    ]


def _documents():
    texts = [
        "ünïcode tëxt padded to more than twenty-four chars",
        "üü" * 12,                       # exactly 24 codepoints, 2-byte
        "émoji 🎵🚀 mix𝄞 goes beyond twenty four",
        "", "x" * 23,
        "nul\x00byte text that is long enough yes",
    ]
    return [(i, t, "en", "src", len(t)) for i, t in enumerate(texts)]


def _embeddings():
    vecs = [
        [-0.0] + [0.5] * 62 + [1e-38],
        [(j - 32) / 32.0 for j in range(64)],
        [0.0] * 64,
    ]
    return [(i, [float(x) for x in v], i) for i, v in enumerate(vecs)]


_TABLES = {
    "customer": (
        _customer,
        "c_custkey:int64,c_name:str,c_nationkey:int32,c_acctbal:f64,"
        "c_mktsegment:str",
    ),
    "part": (
        _part,
        "p_partkey:int64,p_name:str,p_brand:str,p_type:str,p_size:int32,"
        "p_retailprice:f64",
    ),
    "nation": (_nation, "n_nationkey:int32,n_name:str,n_regionkey:int32"),
    "lineitem": (
        _lineitem,
        "l_orderkey:int64,l_partkey:int64,l_suppkey:int64,"
        "l_linenumber:int32,l_quantity:f64,l_extendedprice:f64,"
        "l_discount:f64,l_tax:f64,l_returnflag:str,l_linestatus:str,"
        "l_shipdate:ts",
    ),
    "orders": (
        _orders,
        "o_orderkey:int64,o_custkey:int64,o_orderstatus:str,"
        "o_totalprice:f64,o_orderdate:ts,o_orderpriority:str",
    ),
    "events": (
        _events,
        "event_id:int64,ts:ts,user_id:int64,event_type:str,value:f64,"
        "props:str",
    ),
    "documents": (
        _documents,
        "doc_id:int64,text:str,lang:str,source:str,n_chars:int64",
    ),
    "embeddings": (_embeddings, "vec_id:int64,embedding:vec,label:int32"),
}

_PA = {
    "int64": pa.int64(), "int32": pa.int32(), "str": pa.string(),
    "f64": pa.float64(), "ts": pa.timestamp("us"),
    "vec": pa.list_(pa.float32()),
}


@pytest.fixture(scope="module")
def edge_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("r10_window_edges")
    for name, (rows_fn, ddl) in _TABLES.items():
        fields = [
            pa.field(*[p.split(":")[0], _PA[p.split(":")[1]]])
            for p in ddl.split(",")
        ]
        rows = rows_fn()
        cols = list(zip(*rows))
        table = pa.Table.from_arrays(
            [pa.array(list(c), type=f.type) for c, f in zip(cols, fields)],
            schema=pa.schema(fields),
        )
        pq.write_table(table, str(d / f"{name}.parquet"))
    return str(d)


@pytest.fixture(scope="module")
def edge_duck(edge_dir):
    con = duckdb.connect()
    for name in _TABLES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM "
            f"read_parquet('{edge_dir}/{name}.parquet')"
        )
    yield con
    con.close()


@pytest.mark.parametrize("op", OPS)
def test_window_op_parity_on_hostile_fixture(spark, edge_dir, edge_duck, op):
    df = _QUERIES[op](spark, edge_dir)
    assert_parity(df, edge_duck, _ORACLES[op], op)


# ------------------------------------------------- absolute pins


def _rows(spark, op, d, keycol):
    return {
        r[keycol]: r.asDict()
        for r in _QUERIES[op](spark, d).collect()
    }


def test_phone_branches_pinned(spark, edge_dir):
    got = _rows(spark, "str_concat_phone", edge_dir, "c_custkey")
    # key 0: cc NULL (%3), ac NULL (%4), ext '0' (%5) → bare loc + ext
    assert got[0]["phone"] == "0000000 x0"
    # key 1: every part present except ext
    assert got[1]["phone"].startswith("+1 (007) ")
    # key 3: cc dropped, ac kept
    assert got[3]["phone"].startswith("(021) ")
    # key 4: ac dropped → bare loc, no parens
    assert "(" not in got[4]["phone"] and "+" not in got[4]["phone"]


def test_rtrim_strips_spaces_only(spark, edge_dir):
    got = _rows(spark, "str_substr_trim", edge_dir, "p_partkey")
    nel_key = next(k for k, r in got.items() if NEL in (r["trimmed"] or ""))
    # the padded '  name  ' loses spaces but KEEPS the data-final NEL
    assert got[nel_key]["rtrimmed"] == f"  ends nel{NEL}"
    # astral name: substring counts CODEPOINTS, not bytes or chars16
    ast = next(k for k, r in got.items() if "🎵" in (r["name10"] or ""))
    assert got[ast]["name10"] == "émoji 🎵 mi"


def test_pad_truncation_and_printf_pinned(spark, edge_dir):
    got = _rows(spark, "str_pad_format", edge_dir, "n_nationkey")
    assert got[5]["name_pad"] == "a much longer nation"  # 20, truncated
    assert got[0]["name_pad"] == "exactly twenty chars"  # 20, untouched
    assert got[-5]["fmt"] == "-05-x"       # C-style negative %03d
    assert got[1000]["code5"] == "01000"
    assert got[999]["fmt"] == "999-pipe|inside"


def test_money_midpoints_half_up(spark, edge_dir):
    got = _rows(spark, "math_round_money", edge_dir, "l_orderkey")
    assert got[0]["disc_amt"] == 0.01     # 0.50 × 0.01 = 0.005 → up
    assert got[6]["disc_amt"] == 0.02     # 0.03 × 0.5  = 0.015 → up
    assert got[1]["price_whole"] == 3.0   # 2.5 → 3 (not banker's 2)
    assert got[2]["price_whole"] == 4.0


def test_ratio_guard_nulls_exactly_at_25(spark, edge_dir):
    got = _rows(spark, "math_ratio_guard", edge_dir, "l_orderkey")
    assert got[0]["price_per_off25"] is None          # qty == 25
    assert got[1]["price_per_off25"] is not None      # 24.999999


def test_json_missing_and_null_both_null(spark, edge_dir):
    got = _rows(spark, "json_extract", edge_dir, "event_id")
    assert got[1]["k"] is None      # {} — key missing
    assert got[2]["k"] is None      # {"k": null}
    assert got[3]["k"] is None      # {"j": 1}
    assert got[4]["k"] == -2147483648
    assert got[0]["k"] == 3


def test_split_keeps_empty_tokens(spark, edge_dir):
    df = _QUERIES["str_split_explode"](spark, edge_dir)
    words = [r["word"] for r in df.filter("p_partkey = 0").collect()]
    assert words == ["a", "", "b"]


def test_b64_hex_bytes_vs_codepoints(spark, edge_dir):
    import base64

    got = _rows(spark, "str_encode_b64_hex", edge_dir, "doc_id")
    # doc 1 is exactly 24 two-byte codepoints: head = whole text,
    # 48 UTF-8 bytes; n_bytes counts BYTES
    assert got[1]["n_bytes"] == 48
    assert base64.b64decode(got[1]["head_b64"]).decode() == "üü" * 12
    # NUL byte survives the encode chain
    assert base64.b64decode(got[5]["head_b64"])[3:4] == b"\x00"
