"""Round-13 window coverage top-up: the post-rotation enumeration
(the r12 protocol step that caught agg_collect_sorted) found exactly
two window ops never named by any test — str_url_parse and
scan_csv_multichar_delim. Their documented edge contracts become
executable here; full-result parity stays with the per-round sweeps.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from tpc_di_etl_using_pyspark_spark.plans._util import t
from tpc_di_etl_using_pyspark_spark.plans.registry import all_queries
from tpc_di_etl_using_pyspark_spark.plans.scalars import _URL_VALID_RE

_QUERIES = all_queries()
SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    yield con
    con.close()


# --- str_url_parse: the shared validity gate must mean the same thing
# to Java (Spark rlike) and RE2 (DuckDB regexp_matches) on the edges
# its docstring claims -------------------------------------------------

EDGE_URLS = [
    ("https://ex7.com/seg/3?q=building", True),   # in-domain happy path
    ("https://ex7.com", True),                    # bare host, no path
    ("https://ex7.com\n", False),                 # trailing newline (\z anchor)
    ("https://ex7.com/seg with space", False),    # space in segment
    ("https://exämple.com/x", False),             # unicode host
    ("http://a.com/p?q=x&r=y", True),             # query with &
    ("ftp://a.com/x", False),                     # non-http scheme
    ("https://a.com/p;rm -rf", False),            # shell metachars
]


@pytest.mark.parametrize("url,valid", EDGE_URLS)
def test_url_gate_engine_identical(spark, duck, url, valid):
    s_ok = (
        spark.createDataFrame([(url,)], "url string")
        .select(F.col("url").rlike(_URL_VALID_RE).alias("ok"))
        .collect()[0]
        .ok
    )
    d_ok = duck.execute(
        "SELECT regexp_matches(?, ?)", [url, _URL_VALID_RE]
    ).fetchone()[0]
    assert s_ok == d_ok == valid, (url, s_ok, d_ok)


def test_url_parse_invalid_rows_null_all_components(spark):
    """An out-of-gate URL yields NULL host/path/query on the Spark
    side (the oracle mirrors via the same gate) — the total-function
    contract that keeps one malformed URL from killing a stage."""
    rows = _QUERIES["str_url_parse"](spark, SF).collect()
    assert rows, "op returned no rows at sf0.001"
    # every fixture URL is constructed in-domain → gate passes, host
    # is non-NULL and echoes the construction
    assert all(r.host is not None and r.host.startswith("ex") for r in rows)
    # empty-query canonicalization: q= + lower(mktsegment) is never
    # empty in-domain, so query is always non-NULL here; the NULL
    # path is pinned engine-level below
    assert all(r.query is not None and r.query.startswith("q=") for r in rows)


def test_url_empty_query_canonicalized_null(spark, duck):
    """try_parse_url returns '' for 'https://a.com/p?' where a
    no-match regexp_extract cannot — both sides canonicalize to NULL
    (nullif / NULLIF per the r5 hardening)."""
    got = (
        spark.createDataFrame([("https://a.com/p?",)], "url string")
        .select(
            F.nullif(F.try_parse_url("url", F.lit("QUERY")), F.lit("")).alias("q")
        )
        .collect()[0]
        .q
    )
    d = duck.execute(
        r"SELECT NULLIF(regexp_extract('https://a.com/p?', '\?(.*)$', 1), '')"
    ).fetchone()[0]
    assert got is None and d is None


# --- scan_csv_multichar_delim: the round trip IS the contract ---------


def test_multichar_delim_roundtrip_equals_parquet(spark):
    got = sorted(
        tuple(r) for r in _QUERIES["scan_csv_multichar_delim"](spark, SF).collect()
    )
    want = sorted(tuple(r) for r in t(spark, SF, "nation").collect())
    assert got == want


def test_null_field_keeps_alignment_via_sentinel(spark):
    """The documented concat_ws hazard (r5 ADVICE): concat_ws DROPS
    NULL operands, so an unguarded NULL middle field would shift every
    following field left. The coalesce-to-\\N guard keeps alignment."""
    df = spark.createDataFrame([("a", None, "c")], "x string, y string, z string")
    naked, guarded = (
        df.select(
            F.concat_ws("||", "x", "y", "z").alias("naked"),
            F.concat_ws(
                "||",
                *[F.coalesce(F.col(c), F.lit("\\N")) for c in df.columns],
            ).alias("guarded"),
        )
        .collect()[0]
    )
    assert naked == "a||c", naked  # the hazard is real on this build
    assert guarded == "a||\\N||c"
