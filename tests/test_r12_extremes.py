"""Round-12 extremes-probe regression tests — the permanent
mechanization of the r12 engineered-input wave (SURVEY §7.4o).

The fixture is the REAL probe generator (tools/probe_r12_extremes.py:
ids within 64 of int64 max including the exact maximum, remapped
consistently across every join key; order/ship dates ending mid-9999;
events at 10-digit epochs; 16 hostile JSON payload shapes), so the
three stage-kill classes the probe found — id-derivation overflow,
hostile JSON, the scd2 date-ceiling — cannot silently return: every
fixed op runs as the REAL registered op+oracle pair on the fixture,
and the key boundary behaviors carry absolute pins.

Ops NOT driven here, each adjudicated in §7.4o: the two scd2 batch
ops (named ValueError pinned below instead), json_variant_extract
(nested-container vschema is out of the r5 oracle contract; its
bigint path IS pinned below), and scan_python_datasource (CIK
residue fix r14-pinned in tests/test_r14_prep.py). The rows deferred
from r12 to r13 — the 11-op FLOOR(EPOCH) oracle migration, bit_ops'
masked shift, scan_text_fixedwidth's CIK residue, scan_xml_flatten's
writer reduction, str_encode_b64_hex's CRLF strip — were applied in
r13 and are driven below (R13_OPS) on the same fixture.
"""

from __future__ import annotations

import duckdb
import pytest

from tpc_di_etl_using_pyspark_spark.plans.registry import all_oracles, all_queries

from .conftest import assert_parity

_QUERIES = all_queries()
_ORACLES = all_oracles()

I64_MAX = (1 << 63) - 1

# every op the r12 wave fixed for Spark-side stage-kills, driven as
# the real op+oracle pair on the extremes fixture
OPS = [
    "tpcdi_prospect_match", "tpcdi_dim_broker", "tpcdi_dim_company",
    "tpcdi_dim_security", "tpcdi_financial", "tpcdi_audit_reconciliation",
    "tpcdi_scd2_dimaccount", "audit_data_quality", "graph_pagerank",
    "graph_label_propagation", "agg_first_last", "sample_negative_pairs",
    "str_concat_phone", "json_extract", "udtf_map_in_pandas",
    "sink_compact_small_files", "sink_merge_upsert",
    # the r11 split-bucket adopters on full-range ids
    "sample_split_assign", "sample_stratified_exact",
]

# the r12→r13 deferred-fix wave, applied in r13 (SURVEY §7.4o recipes;
# exact floor-mod epoch oracles, masked shift, CIK residue, writer
# key reduction, CRLF strip) — driven on the same fixture so none of
# the five fix classes can silently regress
R13_OPS = [
    "join_asof_latest", "join_asof_tolerance", "win_lag_change",
    "win_running_distinct", "win_sessionize_gap", "win_interpolate_linear",
    "stream_stream_join", "win_pattern_vshape", "win_rolling_corr",
    "win_range_time_interval", "stream_sliding_sum",
    "str_encode_b64_hex", "bit_ops", "scan_xml_flatten",
    "scan_text_fixedwidth",
]
OPS = OPS + R13_OPS


@pytest.fixture(scope="module")
def extremes_dir(tmp_path_factory):
    import sys, os

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    try:
        import probe_r12_extremes
    finally:
        sys.path.pop(0)
    d = str(tmp_path_factory.mktemp("r12_extremes"))
    return probe_r12_extremes.main(d)


@pytest.fixture(scope="module")
def extremes_duck(extremes_dir):
    con = duckdb.connect()
    for name in [
        "region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents", "embeddings",
    ]:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM "
            f"read_parquet('{extremes_dir}/{name}.parquet')"
        )
    yield con
    con.close()


@pytest.mark.parametrize("op", OPS)
def test_fixed_op_parity_on_extremes_fixture(spark, extremes_dir, extremes_duck, op):
    df = _QUERIES[op](spark, extremes_dir)
    assert_parity(df, extremes_duck, _ORACLES[op], op)


# ------------------------------------------------- absolute pins


def test_prospect_rekey_wraps_at_int64_max(spark, extremes_dir):
    # p_id values observed through the name-join (names repeat across
    # custkeys, so a row's p_id may come from a same-named prospect —
    # pin the VALUE SET, not a per-row mapping)
    pids = {
        r.p_id
        for r in _QUERIES["tpcdi_prospect_match"](spark, extremes_dir).collect()
        if r.p_id is not None
    }
    # the exact int64 maximum is in the prospect side (f(1), %3 != 0);
    # its re-key wraps to 4999999 instead of ANSI-overflowing, and the
    # wrap band [0, 5e6) never collides with the +5e6 band
    assert I64_MAX - 9223372036849775808 == 4999999
    assert 4999999 in pids
    assert 2 + 5_000_000 in pids  # small even key keeps the classic re-key


def test_scd2_batch_raises_named_date_ceiling_error(spark, extremes_dir):
    with pytest.raises(ValueError, match="synthetic-batch contract"):
        _QUERIES["tpcdi_scd2_incremental"](spark, extremes_dir)


def test_json_extract_gate_pins(spark, extremes_dir):
    got = {
        r.event_id: r.k
        for r in _QUERIES["json_extract"](spark, extremes_dir).collect()
    }
    vals = set(got.values())
    # int64 extremes survive exactly; >int64 / floats / strings /
    # containers / null / deep nesting are NULL, never a stage kill
    assert I64_MAX in vals and -(1 << 63) in vals and 2147483648 in vals
    assert 12345678901234567890 not in vals
    # duplicate key takes the FIRST occurrence in both engines
    assert 7 in vals and 8 not in vals


def test_variant_bigint_path_survives_extremes(spark, extremes_dir):
    ks = [
        r.k for r in _QUERIES["json_variant_extract"](spark, extremes_dir).collect()
    ]
    assert I64_MAX in ks          # int64 max extracts, no variant-cast kill
    assert 12345678901234567890 not in ks  # >int64 -> NULL via try_


def test_first_last_runs_at_huge_event_ids(spark, extremes_dir):
    # event_ids sit near int64 max here: the old epoch*1e7+event_id
    # scalar ANSI-overflowed before producing a single row (value
    # agreement with DuckDB is the parity test above; this pins the
    # shape — one row per user, both extremes populated)
    rows = _QUERIES["agg_first_last"](spark, extremes_dir).collect()
    users = {r.user_id for r in rows}
    assert len(rows) == len(users) == 5
    assert I64_MAX in users  # f(1): the exact-maximum user id
    assert all(r.first_value is not None and r.last_value is not None for r in rows)
