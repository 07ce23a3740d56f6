"""Shared fixtures: one SparkSession, one DuckDB connection with the
driver's view registration, and an oracle-parity comparator that
mirrors the driver's check (row-count + columns + order-insensitive
exact value comparison).
"""

from __future__ import annotations

import datetime
import decimal
import math
import os
import sys

import duckdb
import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

# transformWithStateInPandas needs google.protobuf in the python
# WORKERS (the TWS state-server client). This container has no
# protobuf wheel; tools/pb_shim/sitecustomize.py exposes the
# google-cloud-sdk's bundled pure-python runtime instead. PYTHONPATH
# must carry the shim dir BEFORE the JVM starts so forked workers
# auto-run it; activate() covers this (driver) process.
_PB_SHIM = os.path.join(_REPO, "tools", "pb_shim")
if _PB_SHIM not in sys.path:
    sys.path.insert(0, _PB_SHIM)
import sitecustomize as _pb_shim  # noqa: E402

if _pb_shim.activate():
    os.environ["PYTHONPATH"] = os.pathsep.join(
        p for p in [_PB_SHIM, os.environ.get("PYTHONPATH", "")] if p
    )

from tpc_di_etl_using_pyspark_spark.plans._util import TABLES  # noqa: E402
from tpc_di_etl_using_pyspark_spark.session import get_spark  # noqa: E402

# Default to the driver's correctness scale factor (sf0.01); override
# with SPARK_GRAFT_TEST_SF_DIR for quick local iteration at sf0.001.
SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.01")


@pytest.fixture(scope="session")
def spark():
    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
    s = get_spark("tpcdi-engine-tests")
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR


@pytest.fixture(scope="session")
def duck(sf_dir):
    con = duckdb.connect()
    for name in TABLES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{sf_dir}/{name}.parquet')"
        )
    yield con
    con.close()


def _canon(v):
    """Canonicalize one cell to a hashable, engine-independent token."""
    if v is None:
        return "∅"
    if isinstance(v, float):
        if math.isnan(v):
            return "∅nan"
        return float(v).hex()
    if isinstance(v, bool):
        return "T" if v else "F"
    if isinstance(v, int):
        return str(v)
    if isinstance(v, decimal.Decimal):
        return float(v).hex()
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat(timespec="microseconds")
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_canon(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, _canon(x)) for k, x in v.items()))
    if isinstance(v, (bytes, bytearray)):
        return bytes(v).hex()
    return str(v)


def _coarse_spark_type(dt: str) -> str:
    """Collapse a Spark dtype string to a value-representation class."""
    if dt in ("tinyint", "smallint", "int", "bigint"):
        return "int"
    if dt in ("float", "double"):
        return "float"
    if dt.startswith("decimal"):
        return "decimal"
    if dt.startswith("array"):
        return "list"
    if dt.startswith("struct"):
        return "struct"
    if dt.startswith("map"):
        return "map"
    if dt.startswith("timestamp"):
        return "timestamp"
    return dt  # string / boolean / date / binary / void


def _coarse_arrow_type(at) -> str:
    """Collapse a pyarrow DataType to the same classes as above."""
    import pyarrow as pa

    if pa.types.is_integer(at):
        return "int"
    if pa.types.is_floating(at):
        return "float"
    if pa.types.is_decimal(at):
        return "decimal"
    if pa.types.is_boolean(at):
        return "boolean"
    if pa.types.is_string(at) or pa.types.is_large_string(at):
        return "string"
    if pa.types.is_date(at):
        return "date"
    if pa.types.is_timestamp(at):
        return "timestamp"
    if pa.types.is_binary(at) or pa.types.is_large_binary(at):
        return "binary"
    if pa.types.is_list(at) or pa.types.is_large_list(at):
        return "list"
    if pa.types.is_struct(at):
        return "struct"
    if pa.types.is_map(at):
        return "map"
    return str(at)


def assert_type_parity(spark_df, duck_con, sql: str, op: str):
    """The driver's value hash is representation-sensitive: a DuckDB
    HUGEINT (SUM over integers → Arrow decimal128) hashes differently
    from a Spark BIGINT even when every value is identical
    (round-1 agg_conditional failure). Compare the DuckDB Arrow result
    schema against Spark dtypes at the value-representation level so
    local green implies driver green for this whole bug class.
    """
    arrow_schema = duck_con.execute(sql).arrow().schema
    d_types = {f.name: _coarse_arrow_type(f.type) for f in arrow_schema}
    s_types = {c: _coarse_spark_type(dt) for c, dt in spark_df.dtypes}
    mismatches = {
        c: (s_types[c], d_types[c])
        for c in s_types
        if c in d_types and s_types[c] != d_types[c]
    }
    assert not mismatches, (
        f"{op}: value-representation type mismatch (spark, duck) = "
        f"{mismatches} — the driver hash WILL fail on these even with "
        f"identical values; CAST the oracle column (e.g. HUGEINT → "
        f"CAST(... AS BIGINT))"
    )


def assert_parity(spark_df, duck_con, sql: str, op: str):
    """Mirror of the driver's compare: sort columns by name, canonical
    cells, order-insensitive row multiset equality — plus a
    value-representation type check (see assert_type_parity)."""
    s_cols = list(spark_df.columns)
    s_rows = [tuple(row) for row in spark_df.collect()]

    res = duck_con.execute(sql)
    d_cols = [c[0] for c in res.description]
    d_rows = res.fetchall()

    assert sorted(s_cols) == sorted(d_cols), (
        f"{op}: column mismatch spark={sorted(s_cols)} duck={sorted(d_cols)}"
    )
    assert_type_parity(spark_df, duck_con, sql, op)
    assert len(s_rows) == len(d_rows), (
        f"{op}: row count spark={len(s_rows)} duck={len(d_rows)}"
    )

    s_ix = [s_cols.index(c) for c in sorted(s_cols)]
    d_ix = [d_cols.index(c) for c in sorted(d_cols)]
    s_canon = sorted(tuple(_canon(r[i]) for i in s_ix) for r in s_rows)
    d_canon = sorted(tuple(_canon(r[i]) for i in d_ix) for r in d_rows)
    if s_canon != d_canon:
        diffs = [
            (a, b) for a, b in zip(s_canon, d_canon) if a != b
        ][:5]
        raise AssertionError(
            f"{op}: value mismatch (cols={sorted(s_cols)}); first diffs "
            f"(spark vs duck): {diffs}"
        )
