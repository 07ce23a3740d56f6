"""Primary correctness gate mirror: every op with a SQL oracle must
hash-match DuckDB at the driver's scale factor (SURVEY §5.2.1)."""

from __future__ import annotations

import pytest

from tpc_di_etl_using_pyspark_spark.plans.registry import all_oracles, all_queries

from .conftest import assert_parity

_QUERIES = all_queries()
_ORACLES = all_oracles()


def test_every_oracle_has_query():
    missing = set(_ORACLES) - set(_QUERIES)
    assert not missing, f"oracles without queries: {missing}"


@pytest.mark.parametrize("op", sorted(_ORACLES))
def test_oracle_parity(op, spark, duck, sf_dir):
    df = _QUERIES[op](spark, sf_dir)
    assert_parity(df, duck, _ORACLES[op], op)


@pytest.mark.parametrize("op", sorted(set(_QUERIES) - set(_ORACLES)))
def test_rows_only_ops_run(op, spark, sf_dir):
    df = _QUERIES[op](spark, sf_dir)
    assert df.count() >= 0
    assert len(df.columns) > 0
