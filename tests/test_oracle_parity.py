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


def test_approx_percentile_close_to_exact(spark, sf_dir):
    """t-digest estimates must sit within 1% of the exact interpolated
    percentiles (SURVEY §5.2.4 tolerance-based self-check)."""
    from tpc_di_etl_using_pyspark_spark.plans.core_agg import (
        agg_approx_percentile,
        agg_percentile,
    )

    approx = {
        r.l_returnflag: r.approx_pcts
        for r in agg_approx_percentile(spark, sf_dir).collect()
    }
    exact = {
        r.l_returnflag: (r.p25, r.p50, r.p95)
        for r in agg_percentile(spark, sf_dir).collect()
    }
    for flag, (p25, p50, p95) in exact.items():
        for a, e in zip(approx[flag], (p25, p50, p95)):
            assert abs(a - e) / e < 0.01, (flag, a, e)
