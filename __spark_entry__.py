"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``tpc_di_etl_using_pyspark_spark`` (SURVEY.md
§2 op inventory; §7 build plan).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from tpc_di_etl_using_pyspark_spark.plans import registry as _registry  # noqa: E402
from tpc_di_etl_using_pyspark_spark.plans.core_agg import agg_groupby_basic  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship pricing-summary query (SURVEY §7.2) on sf0.001."""
    return agg_groupby_basic(spark, "/root/testdata/sf0.001")


def _cache_scoped(
    fn: Callable[[SparkSession, str], DataFrame],
) -> Callable[[SparkSession, str], DataFrame]:
    """Drop caches leaked by previously-run ops at the next op's build.

    Some ops cache() intermediates reused within their own plan
    (minhash shingles, kmeans components, the batch-e2e phase
    boundaries). The driver materializes ops sequentially in one
    session, so without this each op's cache would accumulate for the
    rest of the run."""

    def wrapped(spark: SparkSession, d: str) -> DataFrame:
        spark.catalog.clearCache()
        return fn(spark, d)

    return wrapped


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {k: _cache_scoped(v) for k, v in _registry.all_queries().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent ANSI SQL per op (rows-only ops omitted)."""
    return _registry.all_oracles()
