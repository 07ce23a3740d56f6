"""Registry-wide physical-plan lint (100 TB posture, SURVEY §4):

1. No Python evaluation node (BatchEvalPython / ArrowEvalPython /
   MapInPandas / FlatMapGroupsInPandas / MapInArrow / PythonMapInArrow)
   in ANY op's plan except the declared Python surface (§2.J UDFs, the
   multimodal decode stand-ins, the Python DataSource connectors).
2. No CartesianProduct anywhere. Declared broadcast cross joins
   (1-row/k-row aggregates, small literal grids) must plan as
   BroadcastNestedLoopJoin, never a shuffled cartesian.

Builds the optimized physical plan of all registry ops and fails with
the op id and offending node. Plan construction is cheap for most ops;
write-then-read-back ops materialize their (pid-scoped, small) scratch
fixtures as a construction side effect, which is tolerated. Ops whose
CONSTRUCTION runs full jobs over the base tables (the compaction op's
two parquet write passes, the Python DataSource connectors' scratch
materialization) are skipped here — their plans are exercised by their
own dedicated tests and the oracle-parity sweep (ADVICE r3).
"""

from __future__ import annotations

import pytest

from tpc_di_etl_using_pyspark_spark.plans.registry import all_queries

# Ops whose CONTRACT is Python execution (the declared slow path).
PYTHON_SURFACE = {
    "udf_python_scalar",
    "udf_pandas_scalar",
    "udf_arrow_scalar",
    "udaf_pandas_grouped",
    "udtf_apply_in_pandas",
    "udtf_map_in_pandas",
    "udtf_map_in_arrow",
    "udtf_python_lateral",
    "multimodal_binary_features",
    "multimodal_frame_sample",
    "multimodal_image_resize",
    "multimodal_phash_neardup",
    "pipeline_multimodal_e2e",
    "scan_python_datasource",
    "sink_python_datasource",
    "stream_transform_with_state",
    # documented slow paths: Spark has no builtin NFC normalizer, and
    # the CustomerMgmt XML flatten is an ElementTree mapInPandas by
    # design (both state this in their docstrings)
    "text_normalize_unicode",
    "scan_xml_flatten",
}

# Ops whose DataFrame CONSTRUCTION executes full jobs (eager writes /
# globs) — linting them re-runs those jobs on every sweep and couples
# the lint to writable scratch dirs, so they are skipped (see module
# docstring).
SIDE_EFFECT = {
    "sink_compact_small_files",
    "scan_python_datasource",
    "sink_python_datasource",
    # construction runs the full write→merge→overwrite cycle (two
    # partitioned write jobs + a localCheckpoint), like the compaction op
    "sink_merge_upsert",
}

_PY_NODES = (
    "BatchEvalPython",
    "ArrowEvalPython",
    "MapInPandas",
    "FlatMapGroupsInPandas",
    "PythonMapInArrow",
    "MapInArrow",
)

_QUERIES = all_queries()


def _plan(df) -> str:
    return df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


@pytest.mark.parametrize("op", sorted(set(_QUERIES) - SIDE_EFFECT))
def test_plan_is_python_free_and_never_cartesian(op, spark, sf_dir):
    plan = _plan(_QUERIES[op](spark, sf_dir))
    assert "CartesianProduct" not in plan, f"{op}: shuffled cartesian product"
    if op in PYTHON_SURFACE:
        return
    for node in _PY_NODES:
        assert node not in plan, f"{op}: hot path contains {node}"
