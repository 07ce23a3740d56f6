"""Registry-wide output-schema lint: every op's result must be
driver-hashable (VERDICT r5 item 4 — structural closure of the
`agg_collect_sorted` failure class).

The external driver canonicalizes each result with a pandas
``sort_values`` over all columns before value-hashing; pandas cannot
factorize columns holding Python lists / dicts / Rows, so ANY op that
emits an array / map / struct column crashes its correctness row with
``TypeError: unhashable type`` regardless of whether the values match
(CORRECTNESS_r05.json, agg_collect_sorted). This test builds every
registry op's DataFrame (construction only — no job execution beyond
the few eager-write ops) and fails if any output column is a
container type, so the class can never re-enter the registry.

BinaryType would be hashable (Python ``bytes``), but no op currently
emits it; it is rejected too so that a future addition gets a
deliberate decision rather than an accident.
"""

from __future__ import annotations

from pyspark.sql.types import ArrayType, BinaryType, MapType, StructType

from tpc_di_etl_using_pyspark_spark.plans.registry import all_queries

_CONTAINER = (ArrayType, MapType, StructType, BinaryType)


def test_every_registry_output_schema_is_flat_scalar(spark, sf_dir):
    violations = []
    for op, fn in sorted(all_queries().items()):
        df = fn(spark, sf_dir)
        names = [f.name for f in df.schema.fields]
        # duplicate names would make the canonicalizer's column-sorted
        # value hash ambiguous (pandas mangles duplicates on toPandas)
        if len(set(names)) != len(names):
            violations.append(f"{op}: duplicate column names {names}")
        for f in df.schema.fields:
            if isinstance(f.dataType, _CONTAINER):
                violations.append(
                    f"{op}: column {f.name!r} is {f.dataType.simpleString()}"
                )
    assert not violations, (
        "driver-unhashable output columns (project to flat scalars — "
        "array_join for string sets, long-form posexplode for vectors):\n"
        + "\n".join(violations)
    )
