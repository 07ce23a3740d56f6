"""Lakehouse table-format connectors (Delta / Iceberg / Hudi).

The production deployment of a TPC-DI-style warehouse sits on a
transactional table format: MERGE INTO for the CDC apply
(tpcdi/pipeline.py cdc_apply is the plain-parquet emulation), time
travel for audit reruns, OPTIMIZE/compaction for small-file control.
None of the format jars ship in this offline image, so each connector
is gated behind an import-try with the exact call shape documented —
the engine's op surface (everything in plans/) is format-agnostic
DataFrame code and runs unchanged once a real catalog is attached.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def _unavailable(fmt: str, hint: str) -> RuntimeError:
    return RuntimeError(
        f"{fmt} support requires its runtime jars on the Spark classpath "
        f"(offline image ships none). Deploy-time config: {hint}"
    )


def write_delta(df: DataFrame, path: str, mode: str = "append") -> None:
    """`df.write.format('delta')` when delta-spark is present."""
    try:
        import delta  # noqa: F401
    except ImportError:
        raise _unavailable(
            "Delta Lake",
            "spark.sql.extensions=io.delta.sql.DeltaSparkSessionExtension, "
            "spark.sql.catalog.spark_catalog=org.apache.spark.sql.delta.catalog.DeltaCatalog",
        ) from None
    df.write.format("delta").mode(mode).save(path)


def merge_upsert_delta(
    spark: SparkSession, target_path: str, updates: DataFrame, key_cols: list[str]
) -> None:
    """MERGE INTO upsert — the transactional form of cdc_apply()."""
    try:
        from delta.tables import DeltaTable
    except ImportError:
        raise _unavailable("Delta Lake", "see write_delta") from None
    cond = " AND ".join(f"t.{k} = s.{k}" for k in key_cols)
    (
        DeltaTable.forPath(spark, target_path)
        .alias("t")
        .merge(updates.alias("s"), cond)
        .whenMatchedUpdateAll()
        .whenNotMatchedInsertAll()
        .execute()
    )


def write_iceberg(df: DataFrame, table: str, mode: str = "append") -> None:
    """`df.writeTo(table)` against an Iceberg catalog when configured."""
    spark = df.sparkSession
    if not any(
        "iceberg" in (spark.conf.get(k, "") or "").lower()
        for k in ("spark.sql.extensions",)
    ):
        raise _unavailable(
            "Apache Iceberg",
            "spark.sql.extensions=org.apache.iceberg.spark.extensions"
            ".IcebergSparkSessionExtensions + a spark.sql.catalog.<name> entry",
        )
    if mode not in ("append", "createOrReplace"):
        raise ValueError(
            f"write_iceberg mode must be 'append' or 'createOrReplace', got {mode!r}"
        )
    writer = df.writeTo(table)
    (writer.append() if mode == "append" else writer.createOrReplace())
