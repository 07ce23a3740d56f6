"""SparkSession factory tuned for this engine.

Local testing runs on ``local[N]`` (single JVM); the configuration is
chosen so that the same declarative plans scale to a multi-executor
cluster: AQE handles partition coalescing / skew splitting / join
strategy switches at runtime, Arrow keeps any pandas exchange
vectorized, and shuffle partitions stay modest for local mode (a real
cluster deployment would raise ``spark.sql.shuffle.partitions`` or rely
on AQE's coalescing from a higher initial number).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "tpcdi-spark-engine", master: str | None = None) -> SparkSession:
    """Build (or fetch) the engine's SparkSession.

    AQE on (runtime re-planning: partition coalescing, skew-join
    splitting, broadcast switch), Arrow on (vectorized pandas-UDF and
    toPandas exchange), timestamps truncated to microseconds on parquet
    read (events.ts is ns — FIXTURES.md).
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or f"local[{cpus}]")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(32 * 1024 * 1024))
    )
    return builder.getOrCreate()
